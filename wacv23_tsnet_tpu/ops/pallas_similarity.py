"""Fused Pallas TPU kernel for the transformation branch.

Fuses, for each tile of target pixels (reference model/TSNet.py:350-365):

    logits = tar_tile @ src^T                # MXU, fp32
    logits *= mt*ms + (1-mt)*(1-ms)          # bbox same-region coefficient
    P      = exp(temp*logits - rowmax)       # VPU
    flow   = (P @ grid_padded) / rowsum(P)   # MXU

so the (h*w x h*w) attention matrix never leaves VMEM — the einsum path
writes it to HBM twice (after the matmul, before the softmax), which at
the shipped 1024x1024xB fp32 shape is the dominant memory traffic of the
branch. The kernel keeps everything resident: one HBM read of the source
features per batch element, one lane-padded flow write.

The 2-wide coordinate grid is lane-padded to 128 so the `P @ grid`
reduction maps onto the MXU; the pad columns are sliced off outside.

Differentiable via `jax.custom_vjp`: the backward pass reuses the VJP of
the einsum reference implementation (ops/similarity.py), recomputing
activations — the standard flash-attention trade of FLOPs for HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_T = 256


def _interpret() -> bool:
    """Pallas interpreter mode off-TPU (tests run on the CPU backend)."""
    return jax.default_backend() not in ("tpu",)


def _flow_kernel(t_ref, s_ref, mt_ref, ms_ref, grid_ref, out_ref, *, temp):
    tt = t_ref[0].astype(jnp.float32)              # (TILE_T, C)
    ss = s_ref[0].astype(jnp.float32)              # (S, C)
    # Full fp32 MXU passes: the softmax temperature (100) amplifies any
    # bf16-pass logit error 100x in exp space.
    logits = jax.lax.dot_general(
        tt, ss,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (TILE_T, S)
    mt = mt_ref[0].astype(jnp.float32)             # (TILE_T, 1)
    ms = ms_ref[0].astype(jnp.float32)             # (1, S)
    coeff = mt * ms + (1.0 - mt) * (1.0 - ms)      # (TILE_T, S)
    z = temp * (logits * coeff)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    p = jnp.exp(z)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    flow = jax.lax.dot_general(
        p, grid_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (TILE_T, LANES)
    out_ref[0] = flow / denom


def _flow_pallas(tar_fea, src_fea, mt_col, ms_row, grid_padded, temp):
    b, t, c = tar_fea.shape
    s = src_fea.shape[1]
    tile_t = min(_TILE_T, t)
    kernel = functools.partial(_flow_kernel, temp=temp)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, _LANES), jnp.float32),
        grid=(b, t // tile_t),
        in_specs=[
            pl.BlockSpec((1, tile_t, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, _LANES), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, _LANES), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * s * (c + _LANES),
            bytes_accessed=4 * b * (t * c + s * c + t * _LANES),
            transcendentals=b * t * s,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(tar_fea, src_fea, mt_col, ms_row, grid_padded)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def masked_attention_flow_fused(tar_fea, src_fea, tar_mask, src_mask, grid,
                                temp: float = 100.0):
    """Drop-in fused version of `ops.similarity.masked_attention_flow`.

    Same signature/semantics. Falls back to the einsum path when the
    target-pixel count doesn't tile cleanly (every shipped config does:
    32*32 = 1024 = 4 tiles of 256).
    """
    b, t, c = tar_fea.shape
    s = src_fea.shape[1]
    if t % min(_TILE_T, t) != 0:
        from .similarity import masked_attention_flow
        return masked_attention_flow(tar_fea, src_fea, tar_mask, src_mask,
                                     grid, temp=temp)
    grid_padded = jnp.zeros((s, _LANES), jnp.float32).at[:, :2].set(
        grid.astype(jnp.float32))
    out = _flow_pallas(
        tar_fea.astype(jnp.float32), src_fea.astype(jnp.float32),
        tar_mask.astype(jnp.float32).reshape(b, t, 1),
        src_mask.astype(jnp.float32).reshape(b, 1, s),
        grid_padded, temp)
    return out[:, :, :2]


def _fused_fwd(tar_fea, src_fea, tar_mask, src_mask, grid, temp):
    out = masked_attention_flow_fused(tar_fea, src_fea, tar_mask, src_mask,
                                      grid, temp)
    return out, (tar_fea, src_fea, tar_mask, src_mask, grid)


def _fused_bwd(temp, residuals, g):
    from .similarity import masked_attention_flow
    tar_fea, src_fea, tar_mask, src_mask, grid = residuals
    _, vjp = jax.vjp(
        lambda *a: masked_attention_flow(*a, temp=temp),
        tar_fea, src_fea, tar_mask, src_mask, grid,
    )
    return vjp(g)


masked_attention_flow_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# fully-fused transformation branch: similarity -> softmax -> flow ->
# bilinear warp, one kernel (the BASELINE.json north star: "the
# transformation branch's mask-aware similarity matrix ... and flow-based
# bilinear grid-sample warping become fused Pallas kernels").
#
# The bilinear gather is reformulated as a DENSE matmul: with source
# pixel s at integer coords (sy_s, sx_s) and a target's unnormalized
# sample point (ix, iy), torch's zeros-padded bilinear grid_sample weight
# is exactly the separable tent product
#     W[t, s] = max(0, 1 - |sx_s - ix_t|) * max(0, 1 - |sy_s - iy_t|)
# (non-zero only for the 4 neighbors; partially out-of-canvas samples
# lose the missing corners' mass, matching padding_mode="zeros"). So
# warped = W @ src_fea rides the MXU and the attention matrix, flow, AND
# warp never leave VMEM.
# ---------------------------------------------------------------------------


def _transform_warp_ref(src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask,
                        grid, h, w, temp):
    """Composite einsum + grid_sample reference (for the VJP)."""
    from .grid_sample import grid_sample
    from .similarity import masked_attention_flow

    b, s, c = src_fea.shape
    flow = masked_attention_flow(tar_fea_n, src_fea_n, tar_mask, src_mask,
                                 grid, temp=temp)
    warped = grid_sample(src_fea.reshape(b, h, w, c),
                         flow.reshape(b, h, w, 2), align_corners=False)
    return warped.reshape(b, h * w, c), flow


# ---------------------------------------------------------------------------
# multi-source fused transformation branch.
#
# The model runs the branch once per (sample, source) — or, on the clip
# inference path, per (source, frame) — pair. Round 1 wrapped the fused
# kernel in `vmap` over the source axis, which lowers the multi-output
# pallas_call ~20x slower; the fix (VERDICT.md item 1) is to flatten the
# pair axes INTO THE KERNEL GRID: a (G, NS, NF, tiles) grid whose
# BlockSpec index maps pick the source block from grid axis 1 and the
# target block from grid axis 2. No vmap, no broadcast materialization:
# source features are fetched from HBM once per source (they stay
# resident across the frame-tile iterations, which are innermost), and
# target features once per (source, tile).
#
# Covers both call shapes with one kernel:
#   train   (tsnet_forward):      G=batch, NS=n_source, NF=1
#   clip    (decode_with_sources): G=1,     NS=n_source, NF=frames
# ---------------------------------------------------------------------------


def _pair_kernel(t_ref, s_ref, mt_ref, ms_ref, grid_ref, fea_ref,
                 outw_ref, *outf, temp, h, w, warp_prec):
    tt = t_ref[0, 0].astype(jnp.float32)           # (TILE_T, C)
    ss = s_ref[0, 0].astype(jnp.float32)           # (T, C) normalized
    logits = jax.lax.dot_general(
        tt, ss, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (TILE_T, T)
    mt = mt_ref[0, 0].astype(jnp.float32)          # (TILE_T, 1)
    ms = ms_ref[0, 0].astype(jnp.float32)          # (1, T)
    coeff = mt * ms + (1.0 - mt) * (1.0 - ms)
    z = temp * (logits * coeff)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    p = jnp.exp(z)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    flow = jax.lax.dot_general(
        p, grid_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # (TILE_T, LANES)
    if outf:
        outf[0][0, 0, 0] = flow

    # dense separable-tent bilinear warp: grid_sample as a (T, S) matmul
    # of per-row 4-nonzero tent weights against the source features
    ix = (flow[:, 0:1] + 1.0) * (w * 0.5) - 0.5
    iy = (flow[:, 1:2] + 1.0) * (h * 0.5) - 0.5
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (1, h * w), 1)
    sx = (s_ids % w).astype(jnp.float32)
    sy = (s_ids // w).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - ix))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - iy))
    # warp_prec: HIGHEST for parity; DEFAULT (one bf16 pass) when the
    # caller's tail is bf16 anyway (fast_tail) — the warped features feed
    # only the decoder, never the temp-100 attention
    outw_ref[0, 0, 0] = jax.lax.dot_general(
        wx * wy, fea_ref[0, 0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=warp_prec,
    )


def _pairs_pallas(src_fea, tar_fea_n, src_fea_n, mt, ms, grid_padded,
                  temp, h, w, with_flow, warp_prec):
    g, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]
    tile_t = min(_TILE_T, t)
    kernel = functools.partial(_pair_kernel, temp=temp, h=h, w=w,
                               warp_prec=warp_prec)
    out_shape = [jax.ShapeDtypeStruct((g, ns, nf, t, c), jnp.float32)]
    out_specs = [pl.BlockSpec(
        (1, 1, 1, tile_t, c), lambda gi, si, fi, ti: (gi, si, fi, ti, 0),
        memory_space=pltpu.VMEM)]
    if with_flow:
        out_shape.append(
            jax.ShapeDtypeStruct((g, ns, nf, t, _LANES), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 1, 1, tile_t, _LANES),
            lambda gi, si, fi, ti: (gi, si, fi, ti, 0),
            memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(g, ns, nf, t // tile_t),
        in_specs=[
            pl.BlockSpec((1, 1, tile_t, c),
                         lambda gi, si, fi, ti: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, c),
                         lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, 1),
                         lambda gi, si, fi, ti: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t),
                         lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _LANES), lambda gi, si, fi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, c),
                         lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * ns * nf * t * t * (2 * c + _LANES),
            bytes_accessed=4 * (g * ns * t * c * 2 + g * nf * t * c
                                + g * ns * nf * t * c),
            transcendentals=g * ns * nf * t * t,
        ),
        # the 16 MB default scoped-VMEM rejects the shipped-plus shapes
        # (n_downsampling=2: 4096-pixel grids); the chip has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(tar_fea_n, src_fea_n, mt, ms, grid_padded, src_fea)
    return outs if with_flow else (outs[0],)


def _pairs_ref(src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask, grid,
               h, w, temp):
    """Differentiable einsum+gather reference over the pair axes.

    Flattens (G, NS, NF) into ONE batched call so the backward pass is a
    single batched einsum chain — a per-group Python loop here showed up
    directly as train-step time (the custom-vjp backward runs this).
    """
    g, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]

    def expand_src(x):                              # (G, NS, ...) -> rows
        return jnp.broadcast_to(x[:, :, None], (g, ns, nf) + x.shape[2:]
                                ).reshape((g * ns * nf,) + x.shape[2:])

    def expand_tar(x):                              # (G, NF, ...) -> rows
        return jnp.broadcast_to(x[:, None], (g, ns, nf) + x.shape[2:]
                                ).reshape((g * ns * nf,) + x.shape[2:])

    warped, flow = _transform_warp_ref(
        expand_src(src_fea), expand_tar(tar_fea_n), expand_src(src_fea_n),
        expand_tar(tar_mask), expand_src(src_mask), grid, h, w, temp)
    return (warped.reshape(g, ns, nf, t, c),
            flow.reshape(g, ns, nf, t, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def transform_warp_pairs(src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask,
                         grid, h: int, w: int, temp: float = 100.0,
                         fast_warp: bool = False, bwd_fast3: bool = False):
    """Grid-batched fused transformation branch over (group, src, tar) pairs.

    Args:
      src_fea:   (G, NS, T, C) un-normalized source features.
      tar_fea_n: (G, NF, T, C) L2-normalized target label features.
      src_fea_n: (G, NS, T, C) L2-normalized source features.
      tar_mask:  (G, NF, T) / src_mask: (G, NS, T) bbox masks.
      grid:      (T, 2) normalized source coordinates.

    Returns (warped (G, NS, NF, T, C), flow (G, NS, NF, T, 2)) for every
    (source, target) pair within each group; identical math to
    masked_attention_flow + zeros-padded bilinear grid_sample.
    """
    out = _pairs_dispatch(src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask,
                          grid, h, w, temp, with_flow=True,
                          fast_warp=fast_warp)
    return out[0], out[1][..., :2]


def _pairs_dispatch(src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask, grid,
                    h, w, temp, with_flow, fast_warp=False):
    g, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]
    if t % min(_TILE_T, t) != 0:
        warped, flow = _pairs_ref(src_fea, tar_fea_n, src_fea_n, tar_mask,
                                  src_mask, grid, h, w, temp)
        flow = jnp.pad(flow, ((0, 0),) * 4 + ((0, _LANES - 2),))
        return (warped, flow) if with_flow else (warped,)
    grid_padded = jnp.zeros((t, _LANES), jnp.float32).at[:, :2].set(
        grid.astype(jnp.float32))
    warp_prec = (jax.lax.Precision.DEFAULT if fast_warp
                 else jax.lax.Precision.HIGHEST)
    return _pairs_pallas(
        src_fea.astype(jnp.float32), tar_fea_n.astype(jnp.float32),
        src_fea_n.astype(jnp.float32),
        tar_mask.astype(jnp.float32).reshape(g, nf, t, 1),
        src_mask.astype(jnp.float32).reshape(g, ns, 1, t),
        grid_padded, temp, h, w, with_flow, warp_prec)


def transform_warp_pairs_nf(src_fea, tar_fea_n, src_fea_n, tar_mask,
                            src_mask, grid, h: int, w: int,
                            temp: float = 100.0, fast_warp: bool = False):
    """Inference-only variant: returns just warped (G, NS, NF, T, C),
    skipping the flow output's HBM write (the clip path never reads it).
    Not differentiable — use transform_warp_pairs in training."""
    return _pairs_dispatch(src_fea, tar_fea_n, src_fea_n, tar_mask,
                           src_mask, grid, h, w, temp, with_flow=False,
                           fast_warp=fast_warp)[0]


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with x == hi + lo exactly (lo holds the
    rounding residual; |lo| <= 2^-9 |x|)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_nt(a, b, precision):
    """a @ b^T with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _mean_source_contrib(tt, tt_split, mt, fea, ms, grid_ref, sx, sy,
                         *, temp, h, w, warp_prec, fast3):
    """One source's contribution to the folded-mean warp of a target tile:
    logits -> masked temp-softmax -> flow -> dense-tent warp, all in VMEM.
    Shared by `_mean_kernel` (sources looped in-kernel) and
    `_mean_bigt_kernel` (sources on the kernel grid)."""
    # F.normalize semantics: x / max(||x||_2, eps)
    norm = jnp.sqrt(jnp.sum(jnp.square(fea), axis=-1, keepdims=True))
    ss = fea / jnp.maximum(norm, 1e-12)
    if fast3:
        # hand-rolled bf16x3 (~= Precision.HIGH, which Mosaic cannot
        # lower itself): 3 single-pass MXU products instead of
        # HIGHEST's 6; the dropped lo@lo term is O(2^-18) relative.
        # The einsum path at HIGH measures 1.2e-3 mean L1 end to
        # end — inside the fast path's 0.01 budget.
        tt_hi, tt_lo = tt_split
        ss_hi, ss_lo = _split_bf16(ss)
        one = jax.lax.Precision.DEFAULT
        logits = (_dot_nt(tt_hi, ss_hi, one)
                  + (_dot_nt(tt_hi, ss_lo, one)
                     + _dot_nt(tt_lo, ss_hi, one)))
    else:
        logits = _dot_nt(tt, ss, jax.lax.Precision.HIGHEST)
    coeff = mt * ms + (1.0 - mt) * (1.0 - ms)
    z = temp * (logits * coeff)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    p = jnp.exp(z)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if fast3:
        # p @ grid in THREE bf16 passes with both operands hi/lo
        # split (grid entries -1 + 2i/31 are NOT binary fractions —
        # a plain bf16 grid cast moves sample positions ~0.4% and
        # blew the 0.01 end-to-end budget, measured 0.0129). The
        # dropped lo@lo term is O(2^-18) relative.
        p_hi, p_lo = _split_bf16(p)
        g_hi, g_lo = _split_bf16(grid_ref[:].astype(jnp.float32))
        dot = lambda a, g_: jax.lax.dot_general(
            a, g_, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        flow = (dot(p_hi, g_hi)
                + (dot(p_hi, g_lo) + dot(p_lo, g_hi)))
    else:
        flow = jax.lax.dot_general(
            p, grid_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                          # (TILE_T, LANES)
    ix = (flow[:, 0:1] + 1.0) * (w * 0.5) - 0.5
    iy = (flow[:, 1:2] + 1.0) * (h * 0.5) - 0.5
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - ix))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - iy))
    return jax.lax.dot_general(
        wx * wy, fea,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=warp_prec,
    )


def _mean_kernel(t_ref, mt_ref, ms_ref, grid_ref, fea_ref, out_ref,
                 *, temp, h, w, ns, warp_prec, fast3):
    """Per-tile transformation branch with the mean over sources folded
    in: the NS source iterations run INSIDE the kernel (a static Python
    loop), so the (NS, NF, T, C) per-pair warped tensor never exists in
    HBM — only its mean (NF, T, C) is written. The UN-normalized source
    features are the only per-source block resident in VMEM (shipped
    scale: 3 x 2 MB, constant index — fetched once); their L2
    normalization for the similarity matmul is recomputed on the VPU
    each grid step (2*T*C flops, ~0.1% of the tile's matmul work),
    which both halves the source HBM traffic and keeps the kernel under
    the 16 MB scoped-VMEM limit (a separate normalized block OOMs)."""
    tt = t_ref[0, 0].astype(jnp.float32)           # (TILE_T, C)
    mt = mt_ref[0, 0].astype(jnp.float32)          # (TILE_T, 1)
    tt_split = _split_bf16(tt) if fast3 else None
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (1, h * w), 1)
    sx = (s_ids % w).astype(jnp.float32)
    sy = (s_ids // w).astype(jnp.float32)
    acc = jnp.zeros(out_ref.shape[-2:], jnp.float32)
    for s in range(ns):
        fea = fea_ref[0, s].astype(jnp.float32)    # (T, C) un-normalized
        ms = ms_ref[0, s].astype(jnp.float32)      # (1, T)
        acc = acc + _mean_source_contrib(
            tt, tt_split, mt, fea, ms, grid_ref, sx, sy, temp=temp,
            h=h, w=w, warp_prec=warp_prec, fast3=fast3)
    out_ref[0, 0] = (acc / ns).astype(out_ref.dtype)


def _pairs_mean_pallas(src_fea, tar_fea_n, mt, ms, grid_padded,
                       temp, h, w, warp_prec, out_dtype):
    g, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]
    # 128-row tiles (not _TILE_T): the NS resident source blocks put
    # this kernel ~1 MB over the 16 MB scoped-VMEM limit at 256
    tile_t = min(128, t)
    kernel = functools.partial(
        _mean_kernel, temp=temp, h=h, w=w, ns=ns, warp_prec=warp_prec,
        fast3=warp_prec == jax.lax.Precision.DEFAULT)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, nf, t, c), out_dtype),
        grid=(g, nf, t // tile_t),
        in_specs=[
            pl.BlockSpec((1, 1, tile_t, c),
                         lambda gi, fi, ti: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, 1),
                         lambda gi, fi, ti: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, 1, t),
                         lambda gi, fi, ti: (gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _LANES), lambda gi, fi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ns, t, c),
                         lambda gi, fi, ti: (gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_t, c),
                               lambda gi, fi, ti: (gi, fi, ti, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * ns * nf * t * t * (2 * c + _LANES),
            bytes_accessed=(4 * (g * ns * t * c + g * nf * t * c)
                            + g * nf * t * c * out_dtype.itemsize),
            transcendentals=g * ns * nf * t * t,
        ),
        # the 16 MB default scoped-VMEM rejects the shipped-plus shapes
        # (n_downsampling=2: 4096-pixel grids); the chip has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(tar_fea_n, mt, ms, grid_padded, src_fea)


def _mean_bigt_kernel(t_ref, mt_ref, ms_ref, grid_ref, fea_ref, out_ref,
                      acc_ref, *, temp, h, w, ns, warp_prec, fast3):
    """`_mean_kernel` for feature grids past 32^2 (VERDICT r3 item 6
    scale: n_downsampling=2 -> 64^2 = 4096 target pixels). There the
    small kernel's all-sources-resident block (NS x T x C fp32, 12.6 MB
    at 4096x256 x3 sources) plus the 2 MB lane-padded grid and the 2 MB
    logits tile overflows the 16 MB scoped VMEM and Mosaic refuses to
    compile. This variant puts the source axis on the kernel grid
    (innermost, so the output tile stays resident) and accumulates the
    mean in an fp32 VMEM scratch: only ONE source's features are ever
    resident (4 MB), and the per-pair tensor still never reaches HBM."""
    si = pl.program_id(3)
    tt = t_ref[0, 0].astype(jnp.float32)           # (TILE_T, C)
    mt = mt_ref[0, 0].astype(jnp.float32)          # (TILE_T, 1)
    tt_split = _split_bf16(tt) if fast3 else None
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (1, h * w), 1)
    sx = (s_ids % w).astype(jnp.float32)
    sy = (s_ids // w).astype(jnp.float32)
    fea = fea_ref[0, 0].astype(jnp.float32)        # (T, C) un-normalized
    ms = ms_ref[0, 0].astype(jnp.float32)          # (1, T)
    contrib = _mean_source_contrib(
        tt, tt_split, mt, fea, ms, grid_ref, sx, sy, temp=temp,
        h=h, w=w, warp_prec=warp_prec, fast3=fast3)

    @pl.when(si == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(si > 0)
    def _accum():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(si == ns - 1)
    def _emit():
        out_ref[0, 0] = (acc_ref[...] / ns).astype(out_ref.dtype)


def _pairs_mean_bigt_pallas(src_fea, tar_fea_n, mt, ms, grid_padded,
                            temp, h, w, warp_prec, out_dtype):
    g, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]
    tile_t = min(128, t)
    kernel = functools.partial(
        _mean_bigt_kernel, temp=temp, h=h, w=w, ns=ns, warp_prec=warp_prec,
        fast3=warp_prec == jax.lax.Precision.DEFAULT)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, nf, t, c), out_dtype),
        # sources innermost: the (gi, fi, ti) output tile and scratch
        # accumulator stay resident across the si steps
        grid=(g, nf, t // tile_t, ns),
        in_specs=[
            pl.BlockSpec((1, 1, tile_t, c),
                         lambda gi, fi, ti, si: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, 1),
                         lambda gi, fi, ti, si: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t),
                         lambda gi, fi, ti, si: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _LANES), lambda gi, fi, ti, si: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, c),
                         lambda gi, fi, ti, si: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_t, c),
                               lambda gi, fi, ti, si: (gi, fi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_t, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * g * ns * nf * t * t * (2 * c + _LANES),
            # source blocks re-fetch once per (frame, target-tile) step —
            # the price of fitting VMEM at large T
            bytes_accessed=(4 * g * ns * t * c * nf * (t // tile_t)
                            + 4 * g * nf * t * c
                            + g * nf * t * c * out_dtype.itemsize),
            transcendentals=g * ns * nf * t * t,
        ),
        # the 16 MB default scoped-VMEM rejects the shipped-plus shapes
        # (n_downsampling=2: 4096-pixel grids); the chip has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(tar_fea_n, mt, ms, grid_padded, src_fea)


# resident VMEM budget (bytes) above which transform_warp_pairs_mean
# switches from the all-sources-resident kernel to the big-T grid
# variant; module-level so tests can force the big-T path at small sizes
MEAN_KERNEL_RESIDENT_BUDGET = 10 * 2 ** 20


def transform_warp_pairs_mean(src_fea, tar_fea_n, src_fea_n, tar_mask,
                              src_mask, grid, h: int, w: int,
                              temp: float = 100.0, fast_warp: bool = False,
                              out_dtype=jnp.float32):
    """Inference-only: mean over sources of the per-pair warped features,
    computed without materializing the per-pair tensor.

    Same math as `transform_warp_pairs(...)[0].mean(axis=1)` but the
    (G, NS, NF, T, C) intermediate never touches HBM (at the shipped
    clip scale that is ~800 MB of write + read per 128 frames on a
    ~280 GB/s chip). Returns (G, NF, T, C) in `out_dtype` (pass bf16
    when the consumer is the bf16 fast tail — halves the write).
    Not differentiable — training uses transform_warp_pairs.
    """
    g, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]
    if t % min(128, t) != 0:
        warped, _ = _pairs_ref(src_fea, tar_fea_n, src_fea_n, tar_mask,
                               src_mask, grid, h, w, temp)
        return jnp.mean(warped, axis=1).astype(out_dtype)
    grid_padded = jnp.zeros((t, _LANES), jnp.float32).at[:, :2].set(
        grid.astype(jnp.float32))
    warp_prec = (jax.lax.Precision.DEFAULT if fast_warp
                 else jax.lax.Precision.HIGHEST)
    del src_fea_n  # recomputed in-kernel from src_fea (see _mean_kernel)
    # all-sources-resident kernel only while its resident blocks fit
    # scoped VMEM (shipped 32^2x512 x3 sources: ~6.8 MB); past that
    # (e.g. n_downsampling=2 -> 64^2) sources move onto the kernel grid
    resident = (ns * t * c + t * _LANES) * 4
    call = (_pairs_mean_pallas if resident <= MEAN_KERNEL_RESIDENT_BUDGET
            else _pairs_mean_bigt_pallas)
    return call(
        src_fea.astype(jnp.float32), tar_fea_n.astype(jnp.float32),
        tar_mask.astype(jnp.float32).reshape(g, nf, t, 1),
        src_mask.astype(jnp.float32).reshape(g, ns, 1, t),
        grid_padded, temp, h, w, warp_prec, jnp.dtype(out_dtype))


def _pairs_fwd(src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask, grid,
               h, w, temp, fast_warp, bwd_fast3):
    out = transform_warp_pairs(src_fea, tar_fea_n, src_fea_n, tar_mask,
                               src_mask, grid, h, w, temp, fast_warp,
                               bwd_fast3)
    return out, (src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask, grid)


# ---------------------------------------------------------------------------
# flash-style backward for transform_warp_pairs (VERDICT round-2 item 1).
#
# The einsum-VJP fallback materialized the (G*NS*NF, T, T) fp32 attention
# matrix in HBM twice per training step (recompute + cotangent) — the
# exact traffic the forward kernel exists to avoid. This kernel recomputes
# logits/softmax/flow/tent-weights per target tile in VMEM (the standard
# flash trade: FLOPs for HBM) and chains all six input cotangents without
# the attention or tent-weight matrices ever reaching HBM.
#
# Cotangent algebra (per pair; L=logits, K=mask coeff, P=softmax rows,
# W=bilinear tent weights, a=un-normalized source features):
#   warped = W @ a           -> da += W^T gw ;  dW = gw a^T
#   W[t,s] = wx*wy           -> d ix = sum_s dW*wy*sign(sx-ix)*1{|dx|<1}
#   ix = (fx+1)w/2 - 1/2     -> gflow = gf + (w/2, h/2)*d(ix, iy)
#   flow = P @ grid          -> gP = gflow_x gx^T + gflow_y gy^T (rank-2,
#                               VPU broadcast, no matmul) ; dgrid = P^T gflow
#   P = softmax(temp L K)    -> gz = P*(gP - rowsum(gP*P));
#                               gL = temp K gz ; gK = temp L gz
#   L = tn sn^T              -> gtn = gL sn ; gsn += gL^T tn
#   K = mt ms^T+(1-mt)(1-ms)^T -> gmt = rowsum(gK (2ms-1)); gms += colsum(...)
#
# Accumulation layout on the (G, NS, NF, tiles) grid: da/gsn/gms are
# indexed (gi, si) and accumulate in-place across the INNER (fi, ti) axes
# (consecutive revisits — the only pattern Pallas output blocks support);
# gtn/gmt would need the opposite nesting, so they are emitted per-pair
# and reduced over NS outside the kernel (for the train shape NF=1 that
# is (G, NS, T, C) — tiny next to the (G*NS, T, T) attention it avoids).
# ---------------------------------------------------------------------------

_TILE_BWD = 128


def _pairs_bwd_kernel(t_ref, s_ref, mt_ref, ms_ref, grid_ref, gridt_ref,
                      fea_ref, gw_ref, gf_ref,
                      da_ref, gsn_ref, gtn_ref, gmt_ref, gms_ref, gg_ref,
                      *, temp, h, w, fast3):
    gi = pl.program_id(0)
    si = pl.program_id(1)
    fi = pl.program_id(2)
    ti = pl.program_id(3)
    first_pair = jnp.logical_and(fi == 0, ti == 0)
    first_all = jnp.logical_and(jnp.logical_and(gi == 0, si == 0),
                                first_pair)

    tt = t_ref[0, 0].astype(jnp.float32)           # (TILE, C)
    ss = s_ref[0, 0].astype(jnp.float32)           # (T, C) normalized
    a = fea_ref[0, 0].astype(jnp.float32)          # (T, C) un-normalized
    mt = mt_ref[0, 0].astype(jnp.float32)          # (TILE, 1)
    ms = ms_ref[0, 0].astype(jnp.float32)          # (1, T)
    gw_t = gw_ref[0, 0, 0].astype(jnp.float32)     # (TILE, C)
    gfx = gf_ref[0, 0, 0][:, 0:1].astype(jnp.float32)   # (TILE, 1)
    gfy = gf_ref[0, 0, 0][:, 1:2].astype(jnp.float32)

    def dot(x, y, dims):
        if not fast3:
            return jax.lax.dot_general(
                x, y, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        # fast3: hand-rolled bf16x3 (both operands hi/lo split; the
        # dropped lo@lo term is O(2^-18) relative) — 3 single-pass MXU
        # products instead of HIGHEST's 6, halving the backward's MXU
        # cost. Enabled for the precision="high" training tier, whose
        # whole conv trunk already runs 3-pass; the temp-100 softmax
        # amplifies the logit error to ~4e-4 relative on P, i.e. grads
        # within ~1e-3 of the HIGHEST einsum VJP — far tighter than the
        # TF32-class matmuls the torch reference itself trained with.
        # The bit-parity ("highest") tier keeps the exact branch above.
        one = jax.lax.Precision.DEFAULT

        def d(a_, b_):
            return jax.lax.dot_general(
                a_, b_, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32, precision=one)

        x_hi, x_lo = _split_bf16(x)
        y_hi, y_lo = _split_bf16(y)
        return d(x_hi, y_hi) + (d(x_hi, y_lo) + d(x_lo, y_hi))

    # ---- forward recompute (identical ops/precision to _pair_kernel) ----
    logits = dot(tt, ss, ((1,), (1,)))             # (TILE, T)
    coeff = mt * ms + (1.0 - mt) * (1.0 - ms)
    z = temp * (logits * coeff)
    z = z - jnp.max(z, axis=-1, keepdims=True)
    p = jnp.exp(z)
    p = p / jnp.sum(p, axis=-1, keepdims=True)     # (TILE, T)
    flow = dot(p, grid_ref[:], ((1,), (0,)))       # (TILE, LANES)
    ix = (flow[:, 0:1] + 1.0) * (w * 0.5) - 0.5
    iy = (flow[:, 1:2] + 1.0) * (h * 0.5) - 0.5
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (1, h * w), 1)
    dx = (s_ids % w).astype(jnp.float32) - ix      # (TILE, T)
    dy = (s_ids // w).astype(jnp.float32) - iy
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))

    # ---- warp backward ----
    da_c = dot(wx * wy, gw_t, ((0,), (0,)))        # (T, C)
    gw_mat = dot(gw_t, a, ((1,), (1,)))            # dW = gw a^T  (TILE, T)
    dwx = jnp.sign(dx) * (jnp.abs(dx) < 1.0)
    dwy = jnp.sign(dy) * (jnp.abs(dy) < 1.0)
    gix = jnp.sum(gw_mat * wy * dwx, axis=-1, keepdims=True)   # (TILE, 1)
    giy = jnp.sum(gw_mat * wx * dwy, axis=-1, keepdims=True)
    gflow_x = gfx + gix * (w * 0.5)
    gflow_y = gfy + giy * (h * 0.5)

    # ---- flow backward: gP is rank-2, a VPU broadcast not a matmul ----
    gxr = gridt_ref[0:1]                           # (1, T)
    gyr = gridt_ref[1:2]
    g_p = gflow_x * gxr + gflow_y * gyr            # (TILE, T)

    # ---- softmax + mask backward ----
    gz = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))
    gl = temp * coeff * gz
    gk = temp * logits * gz
    gtn_ref[0, 0, 0] = dot(gl, ss, ((1,), (0,)))   # (TILE, C)
    gsn_c = dot(gl, tt, ((0,), (0,)))              # (T, C)
    gmt_ref[0, 0, 0] = jnp.sum(gk * (2.0 * ms - 1.0), axis=-1).reshape(1, -1)
    gms_c = jnp.sum(gk * (2.0 * mt - 1.0), axis=0, keepdims=True)  # (1, T)
    ggx_c = jnp.sum(p * gflow_x, axis=0, keepdims=True)            # (1, T)
    ggy_c = jnp.sum(p * gflow_y, axis=0, keepdims=True)

    @pl.when(first_pair)
    def _():
        da_ref[0, 0] = da_c
        gsn_ref[0, 0] = gsn_c
        gms_ref[0, 0] = gms_c

    @pl.when(jnp.logical_not(first_pair))
    def _():
        da_ref[0, 0] = da_ref[0, 0] + da_c
        gsn_ref[0, 0] = gsn_ref[0, 0] + gsn_c
        gms_ref[0, 0] = gms_ref[0, 0] + gms_c

    @pl.when(first_all)
    def _():
        gg_ref[0:1] = ggx_c
        gg_ref[1:2] = ggy_c

    @pl.when(jnp.logical_not(first_all))
    def _():
        gg_ref[0:1] = gg_ref[0:1] + ggx_c
        gg_ref[1:2] = gg_ref[1:2] + ggy_c


def _pairs_bwd_pallas(src_fea, tar_fea_n, src_fea_n, mt, ms, grid_padded,
                      grid_t, gw, gf_padded, temp, h, w, fast3):
    g, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]
    tile_t = min(_TILE_BWD, t)
    kernel = functools.partial(_pairs_bwd_kernel, temp=temp, h=h, w=w,
                               fast3=fast3)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((g, ns, t, c), jnp.float32),      # da
            jax.ShapeDtypeStruct((g, ns, t, c), jnp.float32),      # gsn
            jax.ShapeDtypeStruct((g, ns, nf, t, c), jnp.float32),  # gtn/pair
            # gmt/gms carry an explicit singleton axis before the pixel
            # axis so their blocks' last-two dims are (1, tile)/(1, t)
            # against a singleton array dim — Mosaic requires the
            # second-to-minor block dim be 8-divisible or equal to the
            # array dim (interpret mode never checks this)
            jax.ShapeDtypeStruct((g, ns, nf, 1, t), jnp.float32),  # gmt/pair
            jax.ShapeDtypeStruct((g, ns, 1, t), jnp.float32),      # gms
            jax.ShapeDtypeStruct((2, t), jnp.float32),             # ggrid
        ),
        grid=(g, ns, nf, t // tile_t),
        in_specs=[
            pl.BlockSpec((1, 1, tile_t, c),
                         lambda gi, si, fi, ti: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, c),
                         lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, 1),
                         lambda gi, si, fi, ti: (gi, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t),
                         lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, _LANES), lambda gi, si, fi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, t), lambda gi, si, fi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, c),
                         lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t, c),
                         lambda gi, si, fi, ti: (gi, si, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t, _LANES),
                         lambda gi, si, fi, ti: (gi, si, fi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, t, c), lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, c), lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile_t, c),
                         lambda gi, si, fi, ti: (gi, si, fi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, tile_t),
                         lambda gi, si, fi, ti: (gi, si, fi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t), lambda gi, si, fi, ti: (gi, si, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, t), lambda gi, si, fi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * ns * nf * t * t * (5 * c + _LANES),
            bytes_accessed=4 * (3 * g * ns * t * c + 2 * g * nf * t * c
                                + 2 * g * ns * nf * t * c),
            transcendentals=g * ns * nf * t * t,
        ),
        # four (T, C) blocks (ss, a, da, gsn) live double-buffered plus
        # the (TILE, T) temporaries: ~26 MB at the shipped shape — above
        # the 16 MB default scoped-VMEM budget, well inside the 128 MB
        # physical VMEM. The forward kernels stay at the default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(tar_fea_n, src_fea_n, mt, ms, grid_padded, grid_t, src_fea,
      gw, gf_padded)


def _pairs_bwd(h, w, temp, fast_warp, bwd_fast3, residuals, g):
    src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask, grid = residuals
    gb, ns, t, c = src_fea.shape
    nf = tar_fea_n.shape[1]
    if t % min(_TILE_BWD, t) != 0:
        _, vjp = jax.vjp(
            lambda *a: _pairs_ref(*a, h=h, w=w, temp=temp), *residuals)
        return vjp(g)
    gw, gf = g
    gf_padded = jnp.zeros(gf.shape[:-1] + (_LANES,), jnp.float32
                          ).at[..., :2].set(gf.astype(jnp.float32))
    grid_padded = jnp.zeros((t, _LANES), jnp.float32).at[:, :2].set(
        grid.astype(jnp.float32))
    grid_t = grid.astype(jnp.float32).T              # (2, T)
    da, gsn, gtn_pairs, gmt_pairs, gms, gg = _pairs_bwd_pallas(
        src_fea.astype(jnp.float32), tar_fea_n.astype(jnp.float32),
        src_fea_n.astype(jnp.float32),
        tar_mask.astype(jnp.float32).reshape(gb, nf, t, 1),
        src_mask.astype(jnp.float32).reshape(gb, ns, 1, t),
        grid_padded, grid_t, gw.astype(jnp.float32), gf_padded, temp, h, w,
        bwd_fast3)
    return (da.astype(src_fea.dtype),
            jnp.sum(gtn_pairs, axis=1).astype(tar_fea_n.dtype),
            gsn.astype(src_fea_n.dtype),
            jnp.sum(gmt_pairs, axis=1)[..., 0, :].astype(tar_mask.dtype),
            gms[:, :, 0, :].astype(src_mask.dtype),
            gg.T.astype(grid.dtype))


transform_warp_pairs.defvjp(_pairs_fwd, _pairs_bwd)
