"""The transformation branch: mask-aware similarity -> coordinate flow.

This is the algorithmic heart of TS-Net (reference model/TSNet.py:318-367).
For every target pixel t and source pixel s (both at feature resolution,
h*w positions, C=512 channels):

    S[t, s]   = mask_coeff[t, s] * <tar_fea[t], src_fea[s]>
    A         = softmax(temp * S, axis=s)          # temp = 100
    flow[t]   = sum_s A[t, s] * grid[s]            # "coordinate translator"

where the reference computes the bbox masking as TWO bmm's on
mask-multiplied features — in-bbox pairs plus out-of-bbox pairs
(model/TSNet.py:350-358). Because the masks scale whole channel vectors,
that is algebraically `(mt*ms + (1-mt)*(1-ms)) * <t, s>`, so we run ONE
matmul and fold the mask in as a rank-1 elementwise coefficient: half the
MXU work, exactly equal for any real-valued masks (not just binary).

Two implementations behind one signature:
- `masked_attention_flow` — einsum/XLA path (differentiable, used in
  training; XLA fuses mask+scale+softmax into the matmul epilogue).
- the fused Pallas kernel in `pallas_similarity.py`, used on TPU for the
  inference hot path and wired to this path's VJP for training.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

from .coords import normalized_grid
from .grid_sample import grid_sample

# Sequence-parallel hook: when set (by parallel.spmd), the (B, T, S)
# attention logits are sharding-constrained over the target-pixel axis T,
# so GSPMD partitions the quadratic similarity across the `model` mesh
# axis — the TPU analog of sequence/context parallelism (SURVEY.md §5).
_SPATIAL_SHARDING: contextvars.ContextVar = contextvars.ContextVar(
    "tsnet_spatial_sharding", default=None)

# Pallas-under-SPMD hook: a pallas_call is an opaque custom call that
# GSPMD cannot partition (it would read wrong shards). When this is set
# to (mesh, axis_name), the fused-kernel paths wrap themselves in
# `shard_map` over the batch/frame axis, so each device runs the kernel
# on its own shard — the batch axes here are embarrassingly parallel.
_BATCH_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "tsnet_batch_mesh", default=None)


@contextlib.contextmanager
def spatial_partitioning(sharding):
    """Context: shard attention logits with `sharding` (a NamedSharding
    whose spec partitions axis 1, e.g. P(None, 'model', None))."""
    token = _SPATIAL_SHARDING.set(sharding)
    try:
        yield
    finally:
        _SPATIAL_SHARDING.reset(token)


@contextlib.contextmanager
def batch_partitioning(mesh, axis: str = "data"):
    """Context: run the fused Pallas transformation kernels under
    `shard_map` over `axis` of `mesh` (batch for training, driving
    frames for clip inference). Required for `use_pallas=True` inside a
    GSPMD-sharded jit; the sharded axis size must divide the batch."""
    token = _BATCH_MESH.set((mesh, axis))
    try:
        yield
    finally:
        _BATCH_MESH.reset(token)


def _mask_coeff(tar_mask: jnp.ndarray, src_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) x (B, S) -> (B, T, S) same-region coefficient."""
    mt = tar_mask[:, :, None]
    ms = src_mask[:, None, :]
    return mt * ms + (1.0 - mt) * (1.0 - ms)


def masked_attention_flow(
    tar_fea: jnp.ndarray,
    src_fea: jnp.ndarray,
    tar_mask: jnp.ndarray,
    src_mask: jnp.ndarray,
    grid: jnp.ndarray,
    temp: float = 100.0,
) -> jnp.ndarray:
    """Compute the coordinate-translator flow.

    Args:
      tar_fea:  (B, T, C) L2-normalized target label features.
      src_fea:  (B, S, C) L2-normalized source image features.
      tar_mask: (B, T) target bbox mask at feature resolution.
      src_mask: (B, S) source bbox mask at feature resolution.
      grid:     (S, 2) normalized (x, y) coordinates of source pixels.
      temp:     softmax temperature (reference hard-codes 100).

    Returns:
      (B, T, 2) flow: the expected source coordinate per target pixel.
    """
    # Similarity + softmax stay full fp32: temp=100 amplifies any logit
    # error 100x in exp space, so the default bf16-pass matmul is not
    # acceptable here (measured 2e-3 logit / 4e-2 attention drift).
    logits = jnp.einsum(
        "btc,bsc->bts", tar_fea, src_fea,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    logits = logits * _mask_coeff(
        tar_mask.astype(jnp.float32), src_mask.astype(jnp.float32)
    )
    spatial_sharding = _SPATIAL_SHARDING.get()
    if spatial_sharding is not None:
        logits = jax.lax.with_sharding_constraint(logits, spatial_sharding)
    attn = jax.nn.softmax(temp * logits, axis=-1)
    return jnp.einsum(
        "bts,sd->btd", attn, grid.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def transformation_warp(
    src_img_fea: jnp.ndarray,
    tar_fea_n: jnp.ndarray,
    src_fea_n: jnp.ndarray,
    tar_mask: jnp.ndarray,
    src_mask: jnp.ndarray,
    temp: float = 100.0,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full transformation-branch step for one source.

    Args:
      src_img_fea: (B, h, w, C) un-normalized source image features.
      tar_fea_n:   (B, h, w, C) L2-normalized target label features.
      src_fea_n:   (B, h, w, C) L2-normalized source image features.
      tar_mask:    (B, h, w) target bbox at feature resolution.
      src_mask:    (B, h, w) source bbox at feature resolution.

    Returns:
      (warped_fea (B, h, w, C), flow (B, h, w, 2)).
    """
    b, h, w, c = src_img_fea.shape
    grid = normalized_grid(h, w).reshape(h * w, 2)
    # (A standalone one-kernel [similarity+softmax+flow+warp] variant,
    # `transform_warp_fused`, was retired in round 4: the pairs-grid
    # kernels below fold the source/frame axes into the kernel grid and
    # fuse the same warp, superseding it everywhere — the vmap-over-
    # sources lowering of the single-pair kernel measured ~20x slower,
    # while transform_warp_pairs* are the shipped defaults.)
    if use_pallas:
        from .pallas_similarity import masked_attention_flow_fused
        flow = masked_attention_flow_fused(
            tar_fea_n.reshape(b, h * w, c),
            src_fea_n.reshape(b, h * w, c),
            tar_mask.reshape(b, h * w),
            src_mask.reshape(b, h * w),
            grid, temp)
        flow = flow.reshape(b, h, w, 2)
        warped = grid_sample(src_img_fea, flow, align_corners=False)
        return warped, flow
    flow = masked_attention_flow(
        tar_fea_n.reshape(b, h * w, c),
        src_fea_n.reshape(b, h * w, c),
        tar_mask.reshape(b, h * w),
        src_mask.reshape(b, h * w),
        grid,
        temp=temp,
    )
    flow = flow.reshape(b, h, w, 2)
    warped = grid_sample(src_img_fea, flow, align_corners=False)
    return warped, flow


def transformation_warp_sources(
    src_img_fea: jnp.ndarray,   # (B, S, h, w, C) un-normalized
    tar_fea_n: jnp.ndarray,     # (B, h, w, C) L2-normalized
    src_fea_n: jnp.ndarray,     # (B, S, h, w, C) L2-normalized
    tar_mask: jnp.ndarray,      # (B, h, w)
    src_mask: jnp.ndarray,      # (B, S, h, w)
    temp: float = 100.0,
    use_pallas: bool = True,
    fast_warp: bool = False,
    bwd_fast3: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transformation branch for ALL sources of a batch in one call.

    The default TPU path runs the fully-fused Pallas kernel with the
    source axis flattened into the kernel grid (pallas_similarity.
    transform_warp_pairs) — no vmap over sources, no broadcast copies.
    `use_pallas=False` keeps the einsum + XLA-gather composition.
    `bwd_fast3=True` runs the flash backward's matmuls as bf16x3
    (grads within ~1e-3 of the HIGHEST einsum VJP, half the MXU cost —
    the precision="high" training tier).

    Returns (warped (B, S, h, w, C), flow (B, S, h, w, 2)).
    """
    b, s, h, w, c = src_img_fea.shape
    if use_pallas:
        from .pallas_similarity import transform_warp_pairs
        t = h * w
        grid = normalized_grid(h, w).reshape(t, 2)

        def call(sf, tf, sn, tm, sm):
            return transform_warp_pairs(sf, tf, sn, tm, sm, grid, h, w,
                                        temp, fast_warp, bwd_fast3)

        ctx = _BATCH_MESH.get()
        if ctx is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh, axis = ctx
            call = shard_map(call, mesh=mesh,
                             in_specs=(P(axis), P(axis), P(axis),
                                       P(axis), P(axis)),
                             out_specs=(P(axis), P(axis)),
                             check_vma=False)
        warped, flow = call(
            src_img_fea.reshape(b, s, t, c),
            tar_fea_n.reshape(b, 1, t, c),
            src_fea_n.reshape(b, s, t, c),
            tar_mask.reshape(b, 1, t),
            src_mask.reshape(b, s, t))
        return (warped[:, :, 0].reshape(b, s, h, w, c),
                flow[:, :, 0].reshape(b, s, h, w, 2))

    def warp_one(fea, fea_n, mask):
        return transformation_warp(fea, tar_fea_n, fea_n, tar_mask, mask,
                                   temp=temp, use_pallas=False)

    return jax.vmap(warp_one, in_axes=1, out_axes=1)(
        src_img_fea, src_fea_n, src_mask)


def transformation_warp_clip_mean(
    src_fea: jnp.ndarray,       # (S, h, w, C) un-normalized
    src_fea_n: jnp.ndarray,     # (S, h, w, C) L2-normalized
    src_mask: jnp.ndarray,      # (S, h, w)
    tar_fea_n: jnp.ndarray,     # (F, h, w, C) L2-normalized driving frames
    tar_mask: jnp.ndarray,      # (F, h, w)
    temp: float = 100.0,
    fast_warp: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Clip-inference transformation branch with the source mean fused in.

    Equals `transformation_warp_clip(...).mean(axis=0)` but the per-pair
    (S, F, h, w, C) tensor never reaches HBM: the fused kernel iterates
    sources inside each (frame, tile) grid step and writes only the
    mean — in `out_dtype`, so the bf16 fast tail also halves the write.
    Inference-only (not differentiable). Returns (F, h, w, C).
    """
    from .pallas_similarity import transform_warp_pairs_mean
    s, h, w, c = src_fea.shape
    f = tar_fea_n.shape[0]
    t = h * w
    grid = normalized_grid(h, w).reshape(t, 2)

    def call(sf, tf, sn, tm, sm):
        return transform_warp_pairs_mean(sf, tf, sn, tm, sm, grid, h, w,
                                         temp, fast_warp, out_dtype)

    ctx = _BATCH_MESH.get()
    if ctx is not None:
        # driving frames shard over the data axis; sources replicate
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        mesh, axis = ctx
        call = shard_map(call, mesh=mesh,
                         in_specs=(P(), P(None, axis), P(),
                                   P(None, axis), P()),
                         out_specs=P(None, axis),
                         check_vma=False)
    out = call(
        src_fea.reshape(1, s, t, c),
        tar_fea_n.reshape(1, f, t, c),
        src_fea_n.reshape(1, s, t, c),
        tar_mask.reshape(1, f, t),
        src_mask.reshape(1, s, t))
    return out[0].reshape(f, h, w, c)


def transformation_warp_clip(
    src_fea: jnp.ndarray,       # (S, h, w, C) un-normalized
    src_fea_n: jnp.ndarray,     # (S, h, w, C) L2-normalized
    src_mask: jnp.ndarray,      # (S, h, w)
    tar_fea_n: jnp.ndarray,     # (F, h, w, C) L2-normalized driving frames
    tar_mask: jnp.ndarray,      # (F, h, w)
    temp: float = 100.0,
    use_pallas: bool = True,
    fast_warp: bool = False,
) -> jnp.ndarray:
    """Clip-inference transformation branch: every (source, frame) pair.

    Source features are fetched into VMEM once per source and stay
    resident across the frame iterations of the kernel grid. The flow is
    never written back (the clip path only needs the warped features).

    Returns warped (S, F, h, w, C).
    """
    s, h, w, c = src_fea.shape
    f = tar_fea_n.shape[0]
    t = h * w
    if use_pallas:
        from .pallas_similarity import transform_warp_pairs_nf
        grid = normalized_grid(h, w).reshape(t, 2)

        def call(sf, tf, sn, tm, sm):
            return transform_warp_pairs_nf(sf, tf, sn, tm, sm, grid, h, w,
                                           temp, fast_warp)

        ctx = _BATCH_MESH.get()
        if ctx is not None:
            # driving frames shard over the data axis; sources replicate
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh, axis = ctx
            call = shard_map(call, mesh=mesh,
                             in_specs=(P(), P(None, axis), P(),
                                       P(None, axis), P()),
                             out_specs=P(None, None, axis),
                             check_vma=False)
        warped = call(
            src_fea.reshape(1, s, t, c),
            tar_fea_n.reshape(1, f, t, c),
            src_fea_n.reshape(1, s, t, c),
            tar_mask.reshape(1, f, t),
            src_mask.reshape(1, s, t))
        return warped[0].reshape(s, f, h, w, c)

    def one_source(fea_s, fea_n_s, mask_s):
        fea_b = jnp.broadcast_to(fea_s[None], (f,) + fea_s.shape)
        fea_n_b = jnp.broadcast_to(fea_n_s[None], (f,) + fea_n_s.shape)
        mask_b = jnp.broadcast_to(mask_s[None], (f,) + mask_s.shape)
        warped, _ = transformation_warp(fea_b, tar_fea_n, fea_n_b, tar_mask,
                                        mask_b, temp=temp, use_pallas=False)
        return warped

    return jax.vmap(one_source)(src_fea, src_fea_n, src_mask)
