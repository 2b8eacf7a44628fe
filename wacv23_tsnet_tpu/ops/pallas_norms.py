"""Fused Pallas instance-norm (+ optional ReLU) for inference hot paths.

`ops.norms.instance_norm` lowers through XLA as cast-to-fp32 +
mean-reduce + variance-reduce + normalize — several full HBM passes over
the activation (measured 32-33 ms/clip at the decoder's 256^2-equivalent
shapes, ~130 GB/s effective). This kernel pair does the minimum traffic:
one read for the (sum, sum-of-squares) statistics, one read + one write
for the normalize, with the ReLU fused into the write. Variance uses
E[x^2] - E[x]^2 in fp32 accumulators (fine at feature scale; parity
tests bound the drift).

`phase_groups=4` reduces statistics across the 4 phase copies of each
channel for tensors in ops.upconv phase layout (channel layout
(g * C + c)), matching `instance_norm` of the interleaved tensor.

Status: available but NOT wired into the model paths. Measured on the
real chip with dispatch latency amortized, it matches XLA's lowering
(~7 ms at the decoder's biggest shape) — XLA already fuses the IN
epilogue well — and, like any pallas_call, it is NOT partitionable by
GSPMD: under a parallel.spmd mesh it would read wrong shards. Wrap in
`shard_map` over the batch axis before using it in sharded code.

Inference-only: no custom VJP — training keeps the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def _stats_kernel(x_ref, sum_ref, sq_ref):
    ti = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)                # (TILE, C)
    s = jnp.sum(xf, axis=0, keepdims=True)
    q = jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when(ti == 0)
    def _():
        sum_ref[0] = s
        sq_ref[0] = q

    @pl.when(ti != 0)
    def _():
        sum_ref[0] = sum_ref[0] + s
        sq_ref[0] = sq_ref[0] + q


def _norm_kernel(x_ref, mean_ref, inv_ref, out_ref, *, relu):
    xf = x_ref[0].astype(jnp.float32)
    y = (xf - mean_ref[0]) * inv_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _pick_tile(n: int, c: int, itemsize: int) -> int:
    """Largest power-of-two spatial tile <= ~2 MB block."""
    budget = 2 * 1024 * 1024 // max(1, c * itemsize)
    tile = 8
    while tile * 2 <= min(n, budget) and n % (tile * 2) == 0:
        tile *= 2
    return tile


def _in_mean_kernel(x_ref, out_ref, acc_ref, *, ns, n, eps):
    si = pl.program_id(2)
    xf = x_ref[0, 0].astype(jnp.float32)              # (N, C)
    mean = jnp.sum(xf, axis=0, keepdims=True) / n
    # E[x^2]-E[x]^2 cancellation can go (slightly) negative for
    # near-constant channels with large mean; unclamped it NaNs the
    # rsqrt and poisons the whole step. Clamp at 0 before adding eps.
    var = jnp.maximum(
        jnp.sum(xf * xf, axis=0, keepdims=True) / n - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)

    @pl.when(si == 0)
    def _():
        acc_ref[...] = y

    @pl.when(si != 0)
    def _():
        acc_ref[...] = acc_ref[...] + y

    @pl.when(si == ns - 1)
    def _():
        out_ref[0] = (acc_ref[...] / ns).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_mean(x: jnp.ndarray, eps: float = 1e-5,
                       out_dtype=None) -> jnp.ndarray:
    """mean_s instance_norm(x[s]) over the leading source axis, fused.

    Args: x (S, F, H, W, C) per-(source, frame) activations. Returns
    (F, H, W, C): the per-pair instance norm (stats over H*W per
    channel) averaged over S, with the (S*F) per-pair normalized tensor
    never touching HBM — ONE read of x, one (F,...) write, vs the XLA
    lowering's two reads + intermediate traffic (measured 12.4 vs
    ~4 ms/clip at fuse_clip's (3, 128, 32, 32, 1024) bf16 shape).

    Statistics are one-pass fp32 E[x^2]-E[x]^2 (see instance_norm's
    note). Honors `batch_partitioning` for use inside GSPMD-sharded
    jits (shard over the frame axis). Differentiable via custom_vjp:
    the backward runs the XLA composition's vjp (recompute, standard
    flash-style trade).
    """
    ns, f, h, w, c = x.shape
    n = h * w
    out_dtype = x.dtype if out_dtype is None else jnp.dtype(out_dtype)

    # statistics are per channel, so the channel axis tiles freely into
    # the grid. Block-size knob (TSNET_IN_MEAN_CC, read at trace time):
    # round 3 raised the cap 256 -> 1024 (full-plane blocks, 4x fewer
    # grid steps) and shipped it unmeasured at HEAD — the round-4 chip
    # bisect measures both; full-plane blocks need the raised scoped
    # VMEM limit below (the 16 MB default measured a 19.8 MB demand).
    import os
    cap = int(os.environ.get("TSNET_IN_MEAN_CC", "1024"))
    cc = c
    while cc > cap and cc % 2 == 0:
        cc //= 2

    def call(xs):
        nf = xs.shape[1]
        xr = xs.reshape(ns, nf, n, c)
        return pl.pallas_call(
            functools.partial(_in_mean_kernel, ns=ns, n=n, eps=eps),
            out_shape=jax.ShapeDtypeStruct((nf, n, c), out_dtype),
            grid=(nf, c // cc, ns),
            in_specs=[pl.BlockSpec(
                (1, 1, n, cc), lambda fi, ci, si: (si, fi, 0, ci),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, n, cc), lambda fi, ci, si: (fi, 0, ci),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, cc), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_interpret(),
        )(xr).reshape(nf, h, w, c)

    from .similarity import _BATCH_MESH
    batch_mesh = _BATCH_MESH.get()
    if batch_mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        mesh, axis = batch_mesh
        call = shard_map(call, mesh=mesh,
                         in_specs=P(None, axis),
                         out_specs=P(axis),
                         check_vma=False)
    return call(x)


def _in_mean_ref(x, eps, out_dtype):
    """XLA composition (the VJP reference): per-(s, f) instance norm in
    fp32, mean over the source axis."""
    from .norms import instance_norm
    y = jax.vmap(instance_norm, in_axes=0)(x.astype(jnp.float32))
    out_dtype = x.dtype if out_dtype is None else jnp.dtype(out_dtype)
    return jnp.mean(y, axis=0).astype(out_dtype)


def _in_mean_fwd(x, eps, out_dtype):
    return instance_norm_mean(x, eps, out_dtype), x


def _in_mean_bwd(eps, out_dtype, x, g):
    _, vjp = jax.vjp(lambda t: _in_mean_ref(t, eps, out_dtype), x)
    return vjp(g)


instance_norm_mean.defvjp(_in_mean_fwd, _in_mean_bwd)


def instance_norm_fused(x: jnp.ndarray, eps: float = 1e-5,
                        relu: bool = False,
                        phase_groups: int = 1) -> jnp.ndarray:
    """instance_norm (+ReLU) of an NHWC tensor, minimal-HBM-traffic.

    With `phase_groups=g > 1`, the channel axis is treated as (g, C//g)
    and statistics reduce over the g groups as well — the phase-layout
    equivalent of normalizing the interleaved tensor
    (ops.upconv.instance_norm_phase).
    """
    b, h, w, c = x.shape
    n = h * w
    tile = _pick_tile(n, c, x.dtype.itemsize)
    if n % tile != 0:
        from .norms import instance_norm
        from .upconv import instance_norm_phase
        out = (instance_norm_phase(x, eps) if phase_groups > 1
               else instance_norm(x, eps))
        return jnp.maximum(out, 0) if relu else out

    xs = x.reshape(b, n, c)
    sums, sqs = pl.pallas_call(
        _stats_kernel,
        out_shape=(jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)),
        grid=(b, n // tile),
        in_specs=[pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(xs)

    if phase_groups > 1:
        g = phase_groups
        cc = c // g
        s = jnp.sum(sums.reshape(b, g, cc), axis=1)
        q = jnp.sum(sqs.reshape(b, g, cc), axis=1)
        mean = s / (n * g)
        var = jnp.maximum(q / (n * g) - mean * mean, 0.0)
        mean = jnp.tile(mean, (1, g)).reshape(b, 1, c)
        inv = jnp.tile(jax.lax.rsqrt(var + eps), (1, g)).reshape(b, 1, c)
    else:
        mean = sums / n
        var = jnp.maximum(sqs / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)

    out = pl.pallas_call(
        functools.partial(_norm_kernel, relu=relu),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xs, mean, inv)
    return out.reshape(b, h, w, c)
