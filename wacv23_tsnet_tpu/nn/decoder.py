"""TS-Net decoder (reference model/TSNet.py:128-174).

A 1x1 `map_conv` fuses the concatenated warp-branch and synthesis-branch
features (2*feat_ch -> feat_ch), then `n_blocks` ResNet blocks, then
`n_downsampling` [bilinear-2x upsample, reflect-pad 3x3 conv halving
channels, IN, ReLU] stages, then a 7x7 conv + tanh to RGB. Also returns
the penultimate feature map (reference `return_fea=True`, used by the
drivers; model/TSNet.py:162-171).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Optional

from ..ops.dpconv import conv2d_dp
from ..ops.norms import instance_norm
from ..ops.resize import upsample_bilinear_2x
from ..ops.upconv import conv7x7_phase, depth_to_space, upconv_in_relu
from .blocks import DPConv, ResnetBlock, conv_init, reflect_pad


class Decoder(nn.Module):
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 0
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bwd_precision: Optional[str] = None

    @nn.compact
    def __call__(self, prop_fea: jnp.ndarray, syn_fea: jnp.ndarray):
        kw = dict(kernel_init=conv_init, dtype=self.dtype,
                  precision=self.precision,
                  bwd_precision=self.bwd_precision)
        x = jnp.concatenate([prop_fea, syn_fea], axis=-1)
        mult = 2 ** self.n_downsampling
        x = DPConv(self.ngf * mult, (1, 1), padding="SAME",
                   name="map_conv", **kw)(x)
        for j in range(self.n_blocks):
            x = ResnetBlock(self.ngf * mult, dtype=self.dtype,
                            precision=self.precision,
                            bwd_precision=self.bwd_precision,
                            name=f"block{j}")(x)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            x = upsample_bilinear_2x(x)
            x = reflect_pad(x, 1)
            x = DPConv(self.ngf * mult // 2, (3, 3), padding="VALID",
                       name=f"up{i}", **kw)(x)
            x = instance_norm(x)
            x = nn.relu(x)
        fea = x
        x = reflect_pad(x, 3)
        x = DPConv(self.output_nc, (7, 7), padding="VALID",
                   name="conv_out", **kw)(x)
        return jnp.tanh(x), fea


_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def decoder_apply_fast(dec: Decoder, params: dict, prop_fea: jnp.ndarray,
                       syn_fea: jnp.ndarray, return_fea: bool = True,
                       use_pallas_blocks: bool = False,
                       bwd_precision: Optional[str] = None,
                       ring_pad: bool = False):
    """`Decoder.__call__` with the upsample stages phase-decomposed.

    Identical math and param tree; each [bilinear-2x, reflect-pad, 3x3
    conv] stage runs as ONE conv at input resolution with 4x output
    channels + depth-to-space (ops.upconv) — MXU-shaped instead of
    high-resolution/small-channel, and the 4x-size upsampled
    intermediates never touch HBM. The LAST stage stays in phase layout
    end-to-end: its instance norm and the final 7x7 conv (3 output
    channels — the worst MXU shape in the model at full resolution) run
    at half resolution on 4x channels (ops.upconv.conv7x7_phase), and
    only the tanh'd RGB result is interleaved. Exact incl. borders.

    `return_fea=False` skips materializing the full-resolution
    penultimate feature map (clip inference never reads it).
    """
    dt = dec.dtype
    prec = _PREC[dec.precision]

    def conv(x, p, pad=0):
        k = jnp.asarray(p["kernel"], dt)
        if pad and ring_pad:
            # same sums, no materialized pad (ops.reflectconv)
            from ..ops.reflectconv import conv2d_reflect_dp
            y = conv2d_reflect_dp(x, k, pad, precision=prec,
                                  bwd_precision=bwd_precision)
        else:
            if pad:
                x = reflect_pad(x, pad)
            y = conv2d_dp(x, k, (1, 1), "VALID",
                          precision=prec, bwd_precision=bwd_precision)
        return y + jnp.asarray(p["bias"], dt)

    # XLA instance_norm throughout: a fused Pallas IN (ops.pallas_norms)
    # measures no faster once the ~25 ms axon dispatch latency is
    # subtracted, and a pallas_call inside a GSPMD-partitioned jit is
    # NOT partitionable (it silently computes on wrong shards) — the
    # XLA path keeps this function safe under the parallel.spmd mesh.
    x = jnp.concatenate([prop_fea, syn_fea], axis=-1).astype(dt)
    x = conv(x, params["map_conv"])
    if use_pallas_blocks and dt == jnp.bfloat16:
        # fused per-frame [pad+conv+IN+relu / +skip] kernel
        # (ops.pallas_conv): bf16 fast-tail inference only — no VJP,
        # and the single-pass dots match this tier's precision. Wrapped
        # in shard_map over the batch axis under a parallel.spmd mesh
        # (a pallas_call is opaque to GSPMD), like the transformation
        # kernel in ops/similarity.
        from ..ops.pallas_conv import resblock_fused
        from ..ops.similarity import _BATCH_MESH

        def run_blocks(xb):
            for j in range(dec.n_blocks):
                blk = params[f"block{j}"]
                xb = resblock_fused(xb, jnp.asarray(blk["conv1"]["kernel"],
                                                    dt),
                                    jnp.asarray(blk["conv2"]["kernel"], dt))
            return xb

        ctx = _BATCH_MESH.get()
        if ctx is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh, axis = ctx
            run_blocks = shard_map(run_blocks, mesh=mesh,
                                   in_specs=(P(axis),),
                                   out_specs=P(axis), check_vma=False)
        x = run_blocks(x)
    else:
        for j in range(dec.n_blocks):
            blk = params[f"block{j}"]
            h = nn.relu(instance_norm(conv(x, blk["conv1"], pad=1)))
            x = x + instance_norm(conv(h, blk["conv2"], pad=1))
    # up stages: fused conv+ring+IN+relu; the conv bias is dropped (a
    # per-channel constant cancels exactly in the instance norm)
    for i in range(dec.n_downsampling - 1):
        up = params[f"up{i}"]
        x = upconv_in_relu(x, jnp.asarray(up["kernel"], dt), precision=prec,
                           bwd_precision=bwd_precision)
    up = params[f"up{dec.n_downsampling - 1}"]
    x = upconv_in_relu(x, jnp.asarray(up["kernel"], dt), precision=prec,
                       phase_out=True, bwd_precision=bwd_precision)
    # (a 16-phase/quarter-res tail was measured TWICE as a net loss:
    # round 2 via general space-to-depth, round 3 via strided-row
    # pad-add relayout — 34.5 vs 18.8 ms/clip standalone; the wider MXU
    # lanes never pay for the relayouts + ring recompute. 4-phase is
    # the operating point.)
    out = conv7x7_phase(x, jnp.asarray(params["conv_out"]["kernel"], dt),
                        jnp.asarray(params["conv_out"]["bias"], dt),
                        precision=prec)
    rgb = jnp.tanh(depth_to_space(out))
    fea = depth_to_space(x) if return_fea else None
    return rgb, fea
