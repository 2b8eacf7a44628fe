"""Synthesis branch FuseNet (reference model/TSNet.py:177-200).

concat(source image feature, target label feature) -> one ResNet block at
the doubled width -> 1x1 conv back to feat_ch.

`fuse_clip` is the clip-inference specialization: with S sources shared
by F driving frames, the concat-input convs are linear, so their
source half runs once per SOURCE and their target half once per FRAME
instead of once per (source x frame) pair; only the block's second conv
(behind the IN+ReLU nonlinearity) remains per-pair. The mean over
sources commutes with the final 1x1 conv, so that also runs once per
frame. Per-pair FLOPs drop ~2x with identical math (same param tree).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.dpconv import conv2d_dp
from ..ops.norms import instance_norm
from ..ops.pallas_norms import instance_norm_mean
from .blocks import ResnetBlock, conv_init, reflect_pad


class FuseNet(nn.Module):
    ngf: int = 1024   # concatenated width (2 * feat_ch)
    n_blocks: int = 1
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bwd_precision: str | None = None

    @nn.compact
    def __call__(self, src_fea: jnp.ndarray, tar_lbl_fea: jnp.ndarray):
        from .blocks import DPConv
        x = jnp.concatenate([src_fea, tar_lbl_fea], axis=-1)
        for j in range(self.n_blocks):
            x = ResnetBlock(self.ngf, dtype=self.dtype,
                            precision=self.precision,
                            bwd_precision=self.bwd_precision,
                            name=f"block{j}")(x)
        x = DPConv(self.ngf // 2, (1, 1), padding="SAME",
                   kernel_init=conv_init, dtype=self.dtype,
                   precision=self.precision,
                   bwd_precision=self.bwd_precision, name="conv")(x)
        return x


_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _in_mean(x, use_pallas: bool):
    """IN + mean-over-leading-axis: fused Pallas kernel, or the pure-XLA
    composition when `use_pallas=False` (the debugging escape hatch —
    tsnet_forward(use_pallas=False) must stay Pallas-free)."""
    if use_pallas:
        return instance_norm_mean(x)
    from ..ops.pallas_norms import _in_mean_ref
    return _in_mean_ref(x, 1e-5, None)


def fuse_clip(params: dict, src_fea: jnp.ndarray, tar_fea: jnp.ndarray,
              dtype=jnp.float32, precision: str = "highest",
              use_pallas: bool = True, ring_pad: bool = False) -> jnp.ndarray:
    """mean_s FuseNet(src_fea[s], tar_fea[f]) for all frames, split form.

    Exact algebraic restructuring of the generic path for S shared
    sources x F driving frames (same `FuseNet` param tree):

    - block conv1 acts on concat(a_s, t_f), so it splits into
      conv1_src(a_s) (once per source) + conv1_tar(t_f) (once per frame);
      only conv2, behind the IN+ReLU, stays per-pair.
    - the final 1x1 conv is linear, so it commutes with the mean over
      sources and runs once per frame on the meaned block output.

    Args: params = FuseNet params (n_blocks == 1, the shipped config);
    src_fea (S, h, w, C); tar_fea (F, h, w, C). Returns (F, h, w, C).
    """
    prec = _PREC[precision]
    s, h, w, c = src_fea.shape
    f = tar_fea.shape[0]
    blk = params["block0"]
    k1 = jnp.asarray(blk["conv1"]["kernel"], dtype)    # (3, 3, 2C, 2C)
    b1 = jnp.asarray(blk["conv1"]["bias"], dtype)
    k2 = jnp.asarray(blk["conv2"]["kernel"], dtype)
    b2 = jnp.asarray(blk["conv2"]["bias"], dtype)
    km = jnp.asarray(params["conv"]["kernel"], dtype)  # (1, 1, 2C, C)
    bm = jnp.asarray(params["conv"]["bias"], dtype)
    a = src_fea.astype(dtype)
    t = tar_fea.astype(dtype)

    def conv(x, k, pad=0):
        if pad and ring_pad:
            # same sums, no materialized pad (ops.reflectconv)
            from ..ops.reflectconv import conv2d_reflect_dp
            return conv2d_reflect_dp(x, k, pad, precision=prec)
        if pad:
            x = reflect_pad(x, pad)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)

    c1a = conv(a, k1[:, :, :c, :], pad=1)              # (S, h, w, 2C)
    c1t = conv(t, k1[:, :, c:, :], pad=1) + b1         # (F, h, w, 2C)
    # conv2's bias b2 is dropped: a per-channel constant cancels exactly
    # in the instance norm that immediately follows. The IN + mean over
    # sources run as ONE fused Pallas pass (the XLA lowering reads the
    # (S*F, ...) tensor twice; measured 12.4 -> ~4 ms/clip).
    del b2
    # The fused pair-block kernel is opt-in (TSNET_FUSE_PAIR_KERNEL=1):
    # the round-4 chip bisect measured it a small end-to-end LOSS at the
    # 256-frame clip shape (653.0 vs 661.5 fps with the XLA composition;
    # artifacts/round4/logs/bisect_clip2.log) — XLA pipelines the hp
    # round trip better than the kernel's per-pair refetch.
    import os
    if (use_pallas and dtype == jnp.bfloat16
            and os.environ.get("TSNET_FUSE_PAIR_KERNEL", "0") == "1"):
        # fused [pair-sum + IN + relu + conv2] kernel: the 805 MB
        # (S*F, h, w, 2C) hp tensor never reaches HBM and conv2 runs as
        # row-contiguous MXU dots (ops.pallas_fuse). Wrapped in
        # shard_map over the frame axis under a parallel.spmd mesh.
        from ..ops.pallas_fuse import fuse_pair_conv2
        from ..ops.similarity import _BATCH_MESH

        def pair_conv(aa, tt):
            return fuse_pair_conv2(aa, tt, k2)

        ctx = _BATCH_MESH.get()
        if ctx is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh, axis = ctx
            pair_conv = shard_map(pair_conv, mesh=mesh,
                                  in_specs=(P(None), P(axis)),
                                  out_specs=P(None, axis),
                                  check_vma=False)
        h2 = pair_conv(c1a, c1t)
    else:
        hp = (c1a[:, None] + c1t[None]).reshape(s * f, h, w, 2 * c)
        hp = nn.relu(instance_norm(hp))
        h2 = conv(hp, k2, pad=1).reshape(s, f, h, w, 2 * c)
    h2m = _in_mean(h2, use_pallas).astype(dtype)       # (F, h, w, 2C)
    a_mean = jnp.mean(a.astype(jnp.float32), axis=0).astype(dtype)
    x_mean = jnp.concatenate(
        [jnp.broadcast_to(a_mean[None], (f, h, w, c)), t], axis=-1)
    return conv(x_mean + h2m, km) + bm                 # (F, h, w, C)


def fuse_train(params: dict, src_fea: jnp.ndarray, tar_fea: jnp.ndarray,
               dtype=jnp.float32, precision: str = "highest",
               use_pallas: bool = True,
               bwd_precision: str | None = None,
               ring_pad: bool = False) -> jnp.ndarray:
    """mean_s FuseNet(src_fea[b, s], tar_fea[b]) for the TRAIN shape:
    per-sample target features shared across that sample's S sources.

    Exact split of the generic path (same param tree, n_blocks == 1):
    the concat conv1 runs its source half per (b, s) and its target half
    per b (instead of per pair), and the final 1x1 commutes with the
    mean over sources — (S-1)/S of the target-half and final-conv FLOPs
    drop. Differentiable (plain XLA ops only).

    Args: src_fea (B, S, h, w, C); tar_fea (B, h, w, C).
    Returns (B, h, w, C).
    """
    prec = _PREC[precision]
    b, s, h, w, c = src_fea.shape
    blk = params["block0"]
    k1 = jnp.asarray(blk["conv1"]["kernel"], dtype)
    b1 = jnp.asarray(blk["conv1"]["bias"], dtype)
    k2 = jnp.asarray(blk["conv2"]["kernel"], dtype)
    km = jnp.asarray(params["conv"]["kernel"], dtype)
    bm = jnp.asarray(params["conv"]["bias"], dtype)
    a = src_fea.astype(dtype).reshape(b * s, h, w, c)
    t = tar_fea.astype(dtype)

    def conv(x, k, pad=0):
        if pad and ring_pad:
            # same sums, no materialized pad (ops.reflectconv)
            from ..ops.reflectconv import conv2d_reflect_dp
            return conv2d_reflect_dp(x, k, pad, precision=prec,
                                     bwd_precision=bwd_precision)
        if pad:
            x = reflect_pad(x, pad)
        return conv2d_dp(x, k, (1, 1), "VALID", precision=prec,
                         bwd_precision=bwd_precision)

    c1a = conv(a, k1[:, :, :c, :], pad=1).reshape(b, s, h, w, 2 * c)
    c1t = conv(t, k1[:, :, c:, :], pad=1) + b1          # (B, h, w, 2C)
    hp = (c1a + c1t[:, None]).reshape(b * s, h, w, 2 * c)
    hp = nn.relu(instance_norm(hp))
    # b2 dropped (cancels in the IN), IN+mean fused as in fuse_clip
    h2 = conv(hp, k2, pad=1).reshape(b, s, h, w, 2 * c).transpose(
        1, 0, 2, 3, 4)                                  # (S, B, h, w, 2C)
    h2m = _in_mean(h2, use_pallas).astype(dtype)        # (B, h, w, 2C)
    a_mean = jnp.mean(src_fea.astype(jnp.float32), axis=1).astype(dtype)
    x_mean = jnp.concatenate([a_mean, t], axis=-1)
    return conv(x_mean + h2m, km) + bm                  # (B, h, w, C)
