"""On-chip breakdown of fuse_clip's sub-ops at shipped clip scale,
dispatch-free (in-jit scan repeats, profile_stages-style).

fuse stage measured 64.3 ms/clip (queue2) — second-largest after the
decoder. conv2 alone is ~58 GFLOP/frame (half the whole model), so its
MFU sets the stage's floor.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from wacv23_tsnet_tpu.nn.blocks import reflect_pad
from wacv23_tsnet_tpu.nn.fusenet import fuse_clip
from wacv23_tsnet_tpu.ops.norms import instance_norm
from wacv23_tsnet_tpu.ops.pallas_norms import instance_norm_mean

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
S, F, H, W, C = 3, 128, 32, 32, 512
DT = jnp.bfloat16
PREC = jax.lax.Precision.DEFAULT
REPEATS = 8

a = jnp.asarray(rng.standard_normal((S, H, W, C)), DT)
t = jnp.asarray(rng.standard_normal((F, H, W, C)), DT)
k1 = jnp.asarray(rng.standard_normal((3, 3, 2 * C, 2 * C)) * 0.02, DT)
k2 = jnp.asarray(rng.standard_normal((3, 3, 2 * C, 2 * C)) * 0.02, DT)
km = jnp.asarray(rng.standard_normal((1, 1, 2 * C, C)) * 0.02, DT)
hp = jnp.asarray(rng.standard_normal((S * F, H, W, 2 * C)), DT)
h2 = jnp.asarray(rng.standard_normal((S, F, H, W, 2 * C)), DT)


def conv(x, k, pad=0):
    if pad:
        x = reflect_pad(x, pad)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PREC)


def bench(name, fn, x, *rest, iters=3):
    """scan REPEATS copies inside one jit; the carry perturbs the first
    operand each round so XLA cannot CSE the body."""
    @jax.jit
    def run(x0, *xs):
        def body(c, _):
            out = fn(x0 + c.astype(x0.dtype), *xs)
            return jnp.sum(jnp.abs(out.astype(jnp.float32))) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
        return c

    float(run(x, *rest))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(x, *rest))
        times.append((time.perf_counter() - t0) / REPEATS)
    ms = float(np.median(times)) * 1e3
    print(f"  {name:<42s} {ms:7.1f} ms/clip", flush=True)
    return ms


print(f"shapes: S={S} F={F} {H}x{W}x{2*C}  dtype=bf16", flush=True)
fp = {"block0": {"conv1": {"kernel": k1, "bias": jnp.zeros(2 * C, DT)},
                 "conv2": {"kernel": k2, "bias": jnp.zeros(2 * C, DT)}},
      "conv": {"kernel": km, "bias": jnp.zeros(C, DT)}}
bench("full fuse_clip (split form)",
      lambda aa, tt: fuse_clip(fp, aa, tt, dtype=DT, precision="default"),
      a, t)
bench("conv1 tar half (F frames)", lambda tt: conv(tt, k1[:, :, C:], pad=1),
      t)
bench("pair-sum -> IN -> relu (XLA, fused)", lambda aa, tt: jax.nn.relu(
    instance_norm((conv(aa, k1[:, :, :C], pad=1)[:, None] +
                   conv(tt, k1[:, :, C:], pad=1)[None])
                  .reshape(S * F, H, W, 2 * C))), a, t)
bench("conv2 alone on hp (XLA conv)", lambda x: conv(x, k2, pad=1), hp)


def conv2_nchw(x):
    xn = jnp.transpose(x, (0, 3, 1, 2))
    kn = jnp.transpose(k2, (3, 2, 0, 1))
    y = jax.lax.conv_general_dilated(
        jnp.pad(xn, ((0, 0), (0, 0), (1, 1), (1, 1))), kn, (1, 1),
        "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=PREC)
    return jnp.transpose(y, (0, 2, 3, 1))


bench("conv2 via NCHW layout", conv2_nchw, hp)
bench("conv2 zero-pad SAME (no reflect)", lambda x: jax.lax.conv_general_dilated(
    x, k2, (1, 1), "SAME",
    dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PREC), hp)

from wacv23_tsnet_tpu.ops.pallas_fuse import fuse_pair_conv2

c1a_p = jnp.asarray(rng.standard_normal((S, H, W, 2 * C)), DT)
c1t_p = jnp.asarray(rng.standard_normal((F, H, W, 2 * C)), DT)
for ct in (128, 256):
    bench(f"fused pair kernel (pallas, co_tile={ct})",
          lambda a_, t_, c=ct: fuse_pair_conv2(a_, t_, k2, co_tile=c),
          c1a_p, c1t_p)
bench("in_mean pallas on h2", lambda x: instance_norm_mean(x), h2)
bench("final 1x1 conv (F frames)",
      lambda tt: conv(jnp.concatenate([tt, tt], -1), km), t)

flop_conv2 = S * F * H * W * 9 * (2 * C) * (2 * C) * 2 / 1e12
print(f"conv2 logical TFLOP/clip: {flop_conv2:.2f} "
      f"(peak bf16 394 TF/s -> {flop_conv2/394*1e3:.1f} ms floor)",
      flush=True)
