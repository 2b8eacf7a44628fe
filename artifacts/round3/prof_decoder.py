"""Decoder sub-stage timings at clip scale (chip): map_conv, resblocks,
each fused up stage (bulk conv vs ring slabs vs IN), conv7 phase tail."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import flax.linen as nn

from wacv23_tsnet_tpu.cli.profile_stages import timed
from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn.blocks import reflect_pad
from wacv23_tsnet_tpu.ops import upconv as uc
from wacv23_tsnet_tpu.ops.norms import instance_norm

import dataclasses

F = 128
cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True)
mods = TSNetModules(cfg)
params = mods.init_generator_params(jax.random.PRNGKey(0))["dec"]
dt = mods.dec.dtype
prec = jax.lax.Precision.HIGH if dt == jnp.float32 else jax.lax.Precision.DEFAULT
print(f"decoder dtype={dt} prec={prec} frames={F}", flush=True)
rng = np.random.default_rng(0)

x32 = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), dt)
x64 = jnp.asarray(rng.standard_normal((F, 64, 64, 256)), dt)
x128 = jnp.asarray(rng.standard_normal((F, 128, 128, 128)), dt)
xcat = jnp.asarray(rng.standard_normal((F, 32, 32, 1024)), dt)
xph = jnp.asarray(rng.standard_normal((F, 128, 128, 256)), dt)  # up2 phase out


def conv(x, p, pad=0):
    if pad:
        x = reflect_pad(x, pad)
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"], dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec
    ) + jnp.asarray(p["bias"], dt)


total = 0.0
total += timed("map_conv 1024->512 @32^2",
               lambda x, eps: conv(x + eps.astype(dt), params["map_conv"]),
               (xcat,))


def resblock(x, eps):
    blk = params["block0"]
    h = nn.relu(instance_norm(conv(x + eps.astype(dt), blk["conv1"], pad=1)))
    return x + instance_norm(conv(h, blk["conv2"], pad=1))


t = timed("resblock @32^2 512ch (x4)", resblock, (x32,))
total += 4 * t
print(f"    (x4 = {4 * t:.1f} ms)")

for name, xin, key, phase_out in (
        ("up0 32->64 512->256", x32, "up0", False),
        ("up1 64->128 256->128", x64, "up1", False),
        ("up2 128->256 128->64 (phase)", x128, "up2", True)):
    p = params[key]
    k = jnp.asarray(p["kernel"], dt)
    total += timed(name,
                   lambda x, eps, k=k, po=phase_out: uc.upconv_in_relu(
                       x + eps.astype(dt), k, precision=prec, phase_out=po),
                   (xin,))
    # decomposition: bulk conv only vs ring slabs only
    kp = uc.phase_kernel(k)
    timed(f"  {key}: bulk phase conv only",
          lambda x, eps, kp=kp: jax.lax.conv_general_dilated(
              x + eps.astype(dt), kp, (1, 1), ((1, 1), (1, 1)),
              dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec),
          (xin,))

    def slabs(x, eps, k=k):
        x = x + eps.astype(dt)
        top = uc._to_phase_rows(uc._reference(x[:, :3], k, prec)[:, :2])
        bot = uc._to_phase_rows(uc._reference(x[:, -3:], k, prec)[:, -2:])
        left = uc._to_phase_cols(uc._reference(x[:, :, :3], k, prec)[:, :, :2])
        right = uc._to_phase_cols(
            uc._reference(x[:, :, -3:], k, prec)[:, :, -2:])
        return (jnp.sum(jnp.abs(top)) + jnp.sum(jnp.abs(bot))
                + jnp.sum(jnp.abs(left)) + jnp.sum(jnp.abs(right)))

    timed(f"  {key}: ring slab convs only", slabs, (xin,))

total += timed("conv7 phase tail + tanh",
               lambda x, eps: jnp.tanh(uc.depth_to_space(uc.conv7x7_phase(
                   x + eps.astype(dt),
                   jnp.asarray(params["conv_out"]["kernel"], dt),
                   jnp.asarray(params["conv_out"]["bias"], dt),
                   precision=prec))),
               (xph,))
print(f"  SUM of decoder stages: {total:.1f} ms/{F}-frame clip", flush=True)
