"""Decompose the decoder resblock's 12.1 ms/clip (vs ~6.3 ms bf16
roofline): time the conv alone, the 9-shift dot_general form, the
IN, and map_conv as a plain matmul, at clip scale on the chip."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from wacv23_tsnet_tpu.cli.profile_stages import timed
from wacv23_tsnet_tpu.nn.blocks import reflect_pad
from wacv23_tsnet_tpu.ops.norms import instance_norm

F, H, C = 128, 32, 512
dt = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((F, H, H, C)), dt)
w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, dt)
w1x1 = jnp.asarray(rng.standard_normal((1024, 512)) * 0.02, dt)
xcat = jnp.asarray(rng.standard_normal((F, H, H, 1024)), dt)

print(f"dtype={dt} frames={F} {H}x{H}x{C}", flush=True)


def conv_valid(xp, k):
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.DEFAULT)


timed("conv3x3 alone (reflect pad)",
      lambda x_, eps: conv_valid(reflect_pad(x_ + eps.astype(dt), 1), w), (x,))
timed("conv3x3 alone (zero pad SAME)",
      lambda x_, eps: jax.lax.conv_general_dilated(
          x_ + eps.astype(dt), w, (1, 1), "SAME",
          dimension_numbers=("NHWC", "HWIO", "NHWC"),
          precision=jax.lax.Precision.DEFAULT), (x,))


def shift9(x_, eps):
    xp = reflect_pad(x_ + eps.astype(dt), 1)
    acc = jnp.zeros((F, H, H, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy:dy + H, dx:dx + H].reshape(F * H * H, C)
            acc = acc + jax.lax.dot(
                sl, w[dy, dx], precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32).reshape(F, H, H, C)
    return acc.astype(dt)


timed("conv3x3 as 9-shift matmul", shift9, (x,))

timed("conv3x3 + IN + relu",
      lambda x_, eps: jax.nn.relu(instance_norm(
          conv_valid(reflect_pad(x_ + eps.astype(dt), 1), w))), (x,))
timed("IN alone",
      lambda x_, eps: instance_norm(x_ + eps.astype(dt)), (x,))

timed("map_conv as conv1x1",
      lambda x_, eps: jax.lax.conv_general_dilated(
          x_ + eps.astype(dt), w1x1.reshape(1, 1, 1024, 512), (1, 1),
          "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
          precision=jax.lax.Precision.DEFAULT), (xcat,))
timed("map_conv as plain matmul",
      lambda x_, eps: jax.lax.dot(
          (x_ + eps.astype(dt)).reshape(F * H * H, 1024), w1x1,
          precision=jax.lax.Precision.DEFAULT,
          preferred_element_type=jnp.float32).astype(dt), (xcat,))

# calibrate the harness overhead (eps add + abs-sum at this size)
timed("overhead: eps add + copy",
      lambda x_, eps: x_ + eps.astype(dt), (x,))
