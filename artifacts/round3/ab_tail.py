"""A/B: decoder_apply_fast with the 4-phase vs 16-phase conv7 tail at
clip scale on chip (isolates the 15:12 tail switch that moved bench
682.9 -> 628.0)."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/artifacts/round3")
from phase16_tail import conv7x7_phase16, depth_to_space16  # noqa: E402

from wacv23_tsnet_tpu.cli.profile_stages import timed
from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn.decoder import decoder_apply_fast
from wacv23_tsnet_tpu.ops import upconv as uc

F = 128
cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True)
mods = TSNetModules(cfg)
params = mods.init_generator_params(jax.random.PRNGKey(0))["dec"]
dt = mods.dec.dtype
rng = np.random.default_rng(0)
pf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), dt)
sf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), dt)
xph = jnp.asarray(rng.standard_normal((F, 128, 128, 256)), dt)
k7 = jnp.asarray(params["conv_out"]["kernel"], dt)
b7 = jnp.asarray(params["conv_out"]["bias"], dt)
prec = jax.lax.Precision.DEFAULT
print(f"dtype={dt} frames={F}", flush=True)

timed("full decoder (current tail)",
      lambda a, eps: decoder_apply_fast(
          mods.dec, params, a + eps.astype(dt), sf, return_fea=False,
          use_pallas_blocks=True)[0], (pf,))

timed("tail16 standalone",
      lambda x, eps: jnp.tanh(depth_to_space16(conv7x7_phase16(
          x + eps.astype(dt), k7, b7, precision=prec))), (xph,))
timed("tail4 standalone",
      lambda x, eps: jnp.tanh(uc.depth_to_space(uc.conv7x7_phase(
          x + eps.astype(dt), k7, b7, precision=prec))), (xph,))
