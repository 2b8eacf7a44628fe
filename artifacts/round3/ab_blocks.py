"""A/B: decoder_apply_fast with XLA resblocks vs fused Pallas resblocks
(ops.pallas_conv) at clip scale on chip, 4-phase tail."""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from wacv23_tsnet_tpu.cli.profile_stages import timed
from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn.decoder import decoder_apply_fast
from wacv23_tsnet_tpu.ops.pallas_conv import resblock_fused

F = 128
cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True)
mods = TSNetModules(cfg)
params = mods.init_generator_params(jax.random.PRNGKey(0))["dec"]
dt = mods.dec.dtype
rng = np.random.default_rng(0)
pf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), dt)
sf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), dt)
x32 = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), dt)
k1 = jnp.asarray(params["block0"]["conv1"]["kernel"], dt)
k2 = jnp.asarray(params["block0"]["conv2"]["kernel"], dt)
print(f"dtype={dt} frames={F}", flush=True)

for blocks in (False, True):
    timed(f"full decoder blocks={blocks}",
          lambda a, eps, bl=blocks: decoder_apply_fast(
              mods.dec, params, a + eps.astype(dt), sf, return_fea=False,
              use_pallas_blocks=bl)[0], (pf,))

timed("pallas resblock standalone (x1)",
      lambda x, eps: resblock_fused(x + eps.astype(dt), k1, k2), (x32,))
