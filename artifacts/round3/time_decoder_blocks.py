"""Clip-scale timing: decoder_apply_fast with/without the fused Pallas
resblocks, on the real chip."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import dataclasses

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn.decoder import decoder_apply_fast

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
F = 128

cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True)
mods = TSNetModules(cfg)
params = mods.init_generator_params(jax.random.PRNGKey(0))["dec"]
pf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), jnp.bfloat16)
sf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), jnp.bfloat16)


def run(blocks):
    fn = jax.jit(lambda p, a, b: jnp.sum(jnp.abs(decoder_apply_fast(
        mods.dec, p, a, b, return_fea=False, use_pallas_blocks=blocks)[0]
        .astype(jnp.float32))))
    t0 = time.perf_counter()
    float(fn(params, pf, sf))
    print(f"  blocks={blocks}: compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    # pipelined x10 like bench.py
    t0 = time.perf_counter()
    outs = [fn(params, pf, sf) for _ in range(10)]
    _ = [float(o) for o in outs]
    dt = (time.perf_counter() - t0) / 10
    print(f"  blocks={blocks}: {dt*1e3:.1f} ms/clip ({F} frames)", flush=True)
    return dt


t_plain = run(False)
t_pallas = run(True)
print(f"speedup: {t_plain / t_pallas:.3f}x", flush=True)
