import dataclasses, sys, time
import jax, jax.numpy as jnp, numpy as np
from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip
import functools
log = lambda *a: print(*a, flush=True)
cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True)
mods = TSNetModules(cfg)
params = mods.init_generator_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
S, SIZE, L, F = 3, 256, 2, 128
src_img = jnp.asarray(rng.random((S,SIZE,SIZE,3),np.float32))
src_lbl = jnp.asarray(rng.integers(0,2,(S,SIZE,SIZE,L)).astype(np.float32))
src_bbox = jnp.asarray(rng.integers(0,2,(S,SIZE,SIZE)).astype(np.float32))
tar_lbl = jnp.asarray(rng.integers(0,2,(F,SIZE,SIZE,L)).astype(np.float32))
tar_bbox = jnp.asarray(rng.integers(0,2,(F,SIZE,SIZE)).astype(np.float32))
for up in (True, False):
    f = jax.jit(functools.partial(tsnet_forward_clip, mods, use_pallas=up))
    t0=time.perf_counter()
    out = f(params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox)
    jax.block_until_ready(out); log(f"use_pallas={up} compile+1st {time.perf_counter()-t0:.1f}s")
    t0=time.perf_counter()
    for _ in range(6): out = f(params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox)
    jax.block_until_ready(out)
    ms=(time.perf_counter()-t0)/6*1e3
    log(f"use_pallas={up}: {ms:.1f} ms/128-frame clip ({128/ms*1e3:.1f} fps)")
