"""On-chip parity: decoder_apply_fast (closed-form ring + pallas
resblocks) vs truth, at clip scale.

Two checks:
  * f32 "highest" tier: fast path must be EXACT (2e-5) vs the flax
    module — this isolates the closed-form border ring (pallas blocks
    are bf16-gated off here).
  * bf16 fast tail: both fast variants compared against the f32
    HIGHEST module truth; the pallas-blocks variant must be no less
    accurate than the plain fast path (its IN runs on the unrounded
    fp32 conv accumulator, so it is usually slightly closer).

Round-2 lesson: a TPU-only channel-concat miscompile once corrupted the
fast path's border ring while every CPU test was green — always check
the real chip."""
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
F = 16

cfg_hi = dataclasses.replace(face_config(), precision="highest")
mods_hi = TSNetModules(cfg_hi)
params = mods_hi.init_generator_params(jax.random.PRNGKey(0))["dec"]
pf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), jnp.float32)
sf = jnp.asarray(rng.standard_normal((F, 32, 32, 512)), jnp.float32)

t0 = time.perf_counter()
truth = np.asarray(jax.jit(lambda p, a, b: mods_hi.dec.apply(
    {"params": p}, a, b)[0])(params, pf, sf), np.float32)
print(f"truth compile+run {time.perf_counter() - t0:.1f}s", flush=True)

# --- f32 exactness of the ring (pallas blocks auto-off at f32) --------
yf = np.asarray(jax.jit(lambda p, a, b: decoder_apply_fast(
    mods_hi.dec, p, a, b, return_fea=False, use_pallas_blocks=True)[0])(
        params, pf, sf), np.float32)
err = np.abs(yf - truth)
print(f"[highest] fast-vs-module maxerr {err.max():.2e} "
      f"mean {err.mean():.2e}", flush=True)
# TPU HIGHEST = 6-pass bf16 accumulation; order differs between the
# closed-form ring kernels and the module's direct composition, so a
# few border pixels land ~3.6e-5 apart (mean 2e-7). A real ring bug
# (wrong tap matrix / miscompile) shows up at ~5e-2.
assert err.max() < 1e-4, err.max()

# --- bf16 fast tail: both variants vs the f32 truth -------------------
cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True)
mods = TSNetModules(cfg)
errs = {}
for blocks in (False, True):
    y = np.asarray(jax.jit(lambda p, a, b, bl=blocks: decoder_apply_fast(
        mods.dec, p, a, b, return_fea=False, use_pallas_blocks=bl)[0])(
            params, pf, sf), np.float32)
    e = np.abs(y - truth)
    errs[blocks] = (e.max(), e.mean())
    print(f"[bf16 blocks={blocks}] vs f32 truth: maxerr {e.max():.2e} "
          f"mean {e.mean():.2e}", flush=True)
assert errs[True][1] < errs[False][1] * 1.3 + 1e-4, errs
print("OK: ring exact at f32; pallas blocks within the bf16 tier's "
      "accuracy envelope")
