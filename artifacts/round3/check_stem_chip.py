"""On-chip parity + clip-scale timing: encoder_apply_fast (folded stem)
vs the flax Encoder module, at the shipped lbl_enc config."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import dataclasses

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn.encoder import encoder_apply_fast

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
F = 128
REPEATS = 8

for precision in ("highest", "high"):
    cfg = dataclasses.replace(face_config(), precision=precision)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))["lbl_enc"]
    x = jnp.asarray(rng.integers(0, 2, (F, 256, 256, 2)), jnp.float32)

    truth = np.asarray(jax.jit(lambda p, t: mods.lbl_enc.apply(
        {"params": p}, t.astype(mods.dtype)))(params, x), np.float32)
    got = np.asarray(jax.jit(lambda p, t: encoder_apply_fast(
        mods.lbl_enc, p, t.astype(mods.dtype)))(params, x), np.float32)
    err = np.abs(got - truth)
    print(f"[{precision}] fast-vs-module maxerr {err.max():.2e} "
          f"mean {err.mean():.2e}", flush=True)
    tol = 1e-4 if precision == "highest" else 3e-2
    assert err.max() < tol, (precision, err.max())

    def timed(fn):
        @jax.jit
        def run(p, t):
            def body(c, _):
                out = fn(p, t + c.astype(t.dtype))
                return jnp.sum(jnp.abs(out.astype(jnp.float32))) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
            return c
        float(run(params, x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, x))
            ts.append((time.perf_counter() - t0) / REPEATS)
        return float(np.median(ts)) * 1e3

    ms_mod = timed(lambda p, t: mods.lbl_enc.apply(
        {"params": p}, t.astype(mods.dtype)))
    ms_fast = timed(lambda p, t: encoder_apply_fast(
        mods.lbl_enc, p, t.astype(mods.dtype)))
    print(f"[{precision}] module {ms_mod:.1f} ms/clip -> "
          f"fast {ms_fast:.1f} ms/clip ({ms_mod/ms_fast:.2f}x)", flush=True)
print("OK", flush=True)
