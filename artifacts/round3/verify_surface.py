"""/verify drive: the library surface end-to-end on the real chip.

1. jitted tsnet_forward_clip (shipped face config) at both precision
   tiers — fast tier must stay inside the 0.01 L1 parity budget vs the
   bit-parity tier (which itself is torch-oracle-verified in tests).
2. one jitted train step (bs=2) — finite losses through the D+G step.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import dataclasses

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip

assert jax.default_backend() == "tpu", jax.default_backend()
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
S, F, HW, L = 3, 32, 256, 2

src_img = jnp.asarray(rng.random((S, HW, HW, 3)), jnp.float32)
src_lbl = jnp.asarray(rng.integers(0, 2, (S, HW, HW, L)), jnp.float32)
src_bbox = jnp.asarray(rng.integers(0, 2, (S, HW, HW)), jnp.float32)
tar_lbl = jnp.asarray(rng.integers(0, 2, (F, HW, HW, L)), jnp.float32)
tar_bbox = jnp.asarray(rng.integers(0, 2, (F, HW, HW)), jnp.float32)

outs = {}
for precision, fast in (("highest", False), ("high", True)):
    cfg = dataclasses.replace(face_config(), precision=precision,
                              fast_tail=fast)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    fn = jax.jit(lambda p, *a, m=mods: tsnet_forward_clip(m, p, *a))
    t0 = time.perf_counter()
    y = np.asarray(fn(params, src_img, src_lbl, src_bbox, tar_lbl,
                      tar_bbox), np.float32)
    print(f"[{precision}] clip fwd {y.shape} in "
          f"{time.perf_counter()-t0:.1f}s (compile+run), "
          f"finite={np.isfinite(y).all()}", flush=True)
    assert np.isfinite(y).all()
    outs[precision] = y

l1 = np.abs(outs["high"] - outs["highest"]).mean()
print(f"fast-tier vs bit-parity tier mean L1 = {l1:.4f} (budget 0.01)",
      flush=True)
assert l1 < 0.01, l1

# --- one train step --------------------------------------------------
import warnings

from wacv23_tsnet_tpu.nn import load_vgg19_params
from wacv23_tsnet_tpu.train.state import create_train_state
from wacv23_tsnet_tpu.train.step import make_train_step

cfg = dataclasses.replace(face_config(), precision="high")
mods = TSNetModules(cfg)
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    vgg = load_vgg19_params()
state = create_train_state(mods, jax.random.PRNGKey(0), vgg_params=vgg)
step = make_train_step(mods, donate=False)
B = 2
batch = {
    "src_img": jnp.asarray(rng.random((B, S, HW, HW, 3)), jnp.float32),
    "src_lbl": jnp.asarray(rng.integers(0, 2, (B, S, HW, HW, L)), jnp.float32),
    "src_bbox": jnp.asarray(rng.integers(0, 2, (B, S, HW, HW)), jnp.float32),
    "tar_lbl": jnp.asarray(rng.integers(0, 2, (B, HW, HW, L)), jnp.float32),
    "tar_bbox": jnp.asarray(rng.integers(0, 2, (B, HW, HW)), jnp.float32),
    "tar_img": jnp.asarray(rng.random((B, HW, HW, 3)), jnp.float32),
}
t0 = time.perf_counter()
state, metrics, _ = step(state, batch, jnp.float32(2e-4))
metrics = {k: float(v) for k, v in metrics.items()}
print(f"train step in {time.perf_counter()-t0:.1f}s (compile+run):",
      {k: round(v, 3) for k, v in sorted(metrics.items())[:6]}, flush=True)
assert all(np.isfinite(v) for v in metrics.values()), metrics
print("VERIFY OK", flush=True)
