"""Time the bs=15 256^2 face train step: fast_tail=True vs the shipped
precision="high" tier (reference train loop: /root/reference/train_face.py:24-29,
model/TSNet.py:432-460).

fast_tail runs fuse_net + decoder in bfloat16 (1 MXU pass instead of 3)
in BOTH directions — forward activations and the conv grads. The
encoders and the temp-100 attention stay at the "high" tier, so the
numerically sensitive parts of the model are untouched; the tail is the
bulk of the FLOPs. This probe measures the step time of both tiers and
the first-step metric agreement, to qualify a mixed-precision training
tier.
"""
import dataclasses
import sys
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn import load_vgg19_params
from wacv23_tsnet_tpu.train.state import create_train_state
from wacv23_tsnet_tpu.train.step import make_train_step

log = lambda *a: print(*a, file=sys.stderr, flush=True)

BS = 15
SIZE = 256


def make_batch(cfg, rng):
    s, hw, l = cfg.n_source, cfg.image_size, cfg.label_nc
    return {
        "src_img": jnp.asarray(rng.random((BS, s, hw, hw, 3), np.float32)),
        "src_lbl": jnp.asarray(rng.integers(0, 2, (BS, s, hw, hw, l)).astype(np.float32)),
        "src_bbox": jnp.asarray(rng.integers(0, 2, (BS, s, hw, hw)).astype(np.float32)),
        "tar_img": jnp.asarray(rng.random((BS, hw, hw, 3), np.float32)),
        "tar_lbl": jnp.asarray(rng.integers(0, 2, (BS, hw, hw, l)).astype(np.float32)),
        "tar_bbox": jnp.asarray(rng.integers(0, 2, (BS, hw, hw)).astype(np.float32)),
    }


def run_tier(fast_tail: bool, n_steps: int = 8):
    cfg = dataclasses.replace(face_config(), precision="high",
                              fast_tail=fast_tail)
    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = load_vgg19_params()
    state = create_train_state(mods, jax.random.PRNGKey(0), vgg_params=vgg)
    step = make_train_step(mods, donate=True)
    rng = np.random.default_rng(0)
    batch = make_batch(cfg, rng)
    lr = jnp.float32(2e-4)

    t0 = time.perf_counter()
    state, metrics, _ = step(state, batch, lr)
    jax.block_until_ready(metrics)
    log(f"[fast_tail={fast_tail}] compile+1st: {time.perf_counter()-t0:.1f}s")
    first = {k: float(v) for k, v in metrics.items()}

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics, _ = step(state, batch, lr)
    jax.block_until_ready(metrics)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    log(f"[fast_tail={fast_tail}] {ms:.1f} ms/step (bs={BS}, {SIZE}^2)")
    last = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in last.values()), last
    return ms, first, last


if __name__ == "__main__":
    log(f"device={jax.devices()[0]}")
    ms_hi, first_hi, last_hi = run_tier(False)
    ms_ft, first_ft, last_ft = run_tier(True)
    log(f"high tier:      {ms_hi:.1f} ms/step")
    log(f"fast_tail tier: {ms_ft:.1f} ms/step ({ms_hi/ms_ft:.2f}x)")
    log("first-step metrics (high vs fast_tail):")
    for k in sorted(first_hi):
        log(f"  {k:8s} {first_hi[k]:+.4f}  {first_ft.get(k, float('nan')):+.4f}")
