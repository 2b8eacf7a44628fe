"""Ring-pad conv A/B on chip: train step ms + clip fps, pad vs ring.

The round-5 device trace attributed 37.5 ms/step of the bs=15 train
step to `jnp.pad(mode="reflect")` materializations (plus their share of
the 44 ms "data formatting" bucket and the pad-transposes in the
backward). ops/reflectconv.py computes the same sums with zero-pad
convs + thin band corrections. This measures both directions of the
claim END TO END on the real chip, at the shipped bench shapes:

  train: bs=15 256², high fwd + default bwd + fast_tail, ring off/on
  clip:  256 frames, n_source=3, high + fast_tail + fast_trunk, off/on

Run on chip:  python artifacts/round5/ring_pad_ab.py
Writes artifacts/round5/ring_pad_ab.json.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time
import warnings

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

from wacv23_tsnet_tpu.configs import face_config               # noqa: E402
from wacv23_tsnet_tpu.models import TSNetModules               # noqa: E402
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip   # noqa: E402
from wacv23_tsnet_tpu.nn import load_vgg19_params              # noqa: E402
from wacv23_tsnet_tpu.train.state import create_train_state   # noqa: E402
from wacv23_tsnet_tpu.train.step import make_train_step       # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "ring_pad_ab.json")
BS = 15


def measure_train(ring: bool) -> float:
    cfg = dataclasses.replace(face_config(), precision="high",
                              bwd_precision="default", fast_tail=True,
                              ring_pad=ring)
    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        state = create_train_state(mods, jax.random.PRNGKey(0),
                                   vgg_params=load_vgg19_params())
    rng = np.random.default_rng(0)
    hw, l, s = cfg.image_size, cfg.label_nc, cfg.n_source
    batch = {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((BS, s, hw, hw, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (BS, s, hw, hw, l)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (BS, s, hw, hw)).astype(np.float32),
        "tar_img": rng.random((BS, hw, hw, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (BS, hw, hw, l)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (BS, hw, hw)).astype(np.float32),
    }.items()}
    step = make_train_step(mods, donate=True)
    lr = jnp.float32(2e-4)
    t0 = time.perf_counter()
    state, _, r = step(state, batch, lr)
    jax.block_until_ready(r)
    print(f"[ab] train ring={ring}: compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        state, _, r = step(state, batch, lr)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 4 * 1e3
    print(f"[ab] train ring={ring}: {ms:.1f} ms/step", flush=True)
    return round(ms, 1)


def measure_clip(ring: bool) -> float:
    cfg = dataclasses.replace(face_config(), precision="high",
                              fast_tail=True, fast_trunk=True,
                              ring_pad=ring)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    F, S, HW, L = 256, 3, 256, 2
    args = (
        jnp.asarray(rng.random((S, HW, HW, 3), np.float32)),
        jnp.asarray(rng.integers(0, 2, (S, HW, HW, L)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2, (S, HW, HW)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2, (F, HW, HW, L)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2, (F, HW, HW)).astype(np.float32)),
    )
    fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=True)
    fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
    t0 = time.perf_counter()
    float(fn(params, *args))
    print(f"[ab] clip ring={ring}: compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    iters = 10
    t0 = time.perf_counter()
    sums = [fn(params, *args) for _ in range(iters)]
    for s_ in sums:
        float(s_)
    fps = F / ((time.perf_counter() - t0) / iters)
    print(f"[ab] clip ring={ring}: {fps:.2f} fps", flush=True)
    return round(fps, 2)


def main():
    result = {}
    result["train_ms_pad"] = measure_train(False)
    result["train_ms_ring"] = measure_train(True)
    result["clip_fps_pad"] = measure_clip(False)
    result["clip_fps_ring"] = measure_clip(True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[ab] {result}")
    print(f"[ab] wrote {OUT}")


if __name__ == "__main__":
    main()
