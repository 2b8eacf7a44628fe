"""Capture a device profile of the bench-tier train step and summarize it.

The roofline accounting (train_roofline.json) says the step's cost-model
legs are 258 ms (HBM) / 124 ms (logical MXU) against 460 ms measured —
~200 ms is unexplained by either leg. This captures a real device trace
(jax.profiler -> xplane) of 3 warm steps and aggregates device-plane op
durations, so the gap is attributed to named fusions instead of guesses.

Run on chip:  python artifacts/round5/train_trace.py
Prints the top device ops and writes artifacts/round5/train_trace_top.json.
"""

from __future__ import annotations

import dataclasses
import glob
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
from wacv23_tsnet_tpu.nn import load_vgg19_params              # noqa: E402
from wacv23_tsnet_tpu.train.state import create_train_state   # noqa: E402
from wacv23_tsnet_tpu.train.step import make_train_step       # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "train_trace_top.json")
LOGDIR = "/tmp/tsnet_train_trace"
BS = 15


def main():
    cfg = dataclasses.replace(face_config(), precision="high",
                              bwd_precision="default", fast_tail=True)
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
    print(f"[trace] compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    state, _, r = step(state, batch, lr)          # warm
    jax.block_until_ready(r)

    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            state, _, r = step(state, batch, lr)
        jax.block_until_ready(r)
    print("[trace] captured", flush=True)

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("[trace] NO xplane produced — profiler not supported "
              "through this backend")
        return
    path = max(paths, key=os.path.getmtime)
    print(f"[trace] parsing {path}", flush=True)
    from tensorboard_plugin_profile.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    agg = {}
    planes = []
    for plane in space.planes:
        planes.append(plane.name)
        if "TPU" not in plane.name and "tpu" not in plane.name.lower() \
                and "device" not in plane.name.lower():
            continue
        ev_names = dict(plane.event_metadata)
        for line in plane.lines:
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e9
    print(f"[trace] planes: {planes}", flush=True)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    total = sum(agg.values())
    print(f"[trace] total device op-time {total:.1f} ms over 3 steps "
          f"({total/3:.1f} ms/step)")
    for name, ms in top:
        print(f"  {ms/3:9.2f} ms/step  {name[:110]}")
    with open(OUT, "w") as f:
        json.dump({"planes": planes, "ms_per_step_total": round(total / 3, 1),
                   "top_ops_ms_per_step": [
                       {"op": n, "ms": round(ms / 3, 2)} for n, ms in top]},
                  f, indent=2)
    print(f"[trace] wrote {OUT}")


if __name__ == "__main__":
    main()
