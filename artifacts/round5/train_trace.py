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

    parse_trace(LOGDIR)


def parse_trace(logdir: str):
    """Aggregate the Chrome trace by source line (the xplane proto has
    no importable parser in this image; the `.trace.json.gz` carries
    the same per-op source_stack/model_flops/raw_bytes_accessed args)."""
    import collections
    import gzip

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("[trace] no chrome trace found")
        return
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        tr = json.load(f)
    evs = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    by_src = collections.Counter()
    flops_src = collections.Counter()
    bytes_src = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or "TPU" not in str(pids.get(e.get("pid"),
                                                           "")):
            continue
        a = e.get("args") or {}
        if not a.get("long_name") and not a.get("source"):
            continue                      # wrapper/step markers
        ms = e.get("dur", 0) / 1e3 / 3
        src = a.get("source", e["name"])
        by_src[src] += ms
        flops_src[src] += float(a.get("model_flops", 0) or 0) / 3
        bytes_src[src] += float(a.get("raw_bytes_accessed", 0) or 0) / 3
    total = sum(by_src.values())
    print(f"[trace] attributed device time {total:.1f} ms/step")
    top = by_src.most_common(30)
    for src, ms in top:
        mxu = flops_src[src] / 197e12 * 1e3
        hbm = bytes_src[src] / 819e9 * 1e3
        print(f"  {ms:8.2f} ms  mxu-1p {mxu:6.1f}  hbm {hbm:6.1f}  {src}")
    with open(OUT, "w") as f:
        json.dump({
            "ms_per_step_attributed": round(total, 1),
            "by_source": [
                {"src": s, "ms": round(ms, 2),
                 "mxu_1pass_ms": round(flops_src[s] / 197e12 * 1e3, 2),
                 "hbm_ms": round(bytes_src[s] / 819e9 * 1e3, 2)}
                for s, ms in top],
        }, f, indent=2)
    print(f"[trace] wrote {OUT}")


if __name__ == "__main__":
    main()
