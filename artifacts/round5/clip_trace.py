"""Device profile of the bench-tier CLIP inference graph (round 5).

Same machinery as train_trace.py, pointed at the 720-fps headline path:
capture an xplane/Chrome trace of 3 warm 256-frame clip invocations at
the shipped bench tier (high + fast_tail + fast_trunk, Pallas kernels
on) and aggregate device op time by source line, so the next inference
optimization starts from attribution instead of guesses.

Run on chip:  python artifacts/round5/clip_trace.py
Writes artifacts/round5/clip_trace_top.json.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402

from wacv23_tsnet_tpu.configs import face_config               # noqa: E402
from wacv23_tsnet_tpu.models import TSNetModules               # noqa: E402
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip   # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "clip_trace_top.json")
LOGDIR = "/tmp/tsnet_clip_trace"


def main():
    cfg = dataclasses.replace(face_config(), precision="high",
                              fast_tail=True, fast_trunk=True)
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
    print(f"[clip-trace] compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    float(fn(params, *args))

    with jax.profiler.trace(LOGDIR):
        sums = [fn(params, *args) for _ in range(3)]
        for s_ in sums:
            float(s_)
    print("[clip-trace] captured", flush=True)

    paths = glob.glob(os.path.join(LOGDIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("[clip-trace] no chrome trace found")
        return
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        tr = json.load(f)
    evs = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    by_src = collections.Counter()
    by_name = collections.Counter()
    flops_src = collections.Counter()
    bytes_src = collections.Counter()
    for e in evs:
        if e.get("ph") != "X" or "TPU" not in str(pids.get(e.get("pid"), "")):
            continue
        a = e.get("args") or {}
        if not a.get("long_name") and not a.get("source"):
            continue                      # wrapper/step markers
        ms = e.get("dur", 0) / 1e3 / 3
        by_src[a.get("source", e["name"])] += ms
        by_name[e["name"].split(".")[0]] += ms
        flops_src[a.get("source", "?")] += \
            float(a.get("model_flops", 0) or 0) / 3
        bytes_src[a.get("source", "?")] += \
            float(a.get("raw_bytes_accessed", 0) or 0) / 3
    total = sum(by_src.values())
    print(f"[clip-trace] attributed device time {total:.1f} ms/clip "
          f"({256/ (total/1e3):.0f} fps-equivalent)")
    top = by_src.most_common(30)
    for src, ms in top:
        mxu = flops_src[src] / 197e12 * 1e3
        hbm = bytes_src[src] / 819e9 * 1e3
        print(f"  {ms:8.2f} ms  mxu-1p {mxu:6.1f}  hbm {hbm:6.1f}  {src}")
    with open(OUT, "w") as f:
        json.dump({
            "ms_per_clip_attributed": round(total, 1),
            "by_source": [
                {"src": s, "ms": round(ms, 2),
                 "mxu_1pass_ms": round(flops_src[s] / 197e12 * 1e3, 2),
                 "hbm_ms": round(bytes_src[s] / 819e9 * 1e3, 2)}
                for s, ms in top],
            "by_op_family": [{"op": n, "ms": round(ms, 2)}
                             for n, ms in by_name.most_common(20)],
        }, f, indent=2)
    print(f"[clip-trace] wrote {OUT}")


if __name__ == "__main__":
    main()
