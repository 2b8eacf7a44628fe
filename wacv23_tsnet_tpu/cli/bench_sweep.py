"""Benchmark sweep: the BASELINE.json config grid on one chip.

Covers BASELINE.json configs 3-4: "multi-source sweep: n_source=1/3/5"
and chunk scaling (frames per device batch) for the streaming-inference
config. Prints a table to stderr and one JSON line per config to
stdout.

    python -m wacv23_tsnet_tpu.cli.bench_sweep
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import sys
import time

import numpy as np


def measure(cfg, n_source: int, frames: int, iters: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    from ..models import TSNetModules
    from ..models.tsnet import tsnet_forward_clip

    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sz, l = cfg.image_size, cfg.label_nc
    args = (
        params,
        jnp.asarray(rng.random((n_source, sz, sz, 3), np.float32)),
        jnp.asarray(rng.integers(0, 2, (n_source, sz, sz, l))
                    .astype(np.float32)),
        jnp.asarray(rng.integers(0, 2, (n_source, sz, sz)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2, (frames, sz, sz, l)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2, (frames, sz, sz)).astype(np.float32)),
    )
    fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=True)
    fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
    float(fn(*args))      # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return frames / ((time.perf_counter() - t0) / iters)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--precision", default="high")
    p.add_argument("--fast-tail", action=argparse.BooleanOptionalAction,
                   default=True)
    args = p.parse_args(argv)

    from ..configs import face_config

    cfg = dataclasses.replace(face_config(), precision=args.precision,
                              fast_tail=args.fast_tail)
    print(f"{'n_source':>8} {'frames':>6} {'fps/chip':>9}", file=sys.stderr)
    for n_source in (1, 3, 5):
        fps = measure(cfg, n_source, args.frames)
        print(f"{n_source:>8} {args.frames:>6} {fps:>9.1f}", file=sys.stderr)
        print(json.dumps({
            "metric": f"streaming inference n_source={n_source}, 256x256",
            "value": round(fps, 2),
            "unit": "frames/sec/chip",
        }), flush=True)
    # chunk scaling (BASELINE config 4: whole driving clip batched on
    # device) — how fps moves with frames per device batch at the
    # shipped n_source=3
    for frames in (8, 16, 32, 64, 128):
        fps = measure(cfg, 3, frames)
        print(f"{3:>8} {frames:>6} {fps:>9.1f}", file=sys.stderr)
        print(json.dumps({
            "metric": f"streaming inference chunk={frames}, n_source=3, "
                      "256x256",
            "value": round(fps, 2),
            "unit": "frames/sec/chip",
        }), flush=True)


if __name__ == "__main__":
    main()
