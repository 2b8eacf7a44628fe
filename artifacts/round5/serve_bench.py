"""Serving-path benchmark (round 5): RetargetSession on chip.

VERDICT r04 Weak #2 / Next #4: the streaming/serving surface
(infer/streaming.py, cli/serve.py) had zero performance numbers, and the
round-4 sweep showed serialized small-chunk dispatch collapsing to
131 fps at chunk=8 (vs 546 at 128). This measures, on the real chip:

  - push_labels throughput at serving chunk sizes (8/16/32) with the
    old serialized dispatch (pipeline_depth=0) and the new pipelined
    dispatch (depth=4);
  - push_keypoints (on-device rasterizer tier: only keypoints cross the
    host boundary) at the same chunks;
  - per-chunk latency (time to the FIRST chunk's result back on host),
    the number a latency-sensitive caller cares about.

Run on chip:  python artifacts/round5/serve_bench.py
Writes artifacts/round5/serve_bench.json.
"""

from __future__ import annotations

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
from wacv23_tsnet_tpu.infer.streaming import RetargetSession   # noqa: E402
from wacv23_tsnet_tpu.models import TSNetModules               # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "serve_bench.json")
F = 256          # frames pushed per measurement
S, HW, L = 3, 256, 2


def main():
    import dataclasses
    cfg = dataclasses.replace(face_config(), precision="high",
                              fast_tail=True)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src_img = rng.random((S, HW, HW, 3), np.float32)
    src_lbl = rng.integers(0, 2, (S, HW, HW, L)).astype(np.float32)
    src_bbox = rng.integers(0, 2, (S, HW, HW)).astype(np.float32)
    tar_lbl = rng.integers(0, 2, (F, HW, HW, L)).astype(np.float32)
    tar_bbox = rng.integers(0, 2, (F, HW, HW)).astype(np.float32)
    kps = (rng.random((F, 68, 2), np.float32) * (HW - 1)).astype(np.float32)

    cls_map = np.argmax(tar_lbl, axis=-1).astype(np.uint8)
    bbox_u8 = tar_bbox.astype(np.uint8)

    results = {"frames": F, "config": "face 256^2, n_source=3, "
               "precision=high + fast_tail (the bench tier)"}

    def measure(sess, push, args_chunk, args_full, key, label):
        push(*args_chunk)                                   # compile
        t0 = time.perf_counter()
        push(*args_chunk)                                   # 1-chunk latency
        lat_ms = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        out = push(*args_full)
        fps = F / (time.perf_counter() - t0)
        assert out.shape == (F, HW, HW, 3)
        results[key] = {"fps": round(fps, 1),
                        "chunk_latency_ms": round(lat_ms, 1)}
        print(f"[serve] {label}: {fps:7.1f} fps, {lat_ms:6.1f} ms/chunk",
              flush=True)

    # wire tiers: f32 = one-hot f32 labels in, f32 model-space frames out
    # (the round-4 surface); u8 = uint8 class maps in, on-device display
    # conversion, uint8 frames out (round-5 fix for the tunnel-bandwidth
    # wall the f32 rows below measure).
    for chunk in (8, 16, 32):
        for depth in (0, 4):
            sess = RetargetSession(cfg, params, src_img, src_lbl, src_bbox,
                                   chunk=chunk, pipeline_depth=depth)
            measure(sess, sess.push_labels,
                    (tar_lbl[:chunk], tar_bbox[:chunk]), (tar_lbl, tar_bbox),
                    f"labels_f32_chunk{chunk}_depth{depth}",
                    f"labels f32 chunk={chunk} depth={depth}")
            measure(sess, sess.push_keypoints,
                    (kps[:chunk],), (kps,),
                    f"keypoints_f32out_chunk{chunk}_depth{depth}",
                    f"keypoints f32-out chunk={chunk} depth={depth}")
            del sess
            sess = RetargetSession(cfg, params, src_img, src_lbl, src_bbox,
                                   chunk=chunk, pipeline_depth=depth,
                                   output="display")
            measure(sess, sess.push_labels,
                    (cls_map[:chunk], bbox_u8[:chunk]), (cls_map, bbox_u8),
                    f"labels_u8_chunk{chunk}_depth{depth}",
                    f"labels u8 chunk={chunk} depth={depth}")
            measure(sess, sess.push_keypoints,
                    (kps[:chunk],), (kps,),
                    f"keypoints_u8out_chunk{chunk}_depth{depth}",
                    f"keypoints u8-out chunk={chunk} depth={depth}")
            del sess

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[serve] wrote {OUT}")


if __name__ == "__main__":
    main()
