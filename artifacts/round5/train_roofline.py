"""Train-step roofline accounting at HEAD (round 5).

VERDICT r04 Weak #1 / Next #2: the benched train step (457 ms at bs=15,
256², high fwd + default bwd + bf16 fast tail) sits ~20% above the
round-4 precision-adjusted roofline estimate (~376 ms), attributed to
decoder-tail backward HBM traffic — "attributed, but not attacked or
bounded with a committed profile". This script produces the accounting
on the real chip:

  1. the shipped bench-tier step: measured ms/step, XLA cost-model FLOPs
     AND bytes-accessed of the COMPILED executable (post-fusion), from
     which the two roofline legs follow:
         t_mxu = weighted MXU-pass FLOPs / 197 TFLOP/s (v5e bf16 peak)
         t_hbm = bytes accessed / 819 GB/s (v5e HBM)
     If max(t_mxu, t_hbm) ≈ measured, the step is AT its roofline and
     457 is the floor for this graph; the gap (if any) is schedulable.
  2. the same accounting for the generator fwd alone and fwd+bwd (vjp),
     so the backward's own bytes/FLOP ratio is explicit.
  3. A/B variants, each compiled+timed on chip:
         remat=True        (subnet-granularity rematerialization —
                            trades HBM writes of saved activations for
                            recompute on the underused MXU)

Run on chip:  python artifacts/round5/train_roofline.py
Writes artifacts/round5/train_roofline.json.

Match: the training loop this step replaces,
/root/reference/model/TSNet.py:432-460.
"""

from __future__ import annotations

import dataclasses
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
from wacv23_tsnet_tpu.train.state import create_train_state   # noqa: E402
from wacv23_tsnet_tpu.train.step import make_train_step       # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "train_roofline.json")
PEAK_BF16 = 197e12        # v5e MXU bf16 peak, FLOP/s
PEAK_HBM = 819e9          # v5e HBM bandwidth, B/s
BS = 15


def bench_cfg(**over):
    return dataclasses.replace(face_config(), precision="high",
                               bwd_precision="default", fast_tail=True,
                               **over)


def make_batch(cfg, bs=BS):
    rng = np.random.default_rng(0)
    hw, l, s = cfg.image_size, cfg.label_nc, cfg.n_source
    return {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((bs, s, hw, hw, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
        "tar_img": rng.random((bs, hw, hw, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (bs, hw, hw)).astype(np.float32),
    }.items()}


def cost_of(lowered):
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    return flops, byts


def run_step_variant(name, cfg, result, iters=3):
    from wacv23_tsnet_tpu.nn import load_vgg19_params

    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        state = create_train_state(mods, jax.random.PRNGKey(0),
                                   vgg_params=load_vgg19_params())
    batch = make_batch(cfg)
    step = make_train_step(mods, donate=True)
    t0 = time.perf_counter()
    state, _, r = step(state, batch, jnp.float32(2e-4))
    jax.block_until_ready(r)
    print(f"[roofline] {name}: compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _, r = step(state, batch, jnp.float32(2e-4))
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / iters * 1e3
    entry = {"ms_per_step": round(ms, 1)}
    # cost model on the einsum lowering (Pallas kernels are opaque);
    # non-donated so .lower can reuse the live buffers
    try:
        ref = make_train_step(mods, use_pallas=False, donate=False)
        flops, byts = cost_of(ref.lower(state, batch, jnp.float32(2e-4)))
        entry.update(
            tflop=round(flops / 1e12, 2),
            gbytes_accessed=round(byts / 1e9, 2),
            t_mxu_ms=round(flops / PEAK_BF16 * 1e3, 1),
            t_hbm_ms=round(byts / PEAK_HBM * 1e3, 1),
        )
    except Exception as e:                            # pragma: no cover
        entry["cost_analysis_error"] = str(e)
    result[name] = entry
    print(f"[roofline] {name}: {entry}", flush=True)
    del state, batch, step
    return entry


def gen_stage_accounting(result):
    """Forward vs fwd+bwd of the generator alone: FLOPs + bytes so the
    backward's arithmetic intensity is explicit."""
    from wacv23_tsnet_tpu.models.tsnet import tsnet_forward

    cfg = bench_cfg()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    batch = make_batch(cfg)

    def gen_fwd(p_, b_):
        out = tsnet_forward(
            mods, p_, b_["src_img"], b_["src_lbl"], b_["src_bbox"],
            b_["tar_lbl"], b_["tar_bbox"], tar_img=b_["tar_img"], train=True)
        return jnp.sum(jnp.abs(out["rec_img"])) + out["loss_warp"]

    def gen_fwd_bwd(p_, b_):
        val, vjp = jax.vjp(lambda q: gen_fwd(q, b_), p_)
        (g,) = vjp(jnp.ones_like(val))
        return val + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    for name, fn in (("gen_fwd", gen_fwd), ("gen_fwd_bwd", gen_fwd_bwd)):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(params, batch))
        print(f"[roofline] {name}: compile+1st {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            out = jfn(params, batch)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 3 * 1e3
        flops, byts = cost_of(jfn.lower(params, batch))
        result[name] = {
            "ms": round(ms, 1),
            "tflop": round(flops / 1e12, 2),
            "gbytes_accessed": round(byts / 1e9, 2),
            "t_mxu_ms": round(flops / PEAK_BF16 * 1e3, 1),
            "t_hbm_ms": round(byts / PEAK_HBM * 1e3, 1),
        }
        print(f"[roofline] {name}: {result[name]}", flush=True)


def main():
    result = {"config": f"face 256^2 bs={BS}, high fwd + default bwd + "
                        "fast_tail (the bench tier)",
              "peaks": {"mxu_bf16_flops": PEAK_BF16, "hbm_Bps": PEAK_HBM}}
    base = run_step_variant("step_bench_tier", bench_cfg(), result)
    gen_stage_accounting(result)
    remat = run_step_variant("step_remat", bench_cfg(remat=True), result)
    result["remat_delta_ms"] = round(
        remat["ms_per_step"] - base["ms_per_step"], 1)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[roofline] wrote {OUT}")


if __name__ == "__main__":
    main()
