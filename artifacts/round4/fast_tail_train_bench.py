"""Fast-tail training tier: measure step time + gradient drift on chip.

Face train step, bs=15, 256^2. Tiers:
  base      = precision="high", bwd_precision="default" (the benched
              dual-precision tier)
  fast_tail = the same + fast_tail=True: decoder + FuseNet run in
              bf16/default-MXU (the shipped INFERENCE fast tier). The
              parity-sensitive parts stay fp32 by construction: the
              encoders, the similarity branch (tsnet_forward casts to
              f32 before l2_normalize/logits/softmax), warp supervision
              (patch_warp runs f32), and every loss (rec_img cast back
              to f32). Unlike the rejected bf16-trunk tier (cosine 0.18
              — encoder rounding feeds the temp-100 attention), nothing
              upstream of the attention is rounded here.

Records ms/step, step-1 metrics, and full-generator gradient drift
(cosine / rel-L2) vs the base tier, like bwd_prec_bench.py did for the
dual-precision backward.
"""
import dataclasses
import json
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.flatten_util
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn import load_vgg19_params
from wacv23_tsnet_tpu.train.state import create_train_state
from wacv23_tsnet_tpu.train.step import make_train_step

BS, SIZE, L, S = 15, 256, 2, 3
TIERS = [("base(high+defbwd)", False), ("fast_tail", True)]
results = {}

rng = np.random.default_rng(0)
batch_np = {
    "src_img": rng.random((BS, S, SIZE, SIZE, 3), np.float32),
    "src_lbl": rng.integers(0, 2, (BS, S, SIZE, SIZE, L)).astype(np.float32),
    "src_bbox": rng.integers(0, 2, (BS, S, SIZE, SIZE)).astype(np.float32),
    "tar_img": rng.random((BS, SIZE, SIZE, 3), np.float32),
    "tar_lbl": rng.integers(0, 2, (BS, SIZE, SIZE, L)).astype(np.float32),
    "tar_bbox": rng.integers(0, 2, (BS, SIZE, SIZE)).astype(np.float32),
}
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    vgg_np = jax.tree.map(lambda t: np.asarray(t), load_vgg19_params())

for tag, ft in TIERS:
    cfg = dataclasses.replace(face_config(), precision="high",
                              bwd_precision="default", fast_tail=ft)
    mods = TSNetModules(cfg)
    vgg = jax.tree.map(jnp.asarray, vgg_np)
    state = create_train_state(mods, jax.random.PRNGKey(0), vgg_params=vgg)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    step = make_train_step(mods, donate=True)
    t0 = time.perf_counter()
    state, m, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    print(f"[{tag}] compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[{tag}] {ms:.1f} ms/step", flush=True)
    results[tag] = {"ms_per_step": round(ms, 1),
                    "metrics_step1": {k: float(v) for k, v in m.items()}}
    del state, step, mods, batch, r

# gradient drift on ONE generator backward: same params/batch, both tiers
print("gradient drift check...", flush=True)
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward

grads = {}
for tag, ft in TIERS:
    cfg = dataclasses.replace(face_config(), precision="high",
                              bwd_precision="default", fast_tail=ft)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def loss(p):
        out = tsnet_forward(mods, p, batch["src_img"], batch["src_lbl"],
                            batch["src_bbox"], batch["tar_lbl"],
                            batch["tar_bbox"], tar_img=batch["tar_img"],
                            train=True)
        return jnp.mean(jnp.abs(out["rec_img"] - batch["tar_img"])) \
            + 1e-3 * out["loss_warp"]

    gfn = jax.jit(jax.grad(loss))
    try:
        g = gfn(params)
    except jax.errors.JaxRuntimeError as e:
        # same XLA:TPU SpaceToBatchConverter CHECK-crash train/step.py
        # works around (see make_train_step); disable the pass and retry
        if "SIGABRT" not in str(e) and "space_to_batch" not in str(e):
            raise
        g = gfn.lower(params).compile(compiler_options={
            "xla_disable_hlo_passes": "space-to-batch-converter"})(params)
    grads[tag] = jax.tree.map(lambda t: np.asarray(t, np.float32), g)
    del mods, params, batch, g

flat_hi, _ = jax.flatten_util.ravel_pytree(grads["base(high+defbwd)"])
flat_lo, _ = jax.flatten_util.ravel_pytree(grads["fast_tail"])
hi, lo = np.asarray(flat_hi, np.float64), np.asarray(flat_lo, np.float64)
cos = float(np.dot(hi, lo) / (np.linalg.norm(hi) * np.linalg.norm(lo)))
rel = float(np.linalg.norm(hi - lo) / np.linalg.norm(hi))
results["grad_drift"] = {
    "cosine": round(cos, 6), "rel_l2": round(rel, 6),
    "note": "full generator grad, bs=15 batch; fast_tail=False vs True, "
            "both precision=high bwd_precision=default"}
print(f"grad cosine={cos:.6f} rel_l2={rel:.6f}", flush=True)

with open("/root/repo/artifacts/round4/fast_tail_train.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results))
