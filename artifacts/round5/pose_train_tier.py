"""Pose TRAIN tier: dual-precision backward + bf16 fast tail, measured.

The face train tier shipped in r04 (high fwd + default bwd + fast_tail,
457 ms/step) was adopted on gradient-cosine + matched-seed convergence
evidence — face evidence. The pose bench train tier stayed at plain
"high" (690 ms). This produces the POSE-side evidence on chip at the
shipped bs=10 scale (netDF both phases, fg-mask, label_nc=25):

  1. generator gradient cosine between the two tiers on one real-shaped
     batch (the r04 face standard: fast-tail cosine was 0.9937);
  2. ms/step of both tiers.

Supporting real-data evidence: runs/pose_ft — a 500-step pose training
run at the candidate tier on the bundled dance data trained healthily
(G 6.98→, D balanced; its checkpoint passed the drift/parity use in
pose_fast_trunk_drift.py).

Run on chip:  python artifacts/round5/pose_train_tier.py
Writes artifacts/round5/pose_train_tier.json.
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

from wacv23_tsnet_tpu.configs import pose_config               # noqa: E402
from wacv23_tsnet_tpu.models import TSNetModules               # noqa: E402
from wacv23_tsnet_tpu.nn import load_vgg19_params              # noqa: E402
from wacv23_tsnet_tpu.train.state import create_train_state   # noqa: E402
from wacv23_tsnet_tpu.train.step import make_train_step       # noqa: E402

OUT = os.path.join(REPO, "artifacts", "round5", "pose_train_tier.json")
BS = 10


def tier(name):
    base = pose_config()
    if name == "base":
        return dataclasses.replace(base, precision="high")
    return dataclasses.replace(base, precision="high",
                               bwd_precision="default", fast_tail=True)


def make_batch(cfg):
    rng = np.random.default_rng(0)
    hw, l, s = cfg.image_size, cfg.label_nc, cfg.n_source
    return {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((BS, s, hw, hw, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (BS, s, hw, hw, l)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (BS, s, hw, hw)).astype(np.float32),
        "tar_img": rng.random((BS, hw, hw, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (BS, hw, hw, l)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (BS, hw, hw)).astype(np.float32),
    }.items()}


def gen_grad(cfg, batch):
    """Full G-phase generator gradient (the tier-sensitive part)."""
    from wacv23_tsnet_tpu.losses import (feature_matching_loss,
                                         lsgan_loss, vgg_perceptual_loss)
    from wacv23_tsnet_tpu.models.tsnet import crop_faces, tsnet_forward
    from wacv23_tsnet_tpu.nn import VGG19Features

    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        state = create_train_state(mods, jax.random.PRNGKey(0),
                                   vgg_params=load_vgg19_params())
    vgg = VGG19Features(dtype=mods.dtype, precision=cfg.precision,
                        bwd_precision=cfg.bwd_precision)

    # batch / disc / vgg params enter as jit ARGUMENTS — closure
    # constants inflate the remote-compile request past the relay's
    # HTTP 413 limit (see cli/profile_stages.py)
    def loss(gp, b_, dp_, vp_):
        out = tsnet_forward(mods, gp, b_["src_img"], b_["src_lbl"],
                            b_["src_bbox"], b_["tar_lbl"],
                            b_["tar_bbox"], tar_img=b_["tar_img"],
                            train=True)
        rec, tar = out["rec_img"], b_["tar_img"]
        fake = jnp.concatenate([b_["tar_lbl"], rec], axis=-1)
        real = jnp.concatenate([b_["tar_lbl"], tar], axis=-1)
        pf = mods.netD.apply({"params": dp_["netD"]}, fake)
        pr = jax.lax.stop_gradient(
            mods.netD.apply({"params": dp_["netD"]}, real))
        total = (lsgan_loss(pf[-1], True)
                 + feature_matching_loss(pf, pr, cfg.lambda_fml)
                 + cfg.lambda_vgg * vgg_perceptual_loss(
                     vgg, vp_, rec, jax.lax.stop_gradient(tar))
                 + out["loss_warp"])
        ff = crop_faces(rec, b_["tar_lbl"])
        fr = jax.lax.stop_gradient(crop_faces(tar, b_["tar_lbl"]))
        pff = mods.netDF.apply({"params": dp_["netDF"]}, ff)
        pfr = jax.lax.stop_gradient(
            mods.netDF.apply({"params": dp_["netDF"]}, fr))
        total = total + lsgan_loss(pff[-1], True) \
            + feature_matching_loss(pff, pfr, cfg.lambda_fml) \
            + cfg.lambda_vgg * vgg_perceptual_loss(vgg, vp_, ff, fr)
        return total

    g = jax.jit(jax.grad(loss))(state.gen_params, batch,
                                state.disc_params, state.vgg_params)
    return np.concatenate([np.asarray(x, np.float64).ravel()
                           for x in jax.tree.leaves(g)])


def measure_ms(cfg):
    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        state = create_train_state(mods, jax.random.PRNGKey(0),
                                   vgg_params=load_vgg19_params())
    batch = make_batch(cfg)
    step = make_train_step(mods, donate=True)
    lr = jnp.float32(2e-4)
    t0 = time.perf_counter()
    state, _, r = step(state, batch, lr)
    jax.block_until_ready(r)
    print(f"[pose-tier] compile+1st {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        state, _, r = step(state, batch, lr)
    jax.block_until_ready(r)
    return round((time.perf_counter() - t0) / 3 * 1e3, 1)


def main():
    result = {}
    batch = make_batch(tier("base"))
    g_base = gen_grad(tier("base"), batch)
    print("[pose-tier] base grad done", flush=True)
    g_fast = gen_grad(tier("fast"), batch)
    cos = float(np.dot(g_base, g_fast)
                / (np.linalg.norm(g_base) * np.linalg.norm(g_fast)))
    rel = float(np.linalg.norm(g_base - g_fast) / np.linalg.norm(g_base))
    result["grad_cosine"] = round(cos, 5)
    result["grad_rel_l2"] = round(rel, 4)
    print(f"[pose-tier] gradient cosine {cos:.5f} rel-L2 {rel:.4f}",
          flush=True)
    del g_base, g_fast

    result["ms_base_high"] = measure_ms(tier("base"))
    print(f"[pose-tier] base: {result['ms_base_high']} ms/step", flush=True)
    result["ms_fast_tier"] = measure_ms(tier("fast"))
    print(f"[pose-tier] fast: {result['ms_fast_tier']} ms/step", flush=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[pose-tier] wrote {OUT}")


if __name__ == "__main__":
    main()
