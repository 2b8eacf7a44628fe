"""Fast-tail TRAINING tier: decoder + FuseNet run in bf16/default-MXU
while everything upstream of (and including) the similarity branch,
warp supervision, and the losses stays f32.

The tier was already the shipped *inference* fast path (bench.py); this
covers its training-side contract:
  - the train step executes and produces finite metrics,
  - metrics stay close to the f32-tail step (the tail's bf16 rounding
    perturbs rec_img but nothing blows up),
  - the full-generator gradient keeps direction (cosine vs the f32-tail
    gradient) — the property that rejected the bf16-trunk tier (cosine
    0.09: encoder rounding feeds the temp-100 attention softmax, see
    artifacts/round4/bf16_trunk_cos_cpu.py) and admits this one (0.996
    at toy scale, 0.99+ at the shipped scale on chip,
    artifacts/round4/fast_tail_train.json).

Reference anchor: the tiers trade MXU passes for unchanged math vs
/root/reference/model/TSNet.py:432-460 (the single-precision torch
step); the A/B evidence lives in artifacts/round4/ft_ab/.
"""

import dataclasses
import warnings

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward
from wacv23_tsnet_tpu.nn import load_vgg19_params
from wacv23_tsnet_tpu.train.state import create_train_state
from wacv23_tsnet_tpu.train.step import make_train_step


def _toy_batch(cfg, bs=2):
    hw, l, s = cfg.image_size, cfg.label_nc, cfg.n_source
    r = np.random.default_rng(0)
    return {k: jnp.asarray(v) for k, v in {
        "src_img": r.random((bs, s, hw, hw, 3), np.float32),
        "src_lbl": r.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
        "src_bbox": r.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
        "tar_img": r.random((bs, hw, hw, 3), np.float32),
        "tar_lbl": r.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
        "tar_bbox": r.integers(0, 2, (bs, hw, hw)).astype(np.float32),
    }.items()}


def test_fast_tail_train_step_runs_and_tracks_base():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = load_vgg19_params()
    metrics = {}
    for tag, ft in [("base", False), ("fast_tail", True)]:
        cfg = dataclasses.replace(toy_config(), precision="high",
                                  bwd_precision="default", fast_tail=ft)
        mods = TSNetModules(cfg)
        state = create_train_state(mods, jax.random.PRNGKey(0),
                                   vgg_params=vgg)
        batch = _toy_batch(cfg)
        step = make_train_step(mods, donate=False)
        _, m, rec = step(state, batch, jnp.float32(2e-4))
        metrics[tag] = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in metrics[tag].values()), tag
        # rec_img leaves the step in f32 regardless of the tail dtype
        assert rec.dtype == jnp.float32
    for k, v in metrics["base"].items():
        # bf16 tail rounding is a real perturbation; the losses must stay
        # in the same regime, not bit-match
        np.testing.assert_allclose(metrics["fast_tail"][k], v, rtol=0.15,
                                   atol=0.02, err_msg=k)


def test_fast_tail_gradient_keeps_direction():
    """Full-generator gradient cosine vs the f32-tail gradient at toy
    scale. The measured value is ~0.996 (CPU, artifacts screen); assert a
    margin below it. The same check run with compute_dtype=bfloat16
    (trunk included) gives 0.09 — this is the discriminating property."""
    grads = {}
    for tag, ft in [("base", False), ("fast_tail", True)]:
        cfg = dataclasses.replace(toy_config(), precision="high",
                                  bwd_precision="default", fast_tail=ft)
        mods = TSNetModules(cfg)
        params = mods.init_generator_params(jax.random.PRNGKey(0))
        batch = _toy_batch(cfg)

        def loss(p):
            out = tsnet_forward(mods, p, batch["src_img"], batch["src_lbl"],
                                batch["src_bbox"], batch["tar_lbl"],
                                batch["tar_bbox"], tar_img=batch["tar_img"],
                                train=True)
            return (jnp.mean(jnp.abs(out["rec_img"] - batch["tar_img"]))
                    + 1e-3 * out["loss_warp"])

        g = jax.jit(jax.grad(loss))(params)
        flat, _ = jax.flatten_util.ravel_pytree(
            jax.tree.map(lambda t: np.asarray(t, np.float32), g))
        grads[tag] = np.asarray(flat, np.float64)
    hi, lo = grads["base"], grads["fast_tail"]
    cos = float(np.dot(hi, lo) / (np.linalg.norm(hi) * np.linalg.norm(lo)))
    assert cos > 0.97, f"fast-tail gradient cosine {cos:.4f}"
