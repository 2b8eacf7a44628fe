"""VERDICT r3 item 6: prove the flash kernel's scaling claim.

The fused transformation branch exists because the attention grows
quadratically once the feature grid exceeds 32^2 (SURVEY.md §5; the
reference's own comment model/TSNet.py:343-346). At n_downsampling=2
the 256^2 input gives 64^2 features -> 4096x4096 attention per
(source, frame) pair: the einsum path materializes ~64 MB fp32 logits
per pair in HBM (x3 sources x frames in flight), while the Pallas
kernels keep each tile's logits in VMEM (flash-style, fwd and bwd).

Measures, on the real chip at n_downsampling=2:
  - clip inference (F frames, n_source=3): Pallas vs einsum ms/clip
  - one bs=2 train step: Pallas (flash bwd) vs einsum VJP ms/step
and records HBM-failure modes if the einsum path cannot run.
"""
import dataclasses
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip

N_SOURCE, SIZE, LABEL_NC, FRAMES = 3, 256, 2, 32

results = {}

cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True,
                          n_downsampling=2)
mods = TSNetModules(cfg)
print(f"devices={jax.devices()} feat {cfg.feat_size}^2 x {cfg.feat_ch}ch "
      f"-> attention {cfg.feat_size**2}x{cfg.feat_size**2}", flush=True)
params = mods.init_generator_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
args = (
    params,
    jnp.asarray(rng.random((N_SOURCE, SIZE, SIZE, 3), np.float32)),
    jnp.asarray(rng.integers(0, 2, (N_SOURCE, SIZE, SIZE, LABEL_NC)).astype(np.float32)),
    jnp.asarray(rng.integers(0, 2, (N_SOURCE, SIZE, SIZE)).astype(np.float32)),
    jnp.asarray(rng.integers(0, 2, (FRAMES, SIZE, SIZE, LABEL_NC)).astype(np.float32)),
    jnp.asarray(rng.integers(0, 2, (FRAMES, SIZE, SIZE)).astype(np.float32)),
)


def time_clip(tag, use_pallas):
    fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=use_pallas)
    fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
    try:
        t0 = time.perf_counter()
        checksum = float(fn(*args))
        print(f"[clip/{tag}] compile+first: {time.perf_counter() - t0:.1f}s "
              f"(checksum {checksum:.1f})", flush=True)
        iters = 3
        t0 = time.perf_counter()
        sums = [fn(*args) for _ in range(iters)]
        for s_ in sums:
            float(s_)
        ms = (time.perf_counter() - t0) / iters * 1e3
        fps = FRAMES / (ms / 1e3)
        print(f"[clip/{tag}] {ms:.1f} ms / {FRAMES} frames = {fps:.1f} fps",
              flush=True)
        results[f"clip_{tag}"] = {"ms_per_clip": round(ms, 1),
                                  "frames": FRAMES, "fps": round(fps, 1)}
    except Exception as e:                                # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"[clip/{tag}] FAILED: {msg}", flush=True)
        results[f"clip_{tag}"] = {"error": msg}


time_clip("pallas", True)
time_clip("einsum", False)


def time_train(tag, use_pallas):
    import warnings
    from wacv23_tsnet_tpu.nn import load_vgg19_params
    from wacv23_tsnet_tpu.train.state import create_train_state
    from wacv23_tsnet_tpu.train.step import make_train_step

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = load_vgg19_params()
    vgg = jax.tree.map(lambda x: jnp.array(np.asarray(x)), vgg)
    state = create_train_state(mods, jax.random.PRNGKey(0), vgg_params=vgg)
    bs = 2
    batch = {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((bs, N_SOURCE, SIZE, SIZE, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (bs, N_SOURCE, SIZE, SIZE, LABEL_NC)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (bs, N_SOURCE, SIZE, SIZE)).astype(np.float32),
        "tar_img": rng.random((bs, SIZE, SIZE, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (bs, SIZE, SIZE, LABEL_NC)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (bs, SIZE, SIZE)).astype(np.float32),
    }.items()}
    step = make_train_step(mods, donate=True, use_pallas=use_pallas)
    try:
        t0 = time.perf_counter()
        state, _, r = step(state, batch, jnp.float32(2e-4))
        float(jnp.sum(r))
        print(f"[train/{tag}] compile+first: {time.perf_counter() - t0:.1f}s",
              flush=True)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _, r = step(state, batch, jnp.float32(2e-4))
        float(jnp.sum(r))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"[train/{tag}] {ms:.0f} ms/step (bs={bs})", flush=True)
        results[f"train_{tag}"] = {"ms_per_step": round(ms, 1), "bs": bs}
    except Exception as e:                                # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"[train/{tag}] FAILED: {msg}", flush=True)
        results[f"train_{tag}"] = {"error": msg}


time_train("pallas_flash", True)
time_train("einsum_vjp", False)


def time_branch(tag, use_pallas):
    """The transformation branch ALONE (fwd + all-cotangent bwd) at the
    nd=2 shape — isolates the quadratic part from the trunk convs that
    dominate the full step at this config."""
    from wacv23_tsnet_tpu.ops.similarity import transformation_warp_sources

    t_hw, c, ns, bs = cfg.feat_size, cfg.feat_ch, N_SOURCE, 2
    r = np.random.default_rng(1)
    sf = jnp.asarray(r.standard_normal((bs, ns, t_hw, t_hw, c)), jnp.float32)
    sn = sf / jnp.linalg.norm(sf, axis=-1, keepdims=True)
    tf = jnp.asarray(r.standard_normal((bs, t_hw, t_hw, c)), jnp.float32)
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    tm = jnp.asarray(r.integers(0, 2, (bs, t_hw, t_hw)).astype(np.float32))
    sm = jnp.asarray(r.integers(0, 2, (bs, ns, t_hw, t_hw)).astype(np.float32))

    def loss(sf_, tf_):
        warped, flow = transformation_warp_sources(
            sf_, tf_, sn, tm, sm, use_pallas=use_pallas,
            bwd_fast3=use_pallas)
        return jnp.sum(jnp.abs(warped)) + jnp.sum(flow)

    fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    try:
        t0 = time.perf_counter()
        v, g = fn(sf, tf)
        float(v)
        print(f"[branch/{tag}] compile+first: {time.perf_counter() - t0:.1f}s",
              flush=True)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            v, g = fn(sf, tf)
        float(v)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"[branch/{tag}] fwd+bwd {ms:.1f} ms "
              f"({bs}x{ns} pairs, {t_hw}^2 x {c})", flush=True)
        results[f"branch_{tag}"] = {"ms_fwd_bwd": round(ms, 1),
                                    "pairs": bs * ns}
    except Exception as e:                                # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"[branch/{tag}] FAILED: {msg}", flush=True)
        results[f"branch_{tag}"] = {"error": msg}


time_branch("pallas", True)
time_branch("einsum", False)

results["config"] = {"n_downsampling": 2, "feat_size": cfg.feat_size,
                     "feat_ch": cfg.feat_ch,
                     "attention": f"{cfg.feat_size**2}x{cfg.feat_size**2}",
                     "logits_fp32_per_pair_mb": round(
                         cfg.feat_size ** 4 * 4 / 2 ** 20, 1)}
with open("/root/repo/artifacts/round4/scaling_nd2.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results), flush=True)
