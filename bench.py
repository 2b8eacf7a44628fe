"""Benchmark: full-video streaming inference frames/sec on one chip.

Flagship config (BASELINE.json: "full-video streaming inference"):
face model, 256x256, label_nc=2, n_source=3, whole driving clip batched
on device. Prints ONE JSON line:
    {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": r}

vs_baseline denominator: the PyTorch reference publishes no numbers
(BASELINE.md), so the baseline is the reference network's per-frame
inference loop (demo_face.py semantics: re-encode all 3 sources every
frame) measured with torch on THIS host, cached in BASELINE_MEASURED.json.
torch in this image is CPU-only; the cached record notes the device so
the ratio is interpretable.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

N_SOURCE = 3
SIZE = 256
LABEL_NC = 2
# 256-frame chunks amortize the per-dispatch latency of this host's TPU
# tunnel (~25 ms/call); measured 568 vs 548 vs 520 fps at 256/192/128
# (and 344 vs 231 at 128 vs 32 in round 1). Peak live activations at 256
# frames stay well inside the 16 GB HBM (lbl_enc stem f32: ~4.3 GB).
CLIP_FRAMES = 256
log = lambda *a: print(*a, file=sys.stderr, flush=True)


def measure_ours() -> float:
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from wacv23_tsnet_tpu.configs import face_config
    from wacv23_tsnet_tpu.models import TSNetModules
    from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip

    # Fast path: "high" MXU precision for the attention/similarity math
    # (1.2e-3 mean L1 vs the bit-parity "highest" path) + bf16
    # fuse/decoder tail (total 5.2e-3) + 1-pass bf16 encoder trunk
    # (fast_trunk) — all inside the 0.01 parity budget. fast_trunk was
    # adopted round 5 on measured evidence: display-space drift vs this
    # tier without it is 0.00047 mean L1 / 0.9997 SSIM on real demo
    # clips with trained weights, and 0.00045 vs the bit-parity anchor
    # (artifacts/round5/fast_trunk_drift.json). Full-bf16/default
    # precision on the SIMILARITY branch flips the temp-100 attention
    # (0.19 L1) and remains rejected; see configs.TSNetConfig.
    cfg = dataclasses.replace(face_config(), precision="high",
                              fast_tail=True, fast_trunk=True)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src_img = jnp.asarray(rng.random((N_SOURCE, SIZE, SIZE, 3), np.float32))
    src_lbl = jnp.asarray(
        rng.integers(0, 2, (N_SOURCE, SIZE, SIZE, LABEL_NC)).astype(np.float32))
    src_bbox = jnp.asarray(
        rng.integers(0, 2, (N_SOURCE, SIZE, SIZE)).astype(np.float32))
    tar_lbl = jnp.asarray(
        rng.integers(0, 2, (CLIP_FRAMES, SIZE, SIZE, LABEL_NC)).astype(np.float32))
    tar_bbox = jnp.asarray(
        rng.integers(0, 2, (CLIP_FRAMES, SIZE, SIZE)).astype(np.float32))

    # Reduce to a checksum on device: `block_until_ready` is unreliable
    # through the axon relay and full-frame host transfers would time the
    # relay, not the chip. float(checksum) forces complete execution with
    # a 4-byte readback.
    fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=True)
    fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
    args = (params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox)
    log(f"[bench] backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    checksum = float(fn(*args))
    log(f"[bench] compile+first batch: {time.perf_counter() - t0:.1f}s "
        f"(checksum {checksum:.1f})")

    # Pipelined dispatch (how a streaming client runs): enqueue all
    # clips, then sync on the checksums — the device executes the queue
    # back-to-back, so the ~25 ms/call tunnel dispatch latency overlaps
    # compute instead of serializing with it.
    iters = 10
    t0 = time.perf_counter()
    sums = [fn(*args) for _ in range(iters)]
    for s_ in sums:
        float(s_)
    dt = (time.perf_counter() - t0) / iters
    fps = CLIP_FRAMES / dt
    log(f"[bench] ours: {dt * 1e3:.1f} ms / {CLIP_FRAMES} frames "
        f"= {fps:.2f} frames/sec/chip")

    # XLA's own cost model -> FLOPs/frame and MFU against the v5e bf16
    # peak (197 TFLOP/s). Counted on the use_pallas=False lowering: a
    # pallas_call is OPAQUE to cost_analysis, so the kernel-path graph
    # under-counts by every fused kernel's matmuls (transformation,
    # fuse pair block, decoder resblocks — ~100 GFLOP/frame by round 3);
    # the einsum/XLA composition is the same math with every op visible.
    # (Compile-only: nothing from this lowering executes.) Logical
    # FLOPs: the fp32-HIGHEST similarity matmuls physically run more MXU
    # passes than counted here, so true utilization is higher still.
    flops_per_frame = None
    try:
        fwd_ref = functools.partial(tsnet_forward_clip, mods,
                                    use_pallas=False)
        cost = jax.jit(lambda p, *a: fwd_ref(p, *a)).lower(*args).compile(
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_frame = float(cost["flops"]) / CLIP_FRAMES
        log(f"[bench] {flops_per_frame / 1e9:.1f} GFLOP/frame (XLA cost "
            f"analysis)")
    except Exception as e:                            # pragma: no cover
        log(f"[bench] cost_analysis unavailable: {e}")
    return fps, flops_per_frame


V5E_BF16_PEAK = 197e12


def measure_train_step() -> float:
    """ms/step of the full jitted GAN step at the shipped training scale
    (bs=15, 256^2, face config) on one chip."""
    import warnings

    import jax
    import jax.numpy as jnp

    from wacv23_tsnet_tpu.configs import face_config
    from wacv23_tsnet_tpu.models import TSNetModules
    from wacv23_tsnet_tpu.nn import load_vgg19_params
    from wacv23_tsnet_tpu.train.state import create_train_state
    from wacv23_tsnet_tpu.train.step import make_train_step

    # precision="high" is the tier the sustained training runs use
    # (artifacts/round2: stable GAN dynamics, ~40% faster than the
    # "highest" bit-parity tier, which remains available via the CLI).
    # bwd_precision="default" runs the backward convs at one bf16 pass
    # instead of three (ops/dpconv.py): full-generator gradient cosine
    # 0.99947 vs the 3-pass backward, and a matched-seed 500-step A/B
    # tracks every loss within ~2% (artifacts/round4/bwd_ab/).
    # fast_tail=True additionally runs the decoder + FuseNet in
    # bf16/default-MXU during training (the shipped inference fast tier;
    # everything upstream of the attention, the warp supervision, and
    # the losses stay f32): full-generator gradient cosine 0.9937 at
    # this exact scale (artifacts/round4/fast_tail_train.json) and a
    # matched-seed 500-step A/B with healthy parallel GAN trajectories
    # (artifacts/round4/ft_ab/). Both knobs are CLI-exposed
    # (--bwd-precision, --fast-tail); the uniform-f32 "high" tier
    # remains the conservative default of the trainers.
    import dataclasses
    cfg = dataclasses.replace(face_config(), precision="high",
                              bwd_precision="default", fast_tail=True)
    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = load_vgg19_params()
    state = create_train_state(mods, jax.random.PRNGKey(0), vgg_params=vgg)
    rng = np.random.default_rng(0)
    bs, hw, l, s = 15, cfg.image_size, cfg.label_nc, cfg.n_source
    batch = {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((bs, s, hw, hw, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
        "tar_img": rng.random((bs, hw, hw, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (bs, hw, hw)).astype(np.float32),
    }.items()}
    # donate=True is what the real trainer (models/api.py) runs with;
    # it is also required headroom at bs=15 (16 GB HBM)
    step = make_train_step(mods, donate=True)
    t0 = time.perf_counter()
    state, _, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    log(f"[bench] train step compile+1st: {time.perf_counter() - t0:.1f}s")
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    ms = (time.perf_counter() - t0) / iters * 1000
    log(f"[bench] train: {ms:.0f} ms/step (bs=15, 256^2, single-forward)")

    # XLA cost model of the whole compiled D+G step -> train-side MFU.
    # Counted on the use_pallas=False lowering (compile-only): the
    # transformation branch's Pallas forward + flash backward are opaque
    # to cost_analysis, so the kernel-path graph under-counts their
    # matmuls. Logical FLOPs; the 3-pass "high" tier runs extra MXU
    # passes, so true utilization is higher.
    tflops = None
    try:
        # .lower only reads avals (donated buffers are fine)
        step_ref = make_train_step(mods, use_pallas=False, donate=False)
        cost = step_ref.lower(
            state, batch, jnp.float32(2e-4)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        tflops = float(cost["flops"])
        log(f"[bench] train step {tflops / 1e12:.2f} TFLOP -> "
            f"MFU {tflops / (ms / 1e3) / V5E_BF16_PEAK:.3f} vs bf16 peak")
    except Exception as e:                            # pragma: no cover
        log(f"[bench] train cost_analysis unavailable: {e}")
    return ms, tflops


def measure_pose() -> tuple:
    """Pose-variant numbers (VERDICT r3 item 4): streaming clip fps and
    train ms/step at the reference's shipped scale (train_pose.py:24-29 —
    n_source=3, batch 10, label_nc=25, netDF + fg-mask compositing)."""
    import dataclasses
    import functools
    import warnings

    import jax
    import jax.numpy as jnp

    from wacv23_tsnet_tpu.configs import pose_config
    from wacv23_tsnet_tpu.models import TSNetModules
    from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip
    from wacv23_tsnet_tpu.nn import load_vgg19_params
    from wacv23_tsnet_tpu.train.state import create_train_state
    from wacv23_tsnet_tpu.train.step import make_train_step

    # fast_trunk adopted for pose inference on its own measured evidence
    # (netDF-trained weights, bundled dance clip): display drift 0.00031
    # mean L1 / 0.9997 SSIM vs the previous tier, 0.00035 vs the
    # bit-parity anchor; 585.8 -> 677.4 fps
    # (artifacts/round5/pose_fast_trunk_drift.json)
    cfg = dataclasses.replace(pose_config(), precision="high",
                              fast_tail=True, fast_trunk=True)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    l = cfg.label_nc
    src_img = jnp.asarray(rng.random((N_SOURCE, SIZE, SIZE, 3), np.float32))
    src_lbl = jnp.asarray(
        rng.integers(0, 2, (N_SOURCE, SIZE, SIZE, l)).astype(np.float32))
    src_bbox = jnp.asarray(
        rng.integers(0, 2, (N_SOURCE, SIZE, SIZE)).astype(np.float32))
    tar_lbl = jnp.asarray(
        rng.integers(0, 2, (CLIP_FRAMES, SIZE, SIZE, l)).astype(np.float32))
    tar_bbox = jnp.asarray(
        rng.integers(0, 2, (CLIP_FRAMES, SIZE, SIZE)).astype(np.float32))
    fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=True)
    fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
    args = (params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox)
    t0 = time.perf_counter()
    float(fn(*args))
    log(f"[bench] pose clip compile+1st: {time.perf_counter() - t0:.1f}s")
    iters = 10
    t0 = time.perf_counter()
    sums = [fn(*args) for _ in range(iters)]
    for s_ in sums:
        float(s_)
    fps = CLIP_FRAMES / ((time.perf_counter() - t0) / iters)
    log(f"[bench] pose clip: {fps:.2f} frames/sec/chip")
    # free the clip buffers before the train phase — tar_lbl alone is
    # 256 frames x 256^2 x 25ch f32 = 6.7 GB of the 16 GB HBM
    del fn, args, params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox

    # pose train step at the shipped bs=10 (reference train_pose.py:29).
    # The face train tier's recipe (default-precision backward + bf16
    # fast tail) adopted for pose in r05 on pose-side evidence:
    # 687.5 -> 406.5 ms/step; grad cosine 0.974 between tiers
    # (artifacts/round5/pose_train_tier.json) + matched-seed 500-step
    # convergence A/B on the bundled dance data with final-step loss
    # gaps <= 3.6% (artifacts/round5/pose_ab_history.json,
    # runs/{pose_ft,pose_ab_base})
    cfg_t = dataclasses.replace(pose_config(), precision="high",
                                bwd_precision="default", fast_tail=True)
    mods_t = TSNetModules(cfg_t)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = load_vgg19_params()
    state = create_train_state(mods_t, jax.random.PRNGKey(0), vgg_params=vgg)
    bs, s = 10, cfg_t.n_source
    batch = {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((bs, s, SIZE, SIZE, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (bs, s, SIZE, SIZE, l)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (bs, s, SIZE, SIZE)).astype(np.float32),
        "tar_img": rng.random((bs, SIZE, SIZE, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (bs, SIZE, SIZE, l)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (bs, SIZE, SIZE)).astype(np.float32),
    }.items()}
    step = make_train_step(mods_t, donate=True)
    t0 = time.perf_counter()
    state, _, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    log(f"[bench] pose train compile+1st: {time.perf_counter() - t0:.1f}s")
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    ms = (time.perf_counter() - t0) / iters * 1000
    log(f"[bench] pose train: {ms:.0f} ms/step (bs=10, 256^2, netDF)")
    return fps, ms


def measure_torch_reference() -> dict:
    """Per-frame reference-style inference with torch on this host."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    class Block(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.net = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                nn.InstanceNorm2d(dim), nn.ReLU(True),
                nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                nn.InstanceNorm2d(dim))

        def forward(self, x):
            return x + self.net(x)

    def encoder(in_ch, nb):
        layers = [nn.ReflectionPad2d(3), nn.Conv2d(in_ch, 64, 7),
                  nn.InstanceNorm2d(64), nn.ReLU(True)]
        ch = 64
        for _ in range(3):
            layers += [nn.Conv2d(ch, ch * 2, 3, 2, 1),
                       nn.InstanceNorm2d(ch * 2), nn.ReLU(True)]
            ch *= 2
        layers += [Block(ch) for _ in range(nb)]
        return nn.Sequential(*layers)

    def decoder(nb):
        layers = [nn.Conv2d(1024, 512, 1)]
        layers += [Block(512) for _ in range(nb)]
        ch = 512
        for _ in range(3):
            layers += [nn.Upsample(scale_factor=2, mode="bilinear"),
                       nn.ReflectionPad2d(1), nn.Conv2d(ch, ch // 2, 3),
                       nn.InstanceNorm2d(ch // 2), nn.ReLU(True)]
            ch //= 2
        layers += [nn.ReflectionPad2d(3), nn.Conv2d(64, 3, 7), nn.Tanh()]
        return nn.Sequential(*layers)

    img_enc = encoder(3 + LABEL_NC + 3, 9).eval()
    lbl_enc = encoder(LABEL_NC + 3, 0).eval()
    dec = decoder(4).eval()
    fuse = nn.Sequential(Block(1024), nn.Conv2d(1024, 512, 1)).eval()

    rng = np.random.default_rng(0)
    src = torch.from_numpy(
        rng.random((N_SOURCE, 3 + LABEL_NC + 3, SIZE, SIZE), np.float32))
    tar = torch.from_numpy(
        rng.random((1, LABEL_NC + 3, SIZE, SIZE), np.float32))
    grid_lin = torch.linspace(-1, 1, 32)
    gy, gx = torch.meshgrid(grid_lin, grid_lin, indexing="ij")
    grid = torch.stack([gx, gy], -1).reshape(1, 32 * 32, 2)

    def per_frame():
        # the reference demo loop re-encodes every source each frame
        # (demo/demo_face.py:185-192)
        feas = [img_enc(src[i:i + 1]) for i in range(N_SOURCE)]
        tfe = lbl_enc(tar)
        b, c, h, w = tfe.shape
        tn = F.normalize(tfe, dim=1).view(b, c, h * w).transpose(1, 2)
        warped = []
        for fea in feas:
            sn = F.normalize(fea, dim=1).view(b, c, h * w)
            sim = torch.bmm(tn, sn)
            attn = F.softmax(100 * sim, dim=2)
            flow = torch.matmul(attn, grid).view(b, h, w, 2)
            warped.append(F.grid_sample(fea, flow, align_corners=False))
        prop = torch.stack(warped, 1).mean(1)
        syn = torch.stack([fuse(torch.cat([f, tfe], 1)) for f in feas],
                          1).mean(1)
        return dec(torch.cat([prop, syn], 1))

    with torch.no_grad():
        per_frame()  # warmup
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            per_frame()
        dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt
    log(f"[bench] torch reference ({dt * 1e3:.0f} ms/frame) = "
        f"{fps:.2f} frames/sec on CPU")
    return {"frames_per_sec": fps, "device": "cpu",
            "torch_threads": torch.get_num_threads(),
            "note": "reference-style per-frame loop, torch CPU "
                    "(no GPU in this image; reference repo publishes no "
                    "numbers)"}


def get_baseline() -> dict:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    record = measure_torch_reference()
    try:
        with open(CACHE, "w") as f:
            json.dump(record, f, indent=2)
    except OSError:
        pass
    return record


def main():
    baseline = get_baseline()
    fps, flops_per_frame = measure_ours()
    try:
        train_ms, train_flops = measure_train_step()
        train_ms = round(train_ms, 1)
    except Exception as e:                            # pragma: no cover
        log(f"[bench] train-step bench failed: {e}")
        train_ms, train_flops = None, None
    try:
        pose_fps, pose_train_ms = measure_pose()
        pose_fps, pose_train_ms = round(pose_fps, 2), round(pose_train_ms, 1)
    except Exception as e:                            # pragma: no cover
        log(f"[bench] pose bench failed: {e}")
        pose_fps, pose_train_ms = None, None
    record = {
        "metric": "face retargeting streaming inference, 256x256, "
                  "n_source=3, 1 chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        # MFU vs the v5e bf16 peak is the honest hardware-relative
        # number and leads; vs_baseline divides by a torch-CPU
        # denominator (this image has no GPU — see README)
        "mfu_vs_bf16_peak": (round(flops_per_frame * fps / V5E_BF16_PEAK, 4)
                             if flops_per_frame else None),
        "vs_baseline": round(fps / baseline["frames_per_sec"], 2),
        "baseline_device": baseline.get("device", "cpu"),
        # measurement methodology, so cross-round numbers are
        # apples-to-apples (round 1 was serial dispatch, 128-frame clips)
        "dispatch": "pipelined_x10",
        "clip_frames": CLIP_FRAMES,
        "train_ms_per_step": train_ms,
        "train_config": "bs=15, 256^2, face, single jitted D+G step, "
                        "precision=high + bwd_precision=default + "
                        "fast_tail (the sustained-run tier; convergence "
                        "A/Bs in artifacts/round4/{bwd_ab,ft_ab})",
        "pose_fps": pose_fps,
        "pose_train_ms_per_step": pose_train_ms,
        "pose_config": "256^2, label_nc=25, n_source=3, netDF + fg-mask; "
                       "train at the shipped bs=10 (train_pose.py:29), "
                       "high fwd + default bwd + fast_tail (pose-side "
                       "convergence A/B in artifacts/round5/"
                       "pose_ab_history.json)",
    }
    if flops_per_frame:
        record["gflop_per_frame"] = round(flops_per_frame / 1e9, 1)
    else:
        record.pop("mfu_vs_bf16_peak")
    if train_flops and train_ms:
        record["train_tflop_per_step"] = round(train_flops / 1e12, 2)
        record["train_mfu_vs_bf16_peak"] = round(
            train_flops / (train_ms / 1e3) / V5E_BF16_PEAK, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
