"""Per-stage timing of the clip-inference hot path on the current device.

Times each stage of `models.tsnet.decode_with_sources` (lbl_enc,
transformation branch, fuse, decoder) in isolation, amortizing the
per-dispatch tunnel latency by repeating the stage K times inside a
single jitted `lax.scan` with an input perturbation (so XLA cannot CSE
the iterations; see ROUND2.md environment facts — per-call timings of
sub-50 ms ops are meaningless through the ~25 ms axon relay). Arrays are
passed as jit ARGUMENTS, never closures — closure constants inflate the
remote-compile request past the relay's HTTP 413 limit.

Usage: python -m wacv23_tsnet_tpu.cli.profile_stages [--frames 128]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import face_config
from ..models import TSNetModules
from ..models.tsnet import encode_sources
from ..nn.decoder import decoder_apply_fast
from ..nn.fusenet import fuse_clip
from ..ops.norms import l2_normalize
from ..ops.resize import resize_nearest
from ..ops.similarity import (transformation_warp_clip,
                              transformation_warp_clip_mean)


def timed(name: str, fn, args, repeats: int = 8, iters: int = 3) -> float:
    """Median wall time of ONE application of `fn(*args, eps)`,
    amortized over `repeats` scan iterations inside one jit."""

    @jax.jit
    def run(*xs):
        def body(carry, _):
            return carry + 1e-6, jnp.sum(jnp.abs(fn(*xs, carry)))

        return jax.lax.scan(body, jnp.float32(0.0), None,
                            length=repeats)[1].sum()

    float(run(*args))  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*args))
        times.append((time.perf_counter() - t0) / repeats)
    ms = float(np.median(times)) * 1e3
    print(f"  {name:<28s} {ms:8.1f} ms/clip", flush=True)
    return ms


def profile_train(args) -> None:
    """Per-stage timing of the TRAIN step at shipped scale: generator
    forward, forward+backward (vjp), discriminator phase, VGG loss, and
    the full jitted D+G step — so the train-side roofline discussion has
    stage numbers, like the inference path has (VERDICT round-2 item 1)."""
    import warnings

    from ..models.tsnet import tsnet_forward
    from ..nn import VGG19Features, load_vgg19_params
    from ..losses import vgg_perceptual_loss
    from ..train.state import create_train_state
    from ..train.step import make_train_step

    cfg = dataclasses.replace(face_config(), precision=args.precision,
                              bwd_precision=args.bwd_precision,
                              fast_tail=not args.no_fast_tail)
    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg_params = load_vgg19_params()
    state = create_train_state(mods, jax.random.PRNGKey(0),
                               vgg_params=vgg_params)
    rng = np.random.default_rng(0)
    bs, hw, l, s = args.batch_size, cfg.image_size, cfg.label_nc, \
        cfg.n_source
    batch = {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((bs, s, hw, hw, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
        "tar_img": rng.random((bs, hw, hw, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (bs, hw, hw)).astype(np.float32),
    }.items()}
    print(f"device={jax.devices()[0]} TRAIN bs={bs} {hw}^2 "
          f"precision={cfg.precision} bwd_precision={cfg.bwd_precision} "
          f"fast_tail={cfg.fast_tail}", flush=True)

    def gen_fwd(p_, b_, eps):
        out = tsnet_forward(
            mods, p_, b_["src_img"] + eps, b_["src_lbl"], b_["src_bbox"],
            b_["tar_lbl"], b_["tar_bbox"], tar_img=b_["tar_img"], train=True)
        return out["rec_img"] + out["loss_warp"]

    def gen_fwd_bwd(p_, b_, eps):
        val, vjp = jax.vjp(lambda q: gen_fwd(q, b_, eps), p_)
        (g,) = vjp(jnp.ones_like(val))
        return val + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    def disc_fwd_bwd(p_, b_, rec, eps):
        def loss(q):
            fake = jnp.concatenate([b_["tar_lbl"], rec + eps], axis=-1)
            real = jnp.concatenate([b_["tar_lbl"], b_["tar_img"]], axis=-1)
            pf = mods.netD.apply({"params": q}, fake)
            pr = mods.netD.apply({"params": q}, real)
            return sum(jnp.sum(jnp.abs(t)) for t in pf + pr)

        val, g = jax.value_and_grad(loss)(p_["netD"])
        return val + sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))

    vgg_net = VGG19Features(dtype=mods.dtype, precision=cfg.precision)

    def vgg_fwd_bwd(vp, rec, tar, eps):
        def loss(r):
            return vgg_perceptual_loss(vgg_net, vp, r, tar)

        val, g = jax.value_and_grad(loss)(rec + eps)
        return val + jnp.sum(jnp.abs(g))

    rec = jnp.asarray(rng.random((bs, hw, hw, 3), np.float32))
    total_fwd = timed("generator forward", gen_fwd,
                      (state.gen_params, batch), repeats=4)
    fwdbwd = timed("generator fwd+bwd (vjp)", gen_fwd_bwd,
                   (state.gen_params, batch), repeats=4)
    print(f"  {'-> generator backward':<28s} {fwdbwd - total_fwd:8.1f} "
          f"ms (difference)")
    timed("netD fwd+bwd (fake+real)", disc_fwd_bwd,
          (state.disc_params, batch, rec), repeats=4)
    timed("VGG loss fwd+bwd", vgg_fwd_bwd,
          (state.vgg_params, rec, batch["tar_img"]), repeats=4)

    # donate=True matches the shipped trainer (models/api.py) and
    # bench.py — without donation XLA copies params + Adam moments every
    # step, which inflated this line by ~200 ms vs the bench number.
    step = make_train_step(mods, donate=True)
    lr = jnp.float32(2e-4)
    state, m, r = step(state, batch, lr)  # compile
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        state, m, r = step(state, batch, lr)
    jax.block_until_ready(r)
    print(f"  {'FULL jitted D+G step':<28s} "
          f"{(time.perf_counter() - t0) / iters * 1e3:8.1f} ms (donated)")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--n-source", type=int, default=3)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--precision", default="high")
    p.add_argument("--no-fast-tail", action="store_true")
    p.add_argument("--train", action="store_true",
                   help="profile the TRAIN step stages instead")
    p.add_argument("--batch-size", type=int, default=15)
    p.add_argument("--bwd-precision", default=None,
                   help="backward-conv MXU tier (train profile); "
                        "'default' matches the benched dual-precision tier")
    args = p.parse_args()
    if args.train:
        profile_train(args)
        return

    cfg = dataclasses.replace(face_config(), precision=args.precision,
                              fast_tail=not args.no_fast_tail)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    s, f, hw, l = args.n_source, args.frames, args.size, cfg.label_nc
    src_img = jnp.asarray(rng.random((s, hw, hw, 3), np.float32))
    src_lbl = jnp.asarray(rng.integers(0, 2, (s, hw, hw, l)).astype(np.float32))
    src_bbox = jnp.asarray(rng.integers(0, 2, (s, hw, hw)).astype(np.float32))
    tar_lbl = jnp.asarray(rng.integers(0, 2, (f, hw, hw, l)).astype(np.float32))
    tar_bbox = jnp.asarray(rng.integers(0, 2, (f, hw, hw)).astype(np.float32))

    print(f"device={jax.devices()[0]} frames={f} n_source={s} "
          f"precision={cfg.precision} fast_tail={cfg.fast_tail}", flush=True)

    pack = jax.jit(
        lambda p_, a, b, c: encode_sources(mods, p_, a, b, c))(
            params, src_img, src_lbl, src_bbox)
    dt = mods.dtype

    # plain module stem, matching decode_with_sources (the folded-stem
    # rewrite was reverted for the clip path by the round-4 bisect)
    run_lbl = lambda p_, x, eps: mods.lbl_enc.apply(
        {"params": p_["lbl_enc"]}, x.astype(dt) + eps)
    tar_fea = jax.jit(lambda p_, x: run_lbl(p_, x, 0.0))(params, tar_lbl)
    h, w = tar_fea.shape[1:3]
    tar_fea_n = l2_normalize(tar_fea.astype(jnp.float32), axis=-1)
    tar_mask = resize_nearest(tar_bbox[..., None], (h, w))[..., 0]

    dec_dt = mods.dec.dtype
    if dec_dt == jnp.bfloat16:
        # mirrors decode_with_sources: mean-over-sources folded into the
        # kernel, written in the decoder's bf16
        run_warp = lambda fea, fea_n, msk, tfn, tm, eps: (
            transformation_warp_clip_mean(
                fea.astype(jnp.float32), fea_n, msk, tfn + eps, tm,
                temp=cfg.softmax_temp, fast_warp=cfg.fast_tail,
                out_dtype=dec_dt))
        warp_label = "transform+warp+mean (pallas)"
    else:
        run_warp = lambda fea, fea_n, msk, tfn, tm, eps: jnp.mean(
            transformation_warp_clip(
                fea.astype(jnp.float32), fea_n, msk, tfn + eps, tm,
                temp=cfg.softmax_temp, use_pallas=True,
                fast_warp=cfg.fast_tail), axis=0).astype(dec_dt)
        warp_label = "transform+warp, mean (pallas)"
    warp_args = (pack["fea"], pack["fea_n"], pack["mask"], tar_fea_n, tar_mask)
    prop_fea = jax.jit(lambda *a: run_warp(*a, 0.0))(*warp_args)

    run_fuse = lambda p_, fea, tf, eps: fuse_clip(
        p_["fuse_net"], fea.astype(jnp.float32), tf.astype(jnp.float32) + eps,
        dtype=mods.fuse_net.dtype, precision=mods.fuse_net.precision)
    syn_fea = jax.jit(lambda p_, a, b: run_fuse(p_, a, b, 0.0))(
        params, pack["fea"], tar_fea)

    total = 0.0
    total += timed("lbl_enc", run_lbl, (params, tar_lbl))
    total += timed(warp_label, run_warp, warp_args)
    total += timed("fuse (split form)", run_fuse,
                   (params, pack["fea"], tar_fea))
    total += timed("decoder (fast)",
                   lambda p_, pf, sf, eps: decoder_apply_fast(
                       mods.dec, p_["dec"], pf + eps.astype(pf.dtype), sf,
                       return_fea=False,
                       # False matches decode_with_sources (round-4 bisect:
                       # the Pallas resblocks lose end-to-end at this shape)
                       use_pallas_blocks=False)[0],
                   (params, prop_fea, syn_fea))
    print(f"  {'SUM of stages':<28s} {total:8.1f} ms/clip "
          f"({f / total * 1e3:.1f} fps equivalent)")


if __name__ == "__main__":
    main()
