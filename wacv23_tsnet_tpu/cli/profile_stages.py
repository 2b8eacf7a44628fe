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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=128)
    p.add_argument("--n-source", type=int, default=3)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--precision", default="high")
    p.add_argument("--no-fast-tail", action="store_true")
    args = p.parse_args()

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
                       return_fea=False)[0],
                   (params, prop_fea, syn_fea))
    print(f"  {'SUM of stages':<28s} {total:8.1f} ms/clip "
          f"({f / total * 1e3:.1f} fps equivalent)")


if __name__ == "__main__":
    main()
