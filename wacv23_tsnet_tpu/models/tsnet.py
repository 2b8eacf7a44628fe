"""The TS-Net functional core (pure JAX; reference model/TSNet.py:309-407).

Everything here is jit-compatible and batched over BOTH the batch and the
source axes: the reference's per-source Python loop (model/TSNet.py:336)
becomes a `vmap` over a (B, S, ...) axis, so `set_source_num` is just a
different static S and the whole forward compiles to one XLA program.

Tensor conventions (vs the torch reference):
- NHWC everywhere (TPU-native layout).
- Images live in "model space": (BGR - mean) / 255 (the dataset subtracts
  the mean, `set_*_input` divides by 255; reference
  dataset_video_face.py:136-139, TSNet.py:268,279).
- Labels are one-hot float maps (B, H, W, label_nc).
- bbox masks are float (B, H, W).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..configs import TSNetConfig
from ..losses.image import l1_loss, cosine_align_loss, renorm_to_reference
from ..nn import Decoder, Encoder, FuseNet, PatchDiscriminator
from ..ops.norms import l2_normalize
from ..ops.resize import resize_nearest, _sample_separable
from ..ops.similarity import (transformation_warp_clip,
                              transformation_warp_clip_mean,
                              transformation_warp_sources)
from ..ops.warp import patch_warp


class TSNetModules:
    """Flax module definitions for all TS-Net subnets, from one config."""

    def __init__(self, cfg: TSNetConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.dtype = dt
        feat = cfg.feat_ch
        prec = cfg.precision
        if cfg.remat:
            # rematerialize each subnet's activations in the backward
            # pass (HBM for FLOPs); param trees are unchanged
            import flax.linen as fnn
            enc_cls, dec_cls, fuse_cls, disc_cls = (
                fnn.remat(Encoder), fnn.remat(Decoder), fnn.remat(FuseNet),
                fnn.remat(PatchDiscriminator))
        else:
            enc_cls, dec_cls, fuse_cls, disc_cls = (
                Encoder, Decoder, FuseNet, PatchDiscriminator)
        bwd = cfg.bwd_precision
        # fast_trunk (inference tier): encoder convs at 1-pass bf16 MXU;
        # activations stay f32 and the similarity math keeps its own
        # precision path (see configs.TSNetConfig.fast_trunk)
        trunk_prec = "default" if cfg.fast_trunk else prec
        self.img_enc = enc_cls(ngf=cfg.ngf, n_downsampling=cfg.n_downsampling,
                               n_blocks=cfg.enc_n_blocks,
                               addcoords=cfg.addcoords, dtype=dt,
                               precision=trunk_prec, bwd_precision=bwd,
                               ring_pad=cfg.ring_pad)
        self.lbl_enc = enc_cls(ngf=cfg.ngf, n_downsampling=cfg.n_downsampling,
                               n_blocks=0, addcoords=cfg.addcoords, dtype=dt,
                               precision=trunk_prec, bwd_precision=bwd,
                               ring_pad=cfg.ring_pad)
        tail_dt = jnp.bfloat16 if cfg.fast_tail else dt
        tail_prec = "default" if cfg.fast_tail else prec
        self.dec = dec_cls(output_nc=3, ngf=cfg.ngf,
                           n_downsampling=cfg.n_downsampling,
                           n_blocks=cfg.dec_n_blocks, dtype=tail_dt,
                           precision=tail_prec, bwd_precision=bwd)
        self.fuse_net = fuse_cls(ngf=2 * feat, n_blocks=1, dtype=tail_dt,
                                 precision=tail_prec, bwd_precision=bwd)
        self.netD = disc_cls(ndf=cfg.ndf, n_layers=cfg.d_n_layers,
                             dtype=dt, precision=prec, bwd_precision=bwd)
        self.netDF = (disc_cls(ndf=cfg.ndf, n_layers=cfg.d_n_layers,
                               dtype=dt, precision=prec, bwd_precision=bwd)
                      if cfg.use_face_d else None)

    def init_generator_params(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        hw = cfg.image_size
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        img = jnp.zeros((1, hw, hw, 3 + cfg.label_nc), jnp.float32)
        lbl = jnp.zeros((1, hw, hw, cfg.label_nc), jnp.float32)
        fea = jnp.zeros((1, cfg.feat_size, cfg.feat_size, cfg.feat_ch),
                        jnp.float32)
        return {
            "img_enc": self.img_enc.init(r1, img)["params"],
            "lbl_enc": self.lbl_enc.init(r2, lbl)["params"],
            "dec": self.dec.init(r3, fea, fea)["params"],
            "fuse_net": self.fuse_net.init(r4, fea, fea)["params"],
        }

    def init_discriminator_params(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        hw = cfg.image_size
        r1, r2 = jax.random.split(rng)
        st = jnp.zeros((1, hw, hw, cfg.label_nc + 3), jnp.float32)
        params = {"netD": self.netD.init(r1, st)["params"]}
        if self.netDF is not None:
            face = jnp.zeros((1, hw // 32 * 8, hw // 32 * 8, 3), jnp.float32)
            params["netDF"] = self.netDF.init(r2, face)["params"]
        return params


def get_face_bbox(lbl: jnp.ndarray, h: int, w: int):
    """Data-dependent face crop box from a pose label map (one sample).

    Reimplements reference model/TSNet_pose.py:450-482 with static-shape
    masked min/max arithmetic (the torch version calls `.nonzero()` +
    `.item()`, which cannot trace). Channel -1 is the face class; channels
    1..4 the head classes.

    Returns (yc, xc, length) as traced int32 scalars.
    """
    face_mask = lbl[:, :, -1] > 0
    head_mask = (lbl[:, :, 1] + lbl[:, :, 2] + lbl[:, :, 3] + lbl[:, :, 4]) > 0

    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]

    def extent(mask):
        big = jnp.int32(1 << 20)
        ys = jnp.min(jnp.where(mask, rows, big))
        ye = jnp.max(jnp.where(mask, rows, -big))
        xs = jnp.min(jnp.where(mask, cols, big))
        xe = jnp.max(jnp.where(mask, cols, -big))
        return ys, ye, xs, xe

    def center_from(mask):
        ys, ye, xs, xe = extent(mask)
        xc = (xs + xe) // 2
        yc = (ys * 3 + ye * 2) // 5
        ln = ((xe - xs) * 5) // 2          # int((xe-xs) * 2.5)
        ln = jnp.minimum(w, jnp.maximum(32, ln))
        yc = jnp.maximum(ln // 2, jnp.minimum(h - 1 - ln // 2, yc))
        xc = jnp.maximum(ln // 2, jnp.minimum(w - 1 - ln // 2, xc))
        return yc, xc, ln

    default = (jnp.int32(h // 4), jnp.int32(w // 2), jnp.int32(h // 32 * 8))
    has_face = jnp.any(face_mask)
    has_head = jnp.any(head_mask)
    yc_f, xc_f, ln_f = center_from(face_mask)
    yc_h, xc_h, ln_h = center_from(head_mask)
    yc = jnp.where(has_face, yc_f, jnp.where(has_head, yc_h, default[0]))
    xc = jnp.where(has_face, xc_f, jnp.where(has_head, xc_h, default[1]))
    ln = jnp.where(has_face, ln_f, jnp.where(has_head, ln_h, default[2]))
    return yc, xc, ln


def crop_faces(images: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Crop + resize the face region of each image (pose variant).

    Matches reference `crop_face` (model/TSNet_pose.py:438-448): the
    [ys:ye, xs:xe] crop bilinearly resized to (face_size, face_size) with
    align_corners=True. Implemented as direct bilinear sampling at the
    crop's align-corners sample positions — identical math, static shape,
    batched with vmap instead of the reference's per-sample Python loop.
    """
    b, h, w, _ = images.shape
    face_size = h // 32 * 8

    def one(img, lbl):
        yc, xc, ln = get_face_bbox(lbl, h, w)
        ys = (yc - ln // 2).astype(jnp.float32)
        xs = (xc - ln // 2).astype(jnp.float32)
        # the reference crop is [c - l//2 : c + l//2], i.e. 2*(l//2) rows;
        # align_corners=True samples that span at (L-1)/(face_size-1) steps
        span = (2 * (ln // 2)).astype(jnp.float32) - 1.0
        t = jnp.arange(face_size, dtype=jnp.float32) / (face_size - 1)
        ys_pos = ys + t * span
        xs_pos = xs + t * span
        return _sample_separable(img[None], ys_pos, xs_pos)[0]

    return jax.vmap(one)(images, labels)


def tsnet_forward(
    mods: TSNetModules,
    params: dict,
    src_img: jnp.ndarray,    # (B, S, H, W, 3) model space
    src_lbl: jnp.ndarray,    # (B, S, H, W, L)
    src_bbox: jnp.ndarray,   # (B, S, H, W)
    tar_lbl: jnp.ndarray,    # (B, H, W, L)
    tar_bbox: jnp.ndarray,   # (B, H, W)
    tar_img: Optional[jnp.ndarray] = None,   # (B, H, W, 3), train only
    train: bool = False,
    use_pallas: bool = True,
    return_flow: bool = False,
) -> dict[str, Any]:
    """One TS-Net generator forward (reference model/TSNet.py:309-407)."""
    cfg = mods.cfg
    b, s, hh, ww, _ = src_img.shape
    dt = mods.dtype

    # --- encoders ------------------------------------------------------
    # Plain module path. The folded-stem rewrite (nn.encoder.
    # encoder_apply_fast, round 3) measured as a REGRESSION end to end on
    # the chip: 829 -> 702 ms/step at bs=15 with it off (round-4 bisect,
    # artifacts/round4/logs/bisect_train2.log) — the space-to-depth fold
    # relayouts cost more than the low-occupancy 7x7 stem they replace.
    # Its other role (dodging XLA's space-to-batch backprop-filter
    # CHECK-crash) is covered by the compiler-options fallback in
    # train/step.py.
    def run_img_enc(x):
        return mods.img_enc.apply({"params": params["img_enc"]}, x)

    def run_lbl_enc(x):
        return mods.lbl_enc.apply({"params": params["lbl_enc"]}, x)
    enc_in = jnp.concatenate([src_img, src_lbl], axis=-1).astype(dt)
    src_img_fea = jax.vmap(run_img_enc, in_axes=1, out_axes=1)(enc_in)
    tar_lbl_fea = run_lbl_enc(tar_lbl.astype(dt))      # (B, h, w, C)
    h, w = tar_lbl_fea.shape[1:3]

    # --- transformation branch ----------------------------------------
    tar_fea_n = l2_normalize(tar_lbl_fea.astype(jnp.float32), axis=-1)
    tar_mask = resize_nearest(tar_bbox[..., None], (h, w))[..., 0]
    src_fea_n = l2_normalize(src_img_fea.astype(jnp.float32), axis=-1)
    src_mask = jax.vmap(
        lambda m: resize_nearest(m[..., None], (h, w))[..., 0],
        in_axes=1, out_axes=1)(src_bbox)               # (B, S, h, w)

    warped_fea, flows = transformation_warp_sources(
        src_img_fea.astype(jnp.float32), tar_fea_n, src_fea_n,
        tar_mask, src_mask, temp=cfg.softmax_temp,
        use_pallas=bool(use_pallas),
        fast_warp=cfg.fast_tail,
        # 3-pass backward for the 3-pass training tier; the bit-parity
        # tier keeps the HIGHEST backward (see pallas_similarity)
        bwd_fast3=cfg.precision != "highest")          # (B,S,h,w,C), (B,S,h,w,2)

    out: dict[str, Any] = {}
    if return_flow:
        out["flows"] = flows

    if train:
        assert tar_img is not None
        # image-space warp supervision (reference model/TSNet.py:372-387)
        def warp_img_one(img, flow):
            warped = patch_warp(img.astype(jnp.float32),
                                flow.astype(jnp.float32))
            return renorm_to_reference(warped, tar_img.astype(jnp.float32))

        warp_imgs = jax.vmap(warp_img_one, in_axes=1, out_axes=1)(
            src_img, flows)                            # (B, S, H, W, 3)
        if cfg.use_fg_mask:
            warp_imgs = composite_foreground(warp_imgs, cfg)
        out["warp_imgs"] = warp_imgs
        # 10 * L1 per source, summed over sources
        out["loss_warp"] = 10.0 * jnp.sum(jax.vmap(
            lambda wi: l1_loss(wi, tar_img), in_axes=1)(warp_imgs))

    prop_fea = jnp.mean(warped_fea, axis=1).astype(dt)  # (B, h, w, C)

    # --- synthesis branch ---------------------------------------------
    if mods.fuse_net.n_blocks == 1:
        # exact split: conv1's target half runs once per sample instead
        # of per (sample, source); the final 1x1 commutes with the mean
        from ..nn.fusenet import fuse_train
        syn_fea = fuse_train(params["fuse_net"], src_img_fea.astype(dt),
                             tar_lbl_fea, dtype=mods.fuse_net.dtype,
                             precision=mods.fuse_net.precision,
                             use_pallas=bool(use_pallas),
                             bwd_precision=cfg.bwd_precision,
                             ring_pad=cfg.ring_pad)
    else:
        syn_fea = jnp.mean(jax.vmap(
            lambda f: mods.fuse_net.apply({"params": params["fuse_net"]},
                                          f, tar_lbl_fea),
            in_axes=1, out_axes=1)(src_img_fea), axis=1)  # (B, h, w, C)

    if train and cfg.use_align_loss:
        out["loss_align"] = cosine_align_loss(prop_fea, syn_fea)

    # phase-decomposed decoder (exact; nn.decoder.decoder_apply_fast) —
    # the flax module's upsample stages run high-res/small-channel convs
    # (measured 60.5 -> ~42 ms at the bs=15 train-forward shape)
    from ..nn.decoder import decoder_apply_fast

    def run_dec(pf, sf):
        return decoder_apply_fast(mods.dec, params["dec"], pf, sf,
                                  return_fea=True,
                                  bwd_precision=cfg.bwd_precision,
                                  ring_pad=cfg.ring_pad)

    if cfg.remat:
        run_dec = jax.checkpoint(run_dec)
    rec_img, rec_fea = run_dec(prop_fea, syn_fea)
    rec_img = rec_img.astype(jnp.float32)
    if cfg.use_fg_mask:
        rec_img = composite_foreground(rec_img, cfg)
    out["rec_img"] = rec_img
    out["rec_fea"] = rec_fea
    out["prop_fea"] = prop_fea
    out["syn_fea"] = syn_fea
    return out


def encode_sources(mods: TSNetModules, params: dict, src_img: jnp.ndarray,
                   src_lbl: jnp.ndarray, src_bbox: jnp.ndarray) -> dict:
    """Encode the S reference frames once; returns the device-resident
    source pack reused by every subsequent driving frame.

    Uses the plain module path, NOT the folded-stem rewrite: the round-4
    chip bisect (artifacts/round4/logs/bisect_clip.log) measured the
    folded stem as a 633.7 -> 497.4 ms/clip END-TO-END regression at the
    256-frame bench shape — the space-to-depth fold's relayout costs more
    than the low-occupancy 7x7 stem it replaces. Training keeps the
    folded stem (bisect_train.log: neutral there, and it avoids the
    space-to-batch backprop-filter crash)."""
    dt = mods.dtype
    enc_in = jnp.concatenate([src_img, src_lbl], axis=-1).astype(dt)
    src_fea = mods.img_enc.apply({"params": params["img_enc"]}, enc_in)
    h, w = src_fea.shape[1:3]
    return {
        "fea": src_fea,
        "fea_n": l2_normalize(src_fea.astype(jnp.float32), axis=-1),
        "mask": resize_nearest(src_bbox[..., None], (h, w))[..., 0],
    }


def decode_with_sources(mods: TSNetModules, params: dict, src_pack: dict,
                        tar_lbl: jnp.ndarray, tar_bbox: jnp.ndarray,
                        use_pallas: bool = True) -> jnp.ndarray:
    """Run F driving frames against a pre-encoded source pack."""
    cfg = mods.cfg
    dt = mods.dtype
    f = tar_lbl.shape[0]
    src_fea = src_pack["fea"]
    src_fea_n = src_pack["fea_n"]
    src_mask = src_pack["mask"]

    # plain module stem (round-4 bisect: the folded-stem rewrite is an
    # end-to-end clip regression; see encode_sources)
    tar_fea = mods.lbl_enc.apply({"params": params["lbl_enc"]},
                                 tar_lbl.astype(dt))        # (F, h, w, C)
    h, w = tar_fea.shape[1:3]
    tar_fea_n = l2_normalize(tar_fea.astype(jnp.float32), axis=-1)
    tar_mask = resize_nearest(tar_bbox[..., None], (h, w))[..., 0]

    dec_dt = mods.dec.dtype
    if use_pallas and dec_dt == jnp.bfloat16:
        # fast tail: the mean over sources folds into the kernel — the
        # per-pair (S, F, h, w, C) tensor never reaches HBM and the mean
        # is written directly in the decoder's bf16 (measured faster
        # than pairs+mean only with the halved write; the f32-out
        # variant is slower than the composition, so the bit-parity
        # path keeps the pairs kernel)
        prop_fea = transformation_warp_clip_mean(
            src_fea.astype(jnp.float32), src_fea_n, src_mask,
            tar_fea_n, tar_mask, temp=cfg.softmax_temp,
            fast_warp=cfg.fast_tail, out_dtype=dec_dt)   # (F, h, w, C)
    else:
        warped = transformation_warp_clip(
            src_fea.astype(jnp.float32), src_fea_n, src_mask,
            tar_fea_n, tar_mask, temp=cfg.softmax_temp,
            use_pallas=bool(use_pallas),
            fast_warp=cfg.fast_tail)             # (S, F, h, w, C)
        prop_fea = jnp.mean(warped, axis=0).astype(dt)

    if mods.fuse_net.n_blocks == 1:
        # split form: per-pair work halves, mean commutes with the 1x1
        from ..nn.fusenet import fuse_clip
        syn_fea = fuse_clip(params["fuse_net"], src_fea.astype(jnp.float32),
                            tar_fea.astype(jnp.float32),
                            dtype=mods.fuse_net.dtype,
                            precision=mods.fuse_net.precision,
                            use_pallas=bool(use_pallas),
                            ring_pad=cfg.ring_pad)
    else:
        def fuse_one_source(fea_s):
            fea_b = jnp.broadcast_to(fea_s[None], (f,) + fea_s.shape).astype(dt)
            return mods.fuse_net.apply({"params": params["fuse_net"]},
                                       fea_b, tar_fea)

        syn_fea = jnp.mean(jax.vmap(fuse_one_source)(src_fea), axis=0)

    # use_pallas_blocks=False: the decoder's Pallas resblock kernels are
    # an end-to-end regression at the clip shape (round-4 chip bisect,
    # artifacts/round4/logs/bisect_clip.log: 633.7 -> 533.3 ms/clip with
    # them OFF at HEAD) — XLA's own conv fusion wins here. The kernels
    # remain available for study via decoder_apply_fast directly.
    from ..nn.decoder import decoder_apply_fast
    rec_img, _ = decoder_apply_fast(mods.dec, params["dec"], prop_fea,
                                    syn_fea, return_fea=False,
                                    use_pallas_blocks=False,
                                    ring_pad=cfg.ring_pad)
    rec_img = rec_img.astype(jnp.float32)
    if cfg.use_fg_mask:
        rec_img = composite_foreground(rec_img, cfg)
    return rec_img


def tsnet_forward_clip(
    mods: TSNetModules,
    params: dict,
    src_img: jnp.ndarray,    # (S, H, W, 3) shared reference frames
    src_lbl: jnp.ndarray,    # (S, H, W, L)
    src_bbox: jnp.ndarray,   # (S, H, W)
    tar_lbl: jnp.ndarray,    # (F, H, W, L) whole driving clip
    tar_bbox: jnp.ndarray,   # (F, H, W)
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Whole-clip inference: encode the S references ONCE, batch frames.

    The reference demo re-encodes all sources every frame inside a
    Python loop (demo/demo_face.py:185-192); here source features are
    computed once (`encode_sources`) and every driving frame reuses the
    pack (`decode_with_sources`). Returns (F, H, W, 3) reconstructions.
    """
    src_pack = encode_sources(mods, params, src_img, src_lbl, src_bbox)
    return decode_with_sources(mods, params, src_pack, tar_lbl, tar_bbox,
                               use_pallas=use_pallas)


def composite_foreground(img: jnp.ndarray, cfg: TSNetConfig) -> jnp.ndarray:
    """Fixed foreground-column compositing of the pose variant.

    Reference model/TSNet_pose.py:276-280,395-396,416-417: columns
    64:192 (of 256) are foreground; the background is painted with the
    model-space mean color (-mean/255).
    """
    w = img.shape[-2]
    lo, hi = w // 4, 3 * w // 4
    cols = jnp.arange(w)
    fore = ((cols >= lo) & (cols < hi)).astype(img.dtype)[None, :, None]
    bg = (-cfg.img_mean_array() / 255.0).astype(img.dtype)
    return img * fore + bg * (1.0 - fore)
