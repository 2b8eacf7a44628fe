"""The jitted GAN train step (reference model/TSNet.py:432-460).

One `train_step` call performs the reference's full
`optimize_parameters`: D update on (stop-gradiented fake, real), then G
update against the UPDATED discriminator — reproducing the exact
torch ordering (D.step() happens before G's backward touches netD). The
pose variant adds the face-crop discriminator to both phases
(model/TSNet_pose.py:509-542).

`stop_gradient` replaces `.detach()`/`set_requires_grad`; the learning
rate enters as a traced scalar so the poly schedule never retriggers
compilation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..losses import (feature_matching_loss, gradient_loss, lsgan_loss,
                      vgg_perceptual_loss)
from ..models.tsnet import TSNetModules, crop_faces, tsnet_forward
from ..nn import VGG19Features
from .state import TSNetTrainState, adam_transform


def make_train_step(mods: TSNetModules, lambda_dec: float = 1.0,
                    d_lr_factor: float = 0.5, beta1: float = 0.5,
                    use_pallas: bool = True, donate: bool = True,
                    single_forward: bool = True):
    """Build the jitted train step for this model configuration.

    `single_forward=True` (default) runs the generator forward ONCE per
    step, like the torch reference, whose single autograd graph serves
    both the (detached) D update and the G update
    (model/TSNet.py:432-460): the forward runs under `jax.vjp`, the D
    phase consumes the stop-gradiented reconstruction, and the G-phase
    loss — evaluated against the UPDATED discriminator — backpropagates
    through the saved vjp. `False` keeps the two-forward formulation
    (one `train=False` forward for the D fake, one inside the G grad
    closure); XLA cannot CSE across the value_and_grad boundary, so it
    really does pay the extra generator forward.
    """
    cfg = mods.cfg
    opt = adam_transform(beta1=beta1)
    # the perceptual-loss network follows the model's precision tier:
    # torch's reference VGG runs plain f32 (~= the 3-pass "high" tier);
    # a hardcoded HIGHEST spent 6 passes on a loss signal (measured
    # 131 -> ~70 ms of the bs=15 step)
    vgg = VGG19Features(dtype=mods.dtype, precision=cfg.precision,
                        bwd_precision=cfg.bwd_precision)

    def d_losses(disc_params, batch, rec_img):
        fake_st = jnp.concatenate([batch["tar_lbl"], rec_img], axis=-1)
        real_st = jnp.concatenate([batch["tar_lbl"], batch["tar_img"]], axis=-1)
        pred_fake = mods.netD.apply({"params": disc_params["netD"]}, fake_st)
        pred_real = mods.netD.apply({"params": disc_params["netD"]}, real_st)
        loss_d_fake = lsgan_loss(pred_fake[-1], False)
        loss_d_real = lsgan_loss(pred_real[-1], True)
        losses = {"D_fake": loss_d_fake, "D_real": loss_d_real,
                  "D": 0.5 * (loss_d_fake + loss_d_real)}
        total = losses["D"]
        if cfg.use_face_d:
            fake_face = crop_faces(rec_img, batch["tar_lbl"])
            real_face = crop_faces(batch["tar_img"], batch["tar_lbl"])
            pf = mods.netDF.apply({"params": disc_params["netDF"]}, fake_face)
            pr = mods.netDF.apply({"params": disc_params["netDF"]}, real_face)
            losses["DF_fake"] = lsgan_loss(pf[-1], False)
            losses["DF_real"] = lsgan_loss(pr[-1], True)
            losses["DF"] = 0.5 * (losses["DF_fake"] + losses["DF_real"])
            total = total + losses["DF"]
        return total, losses

    def gen_outputs(gen_params, batch):
        """The generator forward; returns exactly the values the G loss
        reads, so its vjp closes over one forward's residuals."""
        out = tsnet_forward(
            mods, gen_params,
            batch["src_img"], batch["src_lbl"], batch["src_bbox"],
            batch["tar_lbl"], batch["tar_bbox"], tar_img=batch["tar_img"],
            train=True, use_pallas=use_pallas)
        align = out["loss_align"] if cfg.use_align_loss else jnp.float32(0.0)
        return out["rec_img"], out["loss_warp"], align

    def g_losses(outs, disc_params, vgg_params, batch):
        rec, loss_warp, loss_align = outs
        tar = batch["tar_img"]
        fake_st = jnp.concatenate([batch["tar_lbl"], rec], axis=-1)
        real_st = jnp.concatenate([batch["tar_lbl"], tar], axis=-1)
        pred_fake = mods.netD.apply({"params": disc_params["netD"]}, fake_st)
        pred_real = mods.netD.apply({"params": disc_params["netD"]}, real_st)
        pred_real = jax.lax.stop_gradient(pred_real)
        losses = {
            "G_GAN": lsgan_loss(pred_fake[-1], True),
            "G_FML": feature_matching_loss(pred_fake, pred_real,
                                           cfg.lambda_fml),
            "G_VGG": cfg.lambda_vgg * vgg_perceptual_loss(
                vgg, vgg_params, rec, jax.lax.stop_gradient(tar)),
            "grad_G": cfg.lambda_grad * gradient_loss(rec, tar),
            "warp": loss_warp,
        }
        losses["G"] = losses["G_GAN"] + losses["G_FML"] + losses["G_VGG"]
        total = losses["G"] + losses["grad_G"] + losses["warp"]
        if cfg.use_align_loss:
            losses["align"] = loss_align
            total = total + losses["align"]
        if cfg.use_face_d:
            fake_face = crop_faces(rec, batch["tar_lbl"])
            real_face = jax.lax.stop_gradient(
                crop_faces(tar, batch["tar_lbl"]))
            pf = mods.netDF.apply({"params": disc_params["netDF"]}, fake_face)
            pr = jax.lax.stop_gradient(
                mods.netDF.apply({"params": disc_params["netDF"]}, real_face))
            losses["GF_GAN"] = lsgan_loss(pf[-1], True)
            losses["GF_FML"] = feature_matching_loss(pf, pr, cfg.lambda_fml)
            losses["GF_VGG"] = cfg.lambda_vgg * vgg_perceptual_loss(
                vgg, vgg_params, fake_face, real_face)
            losses["GF"] = (losses["GF_GAN"] + losses["GF_FML"]
                            + losses["GF_VGG"])
            total = total + losses["GF"]
        return total, losses

    def train_step(state: TSNetTrainState, batch: dict[str, Any],
                   lr: jax.Array):
        # ---- generator forward (ONCE), vjp saved for the G phase -------
        if single_forward:
            outs, gen_vjp = jax.vjp(
                lambda gp: gen_outputs(gp, batch), state.gen_params)
        else:
            outs = gen_outputs(state.gen_params, batch)
        rec = outs[0]
        rec_detached = jax.lax.stop_gradient(rec)

        # ---- D phase: fake from the CURRENT generator, detached --------
        (_, d_metrics), d_grads = jax.value_and_grad(
            d_losses, has_aux=True)(state.disc_params, batch, rec_detached)
        d_updates, disc_opt_state = opt.update(d_grads, state.disc_opt_state,
                                               state.disc_params)
        d_updates = jax.tree.map(lambda u: -(d_lr_factor * lr) * u, d_updates)
        disc_params = jax.tree.map(lambda p, u: p + u,
                                   state.disc_params, d_updates)

        # ---- G phase: against the UPDATED discriminator ----------------
        if single_forward:
            (_, g_metrics), out_cts = jax.value_and_grad(
                g_losses, has_aux=True)(outs, disc_params,
                                        state.vgg_params, batch)
            (g_grads,) = gen_vjp(out_cts)
        else:
            (_, g_metrics), g_grads = jax.value_and_grad(
                lambda gp: g_losses(gen_outputs(gp, batch), disc_params,
                                    state.vgg_params, batch),
                has_aux=True)(state.gen_params)
        g_updates, gen_opt_state = opt.update(g_grads, state.gen_opt_state,
                                              state.gen_params)
        subnet_lr = {"img_enc": lr, "lbl_enc": lr, "dec": lambda_dec * lr,
                     "fuse_net": lr}
        g_updates = {
            name: jax.tree.map(lambda u: -subnet_lr[name] * u, tree)
            for name, tree in g_updates.items()
        }
        gen_params = jax.tree.map(lambda p, u: p + u,
                                  state.gen_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
        )
        metrics = {**d_metrics, **g_metrics}
        return new_state, metrics, rec

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    # XLA:TPU workaround: on this stack, certain train-step graph
    # variants (the CLI trainer's uint8-wire step at bs=15; any step
    # with lambda_vgg=0) CHECK-crash the compiler in
    # SpaceToBatchConverter::PropagateOnBackpropFilterConv
    # ("halo_size - low_padding <= spatial_split_size (30 vs. 5)",
    # space_to_batch_converter.cc:543 — the remote compile helper dies
    # with SIGABRT). Env vars (LIBTPU_INIT_ARGS/XLA_FLAGS) do NOT reach
    # the remote helper; per-compile `compiler_options` travel with the
    # request, so on that specific failure we AOT-recompile the same
    # lowering with the pass disabled and cache the executable per
    # input signature. Training loops have fixed shapes, so the cache
    # holds one entry in practice.
    compiled_cache: dict = {}

    def _sig(*args):
        return tuple((tuple(l.shape), str(l.dtype))
                     for l in jax.tree.leaves(args))

    def step_call(state, batch, lr):
        if compiled_cache:
            hit = compiled_cache.get(_sig(state, batch, lr))
            if hit is not None:
                return hit(state, batch, lr)
        try:
            return jitted(state, batch, lr)
        except jax.errors.JaxRuntimeError as e:   # pragma: no cover
            msg = str(e)
            if "SIGABRT" not in msg and "space_to_batch" not in msg:
                raise
            # xla_disable_hlo_passes is a DebugOptions field, so it is
            # serialized INTO the compile request (the libtpu absl flag
            # xla_tpu_run_space_to_batch is not — setting it only
            # affects the local process, which isn't where the remote
            # helper crashes)
            compiled = jitted.lower(state, batch, lr).compile(
                compiler_options={
                    "xla_disable_hlo_passes": "space-to-batch-converter"})
            compiled_cache[_sig(state, batch, lr)] = compiled
            return compiled(state, batch, lr)

    step_call.lower = jitted.lower        # bench/profiling cost analysis
    return step_call
