"""GAN objectives (reference model/networks.py:213-279).

TS-Net trains with the lsgan objective (MSE to 1/0 targets,
model/TSNet.py:231) plus a feature-matching L1 over the PatchGAN's
intermediate activations (model/TSNet.py:425-427).
"""

from __future__ import annotations

import jax.numpy as jnp


def lsgan_loss(pred: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    """MSE of the patch logit map against a 1.0/0.0 target."""
    target = 1.0 if target_is_real else 0.0
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


def gan_loss(pred: jnp.ndarray, target_is_real: bool,
             mode: str = "lsgan") -> jnp.ndarray:
    """The full GANLoss objective zoo (reference networks.py:213-279):
    lsgan (MSE), vanilla (BCE-with-logits), wgangp (mean)."""
    pred = pred.astype(jnp.float32)
    if mode == "lsgan":
        return lsgan_loss(pred, target_is_real)
    if mode == "vanilla":
        target = 1.0 if target_is_real else 0.0
        # BCEWithLogits: max(x,0) - x*t + log(1 + exp(-|x|))
        return jnp.mean(jnp.maximum(pred, 0) - pred * target
                        + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    if mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise NotImplementedError(f"gan mode {mode} not implemented")


def gradient_penalty(disc_apply, real: jnp.ndarray, fake: jnp.ndarray,
                     rng, kind: str = "mixed", constant: float = 1.0,
                     lambda_gp: float = 10.0) -> jnp.ndarray:
    """WGAN-GP penalty (reference cal_gradient_penalty,
    networks.py:282-316): ||grad_D(x_interp)||_2 driven to `constant`.

    `disc_apply(x) -> logits`; interpolation per sample for kind="mixed".
    """
    import jax

    if lambda_gp <= 0.0:
        return jnp.float32(0.0)
    if kind == "real":
        x = real
    elif kind == "fake":
        x = fake
    elif kind == "mixed":
        alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) *
                                   (real.ndim - 1))
        x = alpha * real + (1.0 - alpha) * fake
    else:
        raise NotImplementedError(f"{kind} not implemented")

    def scalar_out(xi):
        return jnp.sum(disc_apply(xi[None]))

    grads = jax.vmap(jax.grad(scalar_out))(x)
    flat = grads.reshape(x.shape[0], -1) + 1e-16
    norms = jnp.sqrt(jnp.sum(flat * flat, axis=1))
    return jnp.mean((norms - constant) ** 2) * lambda_gp


def feature_matching_loss(fake_feats, real_feats, weight: float) -> jnp.ndarray:
    """Sum of weighted L1s over all intermediate D features (not the logit).

    The reference weights EACH level by lambda_FML and stops gradients
    into the real branch (model/TSNet.py:426-427); callers pass
    already-stop-gradiented real features.
    """
    loss = 0.0
    for f, r in zip(fake_feats[:-1], real_feats[:-1]):
        loss += weight * jnp.mean(
            jnp.abs(f.astype(jnp.float32) - r.astype(jnp.float32)))
    return loss
