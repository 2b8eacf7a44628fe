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
