"""Image-space losses (reference model/TSNet.py:372-405,462-470,515-520)."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def gradient_loss(fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    """L1 between |finite differences| of fake vs real (NHWC).

    Matches reference grad_loss/gradientx/gradienty (model/TSNet.py:462-470,
    515-520): horizontal + vertical difference maps, abs, L1.
    """
    fx = fake[:, :, :-1, :] - fake[:, :, 1:, :]
    fy = fake[:, :-1, :, :] - fake[:, 1:, :, :]
    rx = real[:, :, :-1, :] - real[:, :, 1:, :]
    ry = real[:, :-1, :, :] - real[:, 1:, :, :]
    return l1_loss(jnp.abs(rx), jnp.abs(fx)) + l1_loss(jnp.abs(ry), jnp.abs(fy))


def cosine_align_loss(prop_fea: jnp.ndarray, syn_fea: jnp.ndarray,
                      eps: float = 1e-8) -> jnp.ndarray:
    """1 - mean cosine similarity over the channel axis (NHWC).

    Matches `1 - F.cosine_similarity(..., dim=1).mean()`
    (reference model/TSNet.py:402-405), including torch's eps clamp of the
    norm product.
    """
    a = prop_fea.astype(jnp.float32)
    b = syn_fea.astype(jnp.float32)
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.sqrt(jnp.sum(a * a, axis=-1))
    nb = jnp.sqrt(jnp.sum(b * b, axis=-1))
    cos = dot / jnp.maximum(na * nb, eps)
    return 1.0 - jnp.mean(cos)


def renorm_to_reference(img: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Shift/scale `img` per (sample, channel) to `ref`'s mean/std (NHWC).

    Matches the reference's warp-image renormalization
    (model/TSNet.py:380-384): statistics over all pixels per channel,
    torch's UNBIASED std (ddof=1).
    """
    def stats(x):
        flat = x.reshape(x.shape[0], -1, x.shape[-1]).astype(jnp.float32)
        mean = jnp.mean(flat, axis=1)
        var = jnp.var(flat, axis=1, ddof=1)
        return mean[:, None, None, :], jnp.sqrt(var)[:, None, None, :]

    gen_mean, gen_std = stats(img)
    ref_mean, ref_std = stats(ref)
    return (img - gen_mean) / gen_std * ref_std + ref_mean
