"""Evaluation metrics.

The reference repo ships NO metric code (SURVEY.md §5: "No structured
metrics... no eval metric (SSIM/LPIPS/FID) code in the repo at all");
the paper reports SSIM/LPIPS/AKD/FID. This module provides the
self-contained ones (L1, PSNR, SSIM, AKD) as jit-compatible functions so
evaluations run on device. LPIPS/FID need pretrained nets; a converted
VGG (nn.vgg) can serve as an LPIPS-style distance via
`vgg_feature_distance`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(a - b))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM over (B, H, W, C) images (standard 11x11 sigma-1.5)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    kernel = _gaussian_kernel()[:, :, None, None]

    def filt(x):
        b_, h, w, c = x.shape
        x = x.transpose(0, 3, 1, 2).reshape(b_ * c, 1, h, w)
        # HIGHEST: the sigma = E[x^2] - E[x]^2 cancellation destroys
        # SSIM (values far outside [-1, 1]) if the window conv runs in
        # the default single bf16 pass on TPU
        y = lax.conv_general_dilated(
            x.astype(jnp.float32), kernel.transpose(2, 3, 0, 1), (1, 1),
            "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)
        oh, ow = y.shape[2:]
        return y.reshape(b_, c, oh, ow).transpose(0, 2, 3, 1)

    mu_a = filt(a)
    mu_b = filt(b)
    sigma_a = filt(a * a) - mu_a * mu_a
    sigma_b = filt(b * b) - mu_b * mu_b
    sigma_ab = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sigma_ab + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (sigma_a + sigma_b + c2)
    return jnp.mean(num / den)


def average_keypoint_distance(pred_kp: jnp.ndarray,
                              true_kp: jnp.ndarray) -> jnp.ndarray:
    """AKD over (..., K, 2) keypoint arrays; invalid (0,0) points skipped."""
    valid = jnp.all(true_kp != 0, axis=-1) & jnp.all(pred_kp != 0, axis=-1)
    d = jnp.linalg.norm(pred_kp - true_kp, axis=-1)
    return jnp.sum(jnp.where(valid, d, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def vgg_feature_distance(vgg_module, vgg_params, a: jnp.ndarray,
                         b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS-style perceptual distance: mean L2 between unit-normalized
    VGG19 activations at the five tap layers."""
    fa = vgg_module.apply(vgg_params, a)
    fb = vgg_module.apply(vgg_params, b)
    total = 0.0
    for xa, xb in zip(fa, fb):
        na = xa / jnp.maximum(
            jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
        nb = xb / jnp.maximum(
            jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
        total = total + jnp.mean(jnp.square(na - nb))
    return total / 5.0
