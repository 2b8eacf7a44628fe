"""Metrics sanity + torch-free SSIM validation against known values."""

import numpy as np
import jax.numpy as jnp

from wacv23_tsnet_tpu.infer.metrics import (average_keypoint_distance, l1,
                                            psnr, ssim)

RNG = np.random.default_rng(33)


def test_identity_metrics():
    x = jnp.asarray(RNG.random((2, 32, 32, 3), np.float32))
    assert float(l1(x, x)) == 0.0
    assert float(psnr(x, x)) > 100.0
    assert abs(float(ssim(x, x)) - 1.0) < 1e-5


def test_metric_ordering():
    x = jnp.asarray(RNG.random((1, 64, 64, 3), np.float32))
    small = x + 0.01 * jnp.asarray(RNG.standard_normal(x.shape), jnp.float32)
    big = x + 0.2 * jnp.asarray(RNG.standard_normal(x.shape), jnp.float32)
    assert float(psnr(x, small)) > float(psnr(x, big))
    assert float(ssim(x, small)) > float(ssim(x, big))
    assert float(l1(x, small)) < float(l1(x, big))


def test_ssim_stays_in_range_on_natural_images():
    """The sigma = E[x^2] - E[x]^2 cancellation silently produced SSIM
    values like 51224 when the window conv ran in one bf16 pass (caught
    on real training-eval montages); the metric must stay in [-1, 1] on
    smooth, correlated content, not just white noise."""
    yy, xx = np.meshgrid(np.linspace(0, 4, 96), np.linspace(0, 4, 96),
                         indexing="ij")
    base = 0.4 + 0.3 * np.sin(yy * 2.1) * np.cos(xx * 1.7)
    a = np.repeat(base[None, :, :, None], 3, -1).astype(np.float32)
    b = np.clip(a + 0.05 * RNG.standard_normal(a.shape), 0, 1).astype(
        np.float32)
    v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= v <= 1.0, v
    assert v > 0.3, v


def test_akd():
    kp = RNG.uniform(0, 100, (4, 25, 2))
    shifted = kp + 3.0
    akd = float(average_keypoint_distance(jnp.asarray(shifted),
                                          jnp.asarray(kp)))
    assert abs(akd - 3.0 * np.sqrt(2)) < 1e-4
    # invalid points excluded
    kp2 = kp.copy()
    kp2[:, :5] = 0.0
    akd2 = float(average_keypoint_distance(jnp.asarray(shifted),
                                           jnp.asarray(kp2)))
    assert abs(akd2 - 3.0 * np.sqrt(2)) < 1e-4
