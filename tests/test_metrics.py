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
