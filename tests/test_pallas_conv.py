"""ops.pallas_conv fused resblock kernel vs the XLA composition
(interpret mode on CPU; the real-chip path is exercised by /verify and
the decoder parity check in artifacts/round3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wacv23_tsnet_tpu.nn.blocks import reflect_pad
from wacv23_tsnet_tpu.ops.norms import instance_norm
from wacv23_tsnet_tpu.ops.pallas_conv import conv3x3_in, resblock_fused

RNG = np.random.default_rng(0)


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        reflect_pad(x, 1), k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


def _mk(b=2, h=8, w=8, c=32, co=32, dtype=jnp.float32):
    x = jnp.asarray(RNG.standard_normal((b, h, w, c)), dtype)
    k = jnp.asarray(RNG.standard_normal((3, 3, c, co)) * 0.1, dtype)
    return x, k


@pytest.mark.parametrize("relu", [True, False])
def test_conv3x3_in_matches_composition(relu):
    x, k = _mk()
    got = conv3x3_in(x, k, relu=relu)
    ref = instance_norm(_conv(x, k))
    if relu:
        ref = jax.nn.relu(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_in_skip():
    x, k = _mk()
    skip = jnp.asarray(RNG.standard_normal(x.shape), x.dtype)
    got = conv3x3_in(x, k, skip=skip, relu=False)
    ref = skip + instance_norm(_conv(x, k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_resblock_fused_matches_reference_block():
    """Against the exact ResnetBlock math incl. bias cancellation:
    biases added before IN change nothing."""
    x, k1 = _mk(b=3)
    _, k2 = _mk()
    b1 = jnp.asarray(RNG.standard_normal((32,)), x.dtype)
    got = resblock_fused(x, k1, k2)
    h = jax.nn.relu(instance_norm(_conv(x, k1) + b1))
    ref = x + instance_norm(_conv(h, k2) + 2 * b1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_in_rect_and_widths():
    x, k = _mk(b=1, h=6, w=10, c=16, co=48)
    got = conv3x3_in(x, k, relu=True)
    ref = jax.nn.relu(instance_norm(_conv(x, k)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
