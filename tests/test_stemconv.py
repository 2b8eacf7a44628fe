"""Folded stem conv (ops.stemconv) + encoder_apply_fast parity vs the
flax Encoder module."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wacv23_tsnet_tpu.nn.blocks import reflect_pad
from wacv23_tsnet_tpu.nn.encoder import Encoder, encoder_apply_fast
from wacv23_tsnet_tpu.ops.stemconv import (depth_to_space, fold_kernel,
                                           space_to_depth,
                                           stem_conv7_fold4)

RNG = np.random.default_rng(0)


def test_space_depth_roundtrip():
    x = jnp.asarray(RNG.standard_normal((2, 16, 16, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 4), 4)), np.asarray(x))


def test_fold_kernel_is_a_scatter():
    """Every original tap value appears; no arithmetic is done on them."""
    k = jnp.asarray(RNG.standard_normal((7, 7, 2, 3)), jnp.float32)
    kf = np.asarray(fold_kernel(k, 4))
    vals = np.sort(np.abs(kf[np.abs(kf) > 0]))
    want = np.sort(np.abs(np.asarray(k)).ravel())
    # each tap lands once per (output phase) pair -> 16 copies
    assert vals.size == want.size * 16
    np.testing.assert_array_equal(vals.reshape(-1, 16)[:, 0], want)


@pytest.mark.parametrize("hw,ci", [(32, 5), (64, 28)])
def test_stem_conv7_fold4_exact(hw, ci):
    x = jnp.asarray(RNG.standard_normal((2, hw, hw, ci)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((7, 7, ci, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(RNG.standard_normal((16,)), jnp.float32)
    got = depth_to_space(stem_conv7_fold4(x, k, b, precision="highest"), 4)
    want = jax.lax.conv_general_dilated(
        reflect_pad(x, 3), k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_encoder_apply_fast_matches_module(dtype):
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    prec = "default" if dtype == "bfloat16" else "highest"
    enc = Encoder(ngf=8, n_downsampling=2, n_blocks=1, addcoords=True,
                  normalization=True, dtype=dt, precision=prec)
    x = jnp.asarray(RNG.standard_normal((2, 32, 32, 2)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    want = enc.apply({"params": params}, x)
    got = encoder_apply_fast(enc, params, x)
    tol = 3e-2 if dtype == "bfloat16" else 2e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol)


def test_encoder_apply_fast_shipped_shape():
    """lbl_enc at the shipped 256^2 config shape (tiny channel widths)."""
    enc = Encoder(ngf=4, n_downsampling=3, n_blocks=0, addcoords=True,
                  dtype=jnp.float32, precision="highest")
    x = jnp.asarray(RNG.standard_normal((1, 256, 256, 2)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    want = enc.apply({"params": params}, x)
    got = encoder_apply_fast(enc, params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
