"""Dual-precision conv (ops/dpconv.py): exactness of the escape hatch,
gradient fidelity of the fast backward, and end-to-end train-step wiring.

The contract: with `bwd_precision=None` (or equal to the forward tier)
the op IS `lax.conv_general_dilated` under normal AD — bit-identical
values AND gradients — so every existing parity test covers the default.
With a lower backward tier, the forward stays bit-identical and only
the two backward convs change precision (on CPU all tiers execute in
f32, so the gradient equality here checks the TRANSPOSITION, not the
rounding; the rounding is measured on chip in
artifacts/round4/bwd_precision/).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wacv23_tsnet_tpu.nn.blocks import DPConv, conv_init
from wacv23_tsnet_tpu.ops.dpconv import conv2d_dp


def _loss(y):
    return jnp.sum(y * jnp.cos(y))


@pytest.mark.parametrize("strides,padding", [
    ((1, 1), "VALID"),
    ((2, 2), ((1, 1), (1, 1))),
])
def test_conv2d_dp_default_is_plain_conv(strides, padding):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)

    def ref(x_, w_):
        return _loss(jax.lax.conv_general_dilated(
            x_, w_, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST))

    def dp(x_, w_):
        return _loss(conv2d_dp(x_, w_, strides, padding,
                               precision="highest", bwd_precision=None))

    v0, g0 = jax.value_and_grad(ref, argnums=(0, 1))(x, w)
    v1, g1 = jax.value_and_grad(dp, argnums=(0, 1))(x, w)
    assert float(v0) == float(v1)
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("strides,padding", [
    ((1, 1), "VALID"),
    ((2, 2), ((1, 1), (1, 1))),
])
def test_conv2d_dp_split_precision_grads(strides, padding):
    """The custom-VJP backward (linear_transpose route) must produce the
    same cotangents as normal AD of the same-precision conv."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)

    def ref(x_, w_):
        return _loss(jax.lax.conv_general_dilated(
            x_, w_, strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.DEFAULT))

    def dp(x_, w_):
        return _loss(conv2d_dp(x_, w_, strides, padding,
                               precision="highest",
                               bwd_precision="default"))

    # forward value comes from the HIGHEST conv
    y_hi = jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    y_dp = conv2d_dp(x, w, strides, padding, precision="highest",
                     bwd_precision="default")
    np.testing.assert_array_equal(np.asarray(y_hi), np.asarray(y_dp))

    # backward cotangents match normal AD at the backward tier (the loss
    # re-linearization differs only through y, identical above)
    g0 = jax.grad(ref, argnums=(0, 1))(x, w)
    g1 = jax.grad(dp, argnums=(0, 1))(x, w)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_conv2d_dp_under_vmap():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 4)), jnp.float32)

    def one(x_):
        return _loss(conv2d_dp(x_, w, (1, 1), "VALID",
                               precision="highest",
                               bwd_precision="default"))

    def one_ref(x_):
        return _loss(jax.lax.conv_general_dilated(
            x_, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST))

    g = jax.vmap(jax.grad(one))(x)
    g_ref = jax.vmap(jax.grad(one_ref))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)


def test_dpconv_module_matches_nn_conv():
    """DPConv is param-compatible and value-identical to flax nn.Conv."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 6)), jnp.float32)
    ref_mod = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                      kernel_init=conv_init, dtype=jnp.float32,
                      precision="highest")
    dp_mod = DPConv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=conv_init, dtype=jnp.float32,
                    precision="highest", bwd_precision=None)
    p_ref = ref_mod.init(jax.random.PRNGKey(0), x)["params"]
    p_dp = dp_mod.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_dp)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_dp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_ref = ref_mod.apply({"params": p_ref}, x)
    y_dp = dp_mod.apply({"params": p_ref}, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_dp))

    def loss_ref(p):
        return _loss(ref_mod.apply({"params": p}, x))

    def loss_dp(p):
        return _loss(dp_mod.apply({"params": p}, x))

    g_ref = jax.grad(loss_ref)(p_ref)
    g_dp = jax.grad(loss_dp)(p_ref)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_with_bwd_precision_runs():
    """End-to-end wiring: a toy train step with bwd_precision='default'
    executes and produces finite metrics close to the plain step (on the
    CPU backend all precision tiers compute in f32, so 'close' here means
    the graph rewiring itself is value-preserving)."""
    import dataclasses
    import warnings

    from wacv23_tsnet_tpu.configs import toy_config
    from wacv23_tsnet_tpu.models import TSNetModules
    from wacv23_tsnet_tpu.nn import load_vgg19_params
    from wacv23_tsnet_tpu.train.state import create_train_state
    from wacv23_tsnet_tpu.train.step import make_train_step

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = load_vgg19_params()
    rng = np.random.default_rng(0)
    metrics = {}
    for tag, bwd in [("base", None), ("fast", "default")]:
        cfg = dataclasses.replace(toy_config(), precision="high",
                                  bwd_precision=bwd)
        mods = TSNetModules(cfg)
        state = create_train_state(mods, jax.random.PRNGKey(0),
                                   vgg_params=vgg)
        bs, hw, l, s = 2, cfg.image_size, cfg.label_nc, cfg.n_source
        r = np.random.default_rng(0)
        batch = {k: jnp.asarray(v) for k, v in {
            "src_img": r.random((bs, s, hw, hw, 3), np.float32),
            "src_lbl": r.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
            "src_bbox": r.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
            "tar_img": r.random((bs, hw, hw, 3), np.float32),
            "tar_lbl": r.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
            "tar_bbox": r.integers(0, 2, (bs, hw, hw)).astype(np.float32),
        }.items()}
        step = make_train_step(mods, donate=False)
        _, m, _ = step(state, batch, jnp.float32(2e-4))
        metrics[tag] = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in metrics[tag].values()), tag
    for k, v in metrics["base"].items():
        np.testing.assert_allclose(metrics["fast"][k], v, rtol=1e-4,
                                   atol=1e-5, err_msg=k)
