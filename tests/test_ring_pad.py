"""Ring-pad convs (ops/reflectconv.py): same sums as reflect_pad + VALID
conv, no materialized pad — exactness vs the padded formulation at every
level it is wired into (raw op, ResnetBlock/Encoder modules, the full
train forward + gradients, and the clip path).

Reference behavior being preserved: ReflectionPad2d before every
generator conv (reference model/TSNet.py:10-49, :300-307).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward, tsnet_forward_clip
from wacv23_tsnet_tpu.nn.blocks import DPConv, ResnetBlock, reflect_pad
from wacv23_tsnet_tpu.ops.dpconv import conv2d_dp
from wacv23_tsnet_tpu.ops.reflectconv import conv2d_reflect_dp

_RNG = np.random.default_rng(1234)


@pytest.mark.parametrize("p,h,w,ci,co", [
    (1, 10, 12, 5, 7), (3, 16, 9, 4, 6), (1, 34, 34, 8, 8), (2, 12, 12, 3, 3),
])
def test_reflect_conv_matches_padded(p, h, w, ci, co):
    rng = np.random.default_rng(p * 100 + h)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2 * p + 1, 2 * p + 1, ci, co)),
                    jnp.float32)
    ref = conv2d_dp(jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)),
                            mode="reflect"), k, (1, 1), "VALID",
                    precision="highest")
    got = conv2d_reflect_dp(x, k, p, precision="highest")
    rel = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-5
    # interiors are bit-identical (zero padding contributes nothing there)
    np.testing.assert_array_equal(np.asarray(ref)[:, p:-p, p:-p],
                                  np.asarray(got)[:, p:-p, p:-p])


def test_reflect_conv_gradients_match():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 12, 14, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 5)), jnp.float32)

    def loss_ring(x_, k_):
        return jnp.sum(jnp.sin(conv2d_reflect_dp(x_, k_, 1,
                                                 precision="highest")))

    def loss_pad(x_, k_):
        xp = jnp.pad(x_, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jnp.sum(jnp.sin(conv2d_dp(xp, k_, (1, 1), "VALID",
                                         precision="highest")))

    g1 = jax.grad(loss_ring, argnums=(0, 1))(x, k)
    g2 = jax.grad(loss_pad, argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert rel < 1e-5


def test_resnet_block_ring_same_params_same_output():
    x = jnp.asarray(_RNG.standard_normal((2, 16, 16, 8)), jnp.float32)
    pad_blk = ResnetBlock(8, precision="highest")
    ring_blk = ResnetBlock(8, precision="highest", ring_pad=True)
    params = pad_blk.init(jax.random.PRNGKey(0), x)["params"]
    # identical parameter tree: ring variant restores the same params
    y_pad = pad_blk.apply({"params": params}, x)
    y_ring = ring_blk.apply({"params": params}, x)
    rel = float(jnp.max(jnp.abs(y_pad - y_ring))
                / jnp.max(jnp.abs(y_pad)))
    assert rel < 1e-5


def _toy_cfg(**over):
    from wacv23_tsnet_tpu.configs import toy_config
    return dataclasses.replace(toy_config(), **over)


def _toy_batch(bs=2, s=2, hw=64, l=2):
    rng = np.random.default_rng(5)
    return {
        "src_img": jnp.asarray(rng.random((bs, s, hw, hw, 3)), jnp.float32),
        "src_lbl": jnp.asarray(
            rng.integers(0, 2, (bs, s, hw, hw, l)), jnp.float32),
        "src_bbox": jnp.asarray(
            rng.integers(0, 2, (bs, s, hw, hw)), jnp.float32),
        "tar_img": jnp.asarray(rng.random((bs, hw, hw, 3)), jnp.float32),
        "tar_lbl": jnp.asarray(
            rng.integers(0, 2, (bs, hw, hw, l)), jnp.float32),
        "tar_bbox": jnp.asarray(
            rng.integers(0, 2, (bs, hw, hw)), jnp.float32),
    }


def test_train_forward_and_grads_match_ring():
    cfg_pad = _toy_cfg()
    cfg_ring = _toy_cfg(ring_pad=True)
    mods_pad, mods_ring = TSNetModules(cfg_pad), TSNetModules(cfg_ring)
    params = mods_pad.init_generator_params(jax.random.PRNGKey(0))
    batch = _toy_batch()

    def run(mods, p):
        out = tsnet_forward(mods, p, batch["src_img"], batch["src_lbl"],
                            batch["src_bbox"], batch["tar_lbl"],
                            batch["tar_bbox"], tar_img=batch["tar_img"],
                            train=True, use_pallas=False)
        return out["rec_img"], out["loss_warp"]

    rec_pad, _ = run(mods_pad, params)
    rec_ring, _ = run(mods_ring, params)
    rel = float(jnp.max(jnp.abs(rec_pad - rec_ring))
                / (jnp.max(jnp.abs(rec_pad)) + 1e-8))
    assert rel < 1e-4

    def loss(mods):
        def f(p):
            rec, lw = run(mods, p)
            return jnp.sum(jnp.abs(rec)) + lw
        return f

    g_pad = jax.grad(loss(mods_pad))(params)
    g_ring = jax.grad(loss(mods_ring))(params)
    flat_p = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_pad)])
    flat_r = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_ring)])
    cos = float(jnp.vdot(flat_p, flat_r)
                / (jnp.linalg.norm(flat_p) * jnp.linalg.norm(flat_r)))
    assert cos > 0.9999, cos


def test_clip_forward_matches_ring():
    cfg_pad = _toy_cfg()
    cfg_ring = _toy_cfg(ring_pad=True)
    mods_pad, mods_ring = TSNetModules(cfg_pad), TSNetModules(cfg_ring)
    params = mods_pad.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    s, f, hw, l = 2, 3, 64, 2
    args = (
        jnp.asarray(rng.random((s, hw, hw, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, 2, (s, hw, hw, l)), jnp.float32),
        jnp.asarray(rng.integers(0, 2, (s, hw, hw)), jnp.float32),
        jnp.asarray(rng.integers(0, 2, (f, hw, hw, l)), jnp.float32),
        jnp.asarray(rng.integers(0, 2, (f, hw, hw)), jnp.float32),
    )
    rec_pad = tsnet_forward_clip(mods_pad, params, *args, use_pallas=False)
    rec_ring = tsnet_forward_clip(mods_ring, params, *args, use_pallas=False)
    rel = float(jnp.max(jnp.abs(rec_pad - rec_ring))
                / (jnp.max(jnp.abs(rec_pad)) + 1e-8))
    # border float-order differences amplified through the IN/attention/
    # tanh chain at random init; measured ~1e-4 max-rel
    assert rel < 5e-4
