"""fuse_clip (split-form FuseNet over shared sources) vs the generic module.

The clip path computes mean_s FuseNet(src[s], tar[f]) with the concat
conv split per source/frame, the conv2 bias dropped into the following
instance norm, and the IN + mean-over-sources fused into one Pallas pass
(ops.pallas_norms.instance_norm_mean). These tests pin the whole chain
and the fused norm-mean op to their reference compositions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wacv23_tsnet_tpu.nn.fusenet import FuseNet, fuse_clip
from wacv23_tsnet_tpu.ops.norms import instance_norm
from wacv23_tsnet_tpu.ops.pallas_norms import instance_norm_mean

RNG = np.random.default_rng(11)


def test_instance_norm_mean_matches_composition():
    x = jnp.asarray(RNG.standard_normal((3, 4, 8, 8, 16)), jnp.float32)
    want = jnp.mean(jax.vmap(instance_norm)(x), axis=0)
    got = instance_norm_mean(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_instance_norm_mean_bf16_out():
    x = jnp.asarray(RNG.standard_normal((2, 3, 8, 8, 16)), jnp.float32) \
        .astype(jnp.bfloat16)
    want = jnp.mean(jax.vmap(instance_norm)(x).astype(jnp.float32), axis=0)
    got = instance_norm_mean(x, out_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


def test_instance_norm_mean_degenerate_channel_is_finite():
    # A near-constant channel with a large mean makes the one-pass
    # E[x^2]-E[x]^2 variance cancel below zero in fp32; unclamped, the
    # rsqrt NaNs and poisons the training step (advisor repro, round 2).
    x = jnp.full((1, 2, 8, 8, 16), 300.0, jnp.float32)
    x = x + jnp.asarray(RNG.standard_normal(x.shape) * 1e-3, jnp.float32)
    got = instance_norm_mean(x)
    assert bool(jnp.all(jnp.isfinite(got)))


def test_instance_norm_degenerate_channel_is_finite():
    from wacv23_tsnet_tpu.ops.upconv import instance_norm_phase
    from wacv23_tsnet_tpu.ops.pallas_norms import instance_norm_fused
    base = jnp.full((2, 8, 8, 16), 300.0, jnp.float32)
    noise = jnp.asarray(RNG.standard_normal(base.shape) * 1e-3, jnp.float32)
    x = (base + noise).astype(jnp.bfloat16)  # bf16 takes the one-pass branch
    assert bool(jnp.all(jnp.isfinite(instance_norm(x).astype(jnp.float32))))
    assert bool(jnp.all(jnp.isfinite(
        instance_norm_phase(x).astype(jnp.float32))))
    assert bool(jnp.all(jnp.isfinite(
        instance_norm_fused(x).astype(jnp.float32))))
    assert bool(jnp.all(jnp.isfinite(
        instance_norm_fused(x, phase_groups=4).astype(jnp.float32))))


def test_fuse_train_matches_generic_module():
    from wacv23_tsnet_tpu.nn.fusenet import fuse_train
    b, s, hw, c = 2, 3, 8, 32
    net = FuseNet(ngf=2 * c, n_blocks=1)
    src = jnp.asarray(RNG.standard_normal((b, s, hw, hw, c)), jnp.float32)
    tar = jnp.asarray(RNG.standard_normal((b, hw, hw, c)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), src[:, 0], src[:, 0])["params"]

    want = jnp.mean(jax.vmap(
        lambda f: net.apply({"params": params}, f, tar),
        in_axes=1, out_axes=1)(src), axis=1)
    got = fuse_train(params, src, tar)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)

    # differentiable (the generic path is the VJP oracle)
    g1 = jax.grad(lambda x: jnp.sum(fuse_train(params, x, tar) ** 2))(src)
    g2 = jax.grad(lambda x: jnp.sum(jnp.mean(jax.vmap(
        lambda f: net.apply({"params": params}, f, tar),
        in_axes=1, out_axes=1)(x), axis=1) ** 2))(src)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-3, rtol=2e-3)


def test_fuse_clip_matches_generic_module():
    s, f, hw, c = 3, 5, 8, 32
    net = FuseNet(ngf=2 * c, n_blocks=1)
    src = jnp.asarray(RNG.standard_normal((s, hw, hw, c)), jnp.float32)
    tar = jnp.asarray(RNG.standard_normal((f, hw, hw, c)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), src[:1], src[:1])["params"]

    # generic path: per (source, frame) pair, then mean over sources
    def pair(sidx):
        src_b = jnp.broadcast_to(src[sidx][None], (f, hw, hw, c))
        return net.apply({"params": params}, src_b, tar)

    want = jnp.mean(jnp.stack([pair(i) for i in range(s)]), axis=0)
    got = fuse_clip(params, src, tar)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
