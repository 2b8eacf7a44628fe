"""ops.pallas_fuse fused pair-block kernel vs the XLA composition
(interpret mode on CPU; the chip path is exercised by /verify and the
fuse parity check in artifacts/round3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wacv23_tsnet_tpu.nn.blocks import reflect_pad
from wacv23_tsnet_tpu.ops.norms import instance_norm
from wacv23_tsnet_tpu.ops.pallas_fuse import fuse_pair_conv2

RNG = np.random.default_rng(0)


def _ref(c1a, c1t, k2, prec=jax.lax.Precision.HIGHEST):
    s, h, w, k = c1a.shape
    f = c1t.shape[0]
    hp = (c1a[:, None].astype(jnp.float32)
          + c1t[None].astype(jnp.float32)).reshape(s * f, h, w, k)
    hp = jax.nn.relu(instance_norm(hp)).astype(c1a.dtype)
    h2 = jax.lax.conv_general_dilated(
        reflect_pad(hp, 1), k2.astype(c1a.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)
    return h2.reshape(s, f, h, w, k)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fuse_pair_conv2_matches_composition(dtype):
    s, f, h, w, k = 2, 3, 8, 8, 128
    c1a = jnp.asarray(RNG.standard_normal((s, h, w, k)), dtype)
    c1t = jnp.asarray(RNG.standard_normal((f, h, w, k)), dtype)
    k2 = jnp.asarray(RNG.standard_normal((3, 3, k, k)) * 0.05, dtype)
    got = fuse_pair_conv2(c1a, c1t, k2, co_tile=64)
    want = _ref(c1a, c1t, k2)
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-3
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol,
                               rtol=tol)


def test_fuse_pair_conv2_co_tiling_invariance():
    s, f, h, w, k = 1, 2, 8, 8, 128
    c1a = jnp.asarray(RNG.standard_normal((s, h, w, k)), jnp.float32)
    c1t = jnp.asarray(RNG.standard_normal((f, h, w, k)), jnp.float32)
    k2 = jnp.asarray(RNG.standard_normal((3, 3, k, k)) * 0.05, jnp.float32)
    a = fuse_pair_conv2(c1a, c1t, k2, co_tile=128)
    b = fuse_pair_conv2(c1a, c1t, k2, co_tile=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fuse_clip_pallas_kernel_path():
    """fuse_clip with the fused kernel == the pure-XLA escape hatch."""
    from wacv23_tsnet_tpu.nn.fusenet import FuseNet, fuse_clip
    s, f, hw, c = 2, 3, 8, 64
    net = FuseNet(ngf=2 * c, n_blocks=1, dtype=jnp.bfloat16,
                  precision="default")
    src = jnp.asarray(RNG.standard_normal((s, hw, hw, c)), jnp.float32)
    tar = jnp.asarray(RNG.standard_normal((f, hw, hw, c)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), src,
                      jnp.broadcast_to(tar[:1], src.shape))["params"]
    got = fuse_clip(params, src, tar, dtype=jnp.bfloat16,
                    precision="default", use_pallas=True)
    want = fuse_clip(params, src, tar, dtype=jnp.bfloat16,
                     precision="default", use_pallas=False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=5e-2)
