"""Flash-style backward of the fused transformation branch.

`transform_warp_pairs`'s custom VJP is a Pallas kernel that recomputes
logits/softmax/flow/tent-weights per tile in VMEM and never materializes
the (G*NS*NF, T, T) attention matrix in HBM (the einsum-VJP fallback it
replaces did, twice per step). These tests pin every one of its six
input cotangents to the differentiable einsum+gather reference
(`_pairs_ref`), including multi-tile and multi-frame accumulation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wacv23_tsnet_tpu.ops.pallas_similarity import (_pairs_ref,
                                                    transform_warp_pairs)

RNG = np.random.default_rng(7)


def _inputs(g=2, ns=2, nf=2, h=16, w=16, c=64):
    t = h * w
    src_fea = RNG.standard_normal((g, ns, t, c)).astype(np.float32)
    tar_fea = RNG.standard_normal((g, nf, t, c)).astype(np.float32)
    norm = lambda x: x / np.maximum(
        np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    tar_fea_n = norm(tar_fea)
    src_fea_n = norm(src_fea)
    tar_mask = RNG.integers(0, 2, (g, nf, t)).astype(np.float32)
    src_mask = RNG.integers(0, 2, (g, ns, t)).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    grid = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    return (jnp.asarray(src_fea), jnp.asarray(tar_fea_n),
            jnp.asarray(src_fea_n), jnp.asarray(tar_mask),
            jnp.asarray(src_mask), jnp.asarray(grid)), (h, w)


@pytest.mark.parametrize("nf", [1, 2])
def test_pairs_backward_matches_einsum_vjp(nf):
    args, (h, w) = _inputs(nf=nf)
    # temp=10 (not the shipped 100): at random-feature logit scales the
    # shipped temperature saturates the softmax one-hot, where both
    # backends return ~zero grads and the comparison is vacuous.
    fused = functools.partial(transform_warp_pairs, h=h, w=w, temp=10.0)
    ref = functools.partial(_pairs_ref, h=h, w=w, temp=10.0)

    out_f, vjp_f = jax.vjp(fused, *args)
    out_r, vjp_r = jax.vjp(ref, *args)
    np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(out_r[0]),
                               atol=1e-5, rtol=1e-5)

    g, ns = args[0].shape[:2]
    t, c = args[0].shape[2:]
    gw = jnp.asarray(RNG.standard_normal((g, ns, nf, t, c)), jnp.float32)
    gf = jnp.asarray(RNG.standard_normal((g, ns, nf, t, 2)), jnp.float32)

    grads_f = vjp_f((gw, gf))
    grads_r = vjp_r((gw, gf))
    names = ["src_fea", "tar_fea_n", "src_fea_n", "tar_mask", "src_mask",
             "grid"]
    for name, gf_, gr_ in zip(names, grads_f, grads_r):
        scale = max(1.0, float(jnp.max(jnp.abs(gr_))))
        np.testing.assert_allclose(
            np.asarray(gf_), np.asarray(gr_), atol=2e-4 * scale, rtol=2e-4,
            err_msg=f"cotangent mismatch for {name}")


def test_pairs_backward_fast3_close_to_einsum_vjp():
    """bwd_fast3 (bf16x3 backward matmuls, the precision='high' tier):
    grads within ~1e-3 relative of the HIGHEST einsum VJP — the temp-100
    softmax amplifies the 2^-18 logit error to ~4e-4 on P."""
    args, (h, w) = _inputs(nf=1)
    fused = functools.partial(transform_warp_pairs, h=h, w=w, temp=10.0,
                              bwd_fast3=True)
    ref = functools.partial(_pairs_ref, h=h, w=w, temp=10.0)
    _, vjp_f = jax.vjp(fused, *args)
    _, vjp_r = jax.vjp(ref, *args)
    g, ns = args[0].shape[:2]
    t, c = args[0].shape[2:]
    gw = jnp.asarray(RNG.standard_normal((g, ns, 1, t, c)), jnp.float32)
    gf = jnp.asarray(RNG.standard_normal((g, ns, 1, t, 2)), jnp.float32)
    for gf_, gr_ in zip(vjp_f((gw, gf)), vjp_r((gw, gf))):
        scale = max(1.0, float(jnp.max(jnp.abs(gr_))))
        np.testing.assert_allclose(np.asarray(gf_), np.asarray(gr_),
                                   atol=2e-3 * scale, rtol=2e-3)


def test_pairs_grad_through_scalar_loss():
    """jax.grad through the fused op (both outputs used) vs the reference."""
    args, (h, w) = _inputs(g=1, ns=2, nf=1, h=8, w=8, c=32)

    def loss(fn, a):
        warped, flow = fn(a, *args[1:], h=h, w=w, temp=10.0)
        return jnp.sum(warped ** 2) + jnp.sum(jnp.sin(flow))

    g_f = jax.grad(functools.partial(loss, transform_warp_pairs))(args[0])
    g_r = jax.grad(functools.partial(loss, _pairs_ref))(args[0])
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-4, rtol=1e-4)


def test_pairs_backward_fallback_shape():
    """Non-tiling T falls back to the einsum VJP (and still differentiates)."""
    args, (h, w) = _inputs(g=1, ns=1, nf=1, h=6, w=6, c=16)
    grads = jax.grad(lambda a: jnp.sum(
        transform_warp_pairs(a, *args[1:], h=h, w=w, temp=10.0)[0] ** 2
    ))(args[0])
    assert np.isfinite(np.asarray(grads)).all()
