"""Phase-decomposed decoder ops vs their reference compositions.

`upsample2x_reflect_conv3` / `upconv_in_relu` fuse the decoder's
[bilinear-2x upsample -> reflect-pad -> 3x3 conv (-> IN -> relu)] stages
(reference model/TSNet.py:144-153) into one input-resolution conv; these
tests pin them to the unfused composition, including the exact border
ring and the IN-statistics-from-pieces path.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wacv23_tsnet_tpu.ops.norms import instance_norm
from wacv23_tsnet_tpu.ops.resize import upsample_bilinear_2x
from wacv23_tsnet_tpu.ops.upconv import (conv7x7_phase, depth_to_space,
                                         upconv_in_relu,
                                         upsample2x_reflect_conv3)

RNG = np.random.default_rng(7)


def _composition(x, k, b=None):
    u = upsample_bilinear_2x(x)
    u = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        u, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y if b is None else y + b


@pytest.mark.parametrize("h,w,ci,co", [(8, 8, 6, 4), (5, 9, 3, 5)])
def test_upsample2x_reflect_conv3_exact(h, w, ci, co):
    x = jnp.asarray(RNG.standard_normal((2, h, w, ci)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((3, 3, ci, co)), jnp.float32) * 0.3
    b = jnp.asarray(RNG.standard_normal((co,)), jnp.float32)
    want = _composition(x, k, b)
    got = upsample2x_reflect_conv3(x, k, b, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("phase_out", [False, True])
def test_upconv_in_relu_matches_composition(phase_out):
    h, w, ci, co = 7, 10, 5, 6
    x = jnp.asarray(RNG.standard_normal((2, h, w, ci)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((3, 3, ci, co)), jnp.float32) * 0.3
    b = jnp.asarray(RNG.standard_normal((co,)), jnp.float32)
    # the bias cancels in the instance norm, so the fused (bias-free)
    # op must match the composition WITH bias
    want = nn.relu(instance_norm(_composition(x, k, b)))
    got = upconv_in_relu(x, k, precision="highest", phase_out=phase_out)
    if phase_out:
        got = depth_to_space(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_decoder_apply_fast_matches_module(dtype):
    """decoder_apply_fast (phase-decomposed stages, fused IN, 4-phase
    conv7 tail) == the flax Decoder module, same param tree."""
    import jax.numpy as jnp
    from wacv23_tsnet_tpu.nn.decoder import Decoder, decoder_apply_fast

    dec = Decoder(output_nc=3, ngf=8, n_downsampling=3, n_blocks=2,
                  dtype=jnp.dtype(dtype),
                  precision="highest" if dtype == "float32" else "default")
    rng = np.random.default_rng(42)   # own stream: shared-RNG order varies
    prop = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    syn = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    params = dec.init(jax.random.PRNGKey(1), prop, syn)["params"]
    want_img, want_fea = dec.apply({"params": params}, prop, syn)
    got_img, got_fea = decoder_apply_fast(dec, params, prop, syn,
                                          return_fea=True)
    tol = 1e-5 if dtype == "float32" else 6e-2
    np.testing.assert_allclose(np.asarray(got_img, np.float32),
                               np.asarray(want_img, np.float32), atol=tol)
    np.testing.assert_allclose(np.asarray(got_fea, np.float32),
                               np.asarray(want_fea, np.float32), atol=tol)
    if dtype == "bfloat16":
        # bf16 tier again with the fused Pallas resblocks (interpret)
        got_img2, _ = decoder_apply_fast(dec, params, prop, syn,
                                         return_fea=True,
                                         use_pallas_blocks=True)
        np.testing.assert_allclose(np.asarray(got_img2, np.float32),
                                   np.asarray(want_img, np.float32),
                                   atol=tol)


def test_conv7x7_phase_exact():
    h, w, ci, co = 12, 14, 4, 3
    interleaved = jnp.asarray(
        RNG.standard_normal((2, 2 * h, 2 * w, ci)), jnp.float32)
    k7 = jnp.asarray(RNG.standard_normal((7, 7, ci, co)), jnp.float32) * 0.2
    b = jnp.asarray(RNG.standard_normal((co,)), jnp.float32)
    pad = jnp.pad(interleaved, ((0, 0), (3, 3), (3, 3), (0, 0)),
                  mode="reflect")
    want = jax.lax.conv_general_dilated(
        pad, k7, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    # phase layout of the input: (B, h, w, 4ci) with ((py*2+px)*ci + c)
    bsz = interleaved.shape[0]
    xp = interleaved.reshape(bsz, h, 2, w, 2, ci).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(bsz, h, w, 4 * ci)
    got = depth_to_space(conv7x7_phase(xp, k7, b, precision="highest"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
