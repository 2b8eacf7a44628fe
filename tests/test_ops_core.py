"""Golden tests: core ops vs torch functional oracles.

Each op must match the torch semantics the reference relies on
(SURVEY.md §4: per-op golden tests vs the math in §3.3).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from wacv23_tsnet_tpu import ops

RNG = np.random.default_rng(0)


def nhwc(t):
    """torch NCHW tensor -> numpy NHWC."""
    return t.detach().numpy().transpose(0, 2, 3, 1)


def to_torch(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def test_instance_norm_matches_torch():
    x = RNG.standard_normal((2, 9, 7, 5), dtype=np.float32)
    want = F.instance_norm(to_torch(x), eps=1e-5)
    got = ops.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)


def test_l2_normalize_matches_torch():
    x = RNG.standard_normal((2, 4, 4, 8), dtype=np.float32)
    want = F.normalize(to_torch(x), p=2, dim=1)
    got = ops.l2_normalize(jnp.asarray(x), axis=-1)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-6)
    # zero vectors: torch clamps the norm at eps, must not NaN
    z = np.zeros((1, 2, 2, 4), dtype=np.float32)
    got = ops.l2_normalize(jnp.asarray(z), axis=-1)
    assert np.isfinite(np.asarray(got)).all()


def test_normalized_grid_matches_reference_get_grid():
    # reference model/TSNet.py:299-307: linspace(-1,1) inclusive, (x, y) order
    h, w = 5, 7
    h_range = torch.linspace(-1, 1, h)
    w_range = torch.linspace(-1, 1, w)
    want = torch.stack(torch.meshgrid([h_range, w_range], indexing="ij"), -1).flip(2)
    got = ops.normalized_grid(h, w)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_coord_channels_matches_reference_coord_conv():
    # reference model/TSNet.py:107-125
    x = RNG.standard_normal((2, 6, 8, 3), dtype=np.float32)
    b, h, w, _ = x.shape
    xx = (np.arange(w, dtype=np.float32) / (w - 1) * 2 - 1)[None, :].repeat(h, 0)
    yy = (np.arange(h, dtype=np.float32) / (h - 1) * 2 - 1)[:, None].repeat(w, 1)
    rr = np.sqrt(xx ** 2 + yy ** 2)
    want_extra = np.stack([xx, yy, rr], -1)[None].repeat(b, 0)
    got = np.asarray(ops.coord_channels(jnp.asarray(x)))
    np.testing.assert_allclose(got[..., :3], x, atol=0)
    np.testing.assert_allclose(got[..., 3:], want_extra, atol=1e-6)


def test_resize_nearest_matches_torch():
    x = RNG.standard_normal((2, 256, 256, 1), dtype=np.float32)
    want = F.interpolate(to_torch(x), (32, 32), mode="nearest")
    got = ops.resize_nearest(jnp.asarray(x), (32, 32))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=0)
    # non-divisible case
    x = RNG.standard_normal((1, 10, 14, 2), dtype=np.float32)
    want = F.interpolate(to_torch(x), (7, 5), mode="nearest")
    got = ops.resize_nearest(jnp.asarray(x), (7, 5))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=0)


def test_upsample_bilinear_2x_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 3), dtype=np.float32)
    want = F.interpolate(to_torch(x), scale_factor=2, mode="bilinear",
                         align_corners=False)
    got = ops.upsample_bilinear_2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)


def test_resize_bilinear_align_corners_matches_torch():
    x = RNG.standard_normal((2, 20, 30, 3), dtype=np.float32)
    want = F.interpolate(to_torch(x), (64, 64), mode="bilinear",
                         align_corners=True)
    got = ops.resize_bilinear(jnp.asarray(x), (64, 64), align_corners=True)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(align_corners):
    x = RNG.standard_normal((2, 16, 16, 4), dtype=np.float32)
    # grid with in-bounds and far out-of-bounds samples
    grid = (RNG.random((2, 8, 8, 2), dtype=np.float32) * 3.0 - 1.5)
    want = F.grid_sample(to_torch(x), torch.from_numpy(grid),
                         mode="bilinear", padding_mode="zeros",
                         align_corners=align_corners)
    got = ops.grid_sample(jnp.asarray(x), jnp.asarray(grid),
                          align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)


def test_patch_warp_matches_torch_unfold_fold_pipeline():
    # reference model/TSNet.py:372-379
    b, H, c, h = 2, 64, 3, 8
    down = H // h
    img = RNG.standard_normal((b, H, H, c), dtype=np.float32)
    flow = (RNG.random((b, h, h, 2), dtype=np.float32) * 2.2 - 1.1)

    timg = to_torch(img)
    tflow = torch.from_numpy(flow)
    unfolded = F.unfold(timg, down, stride=down).view(b, -1, h, h)
    warped = F.grid_sample(unfolded, tflow, align_corners=False)
    want = F.fold(warped.reshape(b, -1, h * h), H, down, stride=down)

    got = ops.patch_warp(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-5)


def _torch_reference_flow(t, s, mt, ms, grid, temp):
    """The literal two-bmm formulation from reference model/TSNet.py:350-365."""
    t_in = t * mt.unsqueeze(-1)
    s_in = s * ms.unsqueeze(-1)
    t_out = t * (1 - mt).unsqueeze(-1)
    s_out = s * (1 - ms).unsqueeze(-1)
    sim = torch.bmm(t_in, s_in.transpose(1, 2)) + \
        torch.bmm(t_out, s_out.transpose(1, 2))
    attn = F.softmax(temp * sim, dim=2)
    return torch.matmul(attn, grid)


def test_masked_attention_flow_matches_reference_two_bmm_form():
    b, n, c = 2, 64, 16
    t = F.normalize(torch.from_numpy(
        RNG.standard_normal((b, n, c), dtype=np.float32)), dim=2)
    s = F.normalize(torch.from_numpy(
        RNG.standard_normal((b, n, c), dtype=np.float32)), dim=2)
    mt = torch.from_numpy((RNG.random((b, n)) > 0.5).astype(np.float32))
    ms = torch.from_numpy((RNG.random((b, n)) > 0.5).astype(np.float32))
    grid = torch.from_numpy(RNG.random((n, 2), dtype=np.float32) * 2 - 1)

    want = _torch_reference_flow(t, s, mt, ms, grid, 100.0)
    got = ops.masked_attention_flow(
        jnp.asarray(t.numpy()), jnp.asarray(s.numpy()),
        jnp.asarray(mt.numpy()), jnp.asarray(ms.numpy()),
        jnp.asarray(grid.numpy()), temp=100.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_masked_attention_flow_nonbinary_masks_still_match():
    # the factored mask coefficient is exact algebra for ANY real masks
    b, n, c = 1, 32, 8
    t = F.normalize(torch.from_numpy(
        RNG.standard_normal((b, n, c), dtype=np.float32)), dim=2)
    s = F.normalize(torch.from_numpy(
        RNG.standard_normal((b, n, c), dtype=np.float32)), dim=2)
    mt = torch.from_numpy(RNG.random((b, n)).astype(np.float32))
    ms = torch.from_numpy(RNG.random((b, n)).astype(np.float32))
    grid = torch.from_numpy(RNG.random((n, 2), dtype=np.float32) * 2 - 1)
    want = _torch_reference_flow(t, s, mt, ms, grid, 100.0)
    got = ops.masked_attention_flow(
        jnp.asarray(t.numpy()), jnp.asarray(s.numpy()),
        jnp.asarray(mt.numpy()), jnp.asarray(ms.numpy()),
        jnp.asarray(grid.numpy()), temp=100.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_transformation_warp_end_to_end_vs_torch():
    """Whole branch: normalize -> masked attention -> flow -> grid_sample."""
    b, h, w, c = 2, 8, 8, 16
    n = h * w
    fea = RNG.standard_normal((b, h, w, c), dtype=np.float32)
    tfe = RNG.standard_normal((b, h, w, c), dtype=np.float32)
    mt = (RNG.random((b, h, w)) > 0.4).astype(np.float32)
    ms = (RNG.random((b, h, w)) > 0.4).astype(np.float32)

    fea_t = to_torch(fea)
    t_n = F.normalize(to_torch(tfe), dim=1).flatten(2).transpose(1, 2)
    s_n = F.normalize(fea_t, dim=1).flatten(2).transpose(1, 2)
    h_range = torch.linspace(-1, 1, h)
    w_range = torch.linspace(-1, 1, w)
    tgrid = torch.stack(
        torch.meshgrid([h_range, w_range], indexing="ij"), -1
    ).flip(2).reshape(n, 2)
    flow_t = _torch_reference_flow(
        t_n, s_n,
        torch.from_numpy(mt.reshape(b, n)), torch.from_numpy(ms.reshape(b, n)),
        tgrid, 100.0)
    want = F.grid_sample(fea_t, flow_t.view(b, h, w, 2), align_corners=False)

    got, flow = ops.transformation_warp(
        jnp.asarray(fea),
        jnp.asarray(np.asarray(
            F.normalize(to_torch(tfe), dim=1).numpy().transpose(0, 2, 3, 1))),
        jnp.asarray(np.asarray(
            F.normalize(fea_t, dim=1).numpy().transpose(0, 2, 3, 1))),
        jnp.asarray(mt), jnp.asarray(ms), temp=100.0)
    np.testing.assert_allclose(
        np.asarray(flow).reshape(b, n, 2), flow_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), nhwc(want), atol=1e-4)


def test_pallas_fused_flow_matches_einsum_path():
    from wacv23_tsnet_tpu.ops.pallas_similarity import masked_attention_flow_fused
    b, n, c = 2, 256, 32
    t = np.asarray(ops.l2_normalize(
        jnp.asarray(RNG.standard_normal((b, n, c), dtype=np.float32))))
    s = np.asarray(ops.l2_normalize(
        jnp.asarray(RNG.standard_normal((b, n, c), dtype=np.float32))))
    mt = (RNG.random((b, n)) > 0.5).astype(np.float32)
    ms = (RNG.random((b, n)) > 0.5).astype(np.float32)
    grid = (RNG.random((n, 2), dtype=np.float32) * 2 - 1)
    want = ops.masked_attention_flow(
        jnp.asarray(t), jnp.asarray(s), jnp.asarray(mt), jnp.asarray(ms),
        jnp.asarray(grid), temp=100.0)
    got = masked_attention_flow_fused(
        jnp.asarray(t), jnp.asarray(s), jnp.asarray(mt), jnp.asarray(ms),
        jnp.asarray(grid), 100.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_fused_flow_gradients_match():
    import jax
    from wacv23_tsnet_tpu.ops.pallas_similarity import masked_attention_flow_fused
    b, n, c = 1, 64, 8
    t = np.asarray(ops.l2_normalize(
        jnp.asarray(RNG.standard_normal((b, n, c), dtype=np.float32))))
    s = np.asarray(ops.l2_normalize(
        jnp.asarray(RNG.standard_normal((b, n, c), dtype=np.float32))))
    mt = (RNG.random((b, n)) > 0.5).astype(np.float32)
    ms = (RNG.random((b, n)) > 0.5).astype(np.float32)
    grid = (RNG.random((n, 2), dtype=np.float32) * 2 - 1)

    def loss_ref(t_, s_):
        return jnp.sum(ops.masked_attention_flow(
            t_, s_, jnp.asarray(mt), jnp.asarray(ms), jnp.asarray(grid),
            temp=10.0) ** 2)

    def loss_fused(t_, s_):
        return jnp.sum(masked_attention_flow_fused(
            t_, s_, jnp.asarray(mt), jnp.asarray(ms), jnp.asarray(grid),
            10.0) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(t), jnp.asarray(s))
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(jnp.asarray(t), jnp.asarray(s))
    for a, b_ in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_pallas_pairs_mean_matches_composition():
    """transform_warp_pairs_mean == mean over sources of the per-pair
    composition, without materializing the per-pair tensor."""
    from wacv23_tsnet_tpu.ops.similarity import (
        transformation_warp_clip, transformation_warp_clip_mean)

    s, f, h, w, c = 3, 4, 16, 16, 32          # t = 256, tiles cleanly
    src = jnp.asarray(RNG.standard_normal((s, h, w, c), dtype=np.float32))
    src_n = ops.l2_normalize(src)
    sm = jnp.asarray((RNG.random((s, h, w)) > 0.5).astype(np.float32))
    tar = jnp.asarray(RNG.standard_normal((f, h, w, c), dtype=np.float32))
    tar_n = ops.l2_normalize(tar)
    tm = jnp.asarray((RNG.random((f, h, w)) > 0.5).astype(np.float32))

    ref = jnp.mean(transformation_warp_clip(
        src, src_n, sm, tar_n, tm, use_pallas=False), axis=0)
    fused = transformation_warp_clip_mean(src, src_n, sm, tar_n, tm)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)

    # bf16 fast-tail output: same values at bf16 resolution
    fused_bf = transformation_warp_clip_mean(
        src, src_n, sm, tar_n, tm, fast_warp=True, out_dtype=jnp.bfloat16)
    assert fused_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(fused_bf, np.float32),
                               np.asarray(ref), atol=0.05)


def test_pallas_pairs_mean_bigt_matches_small_kernel(monkeypatch):
    """The big-T mean kernel (sources on the kernel grid, fp32 scratch
    accumulator — used past 32^2 feature grids where the all-resident
    kernel overflows scoped VMEM) computes the same folded mean. Forced
    here at a small size by zeroing the resident budget."""
    from wacv23_tsnet_tpu.ops import pallas_similarity as ps
    from wacv23_tsnet_tpu.ops.similarity import (
        transformation_warp_clip, transformation_warp_clip_mean)

    s, f, h, w, c = 3, 2, 16, 16, 32          # t = 256, tiles cleanly
    src = jnp.asarray(RNG.standard_normal((s, h, w, c), dtype=np.float32))
    src_n = ops.l2_normalize(src)
    sm = jnp.asarray((RNG.random((s, h, w)) > 0.5).astype(np.float32))
    tar = jnp.asarray(RNG.standard_normal((f, h, w, c), dtype=np.float32))
    tar_n = ops.l2_normalize(tar)
    tm = jnp.asarray((RNG.random((f, h, w)) > 0.5).astype(np.float32))

    ref = jnp.mean(transformation_warp_clip(
        src, src_n, sm, tar_n, tm, use_pallas=False), axis=0)

    monkeypatch.setattr(ps, "MEAN_KERNEL_RESIDENT_BUDGET", 0)
    bigt = transformation_warp_clip_mean(src, src_n, sm, tar_n, tm)
    np.testing.assert_allclose(np.asarray(bigt), np.asarray(ref), atol=1e-4)

    # fast3 variant (bf16x3 logits + split p@grid) under the big-T path
    bigt_bf = transformation_warp_clip_mean(
        src, src_n, sm, tar_n, tm, fast_warp=True, out_dtype=jnp.bfloat16)
    assert bigt_bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(bigt_bf, np.float32),
                               np.asarray(ref), atol=0.05)
