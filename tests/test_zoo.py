"""Network zoo, GAN objective zoo, schedulers, viz, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.losses.gan import gan_loss, gradient_penalty
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn import (PixelDiscriminator, VideoDiscriminator,
                                 define_D, define_G)

RNG = np.random.default_rng(11)


def test_generator_zoo_shapes():
    for name, size in (("resnet_6blocks", 64), ("unet_128", 128)):
        x = jnp.asarray(RNG.random((1, size, size, 3), np.float32))
        g = define_G(3, 16, name)
        params = g.init(jax.random.PRNGKey(0), x)
        y = g.apply(params, x)
        assert y.shape == (1, size, size, 3)
        assert float(jnp.abs(y).max()) <= 1.0


def test_discriminator_zoo_shapes():
    x = jnp.asarray(RNG.random((2, 64, 64, 3), np.float32))
    pix = PixelDiscriminator(ndf=8)
    y = pix.apply(pix.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 64, 64, 1)

    xv = jnp.asarray(RNG.random((2, 256, 256, 3), np.float32))
    vid = VideoDiscriminator(out_nc=16, ndf=8)
    y = vid.apply(vid.init(jax.random.PRNGKey(0), xv), xv)
    assert y.shape == (2, 16)  # 4x4 VALID conv on 4x4 input -> 1x1x16

    patch = define_D(8, "n_layers", n_layers_d=2)
    feats = patch.apply(patch.init(jax.random.PRNGKey(0), x), x)
    assert len(feats) == 4


def test_gan_loss_modes_match_torch():
    import torch
    import torch.nn.functional as F

    pred = RNG.standard_normal((2, 8, 8, 1)).astype(np.float32)
    tpred = torch.from_numpy(pred)
    for real in (True, False):
        t = torch.full_like(tpred, 1.0 if real else 0.0)
        want_ls = F.mse_loss(tpred, t).item()
        want_bce = F.binary_cross_entropy_with_logits(tpred, t).item()
        assert abs(float(gan_loss(jnp.asarray(pred), real, "lsgan"))
                   - want_ls) < 1e-6
        assert abs(float(gan_loss(jnp.asarray(pred), real, "vanilla"))
                   - want_bce) < 1e-6
    assert abs(float(gan_loss(jnp.asarray(pred), True, "wgangp"))
               + pred.mean()) < 1e-6


def test_gradient_penalty_runs():
    pix = PixelDiscriminator(ndf=4)
    x = jnp.asarray(RNG.random((2, 16, 16, 3), np.float32))
    params = pix.init(jax.random.PRNGKey(0), x)

    gp = gradient_penalty(lambda z: pix.apply(params, z),
                          x, x * 0.5, jax.random.PRNGKey(1))
    assert np.isfinite(float(gp)) and float(gp) >= 0.0


def test_scheduler_factory():
    from wacv23_tsnet_tpu.train.schedule import PlateauScale, get_scheduler

    lin = get_scheduler("linear", 1e-3, n_epochs=10, n_epochs_decay=10,
                        steps_per_epoch=2)
    assert abs(float(lin(0)) - 1e-3) < 1e-8
    assert float(lin(39)) < 9e-4
    step = get_scheduler("step", 1e-3, lr_decay_iters=5, steps_per_epoch=1)
    assert abs(float(step(7)) - 1e-4) < 1e-8
    cos = get_scheduler("cosine", 1e-3, n_epochs=10, steps_per_epoch=1)
    assert abs(float(cos(0)) - 1e-3) < 1e-8 and float(cos(10)) < 1e-6
    plat = PlateauScale(1e-3, patience=1)
    for m in [1.0, 1.0, 1.0, 1.0]:
        lr = plat.update(m)
    assert lr < 1e-3


def test_viz_helpers():
    from wacv23_tsnet_tpu.utils.viz import (grid2fig, map2fig, plot_grid,
                                            tensor2im)

    img = tensor2im(RNG.standard_normal((1, 3, 16, 16)).astype(np.float32))
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    heat = map2fig(RNG.random((32, 32)).astype(np.float32))
    assert heat.ndim == 3 and heat.shape[2] == 3
    lin = np.linspace(-1, 1, 8)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    fig = grid2fig(np.stack([gx, gy], -1), grid_size=8)
    assert fig.shape[2] == 3


def test_reference_checkpoint_roundtrip():
    """flax -> .pth-style dict -> flax is identity."""
    from wacv23_tsnet_tpu.compat import (generator_params_from_checkpoint,
                                         reference_checkpoint)

    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(3))
    ckpt = reference_checkpoint(params, cfg, example=123)
    assert ckpt["example"] == 123
    restored = generator_params_from_checkpoint(ckpt, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
