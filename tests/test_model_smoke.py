"""Toy-training smoke: the reference quick_start1.py equivalent.

Runs full `set_train_input` + `optimize_parameters` and the inference
path on random tensors (reference model/TSNet.py:575-606), asserting
shape contracts and loss finiteness.
"""

import numpy as np

from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.models import TSNet

RNG = np.random.default_rng(42)


def _random_inputs(bs, size, label_nc, n_source):
    srcs, lbls, boxes = [], [], []
    for _ in range(n_source):
        srcs.append(RNG.random((bs, 3, size, size), dtype=np.float32) * 255)
        lbls.append(RNG.integers(0, 2, (bs, label_nc, size, size))
                    .astype(np.float32))
        boxes.append(RNG.integers(0, 2, (bs, size, size)).astype(np.float32))
    tar_img = RNG.random((bs, 3, size, size), dtype=np.float32) * 255
    tar_lbl = RNG.integers(0, 2, (bs, label_nc, size, size)).astype(np.float32)
    tar_bbox = RNG.integers(0, 2, (bs, size, size)).astype(np.float32)
    return srcs, lbls, boxes, tar_img, tar_lbl, tar_bbox


def test_toy_train_step_and_inference():
    cfg = toy_config()
    bs, size = 2, cfg.image_size
    model = TSNet(cfg, is_train=True, use_pallas=False)
    srcs, lbls, boxes, tar_img, tar_lbl, tar_bbox = _random_inputs(
        bs, size, cfg.label_nc, cfg.n_source)

    model.setup(actual_step=0, batch_size=bs, initial_iter=100,
                max_iter=1000, power=1.0)
    model.set_train_input(srcs, lbls, boxes, tar_img, tar_lbl, tar_bbox)
    model.optimize_parameters()

    losses = model.get_current_losses()
    assert set(losses) == {"G", "G_GAN", "G_FML", "G_VGG", "D", "D_real",
                           "D_fake", "grad_G", "warp", "align"}
    for name, value in losses.items():
        assert np.isfinite(value), f"loss {name} not finite"
    assert model.rec_tar_img.shape == (bs, 3, size, size)
    assert np.isfinite(model.rec_tar_img).all()

    # params actually moved
    step1_loss = losses["G"]
    model.optimize_parameters()
    assert model.get_current_losses()["G"] != step1_loss

    # forward() in train mode exposes the warp image list
    model.forward()
    assert len(model.warp_src_img_list) == cfg.n_source
    assert model.warp_src_img_list[0].shape == (bs, 3, size, size)

    # inference path
    infer = TSNet(cfg, is_train=False, use_pallas=False)
    infer.load_generator_params(model.generator_params)
    infer.set_test_input(srcs, lbls, boxes, tar_lbl, tar_bbox)
    infer.forward()
    assert infer.rec_tar_img.shape == (bs, 3, size, size)
    assert np.abs(infer.rec_tar_img).max() <= 1.0  # tanh range

    # set_source_num: fewer sources recompiles but runs
    infer.set_source_num(1)
    infer.set_test_input(srcs[:1], lbls[:1], boxes[:1], tar_lbl, tar_bbox)
    infer.forward()
    assert infer.rec_tar_img.shape == (bs, 3, size, size)


def test_remat_train_step_matches_params_and_runs():
    """remat=True keeps the identical param tree and produces the same
    forward (it only changes what the backward stores)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from wacv23_tsnet_tpu.models import TSNetModules, tsnet_forward

    cfg = toy_config()
    mods = TSNetModules(cfg)
    mods_r = TSNetModules(dataclasses.replace(cfg, remat=True))
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    params_r = mods_r.init_generator_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    rng = np.random.default_rng(1)
    s, hw, l = cfg.n_source, cfg.image_size, cfg.label_nc
    args = (jnp.asarray(rng.random((1, s, hw, hw, 3), np.float32)),
            jnp.asarray(rng.integers(0, 2, (1, s, hw, hw, l))
                        .astype(np.float32)),
            jnp.asarray(rng.integers(0, 2, (1, s, hw, hw))
                        .astype(np.float32)),
            jnp.asarray(rng.integers(0, 2, (1, hw, hw, l))
                        .astype(np.float32)),
            jnp.asarray(rng.integers(0, 2, (1, hw, hw)).astype(np.float32)))
    rec = tsnet_forward(mods, params, *args, use_pallas=False)["rec_img"]
    rec_r = tsnet_forward(mods_r, params, *args, use_pallas=False)["rec_img"]
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec_r), atol=1e-5)

    # gradients flow through the remat boundaries
    def loss(p):
        return jnp.sum(tsnet_forward(mods_r, p, *args,
                                     use_pallas=False)["rec_img"] ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_use_pallas_false_is_pallas_free():
    """use_pallas=False is the debugging escape hatch for bisecting
    Pallas/Mosaic issues on TPU; it must not trace ANY pallas_call
    (advisor round-2 finding: fuse_train's fused IN snuck one in)."""
    import jax
    import jax.numpy as jnp
    from wacv23_tsnet_tpu.models import TSNetModules, tsnet_forward
    from wacv23_tsnet_tpu.models.tsnet import (decode_with_sources,
                                               encode_sources)

    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    s, hw, l = cfg.n_source, cfg.image_size, cfg.label_nc
    src_img = jnp.asarray(rng.random((1, s, hw, hw, 3), np.float32))
    src_lbl = jnp.asarray(rng.integers(0, 2, (1, s, hw, hw, l))
                          .astype(np.float32))
    src_box = jnp.asarray(rng.integers(0, 2, (1, s, hw, hw))
                          .astype(np.float32))
    tar_img = jnp.asarray(rng.random((1, hw, hw, 3), np.float32))
    tar_lbl = jnp.asarray(rng.integers(0, 2, (1, hw, hw, l))
                          .astype(np.float32))
    tar_box = jnp.asarray(rng.integers(0, 2, (1, hw, hw)).astype(np.float32))

    jaxpr = jax.make_jaxpr(
        lambda p: tsnet_forward(mods, p, src_img, src_lbl, src_box, tar_lbl,
                                tar_box, tar_img=tar_img, train=True,
                                use_pallas=False)["rec_img"])(params)
    assert "pallas" not in str(jaxpr)

    # clip path too (fuse_clip shares the fused-IN helper)
    pack = encode_sources(mods, params, src_img[0], src_lbl[0], src_box[0])
    jaxpr2 = jax.make_jaxpr(
        lambda p: decode_with_sources(mods, p, pack, tar_lbl, tar_box,
                                      use_pallas=False))(params)
    assert "pallas" not in str(jaxpr2)


def test_poly_lr_schedule_matches_reference():
    from wacv23_tsnet_tpu.train.schedule import lr_poly

    def ref_lr_poly(base_lr, it, initial_iter, max_iter, power):
        # reference model/TSNet.py:523-524
        return base_lr * ((1 - max(0, float(it - initial_iter)
                                   / (max_iter - initial_iter))) ** power)

    for it in [0, 50, 100, 500, 999]:
        want = ref_lr_poly(2e-4, it, 100, 1000, 1.0)
        got = float(lr_poly(2e-4, it, 100, 1000, 1.0))
        assert abs(want - got) < 1e-9  # jnp computes in float32
