"""Checkpoint interop: reference .pth round-trips through the demo loader."""

import numpy as np
import jax

from wacv23_tsnet_tpu.compat import save_reference_checkpoint
from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.models import TSNetModules


def test_pth_roundtrip_through_demo_loader(tmp_path):
    import torch  # noqa: F401  (the .pth path requires torch)

    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(5))
    pth = str(tmp_path / "TSNet_B0002_S000123.pth")
    save_reference_checkpoint(pth, params, cfg, example=123)

    from wacv23_tsnet_tpu.cli.demo_face import load_params
    restored = load_params(pth, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_msgpack_roundtrip_through_demo_loader(tmp_path):
    from wacv23_tsnet_tpu.cli.demo_face import load_params
    from wacv23_tsnet_tpu.train.checkpoint import save_checkpoint

    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(6))
    path = str(tmp_path / "gen.msgpack")
    save_checkpoint(path, params)
    restored = load_params(path, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_trainer_snapshot_through_demo_loader(tmp_path):
    """The demos accept a FULL TSNetTrainState snapshot (like the
    reference demo loading the trainer's .pth) and extract gen_params —
    a trainer-output checkpoint previously failed to load."""
    from wacv23_tsnet_tpu.cli.demo_face import load_params
    from wacv23_tsnet_tpu.train.checkpoint import save_checkpoint
    from wacv23_tsnet_tpu.train.state import create_train_state

    cfg = toy_config()
    mods = TSNetModules(cfg)
    state = create_train_state(mods, jax.random.PRNGKey(7))
    path = str(tmp_path / "TSNet_S000042.msgpack")
    save_checkpoint(path, state)
    restored = load_params(path, cfg)
    for a, b in zip(jax.tree.leaves(state.gen_params),
                    jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
