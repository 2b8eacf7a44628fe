"""Multi-device SPMD tests on the 8-virtual-CPU-device backend."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip
from wacv23_tsnet_tpu.parallel import make_mesh, make_parallel_clip_infer
from wacv23_tsnet_tpu.parallel.spmd import (generator_param_shardings,
                                            shard_batch)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

RNG = np.random.default_rng(5)


def _clip_args(cfg, frames=8):
    s, hw, l = cfg.n_source, cfg.image_size, cfg.label_nc
    return (
        jnp.asarray(RNG.random((s, hw, hw, 3), np.float32)),
        jnp.asarray(RNG.integers(0, 2, (s, hw, hw, l)).astype(np.float32)),
        jnp.asarray(RNG.integers(0, 2, (s, hw, hw)).astype(np.float32)),
        jnp.asarray(RNG.integers(0, 2, (frames, hw, hw, l)).astype(np.float32)),
        jnp.asarray(RNG.integers(0, 2, (frames, hw, hw)).astype(np.float32)),
    )


def test_dp_clip_inference_matches_single_device():
    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    args = _clip_args(cfg)

    want = jax.jit(
        lambda p, *a: tsnet_forward_clip(mods, p, *a, use_pallas=False)
    )(params, *args)

    mesh = make_mesh(8, model_parallel=1)
    run = make_parallel_clip_infer(mods, mesh)
    got = run(params, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5)


def test_tp_sp_clip_inference_matches_single_device():
    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    args = _clip_args(cfg)

    want = jax.jit(
        lambda p, *a: tsnet_forward_clip(mods, p, *a, use_pallas=False)
    )(params, *args)

    mesh = make_mesh(8, model_parallel=4)
    params_tp = jax.device_put(
        params, generator_param_shardings(params, mesh))
    run = make_parallel_clip_infer(mods, mesh, spatial_parallel=True)
    got = run(params_tp, *args)
    # sharded contractions reorder reductions; the temp-100 softmax
    # amplifies that float noise, so tolerances are looser than DP
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert diff.max() < 5e-3, diff.max()
    assert diff.mean() < 2e-4, diff.mean()


def test_multichip_dryrun_entry():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_param_sharding_rule():
    cfg = toy_config()
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))
    mesh = make_mesh(8, model_parallel=2)
    sh = generator_param_shardings(params, mesh)
    # block convs are TP-sharded, stem convs replicated
    from jax.sharding import PartitionSpec as P
    assert sh["fuse_net"]["block0"]["conv1"]["kernel"].spec == \
        P(None, None, None, "model")
    assert sh["fuse_net"]["block0"]["conv2"]["kernel"].spec == \
        P(None, None, "model", None)
    assert sh["img_enc"]["conv_in"]["kernel"].spec == P()
