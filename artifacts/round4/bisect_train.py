"""Round-4 chip bisect of the train-step regression (708 -> 828 ms).

Times the bs=15 jitted D+G step (bench.py methodology) with each
session-3 train-path change toggled off independently:

  head        - HEAD defaults (expect ~830 ms)
  stem_module - folded-stem encoders -> flax module path (pre-27ca496)
  inmean_256  - instance_norm_mean blocks 1024 -> 256 (pre-66a4942)
  inmean_xla  - instance_norm_mean -> XLA composition (pre-r02 form)
"""
import dataclasses
import os
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.nn import load_vgg19_params
from wacv23_tsnet_tpu.train.state import create_train_state
from wacv23_tsnet_tpu.train.step import make_train_step

cfg = dataclasses.replace(face_config(), precision="high")
mods = TSNetModules(cfg)
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    vgg = load_vgg19_params()
rng = np.random.default_rng(0)
bs, hw, l, s = 15, cfg.image_size, cfg.label_nc, cfg.n_source
batch = {k: jnp.asarray(v) for k, v in {
    "src_img": rng.random((bs, s, hw, hw, 3), np.float32),
    "src_lbl": rng.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
    "src_bbox": rng.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
    "tar_img": rng.random((bs, hw, hw, 3), np.float32),
    "tar_lbl": rng.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
    "tar_bbox": rng.integers(0, 2, (bs, hw, hw)).astype(np.float32),
}.items()}

import wacv23_tsnet_tpu.nn.encoder as enc_mod
import wacv23_tsnet_tpu.nn.fusenet as fuse_mod
from wacv23_tsnet_tpu.ops.pallas_norms import _in_mean_ref

orig_stem = enc_mod.encoder_apply_fast
orig_in_mean = fuse_mod._in_mean


def module_stem(mod, p, x):
    return mod.apply({"params": p}, x)


def run(tag):
    # fresh VGG buffer copies: state is donated, so a previous variant's
    # steps deleted the shared arrays
    vgg_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), vgg)
    state = create_train_state(mods, jax.random.PRNGKey(0),
                               vgg_params=vgg_copy)
    step = make_train_step(mods, donate=True)
    t0 = time.perf_counter()
    state, _, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    print(f"[{tag}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _, r = step(state, batch, jnp.float32(2e-4))
    float(jnp.sum(r))
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"[{tag}] {ms:.0f} ms/step", flush=True)


print(f"devices: {jax.devices()}", flush=True)

run("head")

enc_mod.encoder_apply_fast = module_stem
run("stem_module")
enc_mod.encoder_apply_fast = orig_stem

os.environ["TSNET_IN_MEAN_CC"] = "256"
run("inmean_256")
os.environ.pop("TSNET_IN_MEAN_CC")

fuse_mod._in_mean = lambda x, use_pallas: _in_mean_ref(x, 1e-5, None)
run("inmean_xla")
fuse_mod._in_mean = orig_in_mean

print("bisect done", flush=True)
