"""Round-4 chip bisect of the HEAD perf regression (633 -> 406 fps).

Times the full clip forward (bench.py methodology: jit->checksum,
pipelined x5) with each session-3 kernel toggled off independently:

  head        - HEAD defaults (expect ~630 ms/clip)
  stem_module - folded-stem encoders replaced by the flax module path
  pair_xla    - fused FuseNet pair-block kernel -> XLA hp composition
  inmean_256  - instance_norm_mean channel blocks 1024 -> 256 (r02 form)
  dec_xla     - decoder pallas resblocks -> XLA path

Whichever toggle restores ~680 fps is the regression.
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import face_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward_clip

N_SOURCE, SIZE, LABEL_NC, CLIP_FRAMES = 3, 256, 2, 256

cfg = dataclasses.replace(face_config(), precision="high", fast_tail=True)
mods = TSNetModules(cfg)
params = mods.init_generator_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
src_img = jnp.asarray(rng.random((N_SOURCE, SIZE, SIZE, 3), np.float32))
src_lbl = jnp.asarray(
    rng.integers(0, 2, (N_SOURCE, SIZE, SIZE, LABEL_NC)).astype(np.float32))
src_bbox = jnp.asarray(
    rng.integers(0, 2, (N_SOURCE, SIZE, SIZE)).astype(np.float32))
tar_lbl = jnp.asarray(
    rng.integers(0, 2, (CLIP_FRAMES, SIZE, SIZE, LABEL_NC)).astype(np.float32))
tar_bbox = jnp.asarray(
    rng.integers(0, 2, (CLIP_FRAMES, SIZE, SIZE)).astype(np.float32))
args = (params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox)

import wacv23_tsnet_tpu.nn.encoder as enc_mod
import wacv23_tsnet_tpu.nn.decoder as dec_mod

orig_stem = enc_mod.encoder_apply_fast
orig_dec = dec_mod.decoder_apply_fast


def module_stem(mod, p, x):
    return mod.apply({"params": p}, x)


def dec_noblocks(mod, p, pf, sf, return_fea=False, use_pallas_blocks=True):
    return orig_dec(mod, p, pf, sf, return_fea=return_fea,
                    use_pallas_blocks=False)


def run(tag):
    fwd = functools.partial(tsnet_forward_clip, mods, use_pallas=True)
    fn = jax.jit(lambda p, *a: jnp.sum(jnp.abs(fwd(p, *a))))
    t0 = time.perf_counter()
    checksum = float(fn(*args))
    print(f"[{tag}] compile+first: {time.perf_counter() - t0:.1f}s "
          f"(checksum {checksum:.1f})", flush=True)
    iters = 5
    t0 = time.perf_counter()
    sums = [fn(*args) for _ in range(iters)]
    for s_ in sums:
        float(s_)
    dt = (time.perf_counter() - t0) / iters
    print(f"[{tag}] {dt * 1e3:.1f} ms/clip = "
          f"{CLIP_FRAMES / dt:.1f} fps", flush=True)


print(f"devices: {jax.devices()}", flush=True)

run("head")

enc_mod.encoder_apply_fast = module_stem
run("stem_module")
enc_mod.encoder_apply_fast = orig_stem

os.environ["TSNET_FUSE_PAIR_KERNEL"] = "0"
run("pair_xla")
os.environ["TSNET_FUSE_PAIR_KERNEL"] = "1"

os.environ["TSNET_IN_MEAN_CC"] = "256"
run("inmean_256")
os.environ.pop("TSNET_IN_MEAN_CC")

dec_mod.decoder_apply_fast = dec_noblocks
run("dec_xla")
dec_mod.decoder_apply_fast = orig_dec

print("bisect done", flush=True)
