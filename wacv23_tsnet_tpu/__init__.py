"""wacv23_tsnet_tpu — a TPU-native reimplementation of TS-Net.

TS-Net ("Transformation-Synthesis Network", WACV 2023) performs
cross-identity video motion retargeting: given a few frames of a subject
video and the landmark/keypoint labels of a driving video, it synthesizes
the subject performing the driving motion.

This package is a ground-up JAX/XLA/Pallas rebuild of the capabilities of
the PyTorch reference (nihaomiao/WACV23_TSNet), designed TPU-first:

- NHWC layouts, static shapes, `jit`-compiled whole-clip inference.
- The transformation branch (mask-aware similarity attention + coordinate
  translator + bilinear warp; reference model/TSNet.py:318-367) runs as a
  fused Pallas kernel on TPU with an einsum reference implementation.
- Training is a single jitted D-then-G GAN update over an optax state.
- Scaling is expressed with `jax.sharding.Mesh` + `shard_map` (data
  parallel over batch; the spatial attention optionally shards over the
  target-pixel axis).

Subpackages:
    configs   dataclass experiment configs (face / pose / toy)
    ops       core tensor ops with torch-parity semantics + Pallas kernels
    nn        flax modules: encoders, decoder, fuse net, discriminators, VGG
    models    the TSNet functional core and the reference-compatible API
    losses    lsgan / feature-matching / VGG perceptual / gradient losses
    data      keypoint codecs, rasterizers, datasets, retargeting
    train     train state, schedules, loops, checkpointing
    infer     clip-batched inference pipelines and writers
    parallel  mesh utilities, data/spatial parallel train + infer steps
    compat    PyTorch .pth checkpoint converters
    cli       train_face / train_pose / demo_face / demo_pose entry points
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the shipped model compiles in tens of
# seconds; caching makes every CLI/test process after the first start
# fast. Disable with TSNET_COMPILATION_CACHE=0.
import os as _os

if _os.environ.get("TSNET_COMPILATION_CACHE", "1") != "0":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("TSNET_CACHE_DIR",
                            _os.path.expanduser("~/.cache/tsnet_jax")))
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
