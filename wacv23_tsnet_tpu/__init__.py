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
