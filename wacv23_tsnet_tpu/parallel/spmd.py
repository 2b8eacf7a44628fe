"""SPMD train/infer wrappers: DP + TP + SP over a device mesh.

Strategy (replacing the reference's single-GPU `.cuda()` plumbing,
SURVEY.md §2.3):

- **Data parallel**: the batch (and, for clip inference, the frame axis)
  is sharded over the `data` mesh axis; parameters and optimizer moments
  either replicate or TP-shard; XLA GSPMD inserts the gradient
  all-reduces over ICI.
- **Tensor parallel**: ResNet-block conv pairs shard out-channels on
  conv1 / in-channels on conv2 over the `model` axis. InstanceNorm is
  per-channel, so channel sharding needs no extra collectives; the conv2
  contraction produces the single psum per block.
- **Sequence/spatial parallel**: the (B, T, S) attention logits of the
  transformation branch are sharding-constrained over target pixels T
  (ops.similarity.spatial_partitioning), partitioning the quadratic
  similarity + softmax + flow matmul across `model`.

Everything is expressed as shardings on arguments + constraints; there
are no hand-written collectives (scaling-book recipe: pick a mesh,
annotate, let XLA insert collectives).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.tsnet import TSNetModules, tsnet_forward_clip
from ..ops.similarity import batch_partitioning, spatial_partitioning
from ..train.step import make_train_step


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def _param_spec(path_names: list[str]) -> P:
    """TP rule for one param leaf, from its flattened path names.

    TP deliberately covers ONLY ResNet-block conv pairs: they hold ~85%
    of generator FLOPs/params and shard without extra collectives (conv1
    out-channels / conv2 in-channels, one psum per block). The stem,
    down/up-sample convs, and discriminators replicate — at 512 max
    channels their per-device compute is too small for a channel split
    to beat the all-reduce it would add, and replicated they need no
    communication at all (this model is ~60M params; memory is not the
    constraint TP exists to solve here).
    """
    inside_block = any(n.startswith("block") for n in path_names)
    leaf = path_names[-1]
    if inside_block and "conv1" in path_names:
        return P(None, None, None, "model") if leaf == "kernel" else P("model")
    if inside_block and "conv2" in path_names:
        return P(None, None, "model", None) if leaf == "kernel" else P()
    return P()


def _path_names(path) -> list[str]:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        else:
            names.append(str(entry))
    return names


def generator_param_shardings(params: Any, mesh: Mesh,
                              tensor_parallel: bool = True) -> Any:
    """Sharding pytree matching `params` (works for full train states too:
    the rule keys on path suffixes, so optimizer moments inherit their
    parameter's sharding)."""

    def leaf_sharding(path, leaf):
        if not tensor_parallel:
            return replicated(mesh)
        return NamedSharding(mesh, _param_spec(_path_names(path)))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_state(state, mesh: Mesh, tensor_parallel: bool = True):
    """device_put a TSNetTrainState onto the mesh with TP shardings."""
    shardings = generator_param_shardings(state, mesh, tensor_parallel)
    return jax.device_put(state, shardings)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    return jax.device_put(batch, jax.tree.map(
        lambda _: batch_sharding(mesh), batch))


def make_parallel_train_step(mods: TSNetModules, mesh: Mesh,
                             spatial_parallel: bool = True, **kwargs):
    """DP(+TP+SP) train step. Call with state/batch placed via
    shard_state/shard_batch; GSPMD propagates from argument shardings.

    With `use_pallas=True` the fused transformation kernel runs under
    `shard_map` over the data axis (ops.similarity.batch_partitioning) —
    a pallas_call is opaque to GSPMD and must be explicitly sharded.
    Requires batch % data-axis == 0. `spatial_parallel` then only
    affects einsum-path code (the kernel owns the full target-pixel
    axis within each shard).
    """
    use_pallas = kwargs.get("use_pallas", True)
    inner = make_train_step(mods, **kwargs)

    import contextlib

    def step(state, batch, lr):
        with contextlib.ExitStack() as stack:
            if spatial_parallel:
                spec = NamedSharding(mesh, P(None, "model", None))
                stack.enter_context(spatial_partitioning(spec))
            if use_pallas:
                stack.enter_context(batch_partitioning(mesh, "data"))
            return inner(state, batch, lr)

    return step


def make_parallel_clip_infer(mods: TSNetModules, mesh: Mesh,
                             use_pallas: bool = False,
                             spatial_parallel: bool = False):
    """Clip inference with driving frames sharded over `data`.

    Sources replicate (they're shared by every frame); each device
    decodes its shard of frames — embarrassingly parallel except the
    shared source encode, which GSPMD runs replicated.
    """
    fn = jax.jit(functools.partial(tsnet_forward_clip, mods,
                                   use_pallas=use_pallas))

    import contextlib

    def run(params, src_img, src_lbl, src_bbox, tar_lbl, tar_bbox):
        params = jax.device_put(params, jax.tree.map(
            lambda _: replicated(mesh), params))
        srcs = jax.device_put((src_img, src_lbl, src_bbox),
                              replicated(mesh))
        tars = jax.device_put((tar_lbl, tar_bbox), jax.tree.map(
            lambda _: batch_sharding(mesh), (tar_lbl, tar_bbox)))
        with contextlib.ExitStack() as stack:
            if spatial_parallel:
                spec = NamedSharding(mesh, P(None, "model", None))
                stack.enter_context(spatial_partitioning(spec))
            if use_pallas:
                # frames shard over data; the Pallas kernel runs per
                # shard under shard_map (opaque to GSPMD otherwise)
                stack.enter_context(batch_partitioning(mesh, "data"))
            return fn(params, *srcs, *tars)

    return run
