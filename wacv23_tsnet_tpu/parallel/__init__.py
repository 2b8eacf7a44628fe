from .mesh import make_mesh
from .spmd import (batch_sharding, make_parallel_train_step,
                   make_parallel_clip_infer, generator_param_shardings,
                   replicated)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "generator_param_shardings",
    "make_parallel_train_step",
    "make_parallel_clip_infer",
]
