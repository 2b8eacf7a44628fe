"""Device mesh construction.

The reference is single-GPU (`CUDA_VISIBLE_DEVICES`, SURVEY.md §2.3); the
TPU-native scaling story is a `jax.sharding.Mesh` with a `data` axis for
batch parallelism over ICI and a `model` axis for tensor/spatial
parallelism of the wide layers and the attention. All collectives are
inserted by XLA GSPMD from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """Build an (n/model_parallel, model_parallel) mesh.

    With model_parallel=1 this is pure data parallelism; the mesh keeps
    both axes so the same program works at any split.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    assert n % model_parallel == 0
    grid = np.asarray(devices[:n]).reshape(n // model_parallel,
                                           model_parallel)
    return Mesh(grid, axes)
