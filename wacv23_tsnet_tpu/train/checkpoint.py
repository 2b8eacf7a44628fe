"""Checkpoint save/restore.

Unlike the reference — which drops optimizer state on save
(train_face.py:350-358; SURVEY.md §5 "Optimizer state is NOT saved") —
the full TSNetTrainState round-trips here, so resume is exact. The
serialized form is flax msgpack bytes (pure arrays; restore requires a
structurally-matching template, which `create_train_state` provides).

`export_reference_style` / the compat converters bridge to the
reference's flat {example, img_enc, lbl_enc, dec, fuse_net, netD} .pth
layout for interop with published checkpoints.
"""

from __future__ import annotations

import os
from typing import TypeVar

from flax import serialization

T = TypeVar("T")


def save_checkpoint(path: str, state) -> None:
    data = serialization.to_bytes(state)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template: T) -> T:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def find_latest_checkpoint(snapshot_dir: str,
                           prefix: str = "TSNet_S") -> str | None:
    """Most recent snapshot in a directory, for crash auto-resume.

    (Reference recovery is a manual --restore-from + --set-start restart,
    train_face.py:160-172; this removes the manual step.)
    """
    if not os.path.isdir(snapshot_dir):
        return None
    snaps = sorted(f for f in os.listdir(snapshot_dir)
                   if f.startswith(prefix) and f.endswith(".msgpack"))
    return os.path.join(snapshot_dir, snaps[-1]) if snaps else None


def save_generator_params(path: str, gen_params) -> None:
    """Inference-only export: just the four generator subnets."""
    save_checkpoint(path, gen_params)


def restore_generator_params(path: str, template):
    return restore_checkpoint(path, template)
