"""VGG19 feature extractor for the perceptual loss.

Reproduces reference `Vgg19` (model/TSNet.py:542-572): torchvision VGG19
`.features` sliced at relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1.
Only the 13 convs up to conv5_1 are needed. The reference feeds the
model-space images (BGR, /255, mean-subtracted, tanh-range fakes)
straight in with NO ImageNet renormalization — a quirk we reproduce.

Weights: torchvision is not available in this environment (and there is
no network egress), so `load_vgg19_params` loads a converted `.npz`
(written by `compat.export_vgg19_npz` wherever torchvision weights ARE
available) and falls back to a fixed-seed random init with a loud
warning. A randomly-initialized VGG is still a valid perceptual metric
(random-feature perceptual losses are an established technique), but the
published checkpoint parity path requires the real weights.
"""

from __future__ import annotations

import os
import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# channels of the 13 convs up to conv5_1
_VGG_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512, 512)
# taps (indices into the conv list) that produce relu{1..5}_1
_TAPS = (0, 2, 4, 8, 12)
# maxpool AFTER the relu of these conv indices
_POOL_AFTER = (1, 3, 7, 11)

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.pardir, "weights", "vgg19_features.npz",
)


class VGG19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] activations."""

    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bwd_precision: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        from .blocks import DPConv
        taps = []
        for i, ch in enumerate(_VGG_CHANNELS):
            x = DPConv(ch, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=nn.initializers.lecun_normal(),
                       dtype=self.dtype, precision=self.precision,
                       bwd_precision=self.bwd_precision, name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in _TAPS:
                taps.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def load_vgg19_params(path: str | None = None) -> dict:
    """Load converted VGG19 conv weights, or a deterministic fallback."""
    path = path or os.environ.get("TSNET_VGG19_NPZ", os.path.abspath(DEFAULT_WEIGHTS))
    if os.path.exists(path):
        data = np.load(path)
        params = {}
        for i in range(len(_VGG_CHANNELS)):
            params[f"conv{i}"] = {
                "kernel": jnp.asarray(data[f"conv{i}_kernel"]),  # HWIO
                "bias": jnp.asarray(data[f"conv{i}_bias"]),
            }
        return {"params": params}
    warnings.warn(
        "VGG19 weights not found at %s — using a fixed-seed random init. "
        "The perceptual loss remains a valid training signal but is NOT "
        "checkpoint-parity with the torchvision-pretrained reference. "
        "Export real weights with compat.export_vgg19_npz." % path,
        stacklevel=2,
    )
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return VGG19Features().init(jax.random.PRNGKey(0), dummy)
