"""Learning-rate schedules.

The reference applies a per-step polynomial decay AFTER an initial
constant phase (reference model/TSNet.py:523-524, `setup`:504-512):

    lr(it) = base_lr * (1 - max(0, (it - initial) / (max - initial)))**power

where `it` counts EXAMPLES (step * batch_size), the decoder runs at
`lambda_dec * lr` and the discriminator at `0.5 * lr`.
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_poly(base_lr: float, it, initial_iter: int, max_iter: int,
            power: float = 1.0):
    frac = jnp.maximum(0.0, (it - initial_iter) / (max_iter - initial_iter))
    return base_lr * (1.0 - frac) ** power
