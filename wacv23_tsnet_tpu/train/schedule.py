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
    # clamped to [0, 1]: identical to the reference formula
    # (model/TSNet.py:523-524) inside its domain, but training past
    # max_iter yields lr=0 instead of a NEGATIVE lr (power=1) or NaN
    # (fractional power on a negative base) — reachable with small
    # datasets where steps_per_epoch * max_epoch < final_step
    frac = jnp.clip((it - initial_iter) / (max_iter - initial_iter),
                    0.0, 1.0)
    return base_lr * (1.0 - frac) ** power


def get_scheduler(policy: str, base_lr: float, *, n_epochs: int = 100,
                  epoch_count: int = 1, n_epochs_decay: int = 100,
                  lr_decay_iters: int = 50, steps_per_epoch: int = 1):
    """Per-step LR schedule factory (reference get_scheduler,
    networks.py:38-64): linear | step | cosine as optax schedules.

    The torch 'plateau' policy is metric-driven and has no pure-schedule
    equivalent; `plateau_scale` below provides the stateful counterpart.
    Vestigial for TS-Net itself (which uses the poly schedule above), kept
    for zoo parity (SURVEY.md C2).
    """
    import optax

    def per_epoch(fn):
        return lambda step: fn(step // steps_per_epoch)

    if policy == "linear":
        def lam(epoch):
            return base_lr * (1.0 - jnp.maximum(
                0.0, epoch + epoch_count - n_epochs) / float(n_epochs_decay + 1))
        return per_epoch(lam)
    if policy == "step":
        return per_epoch(lambda epoch: base_lr * 0.1 ** (epoch // lr_decay_iters))
    if policy == "cosine":
        sched = optax.cosine_decay_schedule(base_lr, n_epochs, alpha=0.0)
        return per_epoch(sched)
    raise NotImplementedError(f"learning rate policy [{policy}] "
                              "is not implemented")


class PlateauScale:
    """ReduceLROnPlateau counterpart (host-side, metric-driven)."""

    def __init__(self, base_lr: float, factor: float = 0.2,
                 threshold: float = 0.01, patience: int = 5):
        self.lr = base_lr
        self.factor = factor
        self.threshold = threshold
        self.patience = patience
        self.best = float("inf")
        self.bad_epochs = 0

    def update(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr
