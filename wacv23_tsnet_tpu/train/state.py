"""Training state: params + Adam moments for generator and discriminators.

The reference keeps five separate Adam optimizers with per-subnet
learning rates (reference model/TSNet.py:234-246): img_enc/lbl_enc/
fuse_net at lr, dec at lambda_dec*lr, D at 0.5*lr. Adam moments are
elementwise, so one `scale_by_adam` over each param tree plus per-subnet
update scaling is mathematically identical — and it keeps the whole GAN
step one jitted function.

Checkpoint note: like the reference (train_face.py:350-358), optimizer
moments can be dropped on export; `train.checkpoint` saves them anyway so
OUR resume is exact.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


@struct.dataclass
class TSNetTrainState:
    step: jax.Array                      # int32 scalar, counts train steps
    gen_params: Any                      # {img_enc, lbl_enc, dec, fuse_net}
    disc_params: Any                     # {netD[, netDF]}
    gen_opt_state: Any
    disc_opt_state: Any
    vgg_params: Any = struct.field(pytree_node=True, default=None)


def adam_transform(beta1: float = 0.5, beta2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """Bias-corrected Adam moments, NO lr scaling (applied by the caller).

    Matches torch.optim.Adam(betas=(beta1, beta2), eps=1e-8)
    (reference model/TSNet.py:234-238).
    """
    return optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps)


def create_train_state(mods, rng: jax.Array,
                       vgg_params: Optional[Any] = None,
                       beta1: float = 0.5) -> TSNetTrainState:
    import jax.numpy as jnp

    g_rng, d_rng = jax.random.split(rng)
    gen_params = mods.init_generator_params(g_rng)
    disc_params = mods.init_discriminator_params(d_rng)
    opt = adam_transform(beta1=beta1)
    return TSNetTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        disc_params=disc_params,
        gen_opt_state=opt.init(gen_params),
        disc_opt_state=opt.init(disc_params),
        vgg_params=vgg_params,
    )
