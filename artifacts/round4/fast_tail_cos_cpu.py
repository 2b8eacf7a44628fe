"""Fast-tail training tier, CPU gradient-drift screen (toy scale).

fast_tail=True runs the decoder + FuseNet in bf16/default-MXU (the
shipped *inference* fast tier). Unlike the rejected bf16-trunk tier
(cosine 0.18 — bf16-rounding the encoder outputs feeds the temp-100
attention), the fast tail is downstream of the similarity branch, so
the attention inputs stay f32. This screens whether the tier keeps
gradient direction before burning chip time on it.
"""
import dataclasses
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

# the image pins JAX_PLATFORMS=axon via sitecustomize; env alone loses
jax.config.update("jax_platforms", "cpu")
import jax.flatten_util
import jax.numpy as jnp

from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.models import TSNetModules
from wacv23_tsnet_tpu.models.tsnet import tsnet_forward

cfg0 = toy_config()
bs, hw, l, s = 2, cfg0.image_size, cfg0.label_nc, cfg0.n_source
r = np.random.default_rng(0)
batch = {k: jnp.asarray(v) for k, v in {
    "src_img": r.random((bs, s, hw, hw, 3), np.float32),
    "src_lbl": r.integers(0, 2, (bs, s, hw, hw, l)).astype(np.float32),
    "src_bbox": r.integers(0, 2, (bs, s, hw, hw)).astype(np.float32),
    "tar_img": r.random((bs, hw, hw, 3), np.float32),
    "tar_lbl": r.integers(0, 2, (bs, hw, hw, l)).astype(np.float32),
    "tar_bbox": r.integers(0, 2, (bs, hw, hw)).astype(np.float32),
}.items()}

grads = {}
for tag, ft in [("base", False), ("fast_tail", True)]:
    cfg = dataclasses.replace(cfg0, precision="high",
                              bwd_precision="default", fast_tail=ft)
    mods = TSNetModules(cfg)
    params = mods.init_generator_params(jax.random.PRNGKey(0))

    def loss(p):
        out = tsnet_forward(mods, p, batch["src_img"], batch["src_lbl"],
                            batch["src_bbox"], batch["tar_lbl"],
                            batch["tar_bbox"], tar_img=batch["tar_img"],
                            train=True)
        return (jnp.mean(jnp.abs(out["rec_img"] - batch["tar_img"]))
                + 1e-3 * out["loss_warp"])

    g = jax.jit(jax.grad(loss))(params)
    flat, _ = jax.flatten_util.ravel_pytree(
        jax.tree.map(lambda t: np.asarray(t, np.float32), g))
    grads[tag] = np.asarray(flat, np.float64)
    print(f"[{tag}] grad norm {np.linalg.norm(grads[tag]):.6f}", flush=True)

hi, lo = grads["base"], grads["fast_tail"]
cos = float(np.dot(hi, lo) / (np.linalg.norm(hi) * np.linalg.norm(lo)))
rel = float(np.linalg.norm(hi - lo) / np.linalg.norm(hi))
print(f"fast_tail grad cosine={cos:.6f} rel_l2={rel:.6f}")
