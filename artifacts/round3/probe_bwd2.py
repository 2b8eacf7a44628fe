"""Granular isolation: forward-only jit, wrapper-backward jit, then the
combined vjp jit — find which one hangs the remote compile."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from wacv23_tsnet_tpu.ops import pallas_similarity as ps

print("backend:", jax.default_backend(), flush=True)
g, ns, nf, h, w, c = 3, 3, 1, 32, 32, 512
t = h * w
rng = np.random.default_rng(0)
norm = lambda x: x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True),
                                1e-12)
src_fea = jnp.asarray(rng.standard_normal((g, ns, t, c)), jnp.float32)
tar_fea_n = jnp.asarray(norm(rng.standard_normal((g, nf, t, c))), jnp.float32)
src_fea_n = jnp.asarray(norm(np.asarray(src_fea)), jnp.float32)
tar_mask = jnp.asarray(rng.integers(0, 2, (g, nf, t)), jnp.float32)
src_mask = jnp.asarray(rng.integers(0, 2, (g, ns, t)), jnp.float32)
ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                     indexing="ij")
grid = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
args = (src_fea, tar_fea_n, src_fea_n, tar_mask, src_mask, grid)
gw = jnp.asarray(rng.standard_normal((g, ns, nf, t, c)), jnp.float32)
gf = jnp.asarray(rng.standard_normal((g, ns, nf, t, 2)) * 0.01, jnp.float32)

temp = 10.0
fused = functools.partial(ps.transform_warp_pairs, h=h, w=w, temp=temp)


def stage(name, fn, *a):
    t0 = time.perf_counter()
    out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


stage("fwd jit", jax.jit(lambda *a: fused(*a)[0]), *args)
stage("bwd wrapper jit",
      jax.jit(lambda gw_, gf_, *a: ps._pairs_bwd(h, w, temp, False, a,
                                                 (gw_, gf_))),
      gw, gf, *args)
vf = jax.jit(lambda gw_, gf_, *a: jax.vjp(fused, *a)[1]((gw_, gf_)))
gfu = stage("vjp jit", vf, gw, gf, *args)

ref = functools.partial(ps._pairs_ref, h=h, w=w, temp=temp)
vr = jax.jit(lambda gw_, gf_, *a: jax.vjp(ref, *a)[1]((gw_, gf_)))
gre = stage("einsum vjp jit", vr, gw, gf, *args)

names = ["da", "gtn", "gsn", "gmt", "gms", "ggrid"]
for nme, a_, b_ in zip(names, gfu, gre):
    scale = float(jnp.max(jnp.abs(b_))) or 1.0
    err = float(jnp.max(jnp.abs(a_ - b_))) / scale
    print(f"  {nme}: rel maxerr {err:.2e} (scale {scale:.2e})", flush=True)

for name, fn in (("fused_bwd", vf), ("einsum_bwd", vr)):
    outs = [fn(gw, gf, *args) for _ in range(10)]
    for o in outs:
        jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [fn(gw, gf, *args) for _ in range(10)]
    for o in outs:
        jax.block_until_ready(o)
    dtm = (time.perf_counter() - t0) / 10
    print(f"{name}: {dtm * 1e3:.2f} ms (g={g} ns={ns} nf={nf} "
          f"1024x1024x512)", flush=True)
print("all good", flush=True)
