"""On-chip check of the flash backward: Mosaic compile, grad exactness at
shipped scale, and timing vs the einsum VJP (run on the real TPU).

NB: cotangents are jit ARGUMENTS — closing over them embeds ~70 MB of
constants in the HLO and the remote compile service chokes (round-2
note: big graphs fail/hang remote compile)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from wacv23_tsnet_tpu.ops import pallas_similarity as ps

print("backend:", jax.default_backend(), jax.devices(), flush=True)

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

temp = 10.0  # unsaturated softmax so grads are non-trivial (see tests)
fused = functools.partial(ps.transform_warp_pairs, h=h, w=w, temp=temp)
fused3 = functools.partial(ps.transform_warp_pairs, h=h, w=w, temp=temp,
                           bwd_fast3=True)
ref = functools.partial(ps._pairs_ref, h=h, w=w, temp=temp)


@jax.jit
def vf(gw_, gf_, *a):
    return jax.vjp(fused, *a)[1]((gw_, gf_))


@jax.jit
def vf3(gw_, gf_, *a):
    return jax.vjp(fused3, *a)[1]((gw_, gf_))


@jax.jit
def vr(gw_, gf_, *a):
    return jax.vjp(ref, *a)[1]((gw_, gf_))


t0 = time.perf_counter()
gfu = vf(gw, gf, *args)
jax.block_until_ready(gfu)
print(f"fused bwd compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
gre = vr(gw, gf, *args)
jax.block_until_ready(gre)
print(f"einsum bwd compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
gf3 = vf3(gw, gf, *args)
jax.block_until_ready(gf3)
print(f"fast3 bwd compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)

names = ["da", "gtn", "gsn", "gmt", "gms", "ggrid"]
for n, a_, b_ in zip(names, gfu, gre):
    scale = float(jnp.max(jnp.abs(b_))) or 1.0
    err = float(jnp.max(jnp.abs(a_ - b_))) / scale
    print(f"  {n}: rel maxerr {err:.2e} (scale {scale:.2e})", flush=True)
print("fast3 vs einsum VJP:", flush=True)
for n, a_, b_ in zip(names, gf3, gre):
    scale = float(jnp.max(jnp.abs(b_))) or 1.0
    err = float(jnp.max(jnp.abs(a_ - b_))) / scale
    print(f"  {n}: rel maxerr {err:.2e} (scale {scale:.2e})", flush=True)

for name, fn in (("fused_bwd", vf), ("fast3_bwd", vf3), ("einsum_bwd", vr)):
    outs = [fn(gw, gf, *args) for _ in range(10)]
    for o in outs:
        jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [fn(gw, gf, *args) for _ in range(10)]
    for o in outs:
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    print(f"{name}: {dt * 1e3:.2f} ms (g={g} ns={ns} nf={nf} 1024x1024x512)",
          flush=True)
