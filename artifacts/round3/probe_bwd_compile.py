"""Staged Mosaic-compile probe for the backward kernel: small shapes
first, then shipped scale, timing each pallas_call compile separately."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from wacv23_tsnet_tpu.ops import pallas_similarity as ps

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def probe(g, ns, nf, h, w, c):
    t = h * w
    args = (
        jnp.asarray(rng.standard_normal((g, ns, t, c)), jnp.float32),
        jnp.asarray(rng.standard_normal((g, nf, t, c)), jnp.float32),
        jnp.asarray(rng.standard_normal((g, ns, t, c)), jnp.float32),
        jnp.asarray(rng.integers(0, 2, (g, nf, t, 1)), jnp.float32),
        jnp.asarray(rng.integers(0, 2, (g, ns, 1, t)), jnp.float32),
        jnp.asarray(rng.standard_normal((t, ps._LANES)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, t)), jnp.float32),
        jnp.asarray(rng.standard_normal((g, ns, nf, t, c)), jnp.float32),
        jnp.asarray(rng.standard_normal((g, ns, nf, t, ps._LANES)),
                    jnp.float32),
    )

    fn = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.sum(jnp.abs(x)),
        ps._pairs_bwd_pallas(a[0], a[1], a[2], a[3], a[4], a[5], a[6],
                             a[7], a[8], 100.0, h, w)))
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  bwd kernel g={g} ns={ns} nf={nf} t={t} c={c}: "
          f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)


probe(1, 1, 1, 16, 16, 128)   # tiny: 256 pixels, 2 tiles at tile=128
probe(1, 2, 1, 32, 32, 512)   # shipped feature scale, small pair count
probe(3, 3, 1, 32, 32, 512)   # shipped train shape (bs=3 slice)
