"""On-chip parity + timing: fuse_clip with the fused pair-block kernel
vs the XLA composition, shipped clip scale."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from wacv23_tsnet_tpu.nn.fusenet import FuseNet, fuse_clip

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
S, F, HW, C = 3, 128, 32, 512
REPEATS = 8

net = FuseNet(ngf=2 * C, n_blocks=1, dtype=jnp.bfloat16,
              precision="default")
src = jnp.asarray(rng.standard_normal((S, HW, HW, C)), jnp.float32)
tar = jnp.asarray(rng.standard_normal((F, HW, HW, C)), jnp.float32)
params = net.init(jax.random.PRNGKey(0), src,
                  jnp.broadcast_to(tar[:1], src.shape))["params"]

# fp32/HIGHEST truth from the generic path
truth = np.asarray(jax.jit(lambda p, a, t: fuse_clip(
    p, a, t, dtype=jnp.float32, precision="highest",
    use_pallas=False))(params, src, tar), np.float32)

outs = {}
for pallas in (False, True):
    y = np.asarray(jax.jit(lambda p, a, t, u=pallas: fuse_clip(
        p, a, t, dtype=jnp.bfloat16, precision="default",
        use_pallas=u))(params, src, tar), np.float32)
    e = np.abs(y - truth)
    outs[pallas] = e
    print(f"[bf16 pallas={pallas}] vs f32 truth: maxerr {e.max():.2e} "
          f"mean {e.mean():.2e}", flush=True)
assert outs[True].mean() < outs[False].mean() * 1.3 + 1e-4


def timed(pallas):
    @jax.jit
    def run(p, a, t):
        def body(c, _):
            out = fuse_clip(p, a, t + c.astype(t.dtype),
                            dtype=jnp.bfloat16, precision="default",
                            use_pallas=pallas)
            return jnp.sum(jnp.abs(out.astype(jnp.float32))) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPEATS)
        return c
    float(run(params, src, tar))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, src, tar))
        ts.append((time.perf_counter() - t0) / REPEATS)
    return float(np.median(ts)) * 1e3


ms_x = timed(False)
ms_p = timed(True)
print(f"fuse_clip XLA {ms_x:.1f} ms/clip -> fused kernel {ms_p:.1f} "
      f"ms/clip ({ms_x/ms_p:.2f}x)", flush=True)
print("OK", flush=True)
