import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from dmft_ed_tpu import ozaki
from dmft_ed_tpu.pallas_kernels import matmul_fused

n = 3432
rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(n, n)))
B = jnp.asarray(rng.normal(size=(n, n)))

try:
    f = jax.jit(lambda a, b: matmul_fused(a, b, 6, 128, 128))
    C = f(A, B); C.block_until_ready()
    ref = ozaki.matmul(A, B, 6)
    err = float(jnp.max(jnp.abs(C - ref)) / jnp.max(jnp.abs(ref)))
    best = np.inf
    for _ in range(3):
        # vary input to dodge tunnel memoization
        A2 = A * (1.0 + 1e-12)
        t0 = time.time(); C = f(A2, B); C.block_until_ready()
        best = min(best, time.time() - t0)
    print(f"pallas fused 128-tile: {best*1e3:.2f} ms, rel err {err:.2e}", flush=True)
except Exception as e:
    print("pallas fused FAILED:", type(e).__name__, str(e)[:500], flush=True)

g = jax.jit(lambda a, b: ozaki.matmul(a, b, 5, 7))
C = g(A, B); C.block_until_ready()
best = np.inf
for _ in range(3):
    A2 = A * (1.0 + 1e-12)
    t0 = time.time(); C = g(A2, B); C.block_until_ready()
    best = min(best, time.time() - t0)
print(f"xla ozaki5x7:          {best*1e3:.2f} ms", flush=True)
