import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_enable_x64", True)
from dmft_ed_tpu import ozaki
from dmft_ed_tpu.pallas_kernels import matmul_fused

n = 3432
rng = np.random.default_rng(0)
V0 = jnp.asarray(rng.normal(size=(n, n)))
B = jnp.asarray(rng.normal(size=(n, n)))
NITER = 10

def chain(f):
    @jax.jit
    def loop(v):
        def step(v, _):
            c = f(v, B)
            return c / jnp.max(jnp.abs(c)), None
        return lax.scan(step, v, None, length=NITER)[0]
    return loop

def timeit(name, f):
    loop = chain(f)
    r = loop(V0); r.block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.time(); r = loop(V0); r.block_until_ready()
        best = min(best, time.time() - t0)
    print(f"{name}: {best/NITER*1e3:.2f} ms/apply", flush=True)

timeit("pallas fused 6x6 128t", lambda a, b: matmul_fused(a, b, 6, 128, 128))


