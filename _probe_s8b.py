import sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_enable_x64", True)

def probe(m, k, n, iters=8, dt=jnp.int8):
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.integers(-64, 64, (k, n)), dt)
    As = jnp.asarray(rng.integers(-64, 64, (iters, m, k)), dt)
    acc_t = jnp.int32 if dt == jnp.int8 else jnp.float32
    @jax.jit
    def loop(As):
        def step(acc, a):
            c = lax.dot_general(a, B, (((1,), (0,)), ((), ())),
                                preferred_element_type=acc_t)
            return acc + jnp.max(c), None
        return lax.scan(step, jnp.zeros((), acc_t), As)[0]
    r = loop(As); r.block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.time(); r = loop(As); r.block_until_ready()
        best = min(best, time.time() - t0)
    tops = 2.0 * m * k * n * iters / best / 1e12
    print(f"{np.dtype(dt).name} [{m},{k}]x[{k},{n}]: {best/iters*1e3:.3f} ms/mm, {tops:.1f} TOPS", flush=True)

for a in sys.argv[1:]:
    parts = a.split(",")
    m, k, n = int(parts[0]), int(parts[1]), int(parts[2])
    dt = jnp.bfloat16 if len(parts) > 3 and parts[3] == "bf16" else jnp.int8
    probe(m, k, n, dt=dt)
