import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_enable_x64", True)

def probe(m, k, n, iters=20):
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.integers(-64, 64, (k, n)), jnp.int8)
    A0 = jnp.asarray(rng.integers(-64, 64, (m, k)), jnp.int8)
    reps = k // n  # assumes k multiple of n
    @jax.jit
    def loop(A):
        def step(a, _):
            c = lax.dot_general(a, B, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            nxt = (c & 63).astype(jnp.int8) - 32
            if reps > 1:
                nxt = jnp.tile(nxt, (1, reps))
            return nxt, c[0, 0]
        return lax.scan(step, A, None, length=iters)
    af, cs = loop(A0); af.block_until_ready()
    best = np.inf
    for _ in range(3):
        t0 = time.time(); af, cs = loop(A0); af.block_until_ready()
        best = min(best, time.time() - t0)
    tops = 2.0 * m * k * n * iters / best / 1e12
    print(f"s8 [{m},{k}]x[{k},{n}]: {best/iters*1e3:.2f} ms/mm, {tops:.1f} TOPS", flush=True)

for shape in [(3432, 3432, 3432), (3456, 3456, 3456), (4096, 4096, 4096),
              (8192, 8192, 8192), (3432, 17160, 3432), (3456, 17280, 3456)]:
    probe(*shape)
