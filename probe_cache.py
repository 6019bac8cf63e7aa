"""Probe: does jax's persistent compilation cache work with the axon
TPU tunnel backend? (VERDICT r4 item 1.)

Run twice as separate processes; if the cache serializes axon executables,
the second process's compile times collapse.

Usage: python probe_cache.py [tag]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

CACHE_DIR = "/root/repo/.jax_cache_probe"
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import logging
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
logging.basicConfig(level=logging.INFO)

import jax.numpy as jnp

tag = sys.argv[1] if len(sys.argv) > 1 else "run"
print(f"[{tag}] backend: {jax.default_backend()}", flush=True)

from jax import lax


@jax.jit
def probe_fn(x, y):
    # distinctive enough not to collide with other sessions' cache keys
    def body(carry, _):
        a, b = carry
        a = jnp.tanh(a @ y + 0.123456) + b * 0.5
        b = a - b * 0.987
        return (a, b), jnp.sum(a)
    (a, b), s = lax.scan(body, (x, x), None, length=8)
    return a @ b.T + s[-1]


x = jnp.ones((384, 384), jnp.float32)
y = jnp.ones((384, 384), jnp.float32)

t0 = time.time()
probe_fn(x, y).block_until_ready()
t1 = time.time()
print(f"[{tag}] first call (compile+run): {t1-t0:.3f} s", flush=True)

t0 = time.time()
probe_fn(x + 1.0, y).block_until_ready()
t1 = time.time()
print(f"[{tag}] second call (cached-in-process): {t1-t0:.4f} s", flush=True)

if os.path.isdir(CACHE_DIR):
    entries = os.listdir(CACHE_DIR)
    total = sum(os.path.getsize(os.path.join(CACHE_DIR, e)) for e in entries)
    print(f"[{tag}] cache dir: {len(entries)} entries, {total} bytes", flush=True)
else:
    print(f"[{tag}] cache dir missing", flush=True)
