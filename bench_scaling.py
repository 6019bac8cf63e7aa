#!/usr/bin/env python
"""Distributed-SpMV scaling harness (BASELINE north star: >=70% scaling
efficiency of the sector H·v at 2+ hosts).

Runs the row-sharded factorized H·v inside the Lanczos recurrence on
meshes of 1, 2, 4, ... shards over whatever devices are visible, and
reports per-shard-count throughput + efficiency vs the single-shard run.

On this container only one real TPU chip is reachable, so multi-shard
numbers are only meaningful when executed on a pod slice; with
JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=N it
validates the sharded program (correct, not representative of ICI).

Prints one JSON line per mesh size + a summary line.
"""

import json
import sys
import time

import numpy as np

import jax

# `--cpu N` runs the sharded program on an N-device virtual CPU mesh via
# the config API (this container's sitecustomize overrides JAX_PLATFORMS,
# so env vars alone cannot force CPU here).
if "--cpu" in sys.argv:
    n = int(sys.argv[sys.argv.index("--cpu") + 1])
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)

import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from dmft_ed_tpu.config import EDConfig  # noqa: E402
from dmft_ed_tpu.bath import Bath  # noqa: E402
from dmft_ed_tpu.sectors import sector_table  # noqa: E402
from dmft_ed_tpu.hamiltonian import build_sector_hamiltonian  # noqa: E402
from dmft_ed_tpu.parallel import make_mesh  # noqa: E402
from dmft_ed_tpu.parallel.hxv import (sharded_sector_op,  # noqa: E402
                                      pad_flat_to_blocks)
from dmft_ed_tpu.lanczos import lanczos_tridiag_blocks  # noqa: E402


def build(nbath=13, dtype="float64", prec="ozaki5x7"):
    cfg = EDConfig(norb=1, nbath=nbath, nspin=1, uloc=(2.0,), dtype=dtype,
                   matmul_precision=prec,
                   dense_matmul_threshold=8192).validate()
    rng = np.random.default_rng(0)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(cfg.ns // 2, cfg.ns // 2)
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
    return cfg, sec, ham


def run_mesh(cfg, sec, ham, n_shards, niter=20):
    """Time the PRODUCTION distributed Lanczos recurrence
    (lanczos_tridiag_blocks on the pad-and-shard operator — the exact path
    diag._solve_sector_lanczos takes above shard_dim_threshold)."""
    mesh = make_mesh(n_rows=n_shards, n_sites=1,
                     devices=jax.devices()[:n_shards])
    spec, arrays, blocks, sec_p, shd, _ = sharded_sector_op(ham, cfg, mesh)
    rng = np.random.default_rng(1)
    v0 = rng.normal(size=sec.dim)
    v0 = v0 / np.linalg.norm(v0)
    dt = jnp.dtype(cfg.dtype)
    V0 = tuple(jax.device_put(jnp.asarray(v, dtype=dt), shd)
               for v in pad_flat_to_blocks(v0, sec, sec_p))

    def f():
        return lanczos_tridiag_blocks(spec, blocks, arrays, V0, niter, shd)

    y = f()
    jax.block_until_ready(y)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        y = f()
        jax.block_until_ready(y)
        best = min(best, time.time() - t0)
    return best / niter


def main():
    # On the virtual CPU mesh all shards share one host's cores, so total
    # compute does NOT scale with the shard count — classic efficiency
    # t1/(t_n*n) is structurally bounded by 1/n there. The virtual-mesh
    # proxy for the >=70% north star is the sharding OVERHEAD t_n/t1
    # (partitioning + collectives): if the sharded program adds little
    # overhead on shared cores, on a pod (where each shard has its own
    # chip and ICI) efficiency is 1/overhead to first order.
    virtual = "--cpu" in sys.argv
    cfg, sec, ham = build(nbath=11 if virtual else 13)
    nnz = ham.nnz_estimate()
    ndev = len(jax.devices())
    shard_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    results = []
    t1 = None
    for n in shard_counts:
        t = run_mesh(cfg, sec, ham, n)
        if t1 is None:
            t1 = t
        rec = {"shards": n, "s_per_iter": t, "nnz_per_s": nnz / t,
               "overhead_vs_1shard": t / t1,
               "scaling_efficiency": t1 / (t * n)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    ov = results[-1]["overhead_vs_1shard"]
    if virtual:
        line = {
            "metric": "distributed_HxV_sharding_overhead_virtual_mesh",
            "value": ov, "unit": "t_Nshards/t_1shard (shared cores)",
            "vs_baseline": (1.0 / ov) / 0.70,
            "detail": {"sector_dim": sec.dim, "devices": ndev,
                       "device0": str(jax.devices()[0]),
                       "note": "virtual mesh shares one host's cores; "
                               "1/overhead bounds pod efficiency proxy"},
        }
    else:
        line = {
            "metric": "distributed_HxV_scaling_efficiency",
            "value": results[-1]["scaling_efficiency"],
            "unit": "fraction_vs_1shard",
            "vs_baseline": results[-1]["scaling_efficiency"] / 0.70,
            "detail": {"sector_dim": sec.dim, "devices": ndev,
                       "device0": str(jax.devices()[0])},
        }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
