#!/usr/bin/env python
"""Device-trace profile of the distributed Lanczos loop (VERDICT r3 #9).

Runs the production row-sharded Lanczos recurrence (the exact path
diag._solve_sector_lanczos takes above shard_dim_threshold) on an
N-device virtual CPU mesh under ``jax.profiler.trace``, parses the
captured xplane and aggregates per-op device time — turning the
analytical "the gather rides ICI at a few percent" argument in
PERF_NOTES.md into measured per-op numbers (matvec matmuls vs Lanczos
dots vs collectives).

    python bench_trace.py --cpu 8 [--nbath 11] [--niter 20]

Writes artifacts/trace_virtual_mesh.json with the per-class breakdown and
the raw top-op table. Caveat recorded with the output: on the virtual
mesh the "collective" class is shared-core memcpy, an UPPER bound for the
fraction a real ICI would take (PERF_NOTES virtual-mesh section).
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np
import jax

p = argparse.ArgumentParser()
p.add_argument("--cpu", type=int, default=8)
p.add_argument("--nbath", type=int, default=11)
p.add_argument("--niter", type=int, default=20)
args = p.parse_args()

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", args.cpu)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from dmft_ed_tpu.config import EDConfig  # noqa: E402
from dmft_ed_tpu.bath import Bath  # noqa: E402
from dmft_ed_tpu.sectors import sector_table  # noqa: E402
from dmft_ed_tpu.hamiltonian import build_sector_hamiltonian  # noqa: E402
from dmft_ed_tpu.parallel import make_mesh  # noqa: E402
from dmft_ed_tpu.parallel.hxv import (sharded_sector_op,  # noqa: E402
                                      pad_flat_to_blocks)
from dmft_ed_tpu.lanczos import lanczos_tridiag_blocks  # noqa: E402


CLASSES = (
    ("collective", ("all-gather", "all-reduce", "reduce-scatter",
                    "collective-permute", "all-to-all", "partition-id",
                    "collective")),
    ("matmul", ("dot_general", "dot.", "convolution", "gemm")),
    ("reduction", ("reduce",)),          # Lanczos dots/norms
    ("fusion", ("fusion", "loop_")),     # axpy/scale elementwise fusions
)


def classify(name: str) -> str:
    low = name.lower()
    for cls, keys in CLASSES:
        if any(k in low for k in keys):
            return cls
    return "other"


def main():
    cfg = EDConfig(norb=1, nbath=args.nbath, nspin=1, uloc=(2.0,),
                   dtype="float64", matmul_precision="native",
                   dense_matmul_threshold=8192).validate()
    rng = np.random.default_rng(0)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, args.nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(cfg.ns // 2, cfg.ns // 2)
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)

    mesh = make_mesh(n_rows=args.cpu, n_sites=1, devices=jax.devices())
    spec, arrays, blocks, sec_p, shd, _ = sharded_sector_op(ham, cfg, mesh)
    v0 = rng.normal(size=sec.dim)
    v0 = v0 / np.linalg.norm(v0)
    V0 = tuple(jax.device_put(jnp.asarray(v, dtype=jnp.dtype(cfg.dtype)),
                              shd)
               for v in pad_flat_to_blocks(v0, sec, sec_p))

    def f():
        return lanczos_tridiag_blocks(spec, blocks, arrays, V0, args.niter,
                                      shd)

    jax.block_until_ready(f())                      # compile + warmup
    tdir = tempfile.mkdtemp()
    t0 = time.time()
    with jax.profiler.trace(tdir):
        jax.block_until_ready(f())
    wall = time.time() - t0

    pb = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)[0]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(pb, "rb") as fh:
        xs.ParseFromString(fh.read())
    ops = {}
    for plane in xs.planes:
        if plane.name != "/host:CPU":
            continue
        md = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                # keep only XLA thunk-level op events (skip runtime frames)
                if "::" in name or name.startswith(("PjRt", "Pjit", "$",
                                                    "ThunkExecutor")):
                    continue
                ops[name] = ops.get(name, 0) + ev.duration_ps

    total = sum(ops.values())
    by_class = {}
    for name, ps in ops.items():
        c = classify(name)
        by_class[c] = by_class.get(c, 0) + ps
    out = {
        "mesh_shards": args.cpu,
        "sector_dim": sec.dim,
        "niter": args.niter,
        "wall_s": wall,
        "op_time_total_ms": total / 1e9,
        "per_class_ms": {k: v / 1e9
                         for k, v in sorted(by_class.items(),
                                            key=lambda x: -x[1])},
        "per_class_frac": {k: v / total
                           for k, v in sorted(by_class.items(),
                                              key=lambda x: -x[1])},
        "top_ops_ms": {k[:80]: v / 1e9
                       for k, v in sorted(ops.items(),
                                          key=lambda x: -x[1])[:15]},
        "note": ("virtual CPU mesh: op times sum across shards sharing "
                 "2 host cores; the collective class is shared-core "
                 "memcpy — an upper bound on what ICI would cost"),
    }
    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "trace_virtual_mesh.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
