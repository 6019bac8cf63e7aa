#!/usr/bin/env python
"""Headline benchmark: factorized sector H·v throughput driving Lanczos.

Measures the hot kernel of the whole framework (BASELINE.json metric:
"SpMV nnz/s per chip; Lanczos iters/sec"): the block-Kronecker H·v on an
ed_nano-class sector (Ns=14 half-filled, dim = 3432^2 = 11.8M, the scale the
reference reaches with distributed CSR+MPI, SURVEY.md §6) running as dense
MXU matmuls, inside the plain-Lanczos 3-term recurrence.

Throughput is reported as *effective CSR nonzeros per second*: the number of
nonzeros the reference's stored-CSR SpMV (ED_HAMILTONIAN_STORED_HxV.f90)
would touch for the same sector, divided by our per-iteration time — i.e.
apples-to-apples "how fast would the same physics step run".

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against 2e9 nnz/s, a generous estimate for the reference's MPI CSR SpMV on a
full CPU node (~64 cores x ~30 Mnnz/s/core achievable for irregular CSR).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from dmft_ed_tpu.config import EDConfig  # noqa: E402
from dmft_ed_tpu.bath import Bath  # noqa: E402
from dmft_ed_tpu.sectors import sector_table  # noqa: E402
from dmft_ed_tpu.hamiltonian import build_sector_hamiltonian, make_matvec  # noqa: E402

CPU_NODE_CSR_BASELINE = 2.0e9  # nnz/s; see module docstring


def build_problem(nbath: int, dtype: str, matmul_precision: str = "native"):
    cfg = EDConfig(norb=1, nbath=nbath, nspin=1, uloc=(2.0,), beta=100.0,
                   dtype=dtype, matmul_precision=matmul_precision,
                   dense_matmul_threshold=8192).validate()
    ns = cfg.ns
    rng = np.random.default_rng(0)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(ns // 2, ns // 2)
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
    matvec, template = make_matvec(ham, cfg)
    return cfg, sec, ham, matvec, template


def lanczos_loop(matvec, v0, niter):
    from dmft_ed_tpu.lanczos import precise_dot

    def step(carry, _):
        v_prev, v, b_prev = carry
        w = matvec((v,))[0]
        a = precise_dot(v, w)
        w = w - a * v - b_prev * v_prev
        b = jnp.sqrt(precise_dot(w, w))
        return (v, w / jnp.where(b > 0, b, 1.0), b), (a, b)

    init = (jnp.zeros_like(v0), v0, jnp.asarray(0.0, v0.real.dtype))
    (_, vf, _), (al, be) = jax.lax.scan(step, init, None, length=niter)
    return vf, al, be


def run(nbath=13, dtype="float64", niter=30, repeats=3,
        matmul_precision="native"):
    cfg, sec, ham, matvec, template = build_problem(nbath, dtype,
                                                    matmul_precision)
    nnz = ham.nnz_estimate()
    dim = sec.dim
    blk = sec.blocks[0]
    rng = np.random.default_rng(1)
    v0 = jnp.asarray(rng.normal(size=(blk.ddw, blk.dup)),
                     dtype=template[0].dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    loop = jax.jit(lanczos_loop, static_argnums=(0, 2))
    vf, al, be = loop(matvec, v0, niter)
    vf.block_until_ready()                      # compile + warmup
    best = np.inf
    for _ in range(repeats):
        t0 = time.time()
        vf, al, be = loop(matvec, v0, niter)
        vf.block_until_ready()
        best = min(best, time.time() - t0)
    per_iter = best / niter
    nnz_per_s = nnz / per_iter
    return {
        "dim": dim,
        "nnz": nnz,
        "dtype": dtype,
        "lanczos_iters_per_s": 1.0 / per_iter,
        "nnz_per_s": nnz_per_s,
    }


def main():
    # near-f64 accuracy path (Ozaki int8-digit matmuls, ~1e-10 rel error;
    # 5 slices x 7-bit digits: 15 digit-pair MACs vs ozaki6's 21 at the
    # same 2^-35 accuracy class — measured 1.26x on this workload)
    res_oz = run(dtype="float64", matmul_precision="ozaki5x7")
    res64 = run(dtype="float64")
    res32 = run(dtype="float32")
    value = res_oz["nnz_per_s"]
    out = {
        "metric": "sector_HxV_effective_nnz_per_s_f64",
        "value": value,
        "unit": "nnz/s",
        "vs_baseline": value / CPU_NODE_CSR_BASELINE,
        "detail": {
            "precision_mode": "ozaki5x7 (int8 MXU digit products, ~1e-10 rel)",
            "sector_dim": res_oz["dim"],
            "csr_equivalent_nnz": res_oz["nnz"],
            "lanczos_iters_per_s": res_oz["lanczos_iters_per_s"],
            "nnz_per_s_f64_emulated": res64["nnz_per_s"],
            "nnz_per_s_f32": res32["nnz_per_s"],
            "lanczos_iters_per_s_f32": res32["lanczos_iters_per_s"],
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
