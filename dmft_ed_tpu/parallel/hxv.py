"""Distributed sector H·v and Krylov steps.

The TPU-native replacement for the reference's MPI SpMV
(spMatVec_MPI_cc, ED_HAMILTONIAN_STORED_HxV.f90:147-197): the sector vector
V[ddw, dup] is row-sharded over the ``rows`` mesh axis and the factorized
apply

    Y = D∘V + Hdw @ V + V @ Hupᵀ

runs under GSPMD: the up-matmul and the diagonal are purely local
(rows stay put), the dw-matmul contracts over the sharded row index — XLA
places the minimal collective (reduce-scatter / all-gather over ICI) instead
of the reference's AllGatherv-everything. Lanczos dot products become psums
automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EDConfig


# ----------------------------------------------------------------------
# production row sharding: pad-and-shard for ANY sector (multi-block too)
# ----------------------------------------------------------------------
# (The pre-production single-block `make_sharded_matvec` path with raw-vdot
# Lanczos steps was removed in round 3 — it carried the TPU f64-reduce
# pathology and a single-block-only limitation; everything routes through
# sharded_sector_op + the block-tuple Krylov in lanczos.py.)
# The reference distributes every sector solve by 1-D row partition
# (ED_HAMILTONIAN.f90:56-62) and AllGatherVs the full vector per SpMV
# (ED_HAMILTONIAN_STORED_HxV.f90:163-196). Here every block's down (row)
# dimension is zero-padded to the mesh multiple so the block tuple leaves
# shard as P('rows', None); padded rows stay exactly zero through the
# Krylov recurrence (zero diagonal, zero operator rows/cols), so norms,
# dots and tridiagonal coefficients are unchanged — verified against the
# single-device path in tests/test_parallel.py.

import numpy as np
from ..sectors import Block, Sector
from ..hamiltonian import (SectorHamiltonian, SpinCOO, make_matvec_op,
                           np_unflatten_blocks)
from ..lanczos import (lanczos_tridiag_blocks, lanczos_tridiag_blocks_batched,
                       eigs_lanczos_blocks)


def pad_rows_sector(sector: Sector, n_rows: int) -> Sector:
    """Padded twin of `sector`: every block ddw rounded up to a multiple of
    n_rows, offsets recomputed. Only the block SHAPES of the result are
    consumed (by make_matvec_op / flatten helpers)."""
    blocks = []
    off = 0
    for b in sector.blocks:
        ddw_p = -(-b.ddw // n_rows) * n_rows
        blocks.append(Block(b.nup, b.ndw, b.dup, ddw_p, off))
        off += b.dup * ddw_p
    return Sector(sector.index, sector.qn, tuple(blocks), sector.ns)


def pad_rows_ham(ham: SectorHamiltonian, n_rows: int) -> SectorHamiltonian:
    """Zero-pad every block's row dimension of the factorized operator."""
    sec_p = pad_rows_sector(ham.sector, n_rows)
    diag = []
    hdw = []
    for bi, (b, bp) in enumerate(zip(ham.sector.blocks, sec_p.blocks)):
        diag.append(np.pad(ham.diag[bi], ((0, bp.ddw - b.ddw), (0, 0))))
        d = ham.hdw[bi]
        hdw.append(SpinCOO(d.rows, d.cols, d.vals, (bp.ddw, bp.ddw)))
    mix = []
    for t in ham.mix:
        dw = t.dw
        if dw is not None:
            dw = SpinCOO(dw.rows, dw.cols, dw.vals,
                         (sec_p.blocks[t.dst].ddw, sec_p.blocks[t.src].ddw))
        else:
            assert sec_p.blocks[t.dst].ddw == sec_p.blocks[t.src].ddw, \
                "identity dw mix term needs equal padded row dims"
        mix.append(t._replace(dw=dw))
    return SectorHamiltonian(sec_p, diag, ham.hup, hdw, mix, ham.dtype)


def pad_flat_to_blocks(x: np.ndarray, sector: Sector,
                       sector_padded: Sector):
    """Flat [dim] vector in the UNPADDED layout -> tuple of padded
    per-block matrices [ddw_pad, dup]."""
    Vb = np_unflatten_blocks(np.asarray(x), sector)
    out = []
    for V, b, bp in zip(Vb, sector.blocks, sector_padded.blocks):
        out.append(np.pad(V, ((0, bp.ddw - b.ddw), (0, 0))))
    return tuple(out)


def unpad_blocks_to_flat(V, sector: Sector) -> np.ndarray:
    """Inverse of pad_flat_to_blocks (also accepts a leading batch axis)."""
    parts = []
    for Vp, b in zip(V, sector.blocks):
        Vp = np.asarray(Vp)
        if Vp.ndim == 2:
            parts.append(Vp[:b.ddw].reshape(-1))
        else:
            parts.append(Vp[:, :b.ddw].reshape(Vp.shape[0], -1))
    return np.concatenate(parts, axis=-1)


def sharded_sector_op(ham: SectorHamiltonian, cfg: EDConfig, mesh: Mesh):
    """(spec, arrays, blocks, sector_padded, shd, shd_b): the padded
    operator in spec/arrays form with its arrays replicated on the mesh and
    the block-leaf shardings for single [ddw, dup] and batched
    [B, ddw, dup] vectors."""
    n_rows = mesh.shape["rows"]
    ham_p = pad_rows_ham(ham, n_rows)
    spec, arrays, blocks = make_matvec_op(ham_p, cfg)
    rep = NamedSharding(mesh, P())
    arrays = tuple(jax.device_put(a, rep) for a in arrays)
    shd = NamedSharding(mesh, P("rows", None))
    shd_b = NamedSharding(mesh, P(None, "rows", None))
    return spec, arrays, blocks, ham_p.sector, shd, shd_b


def solve_sector_sharded(cfg: EDConfig, ham: SectorHamiltonian, neigen: int,
                         rng, mesh: Mesh, v0=None):
    """Distributed replacement of diag._solve_sector_lanczos for sectors
    above cfg.shard_dim_threshold: thick-restart Lanczos on row-sharded
    block tuples (the production path of ED_MAIN.f90:284-327 +
    sp_eigh/P-ARPACK). Returns (evals, evecs_flat [neigen, dim]) with
    eigenvectors gathered to host in the unpadded layout (the analogue of
    es_return_cvector's gather, ED_EIGENSPACE.f90:448-517)."""
    sec = ham.sector
    spec, arrays, blocks, sec_p, shd, shd_b = sharded_sector_op(
        ham, cfg, mesh)
    cplx = spec[-1].startswith("complex")
    if v0 is None:
        v0 = rng.normal(size=sec.dim)
        if cplx:
            v0 = v0 + 1j * rng.normal(size=sec.dim)
        v0 = v0 / np.linalg.norm(v0)
    else:
        v0 = np.asarray(v0)
    dt = jnp.complex128 if cplx else jnp.dtype(cfg.dtype)
    V0 = tuple(jax.device_put(jnp.asarray(v, dtype=dt), shd)
               for v in pad_flat_to_blocks(v0, sec, sec_p))
    basis_shd = NamedSharding(mesh, P(None, "rows", None))
    if cfg.lanc_method.lower() == "lanczos":
        niter = min(sec.dim, cfg.lanc_niter)
        al, be, ns_ = lanczos_tridiag_blocks(spec, blocks, arrays, V0,
                                             niter, shd)
        from ..lanczos import tridiag_eigh
        n = max(int(ns_), 1)
        evals, Y = tridiag_eigh(np.asarray(al[:n]), np.asarray(be[:n]))
        # second pass to rebuild |gs> (two-pass plain Lanczos; dot-free —
        # the stored betas replay the normalization)
        gs = _rebuild_gs_blocks(spec, blocks, arrays, V0, jnp.asarray(al),
                                jnp.asarray(be), jnp.asarray(Y[:, 0]), n,
                                shd)
        gs_flat = unpad_blocks_to_flat(gs, sec)
        gs_flat = gs_flat / np.linalg.norm(gs_flat)
        return np.array([evals[0]]), jnp.asarray(gs_flat)[None, :]
    ncv = min(sec.dim,
              cfg.lanc_ncv_factor * max(neigen, cfg.lanc_nstates_sector)
              + cfg.lanc_ncv_add)
    evals, evecs_b, _ = eigs_lanczos_blocks(
        spec, blocks, arrays, V0, neigen, ncv,
        maxiter=min(sec.dim, cfg.lanc_niter), tol=cfg.lanc_tolerance,
        shd=basis_shd)
    flat = unpad_blocks_to_flat(evecs_b, sec)      # [k, dim]
    flat = flat / np.linalg.norm(flat, axis=1, keepdims=True)
    return np.asarray(evals), jnp.asarray(flat)


@partial(jax.jit, static_argnums=(0, 1, 7, 8))
def _rebuild_gs_blocks(spec, blocks, arrays, V0, alphas, betas, y, n: int,
                       shd=None):
    """Second-pass ground-state rebuild |gs> = Σ_j y_j |v_j| in the
    block-tuple layout (PLAIN_LANCZOS.f90:189-397 two-pass scheme).
    Dot-free: the stored (alpha, beta) coefficients replay the recurrence —
    one sharded matvec per step, no collective reductions."""
    from ..hamiltonian import apply_op
    from ..lanczos import _constrain, _BREAKDOWN
    rdt0 = jnp.float64 if V0[0].dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    alphas = alphas.astype(rdt0)   # avoid f64 promotion of f32/c64 leaves
    betas = betas.astype(rdt0)
    y = y.astype(rdt0)
    beta_next = jnp.concatenate([betas[1:], jnp.ones(1, rdt0)])

    def step(carry, j):
        v_prev, v, acc = carry
        acc = tuple(ab + y[j] * vb for ab, vb in zip(acc, v))
        w = apply_op(spec, arrays, _constrain(v, shd))
        aj, bj = alphas[j], betas[j]
        w = tuple(wb - aj * vb - bj * pb
                  for wb, vb, pb in zip(w, v, v_prev))
        bn = beta_next[j]
        vn = tuple(wb / jnp.where(bn > _BREAKDOWN, bn, 1.0) for wb in w)
        return (v, _constrain(vn, shd), acc), None

    zeros = tuple(jnp.zeros_like(v) for v in V0)
    init = (zeros, V0, zeros)
    carry, _ = jax.lax.scan(step, init, jnp.arange(n))
    return carry[2]
