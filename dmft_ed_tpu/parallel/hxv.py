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
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EDConfig
from ..hamiltonian import SectorHamiltonian, make_matvec
from .mesh import row_sharding


def make_sharded_matvec(ham: SectorHamiltonian, cfg: EDConfig, mesh: Mesh,
                        batched: bool = False):
    """Returns (matvec, sharding, dtype[, pad]) acting on V [.., ddw, dup]
    with rows sharded. The operator constants are replicated (they are
    exponentially smaller than the sector); vmap over a leading site/batch
    axis when `batched`.

    When the row dimension is not divisible by the mesh 'rows' axis
    (general sector dims), the operator is zero-padded to the next multiple:
    padded rows stay exactly zero through the Krylov recurrence (zero
    diagonal, zero H rows), so norms/dots are unchanged. Callers pad the
    initial vector with `pad_rows` zero rows.
    """
    n_rows = mesh.shape["rows"]
    sec = ham.sector
    pad = 0
    if len(sec.blocks) == 1 and sec.blocks[0].ddw % n_rows != 0:
        blk = sec.blocks[0]
        ddw_pad = -(-blk.ddw // n_rows) * n_rows
        pad = ddw_pad - blk.ddw
        ham = _pad_single_block_rows(ham, ddw_pad)
    base_mv, template = make_matvec(ham, cfg)
    shd = row_sharding(mesh, batched)

    def mv_single(v):
        (out,) = base_mv((v,))
        return out

    mv = jax.vmap(mv_single) if batched else mv_single

    def matvec(v):
        v = jax.lax.with_sharding_constraint(v, shd)
        out = mv(v)
        return jax.lax.with_sharding_constraint(out, shd)

    return matvec, shd, template[0].dtype, pad


def _pad_single_block_rows(ham: SectorHamiltonian, ddw_pad: int):
    """Zero-pad the down (row) dimension of a single-block operator."""
    import numpy as np
    from dataclasses import replace as _dc_replace
    from ..sectors import Block, Sector
    from ..hamiltonian import SpinCOO
    blk = ham.sector.blocks[0]
    new_blk = Block(blk.nup, blk.ndw, blk.dup, ddw_pad, 0)
    new_sec = Sector(ham.sector.index, ham.sector.qn, (new_blk,),
                     ham.sector.ns)
    diag = [np.pad(ham.diag[0], ((0, ddw_pad - blk.ddw), (0, 0)))]
    hd = ham.hdw[0]
    hdw = [SpinCOO(hd.rows, hd.cols, hd.vals, (ddw_pad, ddw_pad))]
    return SectorHamiltonian(new_sec, diag, ham.hup, hdw, ham.mix,
                             ham.dtype)


@partial(jax.jit, static_argnums=(0,))
def lanczos_step(matvec: Callable, v_prev, v, b_prev):
    """One 3-term Lanczos recurrence step on (possibly sharded) block
    matrices — the multi-chip hot path. Dots lower to psum over ICI."""
    w = matvec(v)
    a = jnp.real(jnp.vdot(v, w))
    w = w - a * v - b_prev * v_prev
    b = jnp.sqrt(jnp.real(jnp.vdot(w, w)))
    v_next = w / jnp.where(b > 1e-13, b, 1.0)
    return v, v_next, a, b


def sharded_lanczos_tridiag(matvec: Callable, v0, niter: int):
    """Full scan-based tridiagonalization on sharded vectors (same recurrence
    as lanczos.lanczos_tridiag, shapes [ddw, dup])."""

    def step(carry, _):
        v_prev, v, b_prev = carry
        v_prev, v_next, a, b = lanczos_step(matvec, v_prev, v, b_prev)
        return (v_prev, v_next, b), (a, b)

    init = (jnp.zeros_like(v0), v0, jnp.asarray(0.0, jnp.float64
                                                if v0.dtype == jnp.float64
                                                else jnp.float32))
    _, (alphas, betas) = jax.lax.scan(step, init, None, length=niter)
    return alphas, betas
