"""Single-operator excitation maps between sectors, in the block layout.

Replaces the reference's master-only excitation-vector assembly
(``vvinit(j) = sgn*state_cvec(m)`` loops with per-element binary_search,
e.g. ED_GF_NORMAL.f90:156-175) with closed-form block maps: applying
c/c† of a given spin to a sector vector is a per-block matrix product
(up operators act on the column index, down operators on the row index
with the global (-1)^{n_up} Jordan-Wigner phase). Shard-local by
construction — no Scatterv needed (SURVEY.md §5 'distributed backend').
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from . import fock
from .config import EDConfig
from .sectors import Sector, SectorTable
from .hamiltonian import np_unflatten_blocks


@lru_cache(maxsize=4096)
def _op_coo(ns: int, n: int, level: int, dagger: bool):
    return (fock.cdg_op if dagger else fock.c_op)(ns, n, level)


def apply_spin_op(cfg: EDConfig, table: SectorTable, sector: Sector,
                  vec_flat: np.ndarray, spin: int, level: int,
                  dagger: bool) -> Optional[Tuple[Sector, np.ndarray]]:
    """w = c^(†)_{level, spin} v. Returns (target_sector, flat vector) or None.

    spin: 0=up, 1=dw; level is the 0-based site index within a spin species.
    """
    jsec = (table.cdg_sector if dagger else table.c_sector)(sector, spin)
    if jsec is None:
        return None
    ns = cfg.ns
    Vb = np_unflatten_blocks(np.asarray(vec_flat), sector)
    out = np.zeros(jsec.dim, dtype=np.asarray(vec_flat).dtype)
    dn = 1 if dagger else -1
    for blk, V in zip(sector.blocks, Vb):
        if spin == 0:
            tgt = jsec.block_of(blk.nup + dn, blk.ndw)
            if tgt is None:
                continue
            r, c, s = _op_coo(ns, blk.nup, level, dagger)
            if r.size == 0:
                continue
            W = np.zeros((tgt.ddw, tgt.dup), dtype=out.dtype)
            # W[:, r] += s * V[:, c]
            np.add.at(W, (slice(None), r), s[None, :] * V[:, c])
        else:
            tgt = jsec.block_of(blk.nup, blk.ndw + dn)
            if tgt is None:
                continue
            r, c, s = _op_coo(ns, blk.ndw, level, dagger)
            if r.size == 0:
                continue
            phase = -1.0 if blk.nup % 2 else 1.0  # JW string over all up bits
            W = np.zeros((tgt.ddw, tgt.dup), dtype=out.dtype)
            np.add.at(W, (r, slice(None)), (phase * s)[:, None] * V[c, :])
        out[tgt.offset:tgt.offset + tgt.dim] += W.ravel()
    return jsec, out


def apply_op_combo(cfg: EDConfig, table: SectorTable, sector: Sector,
                   vec_flat, terms) -> Optional[Tuple[Sector, np.ndarray]]:
    """w = Σ coeff * c^(†)_{level,spin} v  for terms = [(coeff, spin, level,
    dagger), ...]; all terms must target the same sector."""
    jsec = None
    acc = None
    for coeff, spin, level, dagger in terms:
        r = apply_spin_op(cfg, table, sector, vec_flat, spin, level, dagger)
        if r is None:
            return None
        js, w = r
        if jsec is None:
            jsec = js
            acc = np.zeros(js.dim, dtype=np.result_type(w.dtype, type(coeff)))
        assert js is jsec, "combo terms must share the target sector"
        acc = acc + coeff * w
    return jsec, acc


def apply_diag_op(cfg: EDConfig, sector: Sector, vec_flat: np.ndarray,
                  up_weights: np.ndarray, dw_weights: np.ndarray) -> np.ndarray:
    """w = (Σ_l u_l n_{l,up} + Σ_l d_l n_{l,dw}) v  — same-sector diagonal
    operators (Sz_a, n_a, ...) used by the susceptibility builders."""
    ns = cfg.ns
    Vb = np_unflatten_blocks(np.asarray(vec_flat), sector)
    out = np.zeros(sector.dim, dtype=np.asarray(vec_flat).dtype)
    for blk, V in zip(sector.blocks, Vb):
        du = fock.occupations(ns, blk.nup) @ np.asarray(up_weights)
        dd = fock.occupations(ns, blk.ndw) @ np.asarray(dw_weights)
        W = V * du[None, :] + V * dd[:, None]
        out[blk.offset:blk.offset + blk.dim] = W.ravel()
    return out
