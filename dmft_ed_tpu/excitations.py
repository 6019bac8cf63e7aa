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
    In the Jz basis, the target sector and sub-blocks follow the per-level
    twoJz shift and class-changing components are membership-filtered.
    """
    jsec = (table.cdg_sector if dagger else table.c_sector)(sector, spin,
                                                            level)
    if jsec is None:
        return None
    ns = cfg.ns
    jz = sector.subsel is not None
    Vb = np_unflatten_blocks(np.asarray(vec_flat), sector)
    out = np.zeros(jsec.dim, dtype=np.asarray(vec_flat).dtype)
    dn = 1 if dagger else -1
    for bi, (blk, V) in enumerate(zip(sector.blocks, Vb)):
        lup, ldw = sector.block_lz(bi)
        if spin == 0:
            n_src = blk.nup
            key = (blk.nup + dn, blk.ndw)
            if jz:
                from .fock import LZDIAG_T2G
                lup_t = lup + dn * 2 * LZDIAG_T2G[level % 3]
                ti = jsec.block_index_of(*key, lup_t, ldw)
            else:
                ti = jsec.block_index_of(*key)
        else:
            n_src = blk.ndw
            key = (blk.nup, blk.ndw + dn)
            if jz:
                from .fock import LZDIAG_T2G
                ldw_t = ldw + dn * 2 * LZDIAG_T2G[level % 3]
                ti = jsec.block_index_of(*key, lup, ldw_t)
            else:
                ti = jsec.block_index_of(*key)
        if ti is None:
            continue
        tgt = jsec.blocks[ti]
        r, c, s = _op_coo(ns, n_src, level, dagger)
        if r.size == 0:
            continue
        if jz:
            from math import comb as _comb
            from .fock import restrict_coo
            if spin == 0:
                row_sel = jsec.up_sel(ti)
                col_sel = sector.up_sel(bi)
                nr = _comb(ns, blk.nup + dn)
            else:
                row_sel = jsec.dw_sel(ti)
                col_sel = sector.dw_sel(bi)
                nr = _comb(ns, blk.ndw + dn)
            nc = _comb(ns, n_src)
            rp = np.full(nr, -1, np.int64)
            rp[row_sel] = np.arange(row_sel.size)
            cp = np.full(nc, -1, np.int64)
            cp[col_sel] = np.arange(col_sel.size)
            r, c, s = restrict_coo(r, c, s, rp, cp)
            if r.size == 0:
                continue
        W = np.zeros((tgt.ddw, tgt.dup), dtype=out.dtype)
        if spin == 0:
            np.add.at(W, (slice(None), r), s[None, :] * V[:, c])
        else:
            phase = -1.0 if blk.nup % 2 else 1.0  # JW string over up bits
            np.add.at(W, (r, slice(None)), (phase * s)[:, None] * V[c, :])
        out[tgt.offset:tgt.offset + tgt.dim] += W.ravel()
    return jsec, out


def apply_hop_op(cfg: EDConfig, table: SectorTable, sector: Sector,
                 vec_flat, spin: int, src: int, dst: int):
    """w = c†_{dst,spin} c_{src,spin} v — number-conserving one-body hop
    back into the SAME sector (the reference assembles it as the two-step
    c/c† excitation, ED_GF_CHIDENS.f90:523-560 / :596-632; here it is one
    per-block COO product, fock.hop_op). The two (-1)^{N_up} JW factors
    of a down-spin c/c† pair cancel, so no cross-spin phase appears. In
    the Jz basis, components leaving the block's Lz class are dropped
    (same convention as apply_op_combo). Returns the flat vector."""
    ns = cfg.ns
    Vb = np_unflatten_blocks(np.asarray(vec_flat), sector)
    out = np.zeros(sector.dim, dtype=np.asarray(vec_flat).dtype)
    for bi, (blk, V) in enumerate(zip(sector.blocks, Vb)):
        n_sp = blk.nup if spin == 0 else blk.ndw
        r, c, s = fock.hop_op(ns, n_sp, dst, src)
        if r.size == 0:
            continue
        if sector.subsel is not None:
            sel = sector.up_sel(bi) if spin == 0 else sector.dw_sel(bi)
            from math import comb as _comb
            nfull = _comb(ns, n_sp)
            pos = np.full(nfull, -1, np.int64)
            pos[sel] = np.arange(sel.size)
            r, c, s = fock.restrict_coo(r, c, s, pos, pos)
            if r.size == 0:
                continue
        W = np.zeros((blk.ddw, blk.dup), dtype=out.dtype)
        if spin == 0:
            np.add.at(W, (slice(None), r), s[None, :] * V[:, c])
        else:
            np.add.at(W, (r, slice(None)), s[:, None] * V[c, :])
        out[blk.offset:blk.offset + blk.dim] += W.ravel()
    return out


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
        if js is not jsec:
            if sector.subsel is not None:
                # Jz basis: combo components with different Jz shifts do not
                # interfere; the reference drops them (ED_OBSERVABLES j==0)
                continue
            raise AssertionError("combo terms must share the target sector")
        acc = acc + coeff * w
    return jsec, acc


def apply_diag_op(cfg: EDConfig, sector: Sector, vec_flat: np.ndarray,
                  up_weights: np.ndarray, dw_weights: np.ndarray) -> np.ndarray:
    """w = (Σ_l u_l n_{l,up} + Σ_l d_l n_{l,dw}) v  — same-sector diagonal
    operators (Sz_a, n_a, ...) used by the susceptibility builders."""
    ns = cfg.ns
    Vb = np_unflatten_blocks(np.asarray(vec_flat), sector)
    out = np.zeros(sector.dim, dtype=np.asarray(vec_flat).dtype)
    for bi, (blk, V) in enumerate(zip(sector.blocks, Vb)):
        occ_u = fock.occupations(ns, blk.nup)
        occ_d = fock.occupations(ns, blk.ndw)
        if sector.subsel is not None:
            occ_u = occ_u[sector.up_sel(bi)]
            occ_d = occ_d[sector.dw_sel(bi)]
        du = occ_u @ np.asarray(up_weights)
        dd = occ_d @ np.asarray(dw_weights)
        W = V * du[None, :] + V * dd[:, None]
        out[blk.offset:blk.offset + blk.dim] = W.ravel()
    return out
