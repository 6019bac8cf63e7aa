"""Sector Hamiltonians as block-Kronecker operators.

TPU-native replacement for the reference's sparse-matrix machinery
(ED_SPARSE_MATRIX.f90, ED_HAMILTONIAN_STORED_HxV.f90 + the four term files
ED_HAMILTONIAN/stored/{Himp,Hint,Hbath,Himp_bath}.f90 and the matrix-free
ED_HAMILTONIAN_DIRECT_HxV.f90).

Design: every sector is a union of (n_up, n_dw) tensor-product blocks
(sectors.py). With the sector vector stored as per-block matrices
``V_b [dim_dw, dim_up]`` (up index fastest), the Hamiltonian acts as

    (H V)_b = D_b ∘ V_b  +  Hdw_b @ V_b  +  V_b @ Hup_bᵀ
              + Σ_terms  coeff · B @ V_src @ Aᵀ          (cross-block)

where Hup/Hdw are *per-spin* operators (dimension C(Ns, n) — exponentially
smaller than the sector) and the cross-block terms cover spin-exchange /
pair-hopping (Hint.f90), superc pairing (Hbath.f90), and nonsu2 spin flips.
Dense per-spin matrices ride the MXU; large blocks fall back to a gathered
COO apply. Jordan-Wigner factorization across spin species: up-operator
strings never cross down bits, a single down operator carries a global
``(-1)^{n_up}`` (constant per block) — so all signs are per-spin-computable
(fock.py) plus per-term block phases handled here.

The stored-vs-direct distinction of the reference (``ed_sparse_H``) collapses:
the factorized operator *is* the compact stored form and *is* applied
on-the-fly.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import comb
from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import EDConfig
from .sectors import Sector, SectorTable, bath_stride
from .bath import Bath
from . import fock


class SpinCOO(NamedTuple):
    """Sparse per-spin operator: dst rank, src rank, value."""
    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    shape: Tuple[int, int]

    def to_dense(self) -> np.ndarray:
        return fock.coo_to_dense(self.rows, self.cols, self.vals, self.shape)

    def scaled(self, c) -> "SpinCOO":
        return SpinCOO(self.rows, self.cols, self.vals * c, self.shape)


def _empty_coo(shape) -> SpinCOO:
    z = np.empty(0, dtype=np.int64)
    return SpinCOO(z, z, np.empty(0, dtype=np.float64), shape)


def _sum_coo(coos: List[SpinCOO], shape) -> SpinCOO:
    if not coos:
        return _empty_coo(shape)
    dt = np.result_type(*[c.vals.dtype for c in coos])
    rows = np.concatenate([c.rows for c in coos])
    cols = np.concatenate([c.cols for c in coos])
    vals = np.concatenate([c.vals.astype(dt) for c in coos])
    # merge duplicates (sorted by row for locality)
    key = rows * shape[1] + cols
    order = np.argsort(key, kind="stable")
    key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
    uniq, inv = np.unique(key, return_inverse=True)
    merged = np.zeros(uniq.size, dtype=vals.dtype)
    np.add.at(merged, inv, vals)
    keep = merged != 0
    return SpinCOO(uniq[keep] // shape[1], uniq[keep] % shape[1], merged[keep], shape)


class MixTerm(NamedTuple):
    """coeff * (dw_op ⊗ up_op) mapping block src -> block dst."""
    src: int
    dst: int
    up: Optional[SpinCOO]   # None = identity on the up factor
    dw: Optional[SpinCOO]   # None = identity on the dw factor
    coeff: complex


@dataclass
class SectorHamiltonian:
    """All data needed to apply H within one sector.

    The diagonal is stored in FACTORED form when possible (``dfac``):
    every density-density diagonal is exactly
    ``nd @ W @ nu.T + d_dw[:, None] + d_up[None, :]`` with per-spin
    occupation matrices ``nd``/``nu`` ([d, norb], 0/1 entries) and
    per-spin energy vectors — so the accelerator sweep engine ships a
    few KB of factors per (spin, n) group instead of the O(dim) dense
    diagonal (which at Ns=12 is ~134 MB/iteration of tunnel traffic).
    ``.diag`` materializes the dense blocks lazily for the paths that
    still want them (dense eigh, serial matvec, oracle tests)."""
    sector: Sector
    _diag: Optional[List[np.ndarray]]   # per block [ddw, dup] real (lazy)
    hup: List[SpinCOO]            # per block, acting on up factor
    hdw: List[SpinCOO]            # per block, acting on dw factor
    mix: List[MixTerm]
    dtype: np.dtype               # overall scalar dtype (real or complex)
    # (W, const, [(d_dw, d_up, nd, nu) per block]) or None; const is the
    # hfmode shift. The materialization below keeps the EXACT expression
    # and f64 add order of the original eager construction (A + d_up +
    # d_dw + const) so the factored form is bit-identical to it — DMFT
    # trajectories near marginal fit bistabilities are sensitive to ulps.
    dfac: Optional[tuple] = None

    @property
    def diag(self) -> List[np.ndarray]:
        if self._diag is None:
            W, const, blocks = self.dfac
            self._diag = [
                np.ascontiguousarray(nd @ W @ nu.T + d_up[None, :]
                                     + d_dw[:, None] + const)
                for d_dw, d_up, nd, nu in blocks]
        return self._diag

    @property
    def dim(self) -> int:
        return self.sector.dim

    def nnz_estimate(self) -> int:
        """Effective nonzeros of the *flat* sector matrix this represents
        (for nnz/s throughput accounting comparable to the reference CSR)."""
        n = 0
        for b, (u, d, dg) in enumerate(zip(self.hup, self.hdw, self.diag)):
            blk = self.sector.blocks[b]
            n += u.rows.size * blk.ddw + d.rows.size * blk.dup + dg.size
        for t in self.mix:
            nu = t.up.rows.size if t.up is not None else \
                self.sector.blocks[t.src].dup
            nd = t.dw.rows.size if t.dw is not None else \
                self.sector.blocks[t.src].ddw
            n += nu * nd
        return n


# ----------------------------------------------------------------------
# single-particle data from (config, bath, Hloc)
# ----------------------------------------------------------------------

def single_particle_parts(cfg: EDConfig, bath: Bath, hloc: np.ndarray):
    """Quadratic Hamiltonian data on the Ns levels per spin.

    Returns (Tuu, Tdd, Tud, P):
      Tuu/Tdd : [Ns, Ns] same-spin hopping (impurity block + bath diag + hyb),
                convention H = Σ T[i,j] c†_i c_j  (T Hermitian)
      Tud     : [Ns, Ns] spin-flip  H += Σ Tud[i,j] c†_{i,up} c_{j,dw} + h.c.
                (nonzero only for ed_mode="nonsu2")
      P       : [Ns] pairing  H += Σ P[l] (c†_{l,up} c†_{l,dw} + h.c.)
                (nonzero only for ed_mode="superc")

    Sources: Himp.f90 (impHloc, xmu), Hbath.f90 (bath energies/replica h,
    superc d), Himp_bath.f90 (hybridizations v, spin-flip u).
    """
    ns, norb, nbath = cfg.ns, cfg.norb, cfg.nbath
    cplx = np.iscomplexobj(hloc) or cfg.bath_type == "replica"
    dt = np.complex128 if cplx else np.float64
    Tuu = np.zeros((ns, ns), dtype=dt)
    Tdd = np.zeros((ns, ns), dtype=dt)
    Tud = np.zeros((ns, ns), dtype=dt)
    P = np.zeros(ns, dtype=np.float64)

    iup, idw = 0, cfg.nspin - 1  # spin index into [Nspin,...] arrays
    # impurity local Hamiltonian and chemical potential (Himp.f90)
    Tuu[:norb, :norb] = hloc[0, 0]
    Tdd[:norb, :norb] = hloc[cfg.nspin - 1, cfg.nspin - 1]
    for a in range(norb):
        Tuu[a, a] -= cfg.xmu
        Tdd[a, a] -= cfg.xmu
    if cfg.ed_mode == "nonsu2" and cfg.nspin == 2:
        Tud[:norb, :norb] = hloc[0, 1]

    if cfg.bath_type != "replica":
        e_orbs = 1 if cfg.bath_type == "hybrid" else norb
        for a in range(e_orbs):
            for k in range(nbath):
                s = bath_stride(cfg, a, k)
                Tuu[s, s] += bath.e[iup, a, k]
                Tdd[s, s] += bath.e[idw, a, k]
        for a in range(norb):
            for k in range(nbath):
                s = bath_stride(cfg, a, k)
                Tuu[a, s] += bath.v[iup, a, k]
                Tuu[s, a] += np.conj(bath.v[iup, a, k])
                Tdd[a, s] += bath.v[idw, a, k]
                Tdd[s, a] += np.conj(bath.v[idw, a, k])
        if cfg.ed_mode == "superc":
            for a in range(e_orbs):
                for k in range(nbath):
                    s = bath_stride(cfg, a, k)
                    P[s] += bath.d[0, a, k]
        if cfg.ed_mode == "nonsu2":
            # imp-bath spin-flip u (Himp_bath.f90 nonsu2 branch)
            for a in range(norb):
                for k in range(nbath):
                    s = bath_stride(cfg, a, k)
                    # c†_{bath,dw} c_{imp,up}: Tud[imp, bath] += u (h.c. of it)
                    Tud[a, s] += bath.u[iup, a, k]
                    # c†_{bath,up} c_{imp,dw}: Tud[bath, imp] += u
                    Tud[s, a] += bath.u[idw, a, k]
    else:
        # replica bath: Nbath copies of an impHloc-shaped matrix + scalar vr
        for k in range(nbath):
            hk = bath.h[..., k]
            for a in range(norb):
                for b in range(norb):
                    sa, sb = bath_stride(cfg, a, k), bath_stride(cfg, b, k)
                    Tuu[sa, sb] += hk[0, 0, a, b]
                    Tdd[sa, sb] += hk[cfg.nspin - 1, cfg.nspin - 1, a, b]
                    if cfg.ed_mode == "nonsu2" and cfg.nspin == 2:
                        Tud[sa, sb] += hk[0, 1, a, b]
            for a in range(norb):
                sa = bath_stride(cfg, a, k)
                Tuu[a, sa] += bath.vr[k]
                Tuu[sa, a] += np.conj(bath.vr[k])
                Tdd[a, sa] += bath.vr[k]
                Tdd[sa, a] += np.conj(bath.vr[k])
    if not cplx:
        Tuu, Tdd, Tud = Tuu.real, Tdd.real, Tud.real
    return Tuu, Tdd, Tud, P


# (ns, n, T-bytes) -> SpinCOO. The sector sweep calls _spin_quadratic
# per sector block, but a sweep only has ~Ns+1 distinct (spin, n)
# operators (H_up depends on n_up only, H_dw on n_dw only) — the same
# sharing the device concat engine exploits (sweep_plain). SpinCOO is
# treated immutably everywhere (scaled() copies), so entries can be
# shared. Bath updates change T's bytes, invalidating naturally.
_SPINQ_CACHE: dict = {}


def _spin_quadratic(ns: int, n: int, T: np.ndarray) -> SpinCOO:
    """Σ_{i≠j} T[i,j] c†_i c_j restricted to the n-particle spin basis.

    The diagonal of T is handled separately (block diagonal), so only
    off-diagonal entries enter.
    """
    key = (ns, n, T.dtype.str, T.tobytes())
    hit = _SPINQ_CACHE.get(key)
    if hit is not None:
        return hit
    dim = fock.comb(ns, n)
    coos = []
    nz = np.argwhere((T != 0) & ~np.eye(ns, dtype=bool))
    for i, j in nz:
        r, c, s = fock.hop_op(ns, n, int(i), int(j))
        coos.append(SpinCOO(r, c, s * T[i, j], (dim, dim)))
    out = _sum_coo(coos, (dim, dim))
    if len(_SPINQ_CACHE) > 512:
        _SPINQ_CACHE.clear()
    _SPINQ_CACHE[key] = out
    return out


# ----------------------------------------------------------------------
# sector Hamiltonian assembly
# ----------------------------------------------------------------------

def _pos_map(sel: np.ndarray, dim: int) -> np.ndarray:
    pos = np.full(dim, -1, dtype=np.int64)
    pos[sel] = np.arange(sel.size)
    return pos


def _maybe_restrict(coo_tuple, shape_full, row_pos, col_pos):
    """Restrict raw (rows, cols, vals) to sub-bases; None pos = identity."""
    rows, cols, vals = coo_tuple
    nr, nc = shape_full
    if row_pos is None and col_pos is None:
        return SpinCOO(rows, cols, np.asarray(vals), (nr, nc))
    if row_pos is None:
        row_pos = np.arange(nr)
        nrr = nr
    else:
        nrr = int((row_pos >= 0).sum())
    if col_pos is None:
        col_pos = np.arange(nc)
        ncc = nc
    else:
        ncc = int((col_pos >= 0).sum())
    r, c, v = fock.restrict_coo(np.asarray(rows), np.asarray(cols),
                                np.asarray(vals), row_pos, col_pos)
    return SpinCOO(r, c, v, (nrr, ncc))


def build_sector_hamiltonian(cfg: EDConfig, sector: Sector, bath: Bath,
                             hloc: np.ndarray) -> SectorHamiltonian:
    ns, norb = cfg.ns, cfg.norb
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    dt = np.result_type(Tuu.dtype, Tud.dtype,
                        np.complex128 if np.any(Tud) else np.float64)
    uloc = np.asarray(cfg.uloc_arr[:norb])
    ust, jh, jx, jp = cfg.ust, cfg.jh, cfg.jx, cfg.jp
    jhflag = (jx != 0.0) or (jp != 0.0)
    jz = sector.subsel is not None
    if jz:
        assert cfg.ed_mode == "nonsu2", "sub-selected blocks imply Jz basis"
        from .fock import LZDIAG_T2G

    diag: List[np.ndarray] = []
    hup: List[SpinCOO] = []
    hdw: List[SpinCOO] = []
    mix: List[MixTerm] = []

    blk_index = {}
    for i, b in enumerate(sector.blocks):
        if not jz:
            blk_index[(b.nup, b.ndw)] = i

    def pos_of(n, sel):
        return None if sel is None else _pos_map(sel, comb(ns, n))

    for bi, blk in enumerate(sector.blocks):
        nup, ndw = blk.nup, blk.ndw
        up_sel = sector.up_sel(bi)
        dw_sel = sector.dw_sel(bi)
        lup, ldw = sector.block_lz(bi)
        up_pos = pos_of(nup, up_sel)
        dw_pos = pos_of(ndw, dw_sel)
        # --- per-spin quadratic off-diagonal parts (restricted to the
        # Lz class in the Jz basis — class-changing entries violate Jz
        # conservation and are dropped, cf. the `if(Jz_basis.and.j==0)cycle`
        # guards in ED_OBSERVABLES.f90:810+)
        hu = _spin_quadratic(ns, nup, Tuu)
        hd = _spin_quadratic(ns, ndw, Tdd)
        hup.append(_maybe_restrict((hu.rows, hu.cols, hu.vals), hu.shape,
                                   up_pos, up_pos))
        hdw.append(_maybe_restrict((hd.rows, hd.cols, hd.vals), hd.shape,
                                   dw_pos, dw_pos))

        # --- diagonal: single-particle diag + interaction (Hint.f90)
        occ_u = fock.occupations(ns, nup)            # [dup_full, Ns]
        occ_d = fock.occupations(ns, ndw)
        if up_sel is not None:
            occ_u = occ_u[up_sel]
        if dw_sel is not None:
            occ_d = occ_d[dw_sel]
        d_up = occ_u @ np.real(np.diag(Tuu))         # [dup]
        d_dw = occ_d @ np.real(np.diag(Tdd))
        nu = occ_u[:, :norb]                          # impurity occupations
        nd = occ_d[:, :norb]
        if norb > 1:
            M = np.triu(np.ones((norb, norb)), 1)
            d_up = d_up + (ust - jh) * np.einsum("ia,ab,ib->i", nu, M, nu)
            d_dw = d_dw + (ust - jh) * np.einsum("ia,ab,ib->i", nd, M, nd)
        if cfg.hfmode:
            d_up = d_up - 0.5 * nu @ uloc
            d_dw = d_dw - 0.5 * nd @ uloc
            const = 0.25 * uloc.sum()
            if norb > 1:
                npairs = norb * (norb - 1) // 2
                d_up = d_up - 0.5 * (ust + (ust - jh)) * (norb - 1) * nu.sum(1)
                d_dw = d_dw - 0.5 * (ust + (ust - jh)) * (norb - 1) * nd.sum(1)
                const += 0.25 * (ust + (ust - jh)) * npairs
        else:
            const = 0.0
        W = np.diag(uloc) + ust * (np.ones((norb, norb)) - np.eye(norb))
        # factored diagonal: materialized lazily by SectorHamiltonian.diag
        # (same expression, same add order — bit-identical f64)
        diag.append((np.asarray(d_dw, dtype=np.float64),
                     np.asarray(d_up, dtype=np.float64),
                     np.asarray(nd, dtype=np.float64),
                     np.asarray(nu, dtype=np.float64)))

        # --- spin-exchange & pair-hopping (Hint.f90, Norb>1 & Jhflag)
        if norb > 1 and jhflag:
            for a in range(norb):
                for b in range(norb):
                    if a == b:
                        continue
                    for coeff, up_ab, dw_ab in (
                            (jx, (a, b), (b, a)),    # S-E
                            (jp, (a, b), (a, b))):   # P-H
                        if coeff == 0.0:
                            continue
                        up = fock.hop_op(ns, nup, *up_ab)
                        dw = fock.hop_op(ns, ndw, *dw_ab)
                        if not (up[0].size and dw[0].size):
                            continue
                        if not jz:
                            mix.append(MixTerm(
                                bi, bi,
                                SpinCOO(*up, (blk.dup, blk.dup)),
                                SpinCOO(*dw, (blk.ddw, blk.ddw)), coeff))
                        else:
                            dl = 2 * (LZDIAG_T2G[up_ab[0] % 3]
                                      - LZDIAG_T2G[up_ab[1] % 3])
                            dl_dw = 2 * (LZDIAG_T2G[dw_ab[0] % 3]
                                         - LZDIAG_T2G[dw_ab[1] % 3])
                            ti = sector.block_index_of(nup, ndw, lup + dl,
                                                       ldw + dl_dw)
                            if ti is None:
                                continue
                            upc = _maybe_restrict(up, (comb(ns, nup),) * 2,
                                                  pos_of(nup,
                                                         sector.up_sel(ti)),
                                                  up_pos)
                            dwc = _maybe_restrict(dw, (comb(ns, ndw),) * 2,
                                                  pos_of(ndw,
                                                         sector.dw_sel(ti)),
                                                  dw_pos)
                            if upc.rows.size and dwc.rows.size:
                                mix.append(MixTerm(bi, ti, upc, dwc, coeff))

        # --- superc pairing (Hbath.f90): P[l] c_{l,up} c_{l,dw} + h.c.
        if cfg.ed_mode == "superc" and np.any(P):
            tgt = blk_index.get((nup - 1, ndw - 1))
            if tgt is not None:
                tb = sector.blocks[tgt]
                for l in np.nonzero(P)[0]:
                    cu = fock.c_op(ns, nup, int(l))
                    cd = fock.c_op(ns, ndw, int(l))
                    if cu[0].size and cd[0].size:
                        # ref order: c_up then c_dw; the dw JW string crosses
                        # nup-1 up bits -> global phase (-1)^(nup-1)
                        ph = -1.0 if (nup - 1) % 2 else 1.0
                        mix.append(MixTerm(
                            bi, tgt,
                            SpinCOO(*cu, (tb.dup, blk.dup)),
                            SpinCOO(*cd, (tb.ddw, blk.ddw)),
                            P[l] * ph))
            tgt = blk_index.get((nup + 1, ndw + 1))
            if tgt is not None:
                tb = sector.blocks[tgt]
                for l in np.nonzero(P)[0]:
                    ku = fock.cdg_op(ns, nup, int(l))
                    kd = fock.cdg_op(ns, ndw, int(l))
                    if ku[0].size and kd[0].size:
                        # ref order: c†_dw then c†_up; dw string crosses nup bits
                        ph = -1.0 if nup % 2 else 1.0
                        mix.append(MixTerm(
                            bi, tgt,
                            SpinCOO(*ku, (tb.dup, blk.dup)),
                            SpinCOO(*kd, (tb.ddw, blk.ddw)),
                            P[l] * ph))

        # --- nonsu2 spin flips: Tud[i,j] c†_{i,up} c_{j,dw} + h.c.
        if cfg.ed_mode == "nonsu2" and np.any(Tud):
            nzs = np.argwhere(Tud != 0)
            for i, j in nzs:
                # c†_{i,up} c_{j,dw}: block (nup, ndw) -> (nup+1, ndw-1)
                ph = -1.0 if nup % 2 else 1.0
                ku = fock.cdg_op(ns, nup, int(i))
                kd = fock.c_op(ns, ndw, int(j))
                if ku[0].size and kd[0].size:
                    if not jz:
                        ti = blk_index.get((nup + 1, ndw - 1))
                        if ti is not None:
                            tb = sector.blocks[ti]
                            mix.append(MixTerm(
                                bi, ti,
                                SpinCOO(*ku, (tb.dup, blk.dup)),
                                SpinCOO(*kd, (tb.ddw, blk.ddw)),
                                Tud[i, j] * ph))
                    else:
                        ti = sector.block_index_of(
                            nup + 1, ndw - 1,
                            lup + 2 * LZDIAG_T2G[int(i) % 3],
                            ldw - 2 * LZDIAG_T2G[int(j) % 3])
                        if ti is not None:
                            upc = _maybe_restrict(
                                ku, (comb(ns, nup + 1), comb(ns, nup)),
                                pos_of(nup + 1, sector.up_sel(ti)), up_pos)
                            dwc = _maybe_restrict(
                                kd, (comb(ns, ndw - 1), comb(ns, ndw)),
                                pos_of(ndw - 1, sector.dw_sel(ti)), dw_pos)
                            if upc.rows.size and dwc.rows.size:
                                mix.append(MixTerm(bi, ti, upc, dwc,
                                                   Tud[i, j] * ph))
                # h.c.: c†_{j,dw} c_{i,up}: block -> (nup-1, ndw+1)
                ph2 = -1.0 if (nup - 1) % 2 else 1.0
                ku2 = fock.c_op(ns, nup, int(i))
                kd2 = fock.cdg_op(ns, ndw, int(j))
                if ku2[0].size and kd2[0].size:
                    if not jz:
                        ti = blk_index.get((nup - 1, ndw + 1))
                        if ti is not None:
                            tb = sector.blocks[ti]
                            mix.append(MixTerm(
                                bi, ti,
                                SpinCOO(*ku2, (tb.dup, blk.dup)),
                                SpinCOO(*kd2, (tb.ddw, blk.ddw)),
                                np.conj(Tud[i, j]) * ph2))
                    else:
                        ti = sector.block_index_of(
                            nup - 1, ndw + 1,
                            lup - 2 * LZDIAG_T2G[int(i) % 3],
                            ldw + 2 * LZDIAG_T2G[int(j) % 3])
                        if ti is not None:
                            upc = _maybe_restrict(
                                ku2, (comb(ns, nup - 1), comb(ns, nup)),
                                pos_of(nup - 1, sector.up_sel(ti)), up_pos)
                            dwc = _maybe_restrict(
                                kd2, (comb(ns, ndw + 1), comb(ns, ndw)),
                                pos_of(ndw + 1, sector.dw_sel(ti)), dw_pos)
                            if upc.rows.size and dwc.rows.size:
                                mix.append(MixTerm(bi, ti, upc, dwc,
                                                   np.conj(Tud[i, j]) * ph2))

    W = np.diag(uloc) + ust * (np.ones((norb, norb)) - np.eye(norb))
    const = 0.25 * uloc.sum() if cfg.hfmode else 0.0
    if cfg.hfmode and norb > 1:
        const += 0.25 * (ust + (ust - jh)) * (norb * (norb - 1) // 2)
    return SectorHamiltonian(sector, None, hup, hdw, mix, np.dtype(dt),
                             dfac=(W, const, diag))


# ----------------------------------------------------------------------
# dense assembly (tests + LAPACK path for small sectors, ED_DIAG.f90:188-211)
# ----------------------------------------------------------------------

def assemble_dense(ham: SectorHamiltonian) -> np.ndarray:
    """Full dense sector matrix H[dst, src] — for dim <= lanc_dim_threshold."""
    sec = ham.sector
    dim = sec.dim
    H = np.zeros((dim, dim), dtype=ham.dtype if ham.dtype != np.float64
                 else np.float64)
    for bi, blk in enumerate(sec.blocks):
        o = blk.offset
        sl = slice(o, o + blk.dim)
        Iu, Id = np.eye(blk.dup), np.eye(blk.ddw)
        Hu = ham.hup[bi].to_dense()
        Hd = ham.hdw[bi].to_dense()
        Hb = np.kron(Id, Hu) + np.kron(Hd, Iu) + np.diag(ham.diag[bi].ravel())
        H[sl, sl] += Hb
    for t in ham.mix:
        bs, bd = sec.blocks[t.src], sec.blocks[t.dst]
        A = t.up.to_dense() if t.up is not None else np.eye(bd.dup, bs.dup)
        B = t.dw.to_dense() if t.dw is not None else np.eye(bd.ddw, bs.ddw)
        M = t.coeff * np.kron(B, A)
        H[bd.offset:bd.offset + bd.dim, bs.offset:bs.offset + bs.dim] += M
    return H


# ----------------------------------------------------------------------
# jitted matvec
# ----------------------------------------------------------------------

def _apply_spin_coo_up(V, coo_dev, out_cols):
    """Y[:, rows] += vals * V[:, cols] via gather + scatter-add."""
    rows, cols, vals = coo_dev
    G = V[:, cols] * vals[None, :]
    Y = jnp.zeros((V.shape[0], out_cols), dtype=G.dtype)
    return Y.at[:, rows].add(G)


def _apply_spin_coo_dw(V, coo_dev, out_rows):
    """Y[rows, :] += vals * V[cols, :]."""
    rows, cols, vals = coo_dev
    G = V[cols, :] * vals[:, None]
    Y = jnp.zeros((out_rows, V.shape[1]), dtype=G.dtype)
    return Y.at[rows, :].add(G)


def make_matvec(ham: SectorHamiltonian, cfg: EDConfig):
    """Returns (matvec, vec_template) where matvec maps a tuple of per-block
    matrices to same. All operator data are closed-over device constants;
    matvec is jit-compatible and fully static-shaped.

    NOTE: each call creates a fresh closure — jit caches keyed on function
    identity recompile per call. Hot paths (DMFT loops revisiting sectors
    with new bath values) should use `make_matvec_op` + `apply_op`, which
    split the operator into a hashable structure spec (compile key) and a
    pytree of arrays (traced arguments).
    """
    sec = ham.sector
    rdtype = jnp.dtype(cfg.dtype)
    cdtype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
    is_cplx = np.issubdtype(ham.dtype, np.complexfloating)
    vdtype = cdtype if is_cplx else rdtype
    thr = cfg.dense_matmul_threshold
    # Ozaki int8-digit matmuls: real f64 dense operators only
    ozaki_n = ozaki_b = 0
    if cfg.matmul_precision.startswith("ozaki") and not is_cplx \
            and rdtype == jnp.float64:
        from . import ozaki as _ozaki
        ozaki_n, ozaki_b = _ozaki.parse_precision(cfg.matmul_precision)

    diag = [jnp.asarray(d, dtype=rdtype) for d in ham.diag]

    def prep(coo: SpinCOO, dense_ok: bool, side: str = "left"):
        """side: how the dense operator is applied — 'left' (O @ V, dw ops)
        or 'right' (V @ O^T, up ops)."""
        n, m = coo.shape
        if dense_ok and max(n, m) <= thr:
            dense = coo.to_dense()
            if ozaki_n:
                if side == "left":
                    op = _ozaki.SlicedMatrix(dense, ozaki_n, ozaki_b)
                else:
                    op = _ozaki.SlicedRightOperand(dense.T, ozaki_n, ozaki_b)
                return ("ozaki_" + side, op)
            return ("dense", jnp.asarray(dense, dtype=vdtype))
        return ("coo", (jnp.asarray(coo.rows, dtype=jnp.int32),
                        jnp.asarray(coo.cols, dtype=jnp.int32),
                        jnp.asarray(coo.vals, dtype=vdtype)))

    def prep_block(coo_up: SpinCOO, coo_dw: SpinCOO):
        """(hup_spec, hdw_spec) per block; when both spin parts are
        dense-ozaki, encode as ONE fused two-orientation product
        (ozaki.fused_two_sided — same MACs, doubled contraction axis, one
        TwoSum epilogue; see make_matvec_op.enc_fused)."""
        from .device import ozaki_fused
        if ozaki_n and ozaki_fused() \
                and max(coo_up.shape) <= thr and max(coo_dw.shape) <= thr:
            return (("fused", None),
                    ("ozaki_fused",
                     (jnp.asarray(coo_dw.to_dense(), dtype=rdtype),
                      jnp.asarray(coo_up.to_dense().T, dtype=rdtype))))
        return prep(coo_up, True, "right"), prep(coo_dw, True, "left")

    hup, hdw = [], []
    for cu, cd in zip(ham.hup, ham.hdw):
        su, sd = prep_block(cu, cd)
        hup.append(su)
        hdw.append(sd)
    mix = []
    for t in ham.mix:
        up = prep(t.up, True, "right") if t.up is not None else None
        dw = prep(t.dw, True, "left") if t.dw is not None else None
        mix.append((t.src, t.dst, up, dw,
                    jnp.asarray(t.coeff, dtype=vdtype)))

    shapes = [(b.ddw, b.dup) for b in sec.blocks]

    def apply_up(v, spec, out_cols):
        kind, dat = spec
        if kind == "dense":
            return v @ dat.T
        if kind == "ozaki_right":
            return _ozaki.right_sliced_matmul(v, dat.digits, dat.scales,
                                              dat.nslices, dat.bits)
        if dat[0].shape[0]:
            return _apply_spin_coo_up(v, dat, out_cols)
        return None

    def apply_dw(v, spec, out_rows):
        kind, dat = spec
        if kind == "dense":
            return dat @ v
        if kind == "ozaki_left":
            return _ozaki.sliced_matmul(dat.digits, dat.scales, v,
                                        dat.nslices, dat.bits)
        if dat[0].shape[0]:
            return _apply_spin_coo_dw(v, dat, out_rows)
        return None

    def matvec(V):
        Y = []
        for bi, blk in enumerate(sec.blocks):
            v = V[bi]
            y = diag[bi] * v
            if hdw[bi][0] == "ozaki_fused":
                Hdw_d, HupT_d = hdw[bi][1]
                y = y + _ozaki.fused_two_sided(Hdw_d, HupT_d, v,
                                               ozaki_n, ozaki_b)
                Y.append(y)
                continue
            r = apply_up(v, hup[bi], blk.dup)
            if r is not None:
                y = y + r
            r = apply_dw(v, hdw[bi], blk.ddw)
            if r is not None:
                y = y + r
            Y.append(y)
        for (src, dst, up, dw, coeff) in mix:
            v = V[src]
            if up is not None:
                v = apply_up(v, up, shapes[dst][1])
                if v is None:       # empty operator: term vanishes
                    continue
            if dw is not None:
                v = apply_dw(v, dw, shapes[dst][0])
                if v is None:
                    continue
            Y[dst] = Y[dst] + coeff * v
        return tuple(Y)

    template = tuple(jnp.zeros(s, dtype=vdtype) for s in shapes)
    return matvec, template


# ----------------------------------------------------------------------
# block-vector <-> flat-vector helpers
# ----------------------------------------------------------------------

def flatten_blocks(V) -> jnp.ndarray:
    return jnp.concatenate([v.reshape(-1) for v in V])


def unflatten_blocks(x, sector: Sector):
    out = []
    for b in sector.blocks:
        out.append(x[b.offset:b.offset + b.dim].reshape(b.ddw, b.dup))
    return tuple(out)


def np_unflatten_blocks(x: np.ndarray, sector: Sector):
    return tuple(np.asarray(x[b.offset:b.offset + b.dim]).reshape(b.ddw, b.dup)
                 for b in sector.blocks)


# ----------------------------------------------------------------------
# spec/arrays operator form: stable compile keys across DMFT iterations
# ----------------------------------------------------------------------
#
# The closure form above recompiles whenever a sector Hamiltonian is rebuilt
# (every DMFT iteration). Here the operator is split into
#   spec   — a hashable tuple describing the block structure, term kinds and
#            shapes (the jit compile key), and
#   arrays — a flat tuple of device arrays (diagonals, dense/COO/ozaki data)
#            passed as traced arguments.
# `_applier(spec)` is lru-cached, so its identity is stable and jitted
# callers (Lanczos loops) retrace only when the structure changes.

from functools import lru_cache as _lru_cache


def make_matvec_op(ham: SectorHamiltonian, cfg: EDConfig, pad=None):
    """Returns (spec, arrays, shapes): use with `apply_op(spec, arrays, V)`
    or `lanczos.lanczos_tridiag_op`.

    pad=(ddw_pad, dup_pad, nnz_up, nnz_dw) zero-embeds a single-block,
    no-mix sector operator into a (ddw_pad, dup_pad) block (the ragged-
    batching form, see make_padded_matvec_op). One encoder serves both
    forms so the dense/ozaki/COO encoding rules cannot diverge: with pad,
    the decision is made from the PADDED shape and COO nonzeros pad to the
    bucket max with zero-valued entries at (0, 0)."""
    sec = ham.sector
    if pad is not None and (len(sec.blocks) != 1 or ham.mix):
        raise ValueError("padded op requires a single block and no mix terms")
    rdtype = jnp.dtype(cfg.dtype)
    cdtype = jnp.dtype(jnp.complex128 if rdtype == jnp.float64
                       else jnp.complex64)
    is_cplx = np.issubdtype(ham.dtype, np.complexfloating)
    vdtype = cdtype if is_cplx else rdtype
    thr = cfg.dense_matmul_threshold
    ozaki_n = ozaki_b = 0
    if cfg.matmul_precision.startswith("ozaki") and not is_cplx \
            and rdtype == jnp.float64:
        from . import ozaki as _oz
        ozaki_n, ozaki_b = _oz.parse_precision(cfg.matmul_precision)
    from .device import ozaki_fused

    arrays = []

    def push(*arrs):
        i0 = len(arrays)
        arrays.extend(arrs)
        return tuple(range(i0, len(arrays)))

    def enc_fused(coo_up: SpinCOO, coo_dw: SpinCOO,
                  up_pad=None, dw_pad=None):
        """('ozf', n, b, iHdw, iHupT) when BOTH spin parts of a block
        encode dense-ozaki: the applier then runs ONE fused two-orientation
        K-concat product (ozaki.fused_two_sided) instead of two pre-sliced
        ones — same MACs, doubled contraction axis (higher size-bound s8
        rate) and a single TwoSum epilogue. Raw f64 matrices are pushed
        (re-sliced per call with the combined row/col scales; slicing is
        ~1% of the product at headline shapes)."""
        if not ozaki_n or not ozaki_fused():
            return None
        nu, mu = coo_up.shape
        nd, md = coo_dw.shape
        if (max(nu, mu) if up_pad is None else up_pad) > thr or \
                (max(nd, md) if dw_pad is None else dw_pad) > thr:
            return None
        du = coo_up.to_dense()
        dd = coo_dw.to_dense()
        if up_pad is not None:
            d = np.zeros((up_pad, up_pad))
            d[:nu, :mu] = du
            du = d
        if dw_pad is not None:
            d = np.zeros((dw_pad, dw_pad))
            d[:nd, :md] = dd
            dd = d
        idx = push(jnp.asarray(dd, dtype=rdtype),
                   jnp.asarray(du.T, dtype=rdtype))
        return ("ozf", ozaki_n, ozaki_b) + idx

    def enc(coo: SpinCOO, side: str, n_pad=None, nnz_pad=0):
        n, m = coo.shape
        if (max(n, m) if n_pad is None else n_pad) <= thr:
            dense = coo.to_dense()
            if n_pad is not None:
                d = np.zeros((n_pad, n_pad),
                             dtype=complex if is_cplx else float)
                d[:n, :m] = dense
                dense = d
            if ozaki_n:
                if side == "left":
                    op = _oz.SlicedMatrix(dense, ozaki_n, ozaki_b)
                else:
                    op = _oz.SlicedRightOperand(dense.T, ozaki_n, ozaki_b)
                idx = push(op.digits, op.scales)
                return ("oz" + side[0], ozaki_n, ozaki_b) + idx
            idx = push(jnp.asarray(dense, dtype=vdtype))
            return ("dense",) + idx
        if (coo.rows.size if n_pad is None else nnz_pad) == 0:
            return ("none",)
        rows, cols, vals = coo.rows, coo.cols, coo.vals
        if n_pad is not None:
            k = coo.rows.size
            rows = np.zeros(nnz_pad, dtype=np.int32)
            cols = np.zeros(nnz_pad, dtype=np.int32)
            vals = np.zeros(nnz_pad, dtype=complex if is_cplx else float)
            rows[:k], cols[:k], vals[:k] = coo.rows, coo.cols, coo.vals
        idx = push(jnp.asarray(rows, dtype=jnp.int32),
                   jnp.asarray(cols, dtype=jnp.int32),
                   jnp.asarray(vals, dtype=vdtype))
        return ("coo",) + idx

    if pad is not None:
        ddw_pad, dup_pad, nnz_up, nnz_dw = pad
        blk = sec.blocks[0]
        diag = np.zeros((ddw_pad, dup_pad))
        diag[:blk.ddw, :blk.dup] = ham.diag[0]
        diag_idx = push(jnp.asarray(diag, dtype=rdtype))[0]
        f = enc_fused(ham.hup[0], ham.hdw[0], dup_pad, ddw_pad)
        if f is not None:
            hup_spec, hdw_spec = ("ozf",), f
        else:
            hup_spec = enc(ham.hup[0], "right", dup_pad, nnz_up)
            hdw_spec = enc(ham.hdw[0], "left", ddw_pad, nnz_dw)
        blocks = ((ddw_pad, dup_pad),)
        spec = (blocks, (diag_idx,), (hup_spec,), (hdw_spec,), (),
                str(vdtype))
        return spec, tuple(arrays), blocks

    blocks = tuple((b.ddw, b.dup) for b in sec.blocks)
    diag_idx = []
    hup_spec = []
    hdw_spec = []
    for bi, blk in enumerate(sec.blocks):
        diag_idx.append(push(jnp.asarray(ham.diag[bi], dtype=rdtype))[0])
        f = enc_fused(ham.hup[bi], ham.hdw[bi])
        if f is not None:
            hup_spec.append(("ozf",))
            hdw_spec.append(f)
        else:
            hup_spec.append(enc(ham.hup[bi], "right"))
            hdw_spec.append(enc(ham.hdw[bi], "left"))
    mix_spec = []
    for t in ham.mix:
        up = enc(t.up, "right") if t.up is not None else None
        dw = enc(t.dw, "left") if t.dw is not None else None
        cidx = push(jnp.asarray(t.coeff, dtype=vdtype))[0]
        mix_spec.append((t.src, t.dst, up, dw, cidx))
    spec = (blocks, tuple(diag_idx), tuple(hup_spec), tuple(hdw_spec),
            tuple(mix_spec), str(vdtype))
    return spec, tuple(arrays), blocks


@_lru_cache(maxsize=512)
def _applier(spec):
    """Python apply function for a given operator structure (stable id)."""
    blocks, diag_idx, hup_spec, hdw_spec, mix_spec, _ = spec

    def app(kind_spec, arrays, v, side, out_dim):
        kind = kind_spec[0]
        if kind == "none":
            return None
        if kind == "dense":
            dat = arrays[kind_spec[1]]
            return v @ dat.T if side == "right" else dat @ v
        if kind in ("ozr", "ozl"):
            from . import ozaki as _oz
            nsl, bits = kind_spec[1], kind_spec[2]
            dg, sc = arrays[kind_spec[3]], arrays[kind_spec[4]]
            if kind == "ozr":
                return _oz.right_sliced_matmul(v, dg, sc, nsl, bits)
            return _oz.sliced_matmul(dg, sc, v, nsl, bits)
        rows, cols, vals = (arrays[i] for i in kind_spec[1:4])
        if side == "right":
            return _apply_spin_coo_up(v, (rows, cols, vals), out_dim)
        return _apply_spin_coo_dw(v, (rows, cols, vals), out_dim)

    def matvec(arrays, V):
        Y = []
        for bi, (ddw, dup) in enumerate(blocks):
            v = V[bi]
            y = arrays[diag_idx[bi]] * v
            if hdw_spec[bi][0] == "ozf":
                # fused two-orientation Ozaki product (one K-concat set +
                # one TwoSum epilogue for Hdw@V + V@HupT)
                from . import ozaki as _oz
                nsl, bits = hdw_spec[bi][1], hdw_spec[bi][2]
                y = y + _oz.fused_two_sided(arrays[hdw_spec[bi][3]],
                                            arrays[hdw_spec[bi][4]],
                                            v, nsl, bits)
                Y.append(y)
                continue
            r = app(hup_spec[bi], arrays, v, "right", dup)
            if r is not None:
                y = y + r
            r = app(hdw_spec[bi], arrays, v, "left", ddw)
            if r is not None:
                y = y + r
            Y.append(y)
        for (src, dst, up, dw, cidx) in mix_spec:
            v = V[src]
            if up is not None:
                v = app(up, arrays, v, "right", blocks[dst][1])
                if v is None:
                    continue
            if dw is not None:
                v = app(dw, arrays, v, "left", blocks[dst][0])
                if v is None:
                    continue
            Y[dst] = Y[dst] + arrays[cidx] * v
        return tuple(Y)

    return matvec


def apply_op(spec, arrays, V):
    """H·V in the spec/arrays form (wrap in jit with spec static)."""
    return _applier(spec)(arrays, V)


def make_padded_matvec_op(ham: SectorHamiltonian, cfg: EDConfig,
                          ddw_pad: int, dup_pad: int,
                          nnz_up: int = 0, nnz_dw: int = 0):
    """Zero-embed a single-block sector operator into a (ddw_pad, dup_pad)
    block so *different-shape* sectors share one spec (compile key) and
    stack on the `lanczos_tridiag_op_stacked` group axis.

    Exactness: the padded rows/columns of H and of the start vector are
    identically zero, so every Krylov vector stays in the embedded
    subspace and the Lanczos (alpha, beta) coefficients are bit-identical
    to the unpadded recurrence. The reference runs each of these
    different-dimension target sectors as a separate serial Lanczos chain
    (ED_GF_NORMAL.f90:580-632 per channel); here they become one batched
    device scan (gf_common.ResolventBatch ragged buckets).

    The encoding decision (dense / ozaki-sliced / COO) is made from the
    PADDED shape with the same rules as `make_matvec_op` (it IS
    make_matvec_op with pad=...), so every member of a bucket produces the
    same spec; COO nonzeros pad to (nnz_up, nnz_dw) with zero-valued
    entries at (0, 0).
    """
    return make_matvec_op(ham, cfg, pad=(ddw_pad, dup_pad, nnz_up, nnz_dw))
