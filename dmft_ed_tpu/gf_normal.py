"""Impurity Green's functions and self-energy, ed_mode = normal.

Replaces ED_GF_NORMAL.f90: diagonal G via c†/c excitations, orbital
off-diagonals via (c†_i+c†_j) and (c†_i+i c†_j) combinations with symmetry
reconstruction (:18-116, :279-553), pole accumulation (:580-632) and the
Dyson self-energy (:656-731).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .config import EDConfig
from .sectors import sector_table
from .bath import Bath
from .bath_fns import bath_params, invg0, g0and
from .eigenspace import StateList
from .excitations import apply_spin_op, apply_op_combo
from .gf_common import HamCache, accumulate_poles, state_iter
from . import grids


def _gf_shape(cfg, L):
    return np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, L),
                    dtype=complex)


def build_gf_normal(cfg: EDConfig, slist: StateList, zeta: float,
                    bath: Bath, hloc: np.ndarray, finite_t: bool,
                    log=None, mesh=None) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (Gmats, Greal) [Nspin,Nspin,Norb,Norb,L].

    All excitation channels targeting the same sector run as ONE batched
    device Lanczos (gf_common.ResolventBatch) — the reference's per-channel
    serial loops (lanc_build_gf_normal_c) become a device batch axis.
    """
    from .gf_common import ResolventBatch
    cache = HamCache(cfg, bath, hloc, mesh)
    batch = ResolventBatch(cfg, cache, slist.emin, zeta, finite_t)
    finalize = gf_normal_plan(cfg, slist, bath, batch, site=0, log=log)
    return finalize(batch.run())


def gf_normal_plan(cfg: EDConfig, slist: StateList, bath: Bath,
                   batch, site: int = 0, log=None):
    """Enqueue every normal-mode GF channel of one impurity into `batch`
    (tagged with `site` for multi-impurity batches) and return
    finalize(results) -> (Gmats, Greal), where results iterates this
    site's (meta, weights, poles). Splitting enqueue from accumulation
    lets the lattice solver share one ResolventBatch across inequivalent
    sites (the reference solves sites serially/round-robin,
    ED_MAIN.f90:576-678)."""
    table = sector_table(cfg)
    zm, zr = grids.z_mats(cfg), grids.z_real(cfg)
    Gm, Gr = _gf_shape(cfg, cfg.lmats), _gf_shape(cfg, cfg.lreal)

    def enqueue(sector, vec, e_i, terms, isign, target, cnorm2=1.0):
        r = apply_op_combo(cfg, table, sector, vec, terms)
        if r is None:
            return
        jsec, vv = r
        batch.add(jsec, vv, e_i,
                  {"isign": isign, "target": target, "cnorm2": cnorm2,
                   "site": site}, site=site)

    # --- diagonal G_aa channels (lanc_build_gf_normal_c)
    for ispin in range(cfg.nspin):
        for iorb in range(cfg.norb):
            if log:
                log(f"Get G_l{iorb + 1}_s{ispin + 1}")
            for sector, e_i, vec in state_iter(slist):
                enqueue(sector, vec, e_i, [(1.0, ispin, iorb, True)], 1,
                        (ispin, ispin, iorb, iorb))
                enqueue(sector, vec, e_i, [(1.0, ispin, iorb, False)], -1,
                        (ispin, ispin, iorb, iorb))

    # --- orbital off-diagonal channels (lanc_build_gf_normal_mix_c)
    offdiag = (cfg.bath_type != "normal") or cfg.ed_solve_offdiag_gf
    mask = _offdiag_mask(cfg, bath) if (offdiag and cfg.norb > 1) else None
    # the two auxiliary combos O+ = c_a + c_b and Oi = c_a - i c_b give
    #   A := G_{O+} = Gaa + Gbb + Gab + Gba
    #   B := G_{Oi} = Gaa + Gbb + i Gab - i Gba
    # from which BOTH off-diagonals follow:
    #   Gab = (S - i D)/2,  Gba = (S + i D)/2,
    #   S = A - Gaa - Gbb,  D = B - Gaa - Gbb.
    # The reference assumes Gab = Gba (real-symmetric impHloc) and keeps
    # only the combined (1-i) reconstruction (ED_GF_NORMAL.f90:580-632);
    # solving for both keeps complex hermitian Hloc exact (e.g. the tBLG
    # Wannier models, ed_tBLG_wannier_2bands.f90).
    Gm_i = np.zeros_like(Gm)
    Gr_i = np.zeros_like(Gr)
    if mask is not None:
        for ispin in range(cfg.nspin):
            for iorb in range(cfg.norb):
                for jorb in range(iorb + 1, cfg.norb):
                    if not mask[ispin, iorb, jorb]:
                        continue
                    if log:
                        log(f"Get G_l{iorb + 1}_m{jorb + 1}_s{ispin + 1}")
                    for sector, e_i, vec in state_iter(slist):
                        tgt = (ispin, ispin, iorb, jorb)
                        enqueue(sector, vec, e_i,
                                [(1.0, ispin, iorb, True),
                                 (1.0, ispin, jorb, True)], 1, tgt)
                        enqueue(sector, vec, e_i,
                                [(1.0, ispin, iorb, False),
                                 (1.0, ispin, jorb, False)], -1, tgt)
                        enqueue(sector, vec, e_i,
                                [(1.0, ispin, iorb, True),
                                 (1j, ispin, jorb, True)], 1,
                                tgt + ("i",))
                        enqueue(sector, vec, e_i,
                                [(1.0, ispin, iorb, False),
                                 (-1j, ispin, jorb, False)], -1,
                                tgt + ("i",))

    # --- pole accumulation + symmetry reconstruction, deferred until the
    # shared batch has run (ED_GF_NORMAL.f90:52-71, :580-632)
    def finalize(results):
        for meta, w, p in results:
            tgt = meta["target"]
            isign = meta["isign"]
            if len(tgt) == 5:                      # the Oi combo channel
                s1, s2, a, b, _ = tgt
                Gm_i[s1, s2, a, b] += accumulate_poles(zm, w, p, isign)
                Gr_i[s1, s2, a, b] += accumulate_poles(zr, w, p, isign)
            else:
                s1, s2, a, b = tgt
                Gm[s1, s2, a, b] += accumulate_poles(zm, w, p, isign)
                Gr[s1, s2, a, b] += accumulate_poles(zr, w, p, isign)
        if mask is not None:
            for ispin in range(cfg.nspin):
                for iorb in range(cfg.norb):
                    for jorb in range(iorb + 1, cfg.norb):
                        if not mask[ispin, iorb, jorb]:
                            continue
                        for G, Gi in ((Gm, Gm_i), (Gr, Gr_i)):
                            dd = (G[ispin, ispin, iorb, iorb]
                                  + G[ispin, ispin, jorb, jorb])
                            S = G[ispin, ispin, iorb, jorb] - dd
                            D = Gi[ispin, ispin, iorb, jorb] - dd
                            G[ispin, ispin, iorb, jorb] = \
                                0.5 * (S - 1j * D)
                            G[ispin, ispin, jorb, iorb] = \
                                0.5 * (S + 1j * D)
        return Gm, Gr

    return finalize


def _offdiag_mask(cfg: EDConfig, bath: Bath) -> np.ndarray:
    """Which (spin, iorb, jorb) off-diagonal components to compute:
    all for hybrid, replica gated by the bath mask (ED_GF_NORMAL.f90:38-42)."""
    m = np.ones((cfg.nspin, cfg.norb, cfg.norb), dtype=bool)
    if cfg.bath_type == "replica" and bath.mask is not None:
        for s in range(cfg.nspin):
            m[s] = bath.mask[s, s, :, :, 0] | bath.mask[s, s, :, :, 1]
    return m


def build_sigma_normal(cfg: EDConfig, bath: Bath, hloc: np.ndarray,
                       Gmats: np.ndarray, Greal: np.ndarray):
    """Σ = G0^{-1} - G^{-1}; scalar per (spin,orb) for bath normal,
    orbital-matrix Dyson for hybrid/replica (build_sigma_normal,
    ED_GF_NORMAL.f90:656-731). Also returns G0 on both axes."""
    p = bath_params(bath)
    zm, zr = jnp.asarray(grids.z_mats(cfg)), jnp.asarray(grids.z_real(cfg))
    ig0m = np.asarray(invg0(cfg, zm, p, hloc, "mats"))
    ig0r = np.asarray(invg0(cfg, zr, p, hloc, "real"))
    Sm = np.zeros_like(Gmats)
    Sr = np.zeros_like(Greal)
    if cfg.bath_type == "normal":
        for s in range(cfg.nspin):
            for a in range(cfg.norb):
                Sm[s, s, a, a] = ig0m[s, s, a, a] - 1.0 / Gmats[s, s, a, a]
                Sr[s, s, a, a] = ig0r[s, s, a, a] - 1.0 / Greal[s, s, a, a]
    else:
        for s in range(cfg.nspin):
            gm = jnp.asarray(Gmats[s, s].transpose(2, 0, 1))
            gr = jnp.asarray(Greal[s, s].transpose(2, 0, 1))
            igm = np.asarray(jnp.linalg.inv(gm)).transpose(1, 2, 0)
            igr = np.asarray(jnp.linalg.inv(gr)).transpose(1, 2, 0)
            Sm[s, s] = ig0m[s, s] - igm
            Sr[s, s] = ig0r[s, s] - igr
    g0m = np.asarray(g0and(cfg, zm, p, hloc, "mats"))
    g0r = np.asarray(g0and(cfg, zr, p, hloc, "real"))
    return Sm, Sr, g0m, g0r
