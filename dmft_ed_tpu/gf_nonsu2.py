"""Green's functions with broken SU(2) (ed_mode = nonsu2).

Replaces ED_GF_NONSU2.f90: spin-diagonal components via c†/c, spin- and
orbital-off-diagonal components via (c†_{a,s} + c†_{b,s'}) and
(c†_{a,s} + i c†_{b,s'}) combinations with the (1+i) symmetry reconstruction
(:18-342; workers :343-902; replica components gated by the bath mask), and
the full (Nspin·Norb)² matrix Dyson equation (:977+).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import EDConfig
from .sectors import sector_table
from .bath import Bath
from .bath_fns import bath_params, invg0, g0and
from .eigenspace import StateList
from .excitations import apply_op_combo
from .gf_common import HamCache, accumulate_poles, state_iter
from . import grids


def _components(cfg: EDConfig, bath: Bath):
    """(s, s2, a, b) off-diagonal combos to compute, per bath topology."""
    out = []
    ns_, no = cfg.nspin, cfg.norb
    for s in range(ns_):
        for s2 in range(ns_):
            for a in range(no):
                for b in range(no):
                    if s == s2 and a == b:
                        continue
                    if cfg.bath_type == "normal":
                        ok = (s != s2) and (a == b)
                    elif cfg.bath_type == "hybrid":
                        ok = True
                    else:  # replica: gate by fit mask (ED_GF_NONSU2.f90:54)
                        m = bath.mask
                        ok = m is not None and (m[s, s2, a, b, 0]
                                                or m[s, s2, a, b, 1])
                    if ok:
                        out.append((s, s2, a, b))
    return out


def gf_nonsu2_plan(cfg: EDConfig, slist: StateList, bath: Bath,
                   batch, site: int = 0, log=None):
    """Enqueue every nonsu2 GF channel of one impurity into `batch`
    (tagged with `site`) and return finalize(results) -> (Gmats, Greal).
    The split lets LatticeEDSolver share ONE ResolventBatch across
    inequivalent SOC/isoc sites — the cross-site device batch replacing the
    reference's per-site serial build (ED_GF_NONSU2.f90:18-342 under the
    ED_MAIN.f90:576-678 round-robin loop)."""
    table = sector_table(cfg)
    zm, zr = grids.z_mats(cfg), grids.z_real(cfg)
    Gm = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, cfg.lmats),
                  dtype=complex)
    Gr = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, cfg.lreal),
                  dtype=complex)

    def enqueue(sector, vec, e_i, terms, isign, target, cnorm2=1.0):
        r = apply_op_combo(cfg, table, sector, vec, terms)
        if r is None:
            return
        jsec, vv = r
        batch.add(jsec, vv, e_i,
                  {"isign": isign, "target": target, "cnorm2": cnorm2,
                   "site": site}, site=site)

    # spin-diagonal, orbital-diagonal channels
    for s in range(cfg.nspin):
        for a in range(cfg.norb):
            if log:
                log(f"Get G_l{a + 1}{a + 1}_s{s + 1}{s + 1}")
            for sector, e_i, vec in state_iter(slist):
                enqueue(sector, vec, e_i, [(1.0, s, a, True)], 1,
                        (s, s, a, a))
                enqueue(sector, vec, e_i, [(1.0, s, a, False)], -1,
                        (s, s, a, a))

    comps = _components(cfg, bath)
    for (s, s2, a, b) in comps:
        if log:
            log(f"Get G_l{a + 1}{b + 1}_s{s + 1}{s2 + 1}")
        for sector, e_i, vec in state_iter(slist):
            tgt = (s, s2, a, b)
            enqueue(sector, vec, e_i,
                    [(1.0, s, a, True), (1.0, s2, b, True)], 1, tgt)
            enqueue(sector, vec, e_i,
                    [(1.0, s, a, False), (1.0, s2, b, False)], -1, tgt)
            enqueue(sector, vec, e_i,
                    [(1.0, s, a, True), (1j, s2, b, True)], 1, tgt, 1j)
            enqueue(sector, vec, e_i,
                    [(1.0, s, a, False), (-1j, s2, b, False)], -1, tgt, 1j)

    def finalize(results):
        for meta, w, p in results:
            s, s2, a, b = meta["target"]
            isign = meta["isign"]
            Gm[s, s2, a, b] += accumulate_poles(zm, w, p, isign)
            Gr[s, s2, a, b] += accumulate_poles(zr, w, p, isign)
        # (1+i) symmetry reconstruction for the off-diagonal components
        for (s, s2, a, b) in comps:
            for G in (Gm, Gr):
                G[s, s2, a, b] = 0.5 * (G[s, s2, a, b]
                                        - (1 + 1j) * G[s, s, a, a]
                                        - (1 + 1j) * G[s2, s2, b, b])
        return Gm, Gr

    return finalize


def build_gf_nonsu2(cfg: EDConfig, slist: StateList, zeta: float,
                    bath: Bath, hloc: np.ndarray, finite_t: bool, log=None,
                    mesh=None):
    from .gf_common import ResolventBatch
    cache = HamCache(cfg, bath, hloc, mesh)
    batch = ResolventBatch(cfg, cache, slist.emin, zeta, finite_t)
    finalize = gf_nonsu2_plan(cfg, slist, bath, batch, site=0, log=log)
    return finalize(list(batch.run()))


def build_sigma_nonsu2(cfg: EDConfig, bath: Bath, hloc: np.ndarray, Gm, Gr):
    """Full (Nspin·Norb)^2 matrix Dyson (build_sigma_nonsu2)."""
    p = bath_params(bath)
    zm = jnp.asarray(grids.z_mats(cfg))
    zr = jnp.asarray(grids.z_real(cfg))
    ig0m = np.asarray(invg0(cfg, zm, p, hloc, "mats"))
    ig0r = np.asarray(invg0(cfg, zr, p, hloc, "real"))
    nso = cfg.nspin * cfg.norb
    Sm = np.zeros_like(Gm)
    Sr = np.zeros_like(Gr)
    for (S, G, ig0, L) in ((Sm, Gm, ig0m, cfg.lmats), (Sr, Gr, ig0r,
                                                       cfg.lreal)):
        g = G.transpose(4, 0, 2, 1, 3).reshape(L, nso, nso)
        ig = np.linalg.inv(g)
        i0 = ig0.transpose(4, 0, 2, 1, 3).reshape(L, nso, nso)
        s = (i0 - ig).reshape(L, cfg.nspin, cfg.norb, cfg.nspin, cfg.norb)
        S[...] = s.transpose(1, 3, 2, 4, 0)
    g0m = np.asarray(g0and(cfg, zm, p, hloc, "mats"))
    g0r = np.asarray(g0and(cfg, zr, p, hloc, "real"))
    return Sm, Sr, g0m, g0r
