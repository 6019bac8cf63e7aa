"""Static observables and local energy.

Replaces ED_OBSERVABLES.f90: thermal averages over the kept states of
densities, double occupancy, magnetizations, Sz/charge correlations, SC and
excitonic order parameters (:48-515), impurity/bath density matrices
(:519-658), quasiparticle weight/scattering rate (:990-1006) and
<Hint>/<Hloc>/Hartree energies (:726-989).

The per-configuration loops of the reference become weighted einsums over
block probability matrices P_b = |V_b|^2 — occupation expectations are
matrix-vector products against the per-spin occupation tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from . import fock
from .config import EDConfig
from .sectors import sector_table
from .bath import Bath
from .eigenspace import StateList
from .excitations import apply_spin_op, apply_op_combo
from .hamiltonian import np_unflatten_blocks, single_particle_parts
from .gf_common import state_iter


@dataclass
class Observables:
    dens: np.ndarray = None
    dens_up: np.ndarray = None
    dens_dw: np.ndarray = None
    docc: np.ndarray = None
    magz: np.ndarray = None
    magx: np.ndarray = None
    magy: np.ndarray = None
    sz2: np.ndarray = None
    n2: np.ndarray = None
    s2tot: float = 0.0
    phisc: np.ndarray = None
    exct_s0: np.ndarray = None
    exct_tz: np.ndarray = None
    exct_tx: np.ndarray = None
    exct_ty: np.ndarray = None
    imp_density_matrix: np.ndarray = None


@dataclass
class EnergyObs:
    eknot: float = 0.0
    epot: float = 0.0       # <Hint> including Hartree (reference convention)
    ehartree: float = 0.0
    dust: float = 0.0
    dund: float = 0.0
    dse: float = 0.0
    dph: float = 0.0


def _state_weights(slist: StateList, beta: float, zeta: float,
                   finite_t: bool):
    egs = slist.emin
    for sec, e, v in state_iter(slist):
        peso = np.exp(-beta * (e - egs)) if finite_t else 1.0
        yield sec, v, peso / zeta


def compute_observables(cfg: EDConfig, slist: StateList, zeta: float,
                        bath: Bath, hloc: np.ndarray,
                        finite_t: bool) -> Observables:
    ns, norb = cfg.ns, cfg.norb
    table = sector_table(cfg)
    o = Observables(
        dens=np.zeros(norb), dens_up=np.zeros(norb), dens_dw=np.zeros(norb),
        docc=np.zeros(norb), magz=np.zeros(norb), magx=np.zeros(norb),
        magy=np.zeros(norb), sz2=np.zeros((norb, norb)),
        n2=np.zeros((norb, norb)), phisc=np.zeros(norb),
        exct_s0=np.zeros((norb, norb)), exct_tz=np.zeros((norb, norb)),
        exct_tx=np.zeros((norb, norb)), exct_ty=np.zeros((norb, norb)))
    rho = np.zeros((cfg.nspin * norb, cfg.nspin * norb), dtype=complex)

    for sec, vec, w in _state_weights(slist, cfg.beta, zeta, finite_t):
        Vb = np_unflatten_blocks(vec, sec)
        for bi, (blk, V) in enumerate(zip(sec.blocks, Vb)):
            P = np.abs(V) ** 2                       # [ddw, dup]
            pu = P.sum(axis=0)                        # up-config marginal
            pd = P.sum(axis=1)
            ou = fock.occupations(ns, blk.nup)
            od = fock.occupations(ns, blk.ndw)
            if sec.subsel is not None:
                ou = ou[sec.up_sel(bi)]
                od = od[sec.dw_sel(bi)]
            ou = ou[:, :norb]                         # [dup, norb]
            od = od[:, :norb]
            nu = pu @ ou                              # <n_up,a> within block
            nd = pd @ od
            o.dens_up += w * nu
            o.dens_dw += w * nd
            o.dens += w * (nu + nd)
            o.magz += w * (nu - nd)
            # cross expectations <x_up,a y_dw,b> = ou^T P^T od ordering
            X = (od.T @ P @ ou)                       # [norb(dw), norb(up)]
            o.docc += w * np.diag(X)
            # sz2/n2: combine same-spin and opposite-spin two-body averages
            UU = ou.T @ np.diag(pu) @ ou              # <n_up,a n_up,b>
            DD = od.T @ np.diag(pd) @ od
            UD = X.T                                  # <n_up,a n_dw,b>
            DU = X
            o.n2 += w * (UU + DD + UD + DU)
            o.sz2 += w * 0.25 * (UU + DD - UD - DU)
            sz_cfg = 0.5 * (ou.sum(1)[None, :] - od.sum(1)[:, None])
            o.s2tot += w * float(np.sum(P * sz_cfg ** 2))

    # SC order parameter (superc): phi = 0.5*(<(c_up+c†_dw)(c†_up+c_dw)> -
    # n_up - (1 - n_dw)) (ED_OBSERVABLES.f90:165-230)
    if cfg.ed_mode == "superc":
        for a in range(norb):
            acc = 0.0
            for sec, vec, w in _state_weights(slist, cfg.beta, zeta, finite_t):
                r = apply_op_combo(cfg, table, sec, vec,
                                   [(1.0, 0, a, True), (1.0, 1, a, False)])
                if r is None:
                    continue
                _, vv = r
                acc += w * float(np.real(np.vdot(vv, vv)))
            o.phisc[a] = 0.5 * (acc - o.dens_up[a] - (1.0 - o.dens_dw[a]))

    # nonsu2: in-plane magnetization and excitonic order parameters via
    # direct matrix elements M[s,s',a,b] = <c†_{a,s} c_{b,s'}> (these
    # conserve N so they are same-sector expectations)
    Mfull = _transfer_matrix(cfg, table, slist, zeta, finite_t)
    if cfg.ed_mode == "nonsu2":
        M = Mfull
        for a in range(norb):
            o.magx[a] = 0.5 * np.real(M[0, 1, a, a] + M[1, 0, a, a])
            o.magy[a] = 0.5 * np.real(-1j * (M[0, 1, a, a] - M[1, 0, a, a]))
        for a in range(norb):
            for b in range(norb):
                o.exct_s0[a, b] = np.real(M[0, 0, a, b] + M[1, 1, a, b])
                o.exct_tz[a, b] = np.real(M[0, 0, a, b] - M[1, 1, a, b])
                o.exct_tx[a, b] = np.real(M[0, 1, a, b] + M[1, 0, a, b])
                o.exct_ty[a, b] = np.real(-1j * (M[0, 1, a, b] - M[1, 0, a, b]))

    # impurity single-particle density matrix <c†_{a,s} c_{b,s'}>
    nso = cfg.nspin * norb
    o.imp_density_matrix = Mfull.transpose(0, 2, 1, 3).reshape(nso, nso)
    return o


def _transfer_matrix(cfg: EDConfig, table, slist, zeta, finite_t,
                     levels=None):
    """M[s,s',a,b] = Σ_states w <ψ| c†_{level_a,s} c_{level_b,s'} |ψ>
    (impurity orbitals by default; arbitrary levels for bath density
    matrices). Spin off-diagonals only meaningful in nonsu2."""
    if levels is None:
        levels = list(range(cfg.norb))
    nl = len(levels)
    M = np.zeros((cfg.nspin, cfg.nspin, nl, nl), dtype=complex)
    for sec, vec, w in _state_weights(slist, cfg.beta, zeta, finite_t):
        # apply each annihilator ONCE per (spin, level) — O(Nspin*nl)
        # sector applies instead of O((Nspin*nl)^2) — then batch the
        # pairwise overlaps per target sector as one Gram matmul
        # (ED_OBSERVABLES.f90:519-658 computes the same matrix elements
        # with per-pair Fock loops).
        applied = {}
        for s in range(cfg.nspin):
            for ia, la in enumerate(levels):
                r = apply_spin_op(cfg, table, sec, vec, s, la, False)
                if r is not None:
                    applied[(s, ia)] = r
        by_target: dict = {}
        for (s, ia), (j, wv) in applied.items():
            by_target.setdefault(j.index, []).append((s, ia, wv))
        for ents in by_target.values():
            Wm = np.stack([np.asarray(wv).ravel() for _, _, wv in ents])
            G = Wm.conj() @ Wm.T                    # [k, k] Gram matrix
            for p, (s, ia, _) in enumerate(ents):
                for q, (s2, ib, _) in enumerate(ents):
                    if s != s2 and cfg.ed_mode != "nonsu2":
                        continue
                    M[s, s2, ia, ib] += w * G[p, q]
    return M


def bath_density_matrix(cfg: EDConfig, slist: StateList, zeta: float,
                        finite_t: bool) -> np.ndarray:
    """Replica-bath density matrix <c†_{bath(a,k),s} c_{bath(b,k),s'}>
    [Nspin, Nspin, Norb, Norb, Nbath] (ED_OBSERVABLES.f90:591-658)."""
    from .sectors import bath_stride
    table = sector_table(cfg)
    out = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, cfg.nbath),
                   dtype=complex)
    for k in range(cfg.nbath):
        levels = [bath_stride(cfg, a, k) for a in range(cfg.norb)]
        out[..., k] = _transfer_matrix(cfg, table, slist, zeta, finite_t,
                                       levels)
    return out


def local_energy(cfg: EDConfig, slist: StateList, zeta: float, bath: Bath,
                 hloc: np.ndarray, finite_t: bool) -> EnergyObs:
    ns, norb = cfg.ns, cfg.norb
    table = sector_table(cfg)
    uloc = np.asarray(cfg.uloc_arr[:norb])
    ust, jh, jx, jp = cfg.ust, cfg.jh, cfg.jx, cfg.jp
    E = EnergyObs()

    for sec, vec, w in _state_weights(slist, cfg.beta, zeta, finite_t):
        Vb = np_unflatten_blocks(vec, sec)
        # --- diagonal pieces
        for bi, (blk, V) in enumerate(zip(sec.blocks, Vb)):
            P = np.abs(V) ** 2
            pu, pd = P.sum(0), P.sum(1)
            ou = fock.occupations(ns, blk.nup)
            od = fock.occupations(ns, blk.ndw)
            if sec.subsel is not None:
                ou = ou[sec.up_sel(bi)]
                od = od[sec.dw_sel(bi)]
            ou = ou[:, :norb]
            od = od[:, :norb]
            nu, nd = pu @ ou, pd @ od
            eup = np.real(np.diag(hloc[0, 0]))
            edw = np.real(np.diag(hloc[cfg.nspin - 1, cfg.nspin - 1]))
            E.eknot += w * float(eup @ nu + edw @ nd)
            X = od.T @ P @ ou                        # <n_dw,a n_up,b>
            E.epot += w * float(uloc @ np.diag(X))
            if norb > 1:
                UU = ou.T @ np.diag(pu) @ ou
                DD = od.T @ np.diag(pd) @ od
                iu = np.triu_indices(norb, 1)
                dust = float((X.T[iu] + X[iu]).sum())
                dund = float((UU[iu] + DD[iu]).sum())
                E.epot += w * (ust * dust + (ust - jh) * dund)
                E.dust += w * dust
                E.dund += w * dund
            if cfg.hfmode:
                eh = -0.5 * float(uloc @ (nu + nd)) + 0.25 * uloc.sum()
                if norb > 1:
                    npair = norb * (norb - 1) // 2
                    eh += -0.5 * (2 * ust - jh) * float((nu + nd).sum()) \
                        * (norb - 1) / 1.0 + 0.25 * (2 * ust - jh) * npair
                E.ehartree += w * eh
        # --- off-diagonal impurity Hloc (hybridization terms I+II)
        hloc_probe = np.array(hloc, dtype=complex)
        for a in range(norb):
            hloc_probe[..., a, a] = 0.0  # diagonal handled above
        E.eknot += w * _expect_quadratic_imp(cfg, table, sec, vec, hloc_probe)
        # --- spin-exchange / pair-hopping expectations
        if norb > 1 and (jx != 0.0 or jp != 0.0) and sec.subsel is None:
            dse, dph = _expect_exchange(cfg, sec, Vb, norb)
            E.epot += w * (jx * dse + jp * dph)
            E.dse += w * dse
            E.dph += w * dph

    E.epot += E.ehartree
    return E


def _expect_quadratic_imp(cfg, table, sec, vec, hloc_probe) -> float:
    """<Σ_{ss',ab} hloc[s,s',a,b] c†_{a,s} c_{b,s'}> for off-diagonal hloc."""
    if not np.any(hloc_probe):
        return 0.0
    acc = 0.0
    # loop over PHYSICAL spins (both up and dw even for Nspin=1, which maps
    # them onto the same hloc block — cf. Himp.f90 using impHloc(1,1) for up
    # and impHloc(Nspin,Nspin) for dw)
    for s in range(2):
        for s2 in range(2):
            if s != s2 and cfg.ed_mode != "nonsu2":
                continue
            blockh = hloc_probe[min(s, cfg.nspin - 1), min(s2, cfg.nspin - 1)]
            for a in range(cfg.norb):
                for b in range(cfg.norb):
                    if blockh[a, b] == 0:
                        continue
                    rb = apply_spin_op(cfg, table, sec, vec, s2, b, False)
                    if rb is None:
                        continue
                    jb, wb = rb
                    ra = apply_spin_op(cfg, table, sec, vec, s, a, False)
                    if ra is None or ra[0].index != jb.index:
                        continue
                    acc += np.real(blockh[a, b] * np.vdot(ra[1], wb))
    return float(acc)


def _expect_exchange(cfg, sec, Vb, norb):
    """(Dse, Dph): spin-exchange and pair-hopping two-body expectations via
    the kron-factorized operators (same algebra as hamiltonian.build mix)."""
    ns = cfg.ns
    dse = dph = 0.0
    for blk, V in zip(sec.blocks, Vb):
        for a in range(norb):
            for b in range(norb):
                if a == b:
                    continue
                upr = fock.hop_op(ns, blk.nup, a, b)
                dwr_se = fock.hop_op(ns, blk.ndw, b, a)
                if upr[0].size and dwr_se[0].size:
                    W = _kron_apply(V, upr, dwr_se, blk)
                    dse += float(np.real(np.vdot(V, W)))
                dwr_ph = fock.hop_op(ns, blk.ndw, a, b)
                if upr[0].size and dwr_ph[0].size:
                    W = _kron_apply(V, upr, dwr_ph, blk)
                    dph += float(np.real(np.vdot(V, W)))
    return dse, dph


def _kron_apply(V, up, dw, blk):
    ru, cu, su = up
    rd, cd, sd = dw
    W1 = np.zeros_like(V)
    np.add.at(W1, (slice(None), ru), su[None, :] * V[:, cu])
    W2 = np.zeros_like(V)
    np.add.at(W2, (rd, slice(None)), sd[:, None] * W1[cd, :])
    return W2


def quasiparticle_weight(cfg: EDConfig, smats: np.ndarray):
    """(simp, zimp) [Norb, Nspin] from Σ(iω1), Σ(iω2) (get_szr)."""
    wm1 = np.pi / cfg.beta
    wm2 = 3 * np.pi / cfg.beta
    simp = np.zeros((cfg.norb, cfg.nspin))
    zimp = np.zeros((cfg.norb, cfg.nspin))
    for s in range(cfg.nspin):
        for a in range(cfg.norb):
            s1 = smats[s, s, a, a, 0].imag
            s2 = smats[s, s, a, a, 1].imag
            simp[a, s] = s1 - wm1 * (s2 - s1) / (wm2 - wm1)
            zimp[a, s] = 1.0 / (1.0 + abs(s1 / wm1))
    return simp, zimp
