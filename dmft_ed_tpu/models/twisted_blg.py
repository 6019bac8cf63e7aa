"""Microscopic commensurate twisted bilayer graphene
(drivers/ed_twistedBLG.f90).

Geometry: the (m0, r) commensurate moiré cell of Sboychakov et al.,
PRB 92, 075402 (2015) — cos(theta) = (3 m0^2 + 3 m0 r + r^2/2) /
(3 m0^2 + 3 m0 r + r^2), Nlat = 4 (3 m0^2 + 3 m0 r + r^2) carbon sites
(two layers x two sublattices), layer 2 rotated by theta and displaced by
dz = 3.345 (alat/2.46) along z (ed_twistedBLG.f90:64,74-95).

Hoppings: the exponential-decay Slater-Koster transfer integral of Nam &
Koshino, PRB 96, 075311 (2017) —
    t(d) = Vpi(d) [1 - (d.ez/|d|)^2] + Vsi(d) (d.ez/|d|)^2,
    Vpi = Vpi0 exp(-(|d|-a0)/r0),  Vsi = Vsi0 exp(-(|d|-dz)/r0),
distance-cutoff over the 3x3 neighboring supercells
(ed_twistedBLG.f90:191-264). DMFT treats the Nlat sites as inequivalent
single-orbital impurities over the moiré-BZ k-sum Gloc, i.e. the
LatticeEDSolver geometry with the cross-site batched sweep.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

from ..config import EDConfig, read_input
from ..lattice_solver import LatticeEDSolver
from ..lattice import gloc_hk_lattice, self_consistency, ConvergenceMonitor


def twist_angle(m0: int, r: int):
    """(theta_radians, Nlat) of the (m0, r) commensurate cell
    (ed_twistedBLG.f90:64,74-75)."""
    den = 3 * m0 ** 2 + 3 * m0 * r + r ** 2
    cth = (3 * m0 ** 2 + 3 * m0 * r + r ** 2 / 2.0) / den
    return float(np.arccos(cth)), 4 * den


def _vectors(alat: float, m0: int, r: int):
    """Direct/rotated/superlattice/reciprocal vectors
    (ed_twistedBLG.f90:74-95)."""
    th, nlat = twist_angle(m0, r)
    a1 = alat * np.array([np.sqrt(3) / 2, -0.5])
    a2 = alat * np.array([np.sqrt(3) / 2, 0.5])
    c, s = np.cos(th), np.sin(th)
    a1z = a1 * (c - s / np.sqrt(3)) + a2 * (2 * s / np.sqrt(3))
    a2z = a2 * (c + s / np.sqrt(3)) - a1 * (2 * s / np.sqrt(3))
    disp = (a1 + a2) / 3.0
    disp2 = alat * np.array([c / np.sqrt(3), s / np.sqrt(3)])
    b1 = (2 * np.pi / alat) * np.array([1 / np.sqrt(3), -1.0])
    b2 = (2 * np.pi / alat) * np.array([1 / np.sqrt(3), 1.0])
    n = nlat // 4
    rr1 = m0 * a1 + (m0 + r) * a2
    rr2 = -(m0 + r) * a1 + (2 * m0 + r) * a2
    gg1 = ((2 * m0 + r) * b1 + (m0 + r) * b2) / n
    gg2 = (-(m0 + r) * b1 + m0 * b2) / n
    return dict(a1=a1, a2=a2, a1z=a1z, a2z=a2z, disp=disp, disp2=disp2,
                rr1=rr1, rr2=rr2, gg1=gg1, gg2=gg2, theta=th, nlat=nlat)


def build_unit_cell(alat: float = 2.46, m0: int = 1, r: int = 1):
    """[Nlat, 3] site positions of the moiré cell (build_uni_cell,
    ed_twistedBLG.f90:270-399): layer 1 at z=0 (sublattice B displaced by
    disp), layer 2 at z=dz on the rotated lattice (sublattice displaced by
    -disp2); a site belongs to the cell iff its (GG1, GG2) fractional
    coordinates lie in [0, 2 pi)."""
    v = _vectors(alat, m0, r)
    nlat = v["nlat"]
    dz = 3.345 * (alat / 2.46)
    eps = 1e-7
    sites = []
    rng_n = nlat
    ij = np.arange(-rng_n, rng_n + 1)
    for layer, (va, vb, dsp, sgn) in enumerate(
            [(v["a1"], v["a2"], v["disp"], 1.0),
             (v["a1z"], v["a2z"], v["disp2"], -1.0)]):
        for ab in (0, 1):
            # positions m*va + n*vb + sgn*ab*dsp, all (m, n)
            mm, nn = np.meshgrid(ij, ij, indexing="ij")
            pos = (mm[..., None] * va + nn[..., None] * vb
                   + sgn * ab * dsp)
            A = pos @ v["gg1"]
            B = pos @ v["gg2"]
            keep = ((A >= 0) & (A < 2 * np.pi - eps)
                    & (B >= 0) & (B < 2 * np.pi - eps))
            p = pos[keep]
            z = np.full((p.shape[0], 1), layer * dz)
            sites.append(np.concatenate([p, z], axis=1))
    ucell = np.concatenate(sites, axis=0)
    if ucell.shape[0] != nlat:
        raise RuntimeError(f"unit cell generation: got {ucell.shape[0]} "
                           f"sites, expected {nlat}")
    return ucell


def hk_twisted_blg(nk: int = 4, alat: float = 2.46, m0: int = 1, r: int = 1,
                   hopping_cutoff: float = np.sqrt(3.0), r0: float = 0.184,
                   vpi0: float = -2.7, vsi0: float = 0.48):
    """[Nlat, Nlat, nk^2] Bloch Hamiltonian over the moiré BZ
    (hk_twistedBLG_model, ed_twistedBLG.f90:191-264). hopping_cutoff and
    r0 in units of alat (rescaled internally as in the driver)."""
    v = _vectors(alat, m0, r)
    ucell = build_unit_cell(alat, m0, r)
    nlat = v["nlat"]
    dz = 3.345 * (alat / 2.46)
    a0 = alat / np.sqrt(3.0)
    r00 = r0 * alat
    cut = hopping_cutoff * alat
    # 3x3 supercell images
    cells = np.array([[ii, jj] for ii in (-1, 0, 1) for jj in (-1, 0, 1)])
    RR = cells[:, :1] * v["rr1"] + cells[:, 1:] * v["rr2"]   # [9, 2]
    RR3 = np.concatenate([RR, np.zeros((9, 1))], axis=1)
    # dist[c, i, j, :] = U_i - (U_j + R_c)
    dist = ucell[None, :, None, :] - (ucell[None, None, :, :]
                                      + RR3[:, None, None, :])
    dd = np.linalg.norm(dist, axis=-1)
    iu, ju = np.triu_indices(nlat, k=1)            # i < j pairs only
    d_ij = dist[:, iu, ju]                          # [9, npair, 3]
    dd_ij = dd[:, iu, ju]
    cosz2 = (d_ij[..., 2] / np.where(dd_ij > 0, dd_ij, 1.0)) ** 2
    vpi = vpi0 * np.exp(-(dd_ij - a0) / r00)
    vsi = vsi0 * np.exp(-(dd_ij - dz) / r00)
    t = np.where(dd_ij < cut, vpi * (1 - cosz2) + vsi * cosz2, 0.0)
    # k grid over the moiré BZ
    fr = np.linspace(0.0, 1.0, nk, endpoint=False)
    kpts = np.array([f1 * v["gg1"] + f2 * v["gg2"]
                     for f1 in fr for f2 in fr])   # [Nk, 2]
    # phase e^{-i k.dist + i k.R} (ed_twistedBLG.f90:250)
    kd = kpts @ d_ij[..., :2].reshape(-1, 2).T     # [Nk, 9*npair]
    kR = kpts @ RR.T                               # [Nk, 9]
    npair = iu.size
    phase = np.exp(-1j * kd.reshape(len(kpts), 9, npair)
                   + 1j * kR[:, :, None])
    upper = np.einsum("cp,kcp->kp", t, phase)      # [Nk, npair]
    hk = np.zeros((nlat, nlat, len(kpts)), dtype=complex)
    hk[iu, ju] = upper.T
    hk[ju, iu] = upper.conj().T
    return hk


@dataclass
class TwistedBLGResult:
    converged: bool
    iterations: int
    baths: np.ndarray
    smats_ineq: np.ndarray
    gmats_ineq: np.ndarray
    dens: np.ndarray
    docc: np.ndarray
    error: float


def run(cfg: EDConfig, m0: int = 1, r: int = 1, nk: int = 4,
        alat: float = 2.46, hopping_cutoff: float = np.sqrt(3.0),
        r0: float = 0.184, vpi0: float = -2.7, vsi0: float = 0.48,
        wmixing: float = 0.75, log=None) -> TwistedBLGResult:
    """Real-space DMFT over the Nlat moiré carbon sites
    (ed_twistedBLG.f90:118-180: per-site bath, shared k-sum Gloc)."""
    cfg = cfg.validate()
    assert cfg.norb == 1, "twistedBLG: Norb=1 (ed_twistedBLG.f90:66)"
    _log = log if log is not None else (print if cfg.ed_verbose > 0
                                        else lambda *a, **k: None)
    hk = hk_twisted_blg(nk, alat, m0, r, hopping_cutoff, r0, vpi0, vsi0)
    nlat = hk.shape[0]
    ns = cfg.nspin
    hloc_so = hk.mean(axis=-1)
    hloc_ineq = np.zeros((nlat, ns, ns, 1, 1))
    for i in range(nlat):
        for s in range(ns):
            hloc_ineq[i, s, s, 0, 0] = hloc_so[i, i].real
    if ns == 2:
        nkk = hk.shape[-1]
        hks = np.zeros((2 * nlat, 2 * nlat, nkk), dtype=complex)
        for i in range(nlat):
            for j in range(nlat):
                hks[2 * i, 2 * j] = hk[i, j]
                hks[2 * i + 1, 2 * j + 1] = hk[i, j]
        hk = hks
    lsolver = LatticeEDSolver(cfg, hloc_ineq, log=_log)
    baths = lsolver.init_solvers()
    baths_prev = baths.copy()
    monitor = ConvergenceMonitor(cfg.dmft_error, cfg.nsuccess, cfg.nloop)
    converged, iloop = False, 0
    gm_ineq = None
    while not converged and iloop < cfg.nloop:
        iloop += 1
        _log(f"--- twistedBLG DMFT loop {iloop}/{cfg.nloop} "
             f"({nlat} moiré sites) ---")
        lsolver.solve(baths)
        smats_ineq = lsolver.get_sigma_matsubara()
        gm_ineq = gloc_hk_lattice(cfg, hk, smats_ineq, "mats")
        weiss_ineq = np.stack([
            self_consistency(cfg, gm_ineq[i], smats_ineq[i], hloc_ineq[i])
            for i in range(nlat)])
        baths = lsolver.chi2_fitgf(weiss_ineq, baths, ispin=0)
        if iloop > 1:
            baths = wmixing * baths + (1 - wmixing) * baths_prev
        baths_prev = baths.copy()
        converged = monitor.check(weiss_ineq[0, 0, 0, 0, 0], log=_log)
    return TwistedBLGResult(converged=converged, iterations=iloop,
                            baths=baths,
                            smats_ineq=lsolver.get_sigma_matsubara(),
                            gmats_ineq=gm_ineq,
                            dens=lsolver.get_dens()[:, 0],
                            docc=lsolver.get_docc()[:, 0],
                            error=monitor.error)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv and "=" not in argv[0] else "inputGRAPHENE.conf"
    cfg = read_input(path, argv)
    kw = dict(m0=1, r=1, nk=4, alat=2.46, hopping_cutoff=np.sqrt(3.0),
              r0=0.184, vpi0=-2.7, vsi0=0.48, wmixing=0.75)
    keys = {"M0": ("m0", int), "R": ("r", int), "NK": ("nk", int),
            "ALAT": ("alat", float),
            "HOPPING_CUTOFF": ("hopping_cutoff", float),
            "R0": ("r0", float), "VPI0": ("vpi0", float),
            "VSI0": ("vsi0", float), "WMIXING": ("wmixing", float)}
    for tok in argv:
        k, _, vs = tok.partition("=")
        if k.upper() in keys:
            name, typ = keys[k.upper()]
            kw[name] = typ(vs)
    r = run(cfg, **kw)
    print(f"converged={r.converged} iters={r.iterations} "
          f"dens_mean={r.dens.mean():.6f}")
    return r


if __name__ == "__main__":
    main()
