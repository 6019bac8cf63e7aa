"""IO parity tail + mu-search + SOC-operator getters (round 2).

Covers: nonsu2 spin-offdiagonal file print/read round trip
(ED_IO/print_impSigma.f90:120-215, read_impSigma.f90:117-216), the
adaptive-threshold bisection search_chemical_potential
(ED_AUX_FUNX.f90:567-672), and ed_get_quantum_SOC_operators
(ED_IO/get_imp_SOC_op.f90).
"""

import os

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu import io as edio
from dmft_ed_tpu.aux import (search_chemical_potential, atomic_j,
                             atomic_soc_rotation, atomic_soc, nn2so,
                             quantum_soc_operators)


def test_nonsu2_spin_offdiag_roundtrip(tmp_path):
    cfg = EDConfig(norb=2, nbath=2, nspin=2, ed_mode="nonsu2",
                   bath_type="hybrid", lmats=32, lreal=24).validate()
    rng = np.random.default_rng(7)
    fm = np.zeros((2, 2, 2, 2, cfg.lmats), dtype=complex)
    fr = np.zeros((2, 2, 2, 2, cfg.lreal), dtype=complex)
    for s1 in range(2):
        for s2 in range(s1, 2):
            for a in range(2):
                for b in range(a, 2):
                    vm = rng.normal(size=cfg.lmats) \
                        + 1j * rng.normal(size=cfg.lmats)
                    vr = rng.normal(size=cfg.lreal) \
                        + 1j * rng.normal(size=cfg.lreal)
                    fm[s1, s2, a, b] = fm[s1, s2, b, a] = vm
                    fr[s1, s2, a, b] = fr[s1, s2, b, a] = vr
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        edio.print_function(cfg, "Sigma", fm, fr, spin_offdiag=True)
        # reference tag convention: always two spin digits for nonsu2
        assert os.path.exists("impSigma_l11_s12_iw.ed")
        assert os.path.exists("impSigma_l12_s22_realw.ed")
        rm, rr = edio.read_function(cfg, "Sigma", spin_offdiag=True)
    finally:
        os.chdir(cwd)
    for s1 in range(2):
        for s2 in range(s1, 2):
            np.testing.assert_allclose(rm[s1, s2], fm[s1, s2], atol=1e-12)
            np.testing.assert_allclose(rr[s1, s2], fr[s1, s2], atol=1e-12)


def test_search_chemical_potential_converges(tmp_path):
    """The bisection walk must drive a monotone n(mu) to nread within the
    final threshold (and tighten the threshold on the way)."""
    cfg = EDConfig(norb=1, nbath=2, nread=0.7, nerr=1e-5,
                   ndelta=0.25).validate()
    dens = lambda mu: 1.0 / (1.0 + np.exp(-2.0 * mu))   # smooth monotone
    mu, state = -1.0, {}
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        converged = False
        for it in range(200):
            n = dens(mu)
            # outer DMFT reports converged every iteration (pure mu search)
            mu, converged = search_chemical_potential(
                cfg, mu, n, True, state)
            if converged:
                break
        assert converged
        assert abs(dens(mu) - cfg.nread) < 1e-4
        assert state["nth"] < 1e-2          # threshold was tightened
        assert os.path.exists("search_mu_iteration.ed")
    finally:
        os.chdir(cwd)


def test_atomic_soc_rotation_diagonalizes_j():
    """R must bring Jz and J^2 to diagonal form with the documented
    (j, jz) column order (atomic_SOC_rotation, ED_AUX_FUNX.f90:942-981)."""
    R = atomic_soc_rotation()
    np.testing.assert_allclose(R.conj().T @ R, np.eye(6), atol=1e-12)
    Jz = atomic_j("z")
    J2 = sum(atomic_j(c) @ atomic_j(c) for c in "xyz")
    Jz_rot = R.conj().T @ Jz @ R
    J2_rot = R.conj().T @ J2 @ R
    np.testing.assert_allclose(
        Jz_rot, np.diag([-0.5, 0.5, -1.5, 1.5, -0.5, 0.5]), atol=1e-12)
    np.testing.assert_allclose(
        J2_rot, np.diag([0.75, 0.75, 3.75, 3.75, 3.75, 3.75]), atol=1e-12)
    # L.S = (J^2 - L^2 - S^2)/2 must be -1/2 on j=1/2, +1/2 ... check via
    # the atomic_soc matrix being diagonal in the J basis
    LS = nn2so(atomic_soc(), 2, 3)
    LS_rot = R.conj().T @ LS @ R
    np.testing.assert_allclose(LS_rot, np.diag(np.diag(LS_rot)), atol=1e-12)


def test_quantum_soc_operators_pure_j_state():
    """rho = |j=3/2, jz=+3/2><...| given in the {J,jz} solver basis
    (bath_type normal branch) must report <Jz>=3/2, Sum<J^2>=15/4."""
    cfg = EDConfig(norb=3, nbath=1, nspin=2, ed_mode="nonsu2").validate()
    rho = np.zeros((6, 6), dtype=complex)
    rho[3, 3] = 1.0                          # column order: (3/2,+3/2) is 4th
    ops = quantum_soc_operators(cfg, rho)
    np.testing.assert_allclose(ops["J"][2].real, 1.5, atol=1e-12)
    np.testing.assert_allclose(np.sum(ops["Jsq"]).real, 3.75, atol=1e-12)
    # t2g effective-moment convention (atomic_SOC, ED_AUX_FUNX.f90:926):
    # the j=3/2 quadruplet carries <L.S> = -1/2 (j=1/2 doublet: +1)
    np.testing.assert_allclose(ops["LS"].real, -0.5, atol=1e-12)
    # trace identities: Tr S_z rho = <Sz>
    np.testing.assert_allclose(np.trace(ops["S"][2]).real,
                               np.real(np.trace(
                                   rho @ (atomic_soc_rotation().conj().T
                                          @ np.kron(np.diag([.5, -.5]),
                                                    np.eye(3))
                                          @ atomic_soc_rotation()))),
                               atol=1e-12)
