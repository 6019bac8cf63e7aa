"""Topological diagnostics (solve_hk_topological, ed_bhz_2d.f90:246-281;
local Chern marker, chern_marker3_NF.f90): FHS Chern numbers and the
Bianco-Resta real-space marker against exactly known phases."""

import numpy as np

from dmft_ed_tpu.topology import (chern_number, topological_hamiltonian,
                                  local_chern_marker, qwz_flake)
from dmft_ed_tpu.models.kspace import hk_haldane
from dmft_ed_tpu.models.bhz_2d import build_hk_grid


def test_chern_haldane_phases():
    hk = hk_haldane(20, 1.0, 0.2, np.pi / 2, 0.0)
    assert abs(chern_number(hk, 20, 1) - 1.0) < 1e-10
    hk = hk_haldane(20, 1.0, 0.2, -np.pi / 2, 0.0)
    assert abs(chern_number(hk, 20, 1) + 1.0) < 1e-10
    # Semenoff mass beyond 3√3 t2: trivial
    hk = hk_haldane(20, 1.0, 0.2, np.pi / 2, 2.0)
    assert abs(chern_number(hk, 20, 1)) < 1e-10


def test_bhz_spin_chern():
    hk, _ = build_hk_grid(20, mh=1.0, llambda=0.3)
    assert abs(chern_number(hk[:2, :2], 20, 1) - 1.0) < 1e-10
    assert abs(chern_number(hk[2:, 2:], 20, 1) + 1.0) < 1e-10
    hk, _ = build_hk_grid(20, mh=3.0, llambda=0.3)
    assert abs(chern_number(hk[:2, :2], 20, 1)) < 1e-10


def test_topological_hamiltonian_mass_renormalization():
    """A σz-like ReΣ(0) shifts the effective mass: pushing BHZ across the
    transition flips the invariant (the solve_hk_topological use-case)."""
    hk, _ = build_hk_grid(20, mh=1.5, llambda=0.3)
    sig = np.zeros((4, 4))
    sig[0, 0] = sig[2, 2] = 1.0   # orbital-1 shift: mh_eff = 2.0 + ...
    sig[1, 1] = sig[3, 3] = -1.0
    hkt = topological_hamiltonian(hk, sig)
    assert abs(chern_number(hk[:2, :2], 20, 1) - 1.0) < 1e-10
    assert abs(chern_number(hkt[:2, :2], 20, 1)) < 1e-10


def test_local_chern_marker_qwz():
    H, pos = qwz_flake(12, 12, m=1.0)
    c = local_chern_marker(H, pos, nso=2)
    interior = c.reshape(12, 12)[4:8, 4:8]
    np.testing.assert_allclose(interior, 1.0, atol=5e-3)
    # marker integrates to ~0 over the full open flake (boundary cancels)
    assert abs(c.sum()) < 1e-8
    H, pos = qwz_flake(12, 12, m=3.0)
    c = local_chern_marker(H, pos, nso=2)
    np.testing.assert_allclose(c.reshape(12, 12)[4:8, 4:8], 0.0, atol=5e-3)


def test_local_chern_marker_with_sigma():
    """Interacting marker: a mass-like ReΣ(0) drives the QWZ flake across
    the transition (chern_marker3_NF.f90 get_local_chern contract)."""
    H, pos = qwz_flake(10, 10, m=1.0)
    sz = np.diag([1.0, -1.0])
    sigma0 = np.broadcast_to(2.0 * sz, (100, 2, 2))
    c = local_chern_marker(H, pos, nso=2, sigma0=sigma0)
    np.testing.assert_allclose(c.reshape(10, 10)[4:6, 4:6], 0.0, atol=5e-3)
