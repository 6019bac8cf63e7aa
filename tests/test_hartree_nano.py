"""Hartree nano solver (hartree_nano.f90 parity): self-consistent static
mean field via exact eigendecomposition."""

import numpy as np

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.models.hartree_nano import run
from dmft_ed_tpu.models.nano import square_flake_hij


def _spinful(h1):
    return np.kron(h1, np.eye(2))


def test_hartree_u0_half_filling(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nspin=2, nbath=1, uloc=(0.0,), beta=100.0,
                   nloop=50, dmft_error=1e-10, ed_verbose=0).validate()
    h1, l2i = square_flake_hij(3, 3)
    r = run(cfg, _spinful(h1), l2i, log=lambda m: None)
    assert r.converged
    # ph-symmetric flake at U=0: exactly half filled, no moment
    np.testing.assert_allclose(r.dens.sum(axis=1), 1.0, atol=1e-9)
    np.testing.assert_allclose(r.mag, 0.0, atol=1e-12)


def test_hartree_dimer_afm_exact(tmp_path, monkeypatch):
    """Hubbard dimer Hartree AFM: the staggered moment solves
    m = (U m / 2) / sqrt((U m / 2)^2 + t^2) — for U=4, t=1 this gives
    m = sqrt(3)/2 (textbook mean-field; same fixed point as
    hartree_nano.f90's Matsubara loop)."""
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nspin=2, nbath=1, uloc=(4.0,), beta=400.0,
                   nloop=400, dmft_error=1e-12, ed_verbose=0).validate()
    h1 = np.array([[0.0, -1.0], [-1.0, 0.0]])
    r = run(cfg, _spinful(h1), np.arange(2), wmixing=0.7,
            seed_mag=[0.5, -0.5], log=lambda m: None)
    assert r.converged
    m = np.sqrt(3) / 2
    np.testing.assert_allclose(np.abs(r.mag), [m, m], atol=1e-6)
    assert r.mag[0] * r.mag[1] < 0                   # staggered
    np.testing.assert_allclose(r.dens.sum(axis=1), 1.0, atol=1e-9)
    # Hartree double occupancy = n_up * n_dw
    np.testing.assert_allclose(r.docc, r.dens[:, 0] * r.dens[:, 1],
                               atol=1e-14)


def test_hartree_flake_neel(tmp_path, monkeypatch):
    """4x4 flake at strong U: staggered Néel mean-field state; observables
    files written per inequivalent site."""
    monkeypatch.chdir(tmp_path)
    import os
    cfg = EDConfig(norb=1, nspin=2, nbath=1, uloc=(6.0,), beta=100.0,
                   nloop=300, dmft_error=1e-9, ed_verbose=0).validate()
    h1, _ = square_flake_hij(4, 4)
    nlat = 16
    seed = np.array([0.4 * (-1) ** ((i % 4) + (i // 4))
                     for i in range(nlat)])
    r = run(cfg, _spinful(h1), np.arange(nlat), wmixing=0.5,
            seed_mag=seed, log=lambda m: None)
    assert r.converged
    signs = np.array([(-1) ** ((i % 4) + (i // 4)) for i in range(nlat)])
    assert np.all(r.mag * signs > 0.5)      # robust Néel pattern
    np.testing.assert_allclose(r.dens.sum(), nlat, atol=1e-8)
    assert os.path.exists("observables_last_site0001.hartree")
