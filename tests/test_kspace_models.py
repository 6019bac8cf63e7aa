"""Bloch-Hamiltonian builders and the generic k-space DMFT loop."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.models import kspace


def test_hk_square_band():
    hk = kspace.hk_square(nk=32, t=0.25)
    ev = np.sort(hk[0, 0].real)
    assert abs(ev.min() + 1.0) < 1e-9      # -4t
    assert abs(ev.max() - 1.0) < 0.02
    assert abs(ev.mean()) < 1e-12


def test_hk_graphene_dirac():
    hk = kspace.hk_graphene(nk=48, t=1.0)
    evs = np.linalg.eigvalsh(hk.transpose(2, 0, 1))
    # particle-hole symmetric, gapless (Dirac points on the grid or near)
    assert abs(evs.mean()) < 1e-12
    assert evs.max() < 3.0 + 1e-9
    assert np.min(np.abs(evs)) < 0.1
    # Semenoff mass opens a gap
    hk_m = kspace.hk_graphene(nk=48, t=1.0, mass=0.3)
    evs_m = np.linalg.eigvalsh(hk_m.transpose(2, 0, 1))
    assert np.min(np.abs(evs_m)) > 0.29


def test_hk_haldane_gap():
    hk = kspace.hk_haldane(nk=48, t1=1.0, t2=0.1)
    evs = np.linalg.eigvalsh(hk.transpose(2, 0, 1))
    # gap at the Dirac points: 2*sqrt(3)*t2*sin(phi) in the reference's
    # convention (hz = -2 t2 sin(phi) sum_i sin(k.a_i), ed_haldane.f90:184)
    gap = np.min(evs[:, 1] - evs[:, 0])
    expect = 2 * np.sqrt(3) * 0.1
    assert 0.9 * expect < gap < 1.3 * expect


def test_hk_kane_mele_spin_blocks():
    hk = kspace.hk_kane_mele(nk=12, t=1.0, soc=0.1)
    # time-reversal: down block is the conjugate of the up block at -k;
    # spectra of the two blocks coincide
    e_up = np.sort(np.linalg.eigvalsh(hk[:2, :2].transpose(2, 0, 1)).ravel())
    e_dw = np.sort(np.linalg.eigvalsh(hk[2:, 2:].transpose(2, 0, 1)).ravel())
    np.testing.assert_allclose(e_up, e_dw, atol=1e-10)


@pytest.mark.slow
def test_graphene_dmft_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=2, nspin=1, nbath=2, uloc=(1.5, 1.5),
                   bath_type="hybrid", beta=60.0, lmats=120, lreal=30,
                   lfit=120, nloop=8, dmft_error=1e-3, ed_verbose=0,
                   lanc_dim_threshold=1024).validate()
    hk = kspace.hk_graphene(nk=8, t=1.0)
    r = kspace.run_kspace(cfg, hk, wmixing=0.5, log=lambda m: None)
    assert np.all(np.isfinite(r.dens))
    # half filling by sublattice symmetry
    np.testing.assert_allclose(r.dens.sum(), 2.0, atol=0.15)  # coarse 8x8 k-grid


def test_hk_wsm_weyl_nodes():
    hk = kspace.hk_wsm_3d(nk=24, t=1.0, mh=2.0, lam=1.0)
    evs = np.linalg.eigvalsh(hk.transpose(2, 0, 1))
    # gapless Weyl nodes exist for |mh| < 3t
    assert np.min(evs[:, 1] - evs[:, 0]) < 0.15
    # trivial insulator when mh > 3t
    hk_t = kspace.hk_wsm_3d(nk=12, t=1.0, mh=4.0, lam=1.0)
    evs_t = np.linalg.eigvalsh(hk_t.transpose(2, 0, 1))
    assert np.min(evs_t[:, 1] - evs_t[:, 0]) > 1.0
