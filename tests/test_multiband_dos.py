"""Multiband square/cubic Bloch drivers and DOS-driven drivers
(ed_hm_2b_square / ed_hm_3b_square / ed_hm_2b_cubic / ed_hm_2bands_bethe /
ed_hm_2bands_dos / ed_hm_square_dos parity)."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.lattice import dos_bands, flat_dos, square2d_dos
from dmft_ed_tpu.models import kspace


def test_hk_multiband_square_bands():
    hk = kspace.hk_multiband_square(nk=32, ts=0.5, norb=2)
    # two exactly degenerate NN square bands, half bandwidth 2.0
    np.testing.assert_allclose(hk[0, 0], hk[1, 1], atol=1e-15)
    assert abs(hk[0, 0].real.min() + 2.0) < 1e-12
    assert abs(hk[0, 0].real.mean()) < 1e-13
    assert np.all(hk[0, 1] == 0)


def test_hk_3b_square_dxy_shift():
    ts = 0.5
    hk = kspace.hk_multiband_square(nk=16, ts=ts, norb=3,
                                    shifts=[0, 0, 0.5 * ts])
    np.testing.assert_allclose(hk[2, 2] - hk[0, 0], 0.5 * ts, atol=1e-14)


def test_hk_multiband_cubic_bands():
    hk = kspace.hk_multiband_cubic(nk=8, ts=0.5, norb=2)
    assert hk.shape == (2, 2, 512)
    assert abs(hk[0, 0].real.min() + 3.0) < 1e-12    # -6t
    assert abs(hk[0, 0].real.mean()) < 1e-13


def test_flat_and_square2d_dos_normalized():
    e = np.linspace(-1, 1, 20001)
    assert abs(np.trapezoid(flat_dos(e, 1.0), e) - 1.0) < 1e-12
    ts = 1.0
    e = np.linspace(-4 * ts, 4 * ts, 20001)
    # integrable log singularity at e=0: trapezoid converges slowly there
    assert abs(np.trapezoid(square2d_dos(e, ts), e) - 1.0) < 2e-3
    # van Hove peak at the band center
    rho = square2d_dos(np.array([-2.0, -0.01, 2.0]), ts)
    assert rho[1] > 3 * rho[0]


def test_dos_bands_file_roundtrip(tmp_path):
    e = np.linspace(-1.5, 1.5, 400)
    rho = flat_dos(e, 1.5)
    f = tmp_path / "dos.dat"
    np.savetxt(f, np.column_stack([e, rho]))
    eb, db, h0 = dos_bands(1, "file", dos_file=str(f))
    np.testing.assert_allclose(eb[0], e)
    # weights carry the exact trapezoid measure: Σ w·rho == trapz(rho, e)
    np.testing.assert_allclose(db[0].sum(), np.trapezoid(rho, e), atol=1e-12)
    # flat DOS nonzero at the band edges: the half-weight endpoints keep
    # the sum rule exact (rectangle/gradient weights bias it by ~1/le)
    np.testing.assert_allclose(db[0].sum(), 1.0, atol=1e-12)
    ebu, dbu, _ = dos_bands(1, "flat", wband=1.5, le=400)
    np.testing.assert_allclose(dbu[0].sum(), 1.0, atol=1e-12)


def test_hm_dos_u0_exact(tmp_path, monkeypatch):
    """U=0, flat DOS: one DMFT pass must reproduce the exact
    noninteracting Gloc = \\int de rho(e)/(z - e) (Sigma == 0)."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.models import hm_dos
    cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(0.0,), beta=40.0,
                   lmats=100, lreal=20, lfit=100, nloop=2, dmft_error=1e-5,
                   ed_verbose=0).validate()
    r = hm_dos.run(cfg, dos_model="flat", wband=1.0, le=1000,
                   log=lambda m: None)
    # ph symmetry: the T=0 star has an exact zero mode (odd site count) so
    # the impurity density averages over a degenerate manifold — loose tol
    assert abs(r.dens[0] - 1.0) < 0.1
    assert np.abs(r.smats).max() < 1e-8          # Sigma = 0 at U = 0
    z = 1j * np.pi / cfg.beta * (2 * np.arange(1, cfg.lmats + 1) - 1)
    e = np.linspace(-1, 1, 1000)
    # independent trapezoid quadrature of \int de rho/(z - e)
    g_exact = np.array([np.trapezoid(flat_dos(e, 1.0) / (zz - e), e)
                        for zz in z])
    np.testing.assert_allclose(r.gmats[0, 0, 0, 0], g_exact, atol=1e-8)


@pytest.mark.slow
def test_hm_2bands_bethe_wratio(tmp_path, monkeypatch):
    """Wratio=2 interacting loop: both orbitals half filled at ph
    symmetry; the wider band is less correlated (larger docc)."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.models import hm_2bands_bethe
    cfg = EDConfig(norb=2, nbath=2, nspin=1, uloc=(1.6, 1.6), beta=50.0,
                   lmats=150, lreal=30, lfit=150, nloop=20, dmft_error=5e-4,
                   ed_verbose=0, lanc_dim_threshold=2048).validate()
    r = hm_2bands_bethe.run(cfg, wratio=2.0, sc_method=2, phsym=True,
                            log=lambda m: None)
    np.testing.assert_allclose(r.dens, [1.0, 1.0], atol=5e-3)
    assert r.docc[1] > r.docc[0] + 0.005


@pytest.mark.slow
def test_hm_multiband_square_loop(tmp_path, monkeypatch):
    """2 degenerate square bands (hybrid bath): converges to half filling
    with equal orbital densities (ed_hm_2b_square.f90 class)."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.models import hm_multiband
    cfg = EDConfig(norb=2, nbath=2, nspin=1, uloc=(1.5, 1.5),
                   bath_type="hybrid", beta=50.0, lmats=120, lreal=30,
                   lfit=120, nloop=15, dmft_error=1e-3, ed_verbose=0,
                   lanc_dim_threshold=2048).validate()
    r = hm_multiband.run(cfg, model="2b_square", nk=10, ts=0.5,
                         log=lambda m: None)
    assert r.converged
    np.testing.assert_allclose(r.dens, [1.0, 1.0], atol=1e-2)
    np.testing.assert_allclose(r.dens[0], r.dens[1], atol=1e-6)
