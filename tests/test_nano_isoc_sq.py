"""Square-torus isoc nano + chi0(q)/Chern post-processing
(ed_nano_isoc_sq.f90 / ed_nano_isoc_chi0.f90 parity)."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.models.nano_isoc_sq import (square_torus_isoc_hij,
                                             cluster_qgrid, post_chi0, run)


def test_square_torus_isoc_spectrum():
    """Real-space torus spectrum == exact Bloch dispersion
    e_s(k) = -2t(cos kx + cos ky) - 2 s lam [sin(kx+ky) - sin(kx-ky)]."""
    nx, t, lam = 6, 1.0, 0.2
    hij, lat2ineq, pos = square_torus_isoc_hij(nx, t, lam)
    np.testing.assert_allclose(hij, hij.conj().T, atol=0)
    ev = np.sort(np.linalg.eigvalsh(hij))
    ks = 2 * np.pi * np.arange(nx) / nx
    disp = []
    for s, sgn in ((0, 1.0), (1, -1.0)):
        for kx in ks:
            for ky in ks:
                disp.append(-2 * t * (np.cos(kx) + np.cos(ky))
                            - 2 * lam * sgn * (np.sin(kx + ky)
                                               - np.sin(kx - ky)))
    np.testing.assert_allclose(ev, np.sort(disp), atol=1e-12)
    assert lat2ineq.max() == 0          # torus: all sites equivalent


def test_chi0_square_nesting(tmp_path, monkeypatch):
    """U=0 half-filled square lattice (lam=0): the static bare bubble is
    maximal at the nesting vector q = (pi, pi) (chi0_lattice.f90
    physics)."""
    monkeypatch.chdir(tmp_path)
    nx = 6
    cfg = EDConfig(norb=1, nspin=2, nbath=1, uloc=(0.0,), beta=20.0,
                   lmats=256, lreal=10).validate()
    hij, _, pos = square_torus_isoc_hij(nx, 1.0, 0.0)
    s0 = np.zeros((nx * nx, 2, 2, 1, 1, cfg.lmats), dtype=complex)
    chi0, qpts = post_chi0(cfg, hij, s0, pos, write=True)
    assert chi0.shape == (2, nx * nx)
    np.testing.assert_allclose(chi0[0], chi0[1], atol=1e-12)
    iq_pi = np.argmin(np.abs(qpts - np.pi).sum(axis=1))
    assert np.argmax(chi0[0]) == iq_pi
    # nesting enhancement (the log^2 peak is cut by beta and cluster size)
    assert chi0[0, iq_pi] > 1.1 * chi0[0, 0]
    assert np.all(chi0[0] > 0)          # bare bubble is positive
    import os
    assert os.path.exists("chi0_up.ed")


@pytest.mark.slow
def test_nano_isoc_sq_dmft(tmp_path, monkeypatch):
    """Interacting 3x3 isoc torus (one inequivalent site): chi0 with the
    converged Sigma is suppressed vs the bare one; Chern marker finite."""
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nspin=2, nbath=3, uloc=(2.0,), beta=30.0,
                   lmats=128, lreal=30, lfit=128, nloop=10, dmft_error=1e-3,
                   ed_verbose=0, lanc_dim_threshold=1024).validate()
    r = run(cfg, nx=3, t=1.0, lam=0.2, chern=True, log=lambda m: None)
    assert r.dmft.converged
    assert np.all(np.isfinite(r.chi0))
    assert r.chern is not None and np.all(np.isfinite(r.chern))
    # interactions suppress the bubble vs self_zero
    hij, l2i, pos = square_torus_isoc_hij(3, 1.0, 0.2)
    smats_lat = r.dmft.smats_ineq[l2i]
    chi0_bare, _ = post_chi0(cfg, hij, smats_lat, pos, self_zero=True,
                             write=False)
    assert r.chi0[0].max() < chi0_bare[0].max()
