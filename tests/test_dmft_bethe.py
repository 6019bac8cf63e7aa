"""End-to-end DMFT: the canonical ed_hm_bethe workload (SURVEY.md §4 level 3).

Known Bethe-lattice physics anchors (half-bandwidth D=1):
  * half filling is pinned by particle-hole symmetry (hfmode, xmu=0)
  * Re Σ(iω) ≈ 0 at half filling
  * U=2: correlated metal — docc well below the U=0 value 0.25, well above 0
  * kinetic energy reduced in magnitude from the U=0 value -4/(3π)·... ≈ -0.424
"""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.models import hm_bethe


@pytest.fixture
def rundir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_bethe_half_filling_metal(rundir):
    cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(2.0,), beta=100.0,
                   lmats=300, lreal=100, lfit=300, nloop=25, dmft_error=1e-5,
                   ed_verbose=0, lanc_dim_threshold=1024).validate()
    r = hm_bethe.run(cfg, le=250, wbethe=1.0, wmixing=0.5,
                     log=lambda m: None)
    assert r.error < 1e-4, f"DMFT did not converge: err={r.error}"
    np.testing.assert_allclose(r.dens, [1.0], atol=1e-3)
    assert 0.03 < r.docc[0] < 0.15, r.docc
    # particle-hole symmetry: real part of Sigma vanishes
    assert np.max(np.abs(r.smats[0, 0, 0, 0].real)) < 5e-3
    # kinetic energy between U=0 value (-0.424) and 0
    assert -0.45 < r.ekin < -0.1, r.ekin
    # output file contract
    import os
    assert os.path.exists("impSigma_l11_s1_iw.ed")
    assert os.path.exists("impG_l11_s1_iw.ed")
    assert os.path.exists("observables_last.ed")
    assert os.path.exists("hamiltonian.restart")
    assert os.path.exists("state_list.ed")


@pytest.mark.slow
def test_backend_parity_ozaki_vs_native(rundir):
    """Backend-parity bound (VERDICT r4 item 6): the effective-f64 ozaki
    Krylov arithmetic (the TPU hybrid path, device.py) must reproduce the
    native-f64 DMFT fixed point. Measured round 5 (PERF_NOTES 2x2
    decomposition): the backend-PINNED docc difference at deep
    convergence (dmft_error=1e-7) is ~1e-3 (measured 4.6e-4 at the
    adaptive-lengths revision, 1.02e-3 after the round-5 sweep-engine
    revisions — the gap itself wobbles with Krylov truncation detail),
    while at the production dmft_error=1e-5 the stop-point wobble adds
    up to ~1.2e-3 more of convergence-depth noise that is NOT a backend
    property. The contract pins the deep fixed point with 2x headroom
    over the measured gap: docc within 2e-3, dens within 1e-3, Z within
    2e-3 at dmft_error=1e-7 — wide enough for truncation wobble, tight
    enough to catch real arithmetic corruption (the round-4 digit
    extraction bug moved docc by >1e-2 and broke convergence). Egs is bounded loosely (0.1): it
    tracks the bath-fit micro-state, which keeps sliding below
    dmft_error long after the physical observables pin
    (native-vs-native across depths moves Egs 0.046)."""
    res = {}
    for prec in ("native", "ozaki5x7"):
        cfg = EDConfig(norb=1, nbath=6, nspin=1, uloc=(2.0,), beta=100.0,
                       lmats=512, lreal=64, lfit=512, nloop=80,
                       dmft_error=1e-7, ed_verbose=0,
                       matmul_precision=prec, lanc_method="lanczos",
                       lanc_niter=256, lanc_ngfiter=200,
                       lanc_dim_threshold=32).validate()
        r = hm_bethe.run(cfg, le=300, wmixing=0.5, log=lambda m: None)
        assert r.error < 5e-6, f"{prec}: err={r.error}"
        wm1 = np.pi / cfg.beta
        z = 1.0 / (1.0 - r.smats[0, 0, 0, 0, 0].imag / wm1)
        res[prec] = (r.docc.copy(), r.dens.copy(), r.egs, z, r.iterations)
    a, b = res["native"], res["ozaki5x7"]
    np.testing.assert_allclose(b[0], a[0], atol=2e-3)      # docc
    np.testing.assert_allclose(b[1], a[1], atol=1e-3)      # dens
    assert abs(b[2] - a[2]) < 0.1, (a[2], b[2])            # Egs (loose)
    assert abs(b[3] - a[3]) < 2e-3, (a[3], b[3])           # Z


def test_bethe_restart_roundtrip(rundir):
    """Bath restart file lets a fresh solver resume with the converged bath."""
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(1.5,), beta=50.0,
                   lmats=150, lreal=50, lfit=150, nloop=15, dmft_error=1e-4,
                   ed_verbose=0, lanc_dim_threshold=1024).validate()
    r1 = hm_bethe.run(cfg, le=150, wbethe=1.0, wmixing=0.5,
                      log=lambda m: None)
    # fresh run must pick up hamiltonian.restart and converge quickly
    r2 = hm_bethe.run(cfg, le=150, wbethe=1.0, wmixing=0.5,
                      log=lambda m: None)
    assert r2.iterations <= max(4, r1.iterations // 2)
    np.testing.assert_allclose(r1.docc, r2.docc, atol=1e-3)
