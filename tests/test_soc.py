"""ed_SOC-class driver: nonsu2 + replica bath + k-sum Gloc end-to-end."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.aux import atomic_soc, nn2so
from dmft_ed_tpu.models import soc


def test_atomic_soc_matrix():
    ls = nn2so(atomic_soc(), 2, 3)
    # Hermitian, traceless; t2g effective convention (L_eff = -L):
    # j_eff=3/2 quartet at -1/2, j_eff=1/2 doublet at +1
    np.testing.assert_allclose(ls, ls.conj().T, atol=1e-14)
    assert abs(np.trace(ls)) < 1e-14
    ev = np.sort(np.linalg.eigvalsh(ls))
    np.testing.assert_allclose(ev, [-0.5, -0.5, -0.5, -0.5, 1.0, 1.0],
                               atol=1e-12)


@pytest.mark.slow
def test_soc_replica_dmft_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=3, nspin=2, nbath=1, uloc=(1.0, 1.0, 1.0), ust=0.5,
                   ed_mode="nonsu2", bath_type="replica", beta=50.0,
                   lmats=100, lreal=30, lfit=100, nloop=5, dmft_error=1e-3,
                   ed_verbose=0, lanc_dim_threshold=400,
                   lanc_nstates_sector=2, cg_niter=200).validate()
    r = soc.run(cfg, nk=4, t=0.5, soc=0.25, wmixing=0.5, log=lambda m: None)
    assert np.all(np.isfinite(r.dens))
    assert r.error < 0.2
    # SOC splits the t2g manifold: orbital densities are not all equal
    assert np.ptp(r.dens) > 0.05
    # spin-off-diagonal self-energy components are generated
    assert np.max(np.abs(r.smats[0, 1])) > 1e-4
