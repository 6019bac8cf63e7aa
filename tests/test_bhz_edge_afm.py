"""BHZ stripe with AFM cells (ed_bhz_2d_edge_afm.f90 parity)."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.models.bhz_edge_afm import bhz_afm_strip_hk, run


def test_afm_strip_structure():
    h = bhz_afm_strip_hk(nkx=8, ly=4, mh=1.0, llambda=0.3)
    assert h.shape == (32, 32, 8)
    np.testing.assert_allclose(h, h.conj().transpose(1, 0, 2), atol=0)
    # lambda = 0, mh = 0: bipartite hopping model — exactly ph-symmetric
    h0 = bhz_afm_strip_hk(nkx=16, ly=6, mh=0.0, llambda=0.0)
    e0 = np.sort(np.linalg.eigvalsh(h0.transpose(2, 0, 1)).ravel())
    np.testing.assert_allclose(e0, -e0[::-1], atol=1e-12)


def test_afm_strip_edge_modes():
    """Topological mh=1: gapless helical edge states on the open stripe;
    trivial mh=3: full gap (the BHZ invariant survives the AFM-cell
    representation at U=0)."""
    e_top = np.linalg.eigvalsh(
        bhz_afm_strip_hk(nkx=64, ly=10, mh=1.0).transpose(2, 0, 1))
    e_trv = np.linalg.eigvalsh(
        bhz_afm_strip_hk(nkx=64, ly=10, mh=3.0).transpose(2, 0, 1))
    assert np.abs(e_top).min() < 0.05
    assert np.abs(e_trv).min() > 0.5


@pytest.mark.slow
def test_bhz_edge_afm_neel(tmp_path, monkeypatch):
    """Interacting stripe with Néel seed: AFM order develops on the A-site
    impurities. Adjacent diagonal layers' A sites belong to the SAME Néel
    sublattice (the B partner within each cell carries the flipped
    moment), so the A moments share a sign
    (ed_bhz_2d_edge_afm.f90:158-210)."""
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=2, nspin=2, nbath=2, uloc=(8.0, 8.0), ust=4.0,
                   beta=50.0, lmats=120, lreal=30, lfit=120, nloop=12,
                   dmft_error=1e-3, sb_field=0.5, ed_verbose=0,
                   lanc_dim_threshold=1500).validate()
    r = run(cfg, ly=3, nkx=8, mh=1.0, llambda=0.3, wmixing=0.7,
            lysym=True, neelsym=True, log=lambda m: None)
    assert np.all(np.isfinite(r.dens))
    m = r.magz.sum(axis=1)            # per-ineq total moment
    assert np.abs(m).min() > 0.5      # Néel order developed on all layers
    assert m[0] * m[1] > 0            # same Néel sublattice
    np.testing.assert_allclose(r.dens.sum(axis=1), 2.0, atol=1e-2)