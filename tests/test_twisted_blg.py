"""Microscopic commensurate twisted bilayer graphene
(ed_twistedBLG.f90 parity): geometry, Slater-Koster Bloch builder, DMFT."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.models import twisted_blg as tb


def test_twist_angle_and_cell():
    """(m0, r) = (1, 1): theta = 21.7868 deg, Nlat = 28 split 14/14 over
    the two layers at z = 0 and z = dz (Sboychakov PRB 92, 075402
    commensuration; ed_twistedBLG.f90:64,74)."""
    th, nlat = tb.twist_angle(1, 1)
    assert abs(np.degrees(th) - 21.786789) < 1e-5
    assert nlat == 28
    uc = tb.build_unit_cell(2.46, 1, 1)
    assert uc.shape == (28, 3)
    zs, counts = np.unique(uc[:, 2], return_counts=True)
    np.testing.assert_allclose(zs, [0.0, 3.345], atol=1e-12)
    assert list(counts) == [14, 14]
    # next commensuration: (2, 1) -> Nlat = 76, theta = 13.1736 deg
    th2, nlat2 = tb.twist_angle(2, 1)
    assert nlat2 == 76
    assert abs(np.degrees(th2) - 13.1736) < 1e-3


def test_hk_twisted_blg_spectrum():
    hk = tb.hk_twisted_blg(nk=4)
    assert hk.shape == (28, 28, 16)
    np.testing.assert_allclose(hk, hk.conj().transpose(1, 0, 2), atol=0)
    evs = np.linalg.eigvalsh(hk.transpose(2, 0, 1))
    # traceless (no on-site terms) and bounded by the coupled bandwidth
    assert abs(evs.mean()) < 1e-12
    assert evs.max() < 12.0 and evs.min() > -12.0


def test_hk_monolayer_limit():
    """Cutoff below the interlayer distance + Vsi0=0: two decoupled
    twisted graphene sheets — exactly ph-symmetric spectrum of bandwidth
    2*3|Vpi0| (NN distance a0 gives t = Vpi0 exactly), gapless."""
    hk = tb.hk_twisted_blg(nk=6, hopping_cutoff=0.6, vsi0=0.0)
    evs = np.linalg.eigvalsh(hk.transpose(2, 0, 1))
    assert abs(evs.max() - 8.1) < 1e-9          # 3 |Vpi0| = 3*2.7
    assert abs(evs.min() + 8.1) < 1e-9
    assert abs(evs.mean()) < 1e-12              # bipartite ph symmetry
    assert np.abs(evs).min() < 1e-9             # Dirac nodes fold onto grid
    # interlayer blocks exactly zero
    uc = tb.build_unit_cell()
    l1 = np.where(uc[:, 2] == 0)[0]
    l2 = np.where(uc[:, 2] > 0)[0]
    assert np.abs(hk[np.ix_(l1, l2)]).max() == 0.0


@pytest.mark.slow
def test_twisted_blg_dmft_smoke(tmp_path, monkeypatch):
    """28-site moiré DMFT loop (cross-site batched sweep): finite
    observables, global half filling at ph-symmetric U."""
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nbath=2, nspin=1, uloc=(2.0,), beta=20.0,
                   lmats=80, lreal=20, lfit=80, nloop=4, dmft_error=1e-2,
                   ed_verbose=0, lanc_dim_threshold=512).validate()
    r = tb.run(cfg, m0=1, r=1, nk=2, wmixing=0.7, log=lambda m: None)
    assert np.all(np.isfinite(r.dens)) and np.all(np.isfinite(r.docc))
    assert r.dens.shape == (28,)
    # ph-symmetric interacting bilayer: total filling = Nlat
    assert abs(r.dens.mean() - 1.0) < 0.05
