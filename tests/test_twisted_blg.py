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


def test_hk_vs_realspace_torus():
    """The union of Bloch spectra over the nk x nk grid equals the exact
    real-space spectrum of the nk x nk supercell torus — validates the
    e^{-ik.dist} phase convention. The reference's extra e^{+ik.R} factor
    (ed_twistedBLG.f90:250) is NOT a gauge (it differs per image at fixed
    (i, j)) and fails this identity by O(eV); we deliberately deviate."""
    # cutoff 1.8 (not the default sqrt(3)): the sqrt(3)*alat value lands
    # EXACTLY on a neighbor shell, where the strict `<` comparison is
    # float-rounding-dependent between implementations
    nk, m0, r, alat, cutoff = 2, 1, 1, 2.46, 1.8
    hk = tb.hk_twisted_blg(nk=nk, m0=m0, r=r, hopping_cutoff=cutoff)
    v = tb._vectors(alat, m0, r)
    uc = tb.build_unit_cell(alat, m0, r)
    RR1 = np.append(v["rr1"], 0.0)
    RR2 = np.append(v["rr2"], 0.0)
    pos = np.concatenate([uc + n1 * RR1 + n2 * RR2
                          for n1 in range(nk) for n2 in range(nk)], axis=0)
    N = pos.shape[0]
    dz, a0, r00 = 3.345, alat / np.sqrt(3), 0.184 * alat
    cut, vpi0, vsi0 = cutoff * alat, -2.7, 0.48
    imgs = [m1 * nk * RR1 + m2 * nk * RR2
            for m1 in (-1, 0, 1) for m2 in (-1, 0, 1)]
    H = np.zeros((N, N))
    for a in range(N):
        for b in range(N):
            if a == b:
                continue
            tsum = 0.0
            for g in imgs:
                d = pos[a] - pos[b] - g
                dd = np.linalg.norm(d)
                if 0 < dd < cut:
                    cz2 = (d[2] / dd) ** 2
                    tsum += (vpi0 * np.exp(-(dd - a0) / r00) * (1 - cz2)
                             + vsi0 * np.exp(-(dd - dz) / r00) * cz2)
            H[a, b] = tsum
    ev_torus = np.sort(np.linalg.eigvalsh(H))
    ev_bloch = np.sort(np.linalg.eigvalsh(hk.transpose(2, 0, 1)).ravel())
    np.testing.assert_allclose(ev_bloch, ev_torus, atol=1e-8)


def test_hk_diagonal_images_vs_torus():
    """hopping_cutoff > |RR1|/alat: same-site hops to neighboring moiré
    images land on the Bloch diagonal (dropped by the reference's
    j = i+1.. loop). Validated against the exact nk=3 supercell torus."""
    nk, m0, r, alat, cutoff = 3, 1, 1, 2.46, 2.7
    hk = tb.hk_twisted_blg(nk=nk, m0=m0, r=r, hopping_cutoff=cutoff)
    d0 = hk[np.arange(28), np.arange(28)]
    assert np.abs(d0).max() > 1e-5   # images within cutoff (exp-decayed t)
    np.testing.assert_allclose(hk, hk.conj().transpose(1, 0, 2), atol=1e-12)
    v = tb._vectors(alat, m0, r)
    uc = tb.build_unit_cell(alat, m0, r)
    RR1 = np.append(v["rr1"], 0.0)
    RR2 = np.append(v["rr2"], 0.0)
    pos = np.concatenate([uc + n1 * RR1 + n2 * RR2
                          for n1 in range(nk) for n2 in range(nk)], axis=0)
    imgs = np.array([m1 * nk * RR1 + m2 * nk * RR2
                     for m1 in (-1, 0, 1) for m2 in (-1, 0, 1)])
    d = (pos[:, None, :] - pos[None, :, :])[None] - imgs[:, None, None, :]
    dd = np.linalg.norm(d, axis=-1)
    dz, a0, r00 = 3.345, alat / np.sqrt(3), 0.184 * alat
    cz2 = (d[..., 2] / np.where(dd > 0, dd, 1.0)) ** 2
    t = np.where((dd > 0) & (dd < cutoff * alat),
                 -2.7 * np.exp(-(dd - a0) / r00) * (1 - cz2)
                 + 0.48 * np.exp(-(dd - dz) / r00) * cz2, 0.0)
    H = t.sum(axis=0)
    # torus diagonal is exactly 0: the g=0 self-pair is masked by dd>0 and
    # same-site image hops appear as OFF-diagonal elements between copies
    ev_torus = np.sort(np.linalg.eigvalsh(H))
    ev_bloch = np.sort(np.linalg.eigvalsh(hk.transpose(2, 0, 1)).ravel())
    np.testing.assert_allclose(ev_bloch, ev_torus, atol=1e-8)


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
