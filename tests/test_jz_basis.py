"""Jz basis (nonsu2 + conserved twoJz = twoLz + twoSz, replica bath).

For a Jz-conserving Hamiltonian (t2g + atomic SOC), the Jz-refined sector
spectra must union exactly to the plain nonsu2 N-sector spectra, and the
refinement must cover the full Fock space."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath, replica_mask
from dmft_ed_tpu.sectors import (build_sector_table, build_sector_table_jz,
                                 sector_table)
from dmft_ed_tpu.hamiltonian import build_sector_hamiltonian, assemble_dense
from dmft_ed_tpu.aux import atomic_soc_jz
from dmft_ed_tpu import fock


def _cfg(jz=True):
    return EDConfig(norb=3, nspin=2, nbath=1, uloc=(0.8, 0.8, 0.8), ust=0.4,
                    ed_mode="nonsu2", bath_type="replica", jz_basis=jz,
                    xmu=0.1).validate()


def _jz_conserving_problem(cfg, lam=0.3, seed=101):
    rng = np.random.default_rng(seed)
    ls = atomic_soc_jz()
    hloc = lam * ls
    for a in range(3):
        hloc[:, :, a, a] += np.diag([0.2, 0.2])[:, :] * 0.0
    b = Bath(cfg)
    b.mask = replica_mask(cfg, hloc + 1e-3 * np.einsum(
        "st,ab->stab", np.eye(2), np.eye(3)))  # mask incl. diagonals
    eps = rng.normal() * 0.3
    b.h[..., 0] = 0.7 * lam * ls
    for s in range(2):
        for a in range(3):
            b.h[s, s, a, a, 0] += eps
    b.vr[:] = 0.6
    return hloc, b


def test_jz_table_partitions_fock_space():
    t = build_sector_table_jz(6, 3)
    assert sum(s.dim for s in t.sectors) == 4 ** 6
    t0 = build_sector_table("nonsu2", 6)
    for n in range(13):
        assert sum(s.dim for s in t.sectors if s.qn[1] == n) == t0.get(n).dim


def test_jz_values_match_brute_force():
    ns, n, norb = 6, 3, 3
    st = fock.spin_states(ns, n)
    lz = fock.lz_values(ns, n, norb)
    for k in range(0, st.size, 5):
        s = int(st[k])
        expect = sum(2 * fock.LZDIAG_T2G[lv % norb] * ((s >> lv) & 1)
                     for lv in range(ns))
        assert lz[k] == expect


@pytest.mark.parametrize("n", [2, 4, 6, 8])
def test_jz_sector_spectra_union(n):
    cfg = _cfg(jz=True)
    hloc, bath = _jz_conserving_problem(cfg)
    tjz = sector_table(cfg)
    cfg_plain = _cfg(jz=False)
    tpl = sector_table(cfg_plain)

    evs_jz = []
    for sec in tjz.sectors:
        if sec.qn[1] != n:
            continue
        ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
        H = assemble_dense(ham)
        np.testing.assert_allclose(H, H.conj().T, atol=1e-12)
        evs_jz.append(np.linalg.eigvalsh(H))
    sec_pl = tpl.get(n)
    Hpl = assemble_dense(build_sector_hamiltonian(cfg_plain, sec_pl, bath,
                                                  hloc))
    evs_pl = np.linalg.eigvalsh(Hpl)
    np.testing.assert_allclose(np.sort(np.concatenate(evs_jz)), evs_pl,
                               atol=1e-9)


def _ph_symmetric_problem(cfg):
    """U + U' + hybridization at xmu=0: particle-hole symmetric (the twin
    validity condition for nonsu2, get_twin_sector ED_SETUP.f90:1195-1212)
    while the Jz table still refines every N sector into Lz sub-blocks."""
    b = Bath(cfg)
    b.mask = replica_mask(cfg, np.einsum(
        "st,ab->stab", np.eye(2), np.eye(3)))
    b.vr[:] = 0.6
    hloc = np.zeros((2, 2, 3, 3), dtype=complex)
    return hloc, b


def test_jz_twin_sector_and_mask():
    """twin_sector in the Jz basis: (n, 2Jz) -> (2Ns-n, -2Jz); the twin
    mask keeps n<Ns plus the 2Jz<=0 half of the n=Ns shell."""
    from dmft_ed_tpu.sectors import build_sector_table_jz
    t = build_sector_table_jz(6, 3)
    for sec in t.sectors:
        tw = t.twin_sector(sec)
        assert tw is not None, sec.qn
        assert tw.qn[1] == 12 - sec.qn[1] and tw.qn[2] == -sec.qn[2]
        assert tw.dim == sec.dim
        assert t.twin_sector(tw) is sec
    mask = t.twin_mask()
    for i, sec in enumerate(t.sectors):
        tw = t.twin_sector(sec)
        # every sector is represented: itself or its twin is scanned
        assert mask[i] or mask[tw.index]
        if sec.index != tw.index:
            assert mask[i] != mask[tw.index]


def test_jz_twin_vector_reconstruction():
    """The complement-gather twin vector (eigenspace.get_vector, nonsu2jz
    branch) is an eigenvector of the twin sector's Hamiltonian."""
    from dmft_ed_tpu.eigenspace import StateList
    cfg = _cfg(jz=True).replace(uloc=(0.8, 0.8, 0.8), ust=0.4, xmu=0.0)
    hloc, bath = _ph_symmetric_problem(cfg)
    t = sector_table(cfg)
    checked = 0
    for sec in t.sectors:
        tw = t.twin_sector(sec)
        if tw.index <= sec.index or sec.dim == 0 or sec.dim > 40:
            continue
        H = assemble_dense(build_sector_hamiltonian(cfg, sec, bath, hloc))
        evals, evecs = np.linalg.eigh(H)
        sl = StateList()
        sl.add(evals[0], evecs[:, 0], sec, t, twin=True)
        twin_states = [s for s in sl if s.sector is tw]
        assert len(twin_states) == 1
        v = np.asarray(twin_states[0].get_vector())
        Htw = assemble_dense(build_sector_hamiltonian(cfg, tw, bath, hloc))
        np.testing.assert_allclose(Htw @ v, evals[0] * v, atol=1e-9)
        checked += 1
    assert checked >= 3


def test_jz_twin_full_solve_matches_full_scan():
    """ed_twin in the Jz basis: the halved sweep reproduces the full-scan
    spectrum, observables and GF for a PH-symmetric problem (VERDICT r4
    item 4; reference twin machinery ED_SETUP.f90:1123-1212)."""
    from dmft_ed_tpu.diag import diagonalize
    from dmft_ed_tpu.observables import compute_observables
    from dmft_ed_tpu.gf_nonsu2 import build_gf_nonsu2

    res = {}
    for tw in (False, True):
        cfg = _cfg(jz=True).replace(uloc=(0.8, 0.8, 0.8), ust=0.4, xmu=0.0,
                                    ed_twin=tw, lmats=10, lreal=6, beta=60.0,
                                    lanc_dim_threshold=10 ** 6)
        hloc, bath = _ph_symmetric_problem(cfg)
        slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
        obs = compute_observables(cfg, slist, zeta, bath, hloc, False)
        Gm, _ = build_gf_nonsu2(cfg, slist, zeta, bath, hloc, False)
        res[tw] = (slist.emin, zeta, obs.dens.copy(), obs.docc.copy(),
                   Gm.copy())
    assert abs(res[0][0] - res[1][0]) < 1e-9
    assert abs(res[0][1] - res[1][1]) < 1e-9
    np.testing.assert_allclose(res[1][2], res[0][2], atol=1e-8)
    np.testing.assert_allclose(res[1][3], res[0][3], atol=1e-8)
    for s in range(2):
        for a in range(3):
            np.testing.assert_allclose(res[1][4][s, s, a, a],
                                       res[0][4][s, s, a, a], atol=1e-7)


def test_jz_ed_sectors_restart_roundtrip(tmp_path, monkeypatch):
    """Jz-basis ed_sectors restart (VERDICT r4 item 3): two-qn (n, 2Jz)
    rows must mask in the listed sector plus its independent +/-shifts
    (ED_DIAG.f90:322-343), write_state_list -> sectors_mask must
    round-trip, and the list_of_sectors audit file is written."""
    import os
    from dmft_ed_tpu.diag import (diagonalize, sectors_mask,
                                  write_state_list)
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(jz=True).replace(ed_sectors=True, ed_sectors_shift=1,
                                lanc_dim_threshold=10 ** 6)
    table = sector_table(cfg)
    assert sectors_mask(cfg, table).all()    # no restart file: full scan
    # single restart row -> center + the existing independent shifts
    center = next(s for s in table.sectors
                  if s.qn[1] == 5 and s.qn[2] == 1)
    with open("sectors_list.restart", "w") as fh:
        fh.write("5 1\n")
    mask = sectors_mask(cfg, table)
    expect = set()
    for qn in [(5, 1), (6, 1), (4, 1), (5, 2), (5, 0)]:
        sec = table.get(*qn)
        if sec is not None:
            expect.add(sec.index)
    assert expect, "test premise: candidates exist"
    assert set(np.nonzero(mask)[0]) == expect
    assert mask[center.index]
    assert os.path.exists("list_of_sectors.ed")
    # full round-trip: solve (restricted), write state list, re-mask
    hloc, bath = _jz_conserving_problem(cfg)
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    assert len(slist) > 0
    for s in slist:
        assert s.sector.index in expect
    write_state_list(cfg, slist, zeta)
    mask2 = sectors_mask(cfg, table)
    for s in slist:
        assert mask2[s.sector.index]


def test_jz_full_solve_matches_plain_nonsu2():
    """Spectrum + observables + GF from the Jz-refined solve equal the plain
    nonsu2 solve for a Jz-conserving problem."""
    from dmft_ed_tpu.diag import diagonalize
    from dmft_ed_tpu.observables import compute_observables
    from dmft_ed_tpu.gf_nonsu2 import build_gf_nonsu2

    res = {}
    for jzflag in (False, True):
        cfg = _cfg(jzflag).replace(lmats=12, lreal=8, beta=60.0,
                                   lanc_dim_threshold=10 ** 6)
        hloc, bath = _jz_conserving_problem(cfg)
        slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
        obs = compute_observables(cfg, slist, zeta, bath, hloc, False)
        Gm, Gr = build_gf_nonsu2(cfg, slist, zeta, bath, hloc, False)
        res[jzflag] = (slist.emin, zeta, obs.dens.copy(), Gm.copy())
    e_p, z_p, d_p, G_p = res[False]
    e_j, z_j, d_j, G_j = res[True]
    assert abs(e_p - e_j) < 1e-9
    assert abs(z_p - z_j) < 1e-9
    np.testing.assert_allclose(d_j, d_p, atol=1e-8)
    for s in range(2):
        for a in range(3):
            np.testing.assert_allclose(G_j[s, s, a, a], G_p[s, s, a, a],
                                       atol=1e-7, err_msg=f"{s}{a}")
