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
