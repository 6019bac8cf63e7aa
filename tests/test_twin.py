"""Twin-sector reduction (ed_twin): halved sector scan must reproduce the
full-scan physics exactly for spin-symmetric problems."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.diag import diagonalize
from dmft_ed_tpu.gf_normal import build_gf_normal
from dmft_ed_tpu.observables import compute_observables


def _setup(ed_twin):
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(2.0,), beta=50.0,
                   lmats=24, lreal=12, xmu=0.15, ed_twin=ed_twin,
                   lanc_dim_threshold=10 ** 6).validate()
    rng = np.random.default_rng(81)
    bath = Bath(cfg)
    bath.e[:] = np.array([-0.8, 0.1, 0.9])[None, None, :]
    bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    return cfg, bath, hloc


def test_twin_reduction_matches_full_scan():
    results = {}
    for tw in (False, True):
        cfg, bath, hloc = _setup(tw)
        slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
        obs = compute_observables(cfg, slist, zeta, bath, hloc, False)
        Gm, Gr = build_gf_normal(cfg, slist, zeta, bath, hloc, False)
        results[tw] = (slist.emin, zeta, obs.dens.copy(), obs.docc.copy(),
                       Gm.copy())
    e0_f, z_f, dens_f, docc_f, G_f = results[False]
    e0_t, z_t, dens_t, docc_t, G_t = results[True]
    assert abs(e0_f - e0_t) < 1e-10
    assert abs(z_f - z_t) < 1e-10
    np.testing.assert_allclose(dens_t, dens_f, atol=1e-9)
    np.testing.assert_allclose(docc_t, docc_f, atol=1e-9)
    np.testing.assert_allclose(G_t, G_f, atol=1e-8)


def test_twin_finite_t():
    for tw in (False, True):
        cfg, bath, hloc = _setup(tw)
        cfg = cfg.replace(beta=5.0, lanc_nstates_total=40, cutoff=1e-8)
        slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
        obs = compute_observables(cfg, slist, zeta, bath, hloc, True)
        if tw:
            dens_t = obs.dens.copy()
        else:
            dens_f = obs.dens.copy()
    np.testing.assert_allclose(dens_t, dens_f, atol=1e-6)


def test_twin_superc():
    """superc twin (sz -> -sz transpose reconstruction) reproduces the
    full-scan spectrum and observables."""
    from dmft_ed_tpu.observables import compute_observables
    res = {}
    for tw in (False, True):
        cfg = EDConfig(norb=1, nbath=2, nspin=1, uloc=(-1.2,),
                       ed_mode="superc", deltasc=0.25, beta=40.0, xmu=0.1,
                       ed_twin=tw, lanc_dim_threshold=10 ** 6).validate()
        rng = np.random.default_rng(83)
        bath = Bath(cfg)
        bath.e[:] = np.array([-0.6, 0.7])[None, None, :]
        bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
        bath.d[:] = 0.3
        hloc = np.zeros((1, 1, 1, 1))
        slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
        obs = compute_observables(cfg, slist, zeta, bath, hloc, False)
        res[tw] = (slist.emin, zeta, obs.dens.copy(), obs.phisc.copy())
    assert abs(res[0][0] - res[1][0]) < 1e-10
    assert abs(res[0][1] - res[1][1]) < 1e-10
    np.testing.assert_allclose(res[1][2], res[0][2], atol=1e-8)
    np.testing.assert_allclose(res[1][3], res[0][3], atol=1e-8)


def test_ed_sectors_restart_mask(tmp_path, monkeypatch):
    """ed_sectors=T + sectors_list.restart restricts the sweep to the listed
    sectors +/- ed_sectors_shift (ed_pre_diag, ED_DIAG.f90:263-363)."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.diag import sectors_mask
    from dmft_ed_tpu.sectors import sector_table
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(2.0,), ed_sectors=True,
                   ed_sectors_shift=1).validate()
    table = sector_table(cfg)
    # no restart file: scan everything
    assert sectors_mask(cfg, table).all()
    with open("sectors_list.restart", "w") as fh:
        fh.write("2 2\n")
    mask = sectors_mask(cfg, table)
    on = {table.sectors[i].qn[1:] for i in np.nonzero(mask)[0]}
    assert on == {(2, 2), (1, 2), (3, 2), (2, 1), (2, 3)}
    # the full solve honors the mask: only listed-sector states kept
    rng = np.random.default_rng(5)
    bath = Bath(cfg)
    bath.e[:] = np.array([-1.0, 0.0, 1.0])[None, None, :]
    bath.v[:] = 0.5
    hloc = np.zeros((1, 1, 1, 1))
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    for s in slist:
        assert s.sector.qn[1:] in on
