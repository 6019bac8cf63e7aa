"""Superc Green's functions: U=0 must reproduce the analytic G0/F0 exactly
(Σ = Σᴬ = 0), and the Lehmann oracle must match the normal component."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.diag import diagonalize
from dmft_ed_tpu.gf_superc import build_gf_superc, build_sigma_superc
from dmft_ed_tpu.bath_fns import bath_params, g0and, f0and
from dmft_ed_tpu import grids

import reference_ed as ref
from test_gf_normal import lehmann_gf


def _cfg(**kw):
    base = dict(norb=1, nbath=3, nspin=1, ed_mode="superc", uloc=(0.0,),
                beta=60.0, lmats=40, lreal=20, deltasc=0.3, xmu=0.2,
                lanc_dim_threshold=10 ** 6, lanc_ngfiter=200)
    base.update(kw)
    return EDConfig(**base).validate()


def _bath(cfg, seed=31):
    rng = np.random.default_rng(seed)
    b = Bath(cfg)
    b.e[:] = np.array([-0.9, 0.1, 0.8])[None, None, :]
    b.v[:] = rng.uniform(0.4, 0.7, size=b.v.shape)
    b.d[:] = np.array([0.35, 0.25, 0.4])[None, None, :]
    return b


def test_superc_u0_matches_g0():
    """Free system: ED Krylov G/F must equal the analytic BdG G0/F0."""
    cfg = _cfg()
    bath = _bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr, Fm, Fr = build_gf_superc(cfg, slist, zeta, bath, hloc, False)
    p = bath_params(bath)
    zm = jnp.asarray(grids.z_mats(cfg))
    g0 = np.asarray(g0and(cfg, zm, p, hloc))
    f0 = np.asarray(f0and(cfg, zm, p, hloc))
    np.testing.assert_allclose(Gm[0, 0, 0, 0], g0[0, 0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(Fm[0, 0, 0, 0], f0[0, 0, 0, 0], atol=1e-7)
    # Dyson: sigma must vanish
    Sm, Sr, SAm, SAr, *_ = build_sigma_superc(cfg, bath, hloc, Gm, Gr, Fm, Fr)
    assert np.max(np.abs(Sm)) < 1e-6
    assert np.max(np.abs(SAm)) < 1e-6


def test_superc_interacting_g_vs_lehmann():
    cfg = _cfg(uloc=(-1.5,), beta=40.0)
    bath = _bath(cfg, seed=32)
    hloc = np.zeros((1, 1, 1, 1))
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr, Fm, Fr = build_gf_superc(cfg, slist, zeta, bath, hloc, False)
    zm = grids.z_mats(cfg)
    Gex = lehmann_gf(cfg, bath, hloc, zm, cfg.beta, False)
    np.testing.assert_allclose(Gm[0, 0, 0, 0], Gex[0, 0, 0, 0], atol=1e-7)
    # F must be essentially real on the Matsubara axis for real H
    assert np.max(np.abs(Fm[0, 0, 0, 0].imag)) < 1e-7
    # attractive U enhances the anomalous amplitude vs U=0
    assert np.max(np.abs(Fm)) > 0.01


def test_superc_finite_t_vs_lehmann():
    cfg = _cfg(uloc=(-1.2,), beta=6.0)
    cfg = cfg.replace(lanc_nstates_total=300, cutoff=1e-12, lmats=16,
                      lanc_nstates_sector=100)
    bath = _bath(cfg, seed=33)
    hloc = np.zeros((1, 1, 1, 1))
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr, Fm, Fr = build_gf_superc(cfg, slist, zeta, bath, hloc, True)
    zm = grids.z_mats(cfg)
    Gex = lehmann_gf(cfg, bath, hloc, zm, cfg.beta, True)
    np.testing.assert_allclose(Gm[0, 0, 0, 0], Gex[0, 0, 0, 0], atol=2e-6)
