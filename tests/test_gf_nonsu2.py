"""nonsu2 Green's functions: U=0 exactness (G == analytic G0, Σ == 0) plus
Lehmann comparison for the interacting spin-diagonal components."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.diag import diagonalize
from dmft_ed_tpu.gf_nonsu2 import build_gf_nonsu2, build_sigma_nonsu2
from dmft_ed_tpu.bath_fns import bath_params, g0and
from dmft_ed_tpu import grids

import reference_ed as ref
from test_gf_normal import lehmann_gf


def _cfg(**kw):
    base = dict(norb=1, nbath=3, nspin=2, ed_mode="nonsu2", uloc=(0.0,),
                beta=60.0, lmats=30, lreal=16, xmu=0.15,
                lanc_dim_threshold=10 ** 6)
    base.update(kw)
    return EDConfig(**base).validate()


def _bath(cfg, seed=41):
    rng = np.random.default_rng(seed)
    b = Bath(cfg)
    b.e[:] = np.array([-0.8, 0.0, 0.9])[None, None, :] \
        + 0.1 * rng.normal(size=b.e.shape)
    b.v[:] = rng.uniform(0.4, 0.7, size=b.v.shape)
    b.u[:] = rng.uniform(0.1, 0.35, size=b.u.shape)
    return b


def test_nonsu2_u0_matches_g0():
    cfg = _cfg()
    bath = _bath(cfg)
    hloc = np.zeros((2, 2, 1, 1), dtype=complex)
    hloc[0, 0, 0, 0] = 0.2
    hloc[1, 1, 0, 0] = -0.1
    hloc[0, 1, 0, 0] = 0.15
    hloc[1, 0, 0, 0] = 0.15
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr = build_gf_nonsu2(cfg, slist, zeta, bath, hloc, False)
    p = bath_params(bath)
    zm = jnp.asarray(grids.z_mats(cfg))
    g0 = np.asarray(g0and(cfg, zm, p, hloc))
    for s in range(2):
        for s2 in range(2):
            np.testing.assert_allclose(Gm[s, s2, 0, 0], g0[s, s2, 0, 0],
                                       atol=1e-7, err_msg=f"{s}{s2}")
    Sm, Sr, *_ = build_sigma_nonsu2(cfg, bath, hloc, Gm, Gr)
    assert np.max(np.abs(Sm)) < 1e-6


def test_nonsu2_interacting_vs_lehmann():
    cfg = _cfg(uloc=(1.4,), beta=40.0)
    bath = _bath(cfg, seed=42)
    hloc = np.zeros((2, 2, 1, 1), dtype=complex)
    hloc[0, 1, 0, 0] = 0.2 + 0.1j
    hloc[1, 0, 0, 0] = 0.2 - 0.1j
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr = build_gf_nonsu2(cfg, slist, zeta, bath, hloc, False)
    zm = grids.z_mats(cfg)
    Gex = lehmann_gf(cfg, bath, hloc, zm, cfg.beta, False)
    for s in range(2):
        np.testing.assert_allclose(Gm[s, s, 0, 0], Gex[s, s, 0, 0],
                                   atol=1e-7, err_msg=str(s))


def test_nonsu2_finite_t_vs_lehmann():
    cfg = _cfg(uloc=(1.0,), beta=5.0)
    cfg = cfg.replace(lanc_nstates_total=400, cutoff=1e-12, lmats=12,
                      lanc_nstates_sector=150)
    bath = _bath(cfg, seed=43)
    hloc = np.zeros((2, 2, 1, 1), dtype=complex)
    hloc[0, 1, 0, 0] = 0.15
    hloc[1, 0, 0, 0] = 0.15
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr = build_gf_nonsu2(cfg, slist, zeta, bath, hloc, True)
    zm = grids.z_mats(cfg)
    Gex = lehmann_gf(cfg, bath, hloc, zm, cfg.beta, True)
    for s in range(2):
        np.testing.assert_allclose(Gm[s, s, 0, 0], Gex[s, s, 0, 0],
                                   atol=2e-6, err_msg=str(s))
