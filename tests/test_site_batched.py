"""Site-batched sweep equals the per-site sweep (lattice DP axis)."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath, unpack_bath, pack_bath
from dmft_ed_tpu.diag import diagonalize, diagonalize_sites


def test_diagonalize_sites_matches_loop():
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(2.0,), beta=50.0,
                   lanc_dim_threshold=4096).validate()
    rng = np.random.default_rng(120)
    nsites = 3
    baths, hlocs = [], []
    for i in range(nsites):
        b = Bath(cfg)
        b.e[:] = np.sort(rng.normal(size=b.e.shape), axis=-1)
        b.v[:] = rng.uniform(0.3, 0.8, size=b.v.shape)
        baths.append(b)
        h = np.zeros((1, 1, 1, 1))
        h[0, 0, 0, 0] = rng.normal() * 0.3
        hlocs.append(h)
    sl_b, z_b, _ = diagonalize_sites(cfg, baths, hlocs)
    for i in range(nsites):
        sl, z, _ = diagonalize(cfg, baths[i], hlocs[i], None)
        assert abs(sl_b[i].emin - sl.emin) < 1e-10, i
        assert abs(z_b[i] - z) < 1e-10
        assert len(sl_b[i]) == len(sl)


def test_cross_site_batched_gf_matches_per_site():
    """LatticeEDSolver's shared-batch GF pass (stacked operator axis) ==
    per-site build_gf_normal, exactly."""
    from dmft_ed_tpu.gf_normal import build_gf_normal
    from dmft_ed_tpu.lattice_solver import LatticeEDSolver
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(1.5,), beta=60.0,
                   lmats=60, lreal=20, lanc_dim_threshold=4096,
                   ed_print_sigma=False, ed_print_g=False,
                   ed_print_g0=False).validate()
    rng = np.random.default_rng(7)
    nsites = 3
    hloc_ineq = rng.normal(size=(nsites, 1, 1, 1, 1)) * 0.3
    lsolver = LatticeEDSolver(cfg, hloc_ineq, log=lambda m: None)
    baths = lsolver.init_solvers()
    for i in range(nsites):
        baths[i] += 0.05 * rng.normal(size=baths[i].shape)
    results = lsolver.solve(baths, batched=True)
    for i, s in enumerate(lsolver.solvers):
        ub = unpack_bath(cfg, baths[i], s.mask)
        from dmft_ed_tpu.diag import diagonalize
        sl, z, _ = diagonalize(cfg, ub, s.hloc, None)
        finite_t = (cfg.finite_t or s.diag_state.lanc_nstates_total > 1) \
            and len(sl) > 1
        gm, gr = build_gf_normal(cfg, sl, z, ub, s.hloc, finite_t)
        np.testing.assert_allclose(results[i].gmats, gm, atol=1e-10)
        np.testing.assert_allclose(results[i].greal, gr, atol=1e-10)
