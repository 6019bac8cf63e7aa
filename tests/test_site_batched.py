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


def test_diagonalize_sites_large_sector_stacked_lanczos():
    """dim > lanc_dim_threshold sectors route through ONE lockstep stacked
    thick-restart (eigs_lanczos_op_stacked) — ground states must match the
    per-site sweep to Lanczos tolerance (VERDICT round 1, item 5)."""
    cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(1.8,), beta=50.0,
                   lanc_dim_threshold=24).validate()   # dims up to 100
    rng = np.random.default_rng(121)
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
        assert abs(sl_b[i].emin - sl.emin) < 1e-9, i
        assert abs(z_b[i] - z) < 1e-8
        assert (next(iter(sl_b[i])).sector.index
                == next(iter(sl)).sector.index)


def test_resolvent_batch_groups_across_sectors(monkeypatch):
    """Channels targeting DIFFERENT but equal-shape sectors (e.g. the
    (nup+1,ndw) and (nup,ndw+1) mirrors) must merge into ONE stacked
    Lanczos call (TODO round 1: cross-sector GF batching)."""
    import jax.numpy as jnp
    from dmft_ed_tpu import lanczos as lz
    from dmft_ed_tpu import gf_common
    from dmft_ed_tpu.gf_common import ResolventBatch, HamCache
    from dmft_ed_tpu.sectors import sector_table

    cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(2.0,)).validate()
    rng = np.random.default_rng(5)
    b = Bath(cfg)
    b.e[:] = np.linspace(-1, 1, 4)
    b.v[:] = 0.5
    hloc = np.zeros((1, 1, 1, 1))
    table = sector_table(cfg)
    s1, s2 = table.get(2, 3), table.get(3, 2)   # equal-shape mirrors
    cache = HamCache(cfg, b, hloc)
    batch = ResolventBatch(cfg, cache, egs=0.0, zeta=1.0, finite_t=False)
    batch.add(s1, rng.normal(size=s1.dim), 0.0, {"c": 1})
    batch.add(s2, rng.normal(size=s2.dim), 0.0, {"c": 2})
    calls = []
    orig = lz.lanczos_tridiag_op_stacked

    def spy(spec, blocks, arrays_stacked, V0, niter):
        calls.append(V0.shape)
        return orig(spec, blocks, arrays_stacked, V0, niter)

    monkeypatch.setattr(lz, "lanczos_tridiag_op_stacked", spy)
    out = list(batch.run())
    assert len(out) == 2
    assert len(calls) == 1, calls          # ONE stacked call for both
    assert calls[0][0] == 2                # both sectors on the stack axis


def test_diagonalize_sites_twin(tmp_path, monkeypatch):
    """ed_twin on the site-batched sweep: twin sectors are skipped (solved
    count halves) and the spectrum matches the full sweep
    (ED_DIAG.f90:71-101 under the lattice loop; VERDICT r2 missing #5)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(121)
    nsites = 2
    hlocs = [np.zeros((1, 1, 1, 1)) for _ in range(nsites)]
    out = {}
    for tw in (False, True):
        cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(2.0,), beta=50.0,
                       ed_twin=tw, lanc_dim_threshold=4096).validate()
        baths = []
        rng = np.random.default_rng(121)
        for i in range(nsites):
            b = Bath(cfg)
            # ph/spin-symmetric bath so twin sectors are exact mirrors
            b.e[:] = np.array([-0.8, 0.0, 0.8])[None, None, :]
            b.v[:] = rng.uniform(0.3, 0.8, size=b.v.shape)
            baths.append(b)
        out[tw] = diagonalize_sites(cfg, baths, hlocs)
    sl_f, z_f, _ = out[False]
    sl_t, z_t, _ = out[True]
    for i in range(nsites):
        assert abs(sl_t[i].emin - sl_f[i].emin) < 1e-10
        assert abs(z_t[i] - z_f[i]) < 1e-9
        assert len(sl_t[i]) == len(sl_f[i])
        # twin-reconstructed states produce identical sector coverage
        secs_f = sorted(s.sector.index for s in sl_f[i])
        secs_t = sorted(s.sector.index for s in sl_t[i])
        assert secs_f == secs_t


def test_cross_site_batched_gf_nonsu2(tmp_path, monkeypatch):
    """nonsu2 lattices (the SOC/isoc class) batch the GF pass across sites
    like normal/superc — shared ResolventBatch == per-site build_gf_nonsu2
    (VERDICT r2 missing #4; ED_GF_NONSU2.f90 under ED_MAIN.f90:576-678)."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.gf_nonsu2 import build_gf_nonsu2
    from dmft_ed_tpu.lattice_solver import LatticeEDSolver
    cfg = EDConfig(norb=1, nbath=3, nspin=2, uloc=(1.5,), ed_mode="nonsu2",
                   beta=60.0, lmats=40, lreal=16, lanc_dim_threshold=4096,
                   ed_print_sigma=False, ed_print_g=False,
                   ed_print_g0=False).validate()
    rng = np.random.default_rng(9)
    nsites = 2
    hloc_ineq = np.zeros((nsites, 2, 2, 1, 1))
    for i in range(nsites):
        hloc_ineq[i, 0, 1, 0, 0] = hloc_ineq[i, 1, 0, 0, 0] = \
            0.15 + 0.05 * i                      # spin-mixing per site
    lsolver = LatticeEDSolver(cfg, hloc_ineq, log=lambda m: None)
    baths = lsolver.init_solvers()
    for i in range(nsites):
        baths[i] += 0.05 * rng.normal(size=baths[i].shape)
    results = lsolver.solve(baths, batched=True)
    from dmft_ed_tpu.diag import diagonalize
    for i, s in enumerate(lsolver.solvers):
        ub = unpack_bath(cfg, baths[i], s.mask)
        sl, z, _ = diagonalize(cfg, ub, s.hloc, None)
        finite_t = (cfg.finite_t or s.diag_state.lanc_nstates_total > 1) \
            and len(sl) > 1
        gm, gr = build_gf_nonsu2(cfg, sl, z, ub, s.hloc, finite_t)
        np.testing.assert_allclose(results[i].gmats, gm, atol=1e-10)
        np.testing.assert_allclose(results[i].greal, gr, atol=1e-10)


def test_diagonalize_sites_finite_t_post_diag(tmp_path, monkeypatch):
    """Finite-T lattice equivalence: the batched site sweep must run the
    FULL per-site post-diag machinery (Boltzmann trimming, neigen_sector
    feedback, lanc_nstates_total auto-tuning, eigenvalues/histogram files;
    ED_DIAG.f90:445-566) and track the per-site `diagonalize` loop
    including the DiagState evolution across 2 DMFT iterations."""
    import copy
    from dmft_ed_tpu.diag import DiagState

    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(2.0,), beta=5.0,
                   lanc_nstates_total=12, lanc_nstates_sector=4,
                   cutoff=1e-6, lanc_dim_threshold=10 ** 9).validate()
    rng = np.random.default_rng(42)
    nsites = 2
    baths, hlocs = [], []
    for i in range(nsites):
        b = Bath(cfg)
        b.e[:] = np.sort(rng.normal(size=b.e.shape), axis=-1)
        b.v[:] = rng.uniform(0.3, 0.8, size=b.v.shape)
        baths.append(b)
        h = np.zeros((1, 1, 1, 1))
        h[0, 0, 0, 0] = rng.normal() * 0.4
        hlocs.append(h)

    # --- batched path, 2 iterations carrying DiagState
    st_b = [None] * nsites
    for _ in range(2):
        sl_b, z_b, st_b = diagonalize_sites(cfg, baths, hlocs, states=st_b)
    # per-site eigenvalues/histogram files written with _ineq suffixes
    assert (tmp_path / "eigenvalues_list_ineq0001.ed").exists()
    assert (tmp_path / "histogram_states_ineq0001.ed").exists()

    # --- per-site reference path (same suffixes -> same restart masks)
    sl_r, z_r, st_r = [], [], []
    for i in range(nsites):
        st = None
        for _ in range(2):
            sl, z, st = diagonalize(cfg, baths[i], hlocs[i], st,
                                    suffix=f"_ref{i:04d}")
        sl_r.append(sl)
        z_r.append(z)
        st_r.append(st)

    for i in range(nsites):
        assert len(sl_b[i]) == len(sl_r[i]), i
        np.testing.assert_allclose(
            sorted(s.energy for s in sl_b[i]),
            sorted(s.energy for s in sl_r[i]), atol=1e-10)
        np.testing.assert_allclose(z_b[i], z_r[i], rtol=1e-12)
        # the DiagState evolution (the adaptive machinery) must match
        assert st_b[i].lanc_nstates_total == st_r[i].lanc_nstates_total, i
        assert st_b[i].neigen_sector == st_r[i].neigen_sector, i


def test_cross_site_batched_chi_matches_per_site(tmp_path, monkeypatch):
    """LatticeEDSolver's cross-site batched chi pass (one ResolventBatch
    with site-tagged probe channels) == per-site build_chi_* exactly."""
    from dmft_ed_tpu.chi import (build_chi_spin, build_chi_dens,
                                 build_chi_dens_mix, build_chi_pair)
    from dmft_ed_tpu.lattice_solver import LatticeEDSolver

    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=2, nbath=2, nspin=1, uloc=(1.5, 1.2), ust=0.6,
                   beta=40.0, lmats=16, lreal=8, ltau=20,
                   chispin_flag=True, chidens_flag=True, chipair_flag=True,
                   lanc_dim_threshold=4096, ed_print_sigma=False,
                   ed_print_g=False, ed_print_g0=False).validate()
    rng = np.random.default_rng(17)
    nsites = 3
    hloc_ineq = np.zeros((nsites, 1, 1, 2, 2))
    for i in range(nsites):
        hloc_ineq[i, 0, 0] = np.diag(rng.normal(size=2) * 0.3)
    lsolver = LatticeEDSolver(cfg, hloc_ineq, log=lambda m: None)
    baths = lsolver.init_solvers()
    for i in range(nsites):
        baths[i] += 0.05 * rng.normal(size=baths[i].shape)
    results = lsolver.solve(baths, batched=True)
    for i, s in enumerate(lsolver.solvers):
        ub = unpack_bath(cfg, baths[i], s.mask)
        sl, z, _ = diagonalize(cfg, ub, s.hloc, None)
        finite_t = (cfg.finite_t or s.diag_state.lanc_nstates_total > 1) \
            and len(sl) > 1
        for kind, fn, got in (
                ("spin", build_chi_spin, results[i].chi_spin),
                ("dens", build_chi_dens, results[i].chi_dens),
                ("dens_mix", build_chi_dens_mix, results[i].chi_dens_mix),
                ("pair", build_chi_pair, results[i].chi_pair)):
            ref = fn(cfg, sl, z, ub, s.hloc, finite_t)
            for a, b in zip(got, ref):
                np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10,
                                           err_msg=f"site {i} chi {kind}")
