"""Krylov solvers vs dense LAPACK on random Hermitian matrices and on real
sector Hamiltonians (SURVEY.md §4 unit level: 'Lanczos tridiag vs numpy
dense eigendecomposition')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmft_ed_tpu.lanczos import (lanczos_tridiag, tridiag_eigh, eigs_lanczos,
                                 lanczos_ground_state)


def _rand_herm(n, seed=0, cplx=False):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    if cplx:
        A = A + 1j * rng.normal(size=(n, n))
    return (A + A.conj().T) / 2


@pytest.mark.parametrize("cplx", [False, True])
def test_eigs_lanczos_matches_dense(cplx):
    n = 200
    A = _rand_herm(n, seed=1, cplx=cplx)
    Aj = jnp.asarray(A)
    mv = lambda v: Aj @ v
    rng = np.random.default_rng(2)
    v0 = jnp.asarray(rng.normal(size=n) + (1j * rng.normal(size=n) if cplx else 0))
    evals, evecs, niter = eigs_lanczos(mv, v0, neigen=4, ncv=20, maxiter=400,
                                       tol=1e-12)
    ref = np.linalg.eigvalsh(A)[:4]
    np.testing.assert_allclose(evals, ref, atol=1e-9)
    # eigvec residuals
    for i in range(4):
        v = np.asarray(evecs[i])
        r = A @ v - evals[i] * v
        assert np.linalg.norm(r) < 1e-7, (i, np.linalg.norm(r))


def test_eigs_lanczos_degenerate():
    """Doubly-degenerate ground state must yield both copies."""
    n = 120
    A = _rand_herm(n, seed=3)
    w, U = np.linalg.eigh(A)
    w[1] = w[0]  # force degeneracy
    A = (U * w) @ U.T
    mv = lambda v: jnp.asarray(A) @ v
    v0 = jnp.asarray(np.random.default_rng(4).normal(size=n))
    evals, evecs, _ = eigs_lanczos(mv, v0, neigen=3, ncv=18, maxiter=600)
    np.testing.assert_allclose(evals[:2], [w[0], w[0]], atol=1e-8)


def test_lanczos_tridiag_spectrum():
    """Eigenvalues of the Lanczos tridiagonal converge to extremal evals."""
    n = 300
    A = _rand_herm(n, seed=5)
    mv = lambda v: jnp.asarray(A) @ v
    v0 = np.random.default_rng(6).normal(size=n)
    v0 = jnp.asarray(v0 / np.linalg.norm(v0))
    al, be, ns = lanczos_tridiag(mv, v0, 80)
    ns = int(ns)
    evals, _ = tridiag_eigh(np.asarray(al[:ns]), np.asarray(be[:ns]))
    dense = np.linalg.eigvalsh(A)
    assert abs(evals[0] - dense[0]) < 1e-8
    assert abs(evals[-1] - dense[-1]) < 1e-8


def test_lanczos_tridiag_breakdown():
    """Krylov space smaller than niter: clean breakdown, exact spectrum."""
    A = np.diag([1.0, 2.0, 3.0])
    mv = lambda v: jnp.asarray(A) @ v
    v0 = jnp.asarray(np.ones(3) / np.sqrt(3))
    al, be, ns = lanczos_tridiag(mv, v0, 10)
    ns = int(ns)
    assert ns == 3
    evals, _ = tridiag_eigh(np.asarray(al[:ns]), np.asarray(be[:ns]))
    np.testing.assert_allclose(evals, [1, 2, 3], atol=1e-10)


def test_ground_state_two_pass():
    n = 150
    A = _rand_herm(n, seed=7)
    mv = lambda v: jnp.asarray(A) @ v
    v0 = np.random.default_rng(8).normal(size=n)
    v0 = jnp.asarray(v0 / np.linalg.norm(v0))
    e0, gs = lanczos_ground_state(mv, v0, niter=150)
    dense = np.linalg.eigvalsh(A)
    assert abs(e0 - dense[0]) < 1e-8
    r = A @ np.asarray(gs) - e0 * np.asarray(gs)
    assert np.linalg.norm(r) < 1e-5


def test_diag_plain_lanczos_dispatch():
    """lanc_method='lanczos' (plain T=0 path) through the sector sweep."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from dmft_ed_tpu.config import EDConfig
    from dmft_ed_tpu.bath import Bath
    from dmft_ed_tpu.diag import diagonalize
    for method in ("arpack", "lanczos"):
        cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(2.0,),
                       lanc_method=method, lanc_dim_threshold=8).validate()
        rng = np.random.default_rng(14)
        bath = Bath(cfg)
        bath.e[:] = np.linspace(-1, 1, 4)[None, None, :]
        bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
        hloc = np.zeros((1, 1, 1, 1))
        slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
        if method == "arpack":
            e_ref = slist.emin
        else:
            assert abs(slist.emin - e_ref) < 1e-8


def test_plain_lanczos_stacked_bucket_matches_serial(monkeypatch):
    """The stacked plain-Lanczos bucket path (_solve_deferred_plain:
    zero-embedded lockstep tridiag + masked stacked rebuild) must
    reproduce the serial per-sector two-pass solves exactly — same
    spectrum, same ground-state vectors up to phase (VERDICT-r5 sweep
    batching; forced on the CPU backend via DMFT_ED_RAGGED=1)."""
    from dmft_ed_tpu.config import EDConfig
    from dmft_ed_tpu.bath import Bath
    from dmft_ed_tpu.diag import diagonalize
    from dmft_ed_tpu.observables import compute_observables

    res = {}
    for ragged in ("0", "1"):
        monkeypatch.setenv("DMFT_ED_RAGGED", ragged)
        cfg = EDConfig(norb=1, nbath=5, nspin=1, uloc=(2.0,), xmu=0.12,
                       lanc_method="lanczos", lanc_dim_threshold=16,
                       lanc_niter=200, beta=50.0).validate()
        rng = np.random.default_rng(21)
        bath = Bath(cfg)
        bath.e[:] = np.linspace(-1.1, 0.9, cfg.nbath)[None, None, :]
        bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
        hloc = np.zeros((1, 1, 1, 1))
        slist, zeta, st = diagonalize(cfg, bath, hloc, None)
        obs = compute_observables(cfg, slist, zeta, bath, hloc, False)
        res[ragged] = (slist.emin, zeta, obs.dens.copy(), obs.docc.copy(),
                       dict(st.lanc_niter_sector))
    assert abs(res["0"][0] - res["1"][0]) < 1e-10
    assert abs(res["0"][1] - res["1"][1]) < 1e-10
    np.testing.assert_allclose(res["1"][2], res["0"][2], atol=1e-9)
    np.testing.assert_allclose(res["1"][3], res["0"][3], atol=1e-9)
    # adaptive-niter memory populated on both routes
    assert res["0"][4] and res["1"][4]


def test_plain_lanczos_adaptive_second_sweep(monkeypatch):
    """A hinted (shortened) second sweep reproduces the first sweep's
    ground state on both the serial and stacked routes."""
    from dmft_ed_tpu.config import EDConfig
    from dmft_ed_tpu.bath import Bath
    from dmft_ed_tpu.diag import diagonalize

    for ragged in ("0", "1"):
        monkeypatch.setenv("DMFT_ED_RAGGED", ragged)
        cfg = EDConfig(norb=1, nbath=5, nspin=1, uloc=(2.0,), xmu=0.12,
                       lanc_method="lanczos", lanc_dim_threshold=16,
                       lanc_niter=200, beta=50.0).validate()
        rng = np.random.default_rng(22)
        bath = Bath(cfg)
        bath.e[:] = np.linspace(-1.1, 0.9, cfg.nbath)[None, None, :]
        bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
        hloc = np.zeros((1, 1, 1, 1))
        slist1, _, st = diagonalize(cfg, bath, hloc, None)
        slist2, _, st = diagonalize(cfg, bath, hloc, st)
        assert abs(slist1.emin - slist2.emin) < 1e-10
        v1 = np.asarray(slist1.states[0].get_vector())
        v2 = np.asarray(slist2.states[0].get_vector())
        assert abs(abs(np.vdot(v1, v2)) - 1.0) < 1e-8


def test_sweep_factored_diagonal_bit_identical():
    """The sweep engine's device-rebuilt diagonals (round-5 factored
    transfer: per-(spin, n) occupation factors + W instead of the dense
    [ddw, dup] blocks) must be BIT-identical to the host
    materialization (SectorHamiltonian.diag) on a native-f64 backend —
    same expression, same add order. Exercises W off-diagonals
    (ust), the same-spin (ust-jh) term and the hfmode constant with
    norb=2."""
    import jax.numpy as jnp
    from dmft_ed_tpu.config import EDConfig
    from dmft_ed_tpu.bath import Bath
    from dmft_ed_tpu.sectors import sector_table
    from dmft_ed_tpu.hamiltonian import build_sector_hamiltonian
    from dmft_ed_tpu.sweep_plain import (sweep_supported, make_sweep_op,
                                         sweep_tridiag, _sweep_applier)

    cfg = EDConfig(norb=2, nbath=2, nspin=1, uloc=(2.0, 1.5), ust=0.8,
                   jh=0.2, hfmode=True, beta=50.0).validate()
    rng = np.random.default_rng(31)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1.0, 1.0, bath.e.shape[-1])[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.1, -0.1])
    tbl = sector_table(cfg)
    hams = [build_sector_hamiltonian(cfg, s, bath, hloc)
            for s in tbl.sectors
            if s.dim > 1 and len(s.blocks) == 1][:10]
    assert sweep_supported(cfg, hams)
    spec, arrays = make_sweep_op(cfg, hams)
    assert spec[7] is not None, "factored-diagonal path not taken"
    prepare, _ = _sweep_applier(spec)
    Ds = prepare(arrays)
    for h, D in zip(hams, Ds):
        assert np.array_equal(np.asarray(D), h.diag[0])
    # and the lockstep solve over the factored operators still matches
    # the dense spectrum
    V0 = tuple(jnp.asarray(rng.standard_normal(
        (h.sector.blocks[0].ddw, h.sector.blocks[0].dup))) for h in hams)
    V0 = tuple(v / jnp.linalg.norm(v) for v in V0)
    al, be, ns = sweep_tridiag(spec, arrays, 60, V0)
    al, be, ns = np.asarray(al), np.asarray(be), np.asarray(ns)
    from dmft_ed_tpu.hamiltonian import assemble_dense
    for s, h in enumerate(hams):
        n = min(int(ns[s]), h.dim)
        T = (np.diag(al[:n, s]) + np.diag(be[1:n, s], 1)
             + np.diag(be[1:n, s], -1))
        e0 = np.linalg.eigvalsh(T)[0]
        e0d = np.linalg.eigvalsh(assemble_dense(h))[0]
        assert n < h.dim or abs(e0 - e0d) < 1e-8
