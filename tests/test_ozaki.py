"""Ozaki int8-digit matmul: accuracy vs f64 and matvec integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmft_ed_tpu import ozaki
from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.sectors import sector_table
from dmft_ed_tpu.hamiltonian import (build_sector_hamiltonian, make_matvec,
                                     flatten_blocks, unflatten_blocks)


def test_matmul_accuracy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(120, 300)) * np.exp(rng.normal(size=(120, 1)) * 4)
    B = rng.normal(size=(300, 80)) * np.exp(rng.normal(size=(1, 80)) * 4)
    exact = A @ B
    scale = np.max(np.abs(exact))
    for ns, bits, tol in [(4, 6, 1e-5), (6, 6, 1e-9), (8, 6, 1e-12),
                          (4, 7, 1e-6), (5, 7, 1e-9)]:
        got = np.asarray(ozaki.matmul(jnp.asarray(A), jnp.asarray(B),
                                      ns, bits))
        assert np.max(np.abs(got - exact)) / scale < tol, (ns, bits)


def test_parse_precision():
    assert ozaki.parse_precision("ozaki6") == (6, 6)
    assert ozaki.parse_precision("ozaki") == (6, 6)
    assert ozaki.parse_precision("ozaki5x7") == (5, 7)
    with pytest.raises(ValueError):
        ozaki.parse_precision("ozaki5x8")   # 8-bit digits overflow int8


@pytest.mark.parametrize("ns,bits", [(6, 6), (5, 7)])
def test_sliced_operands(ns, bits):
    rng = np.random.default_rng(1)
    A = rng.normal(size=(90, 90))
    B = rng.normal(size=(90, 90))
    exact = A @ B
    left = ozaki.SlicedMatrix(A, ns, bits)
    got = np.asarray(ozaki.sliced_matmul(left.digits, left.scales,
                                         jnp.asarray(B), ns, bits))
    np.testing.assert_allclose(got, exact, atol=1e-9 * np.max(np.abs(exact)))
    right = ozaki.SlicedRightOperand(B, ns, bits)
    got2 = np.asarray(ozaki.right_sliced_matmul(jnp.asarray(A), right.digits,
                                                right.scales, ns, bits))
    np.testing.assert_allclose(got2, exact, atol=1e-9 * np.max(np.abs(exact)))


@pytest.mark.parametrize("prec", ["ozaki6", "ozaki5x7"])
def test_matvec_ozaki_vs_native(prec):
    cfg = EDConfig(norb=1, nbath=6, nspin=1, uloc=(2.0,),
                   matmul_precision=prec).validate()
    rng = np.random.default_rng(2)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, cfg.nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(3, 4)
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
    mv_oz, _ = make_matvec(ham, cfg)
    mv_f64, _ = make_matvec(ham, cfg.replace(matmul_precision="native"))
    x = rng.normal(size=sec.dim)
    V = unflatten_blocks(jnp.asarray(x), sec)
    y1 = np.asarray(flatten_blocks(jax.jit(mv_oz)(V)))
    y2 = np.asarray(flatten_blocks(jax.jit(mv_f64)(V)))
    np.testing.assert_allclose(y1, y2, atol=1e-9 * np.max(np.abs(y2)))


def test_pairwise_fallback_chunked(monkeypatch):
    """Large-K pairwise fallback: each (p, q) product must enter the f32
    TwoSum pair individually (an int32 GROUP sum can wrap exactly in the
    regime where the fallback is selected), chunking the contraction axis
    when even single products could exceed 2^31. Force both paths with a
    tiny synthetic int32 limit."""
    rng = np.random.default_rng(5)
    # unique shape to dodge jit caches compiled with the real limit
    A = rng.normal(size=(31, 97))
    B = rng.normal(size=(97, 29))
    exact = A @ B
    monkeypatch.setattr(ozaki, "_INT32_LIM", 1024.0 * 40)  # kmax = 39 < 97
    got = np.asarray(ozaki.matmul(jnp.asarray(A), jnp.asarray(B), 6))
    assert np.max(np.abs(got - exact)) / np.max(np.abs(exact)) < 1e-9


@pytest.mark.slow
@pytest.mark.parametrize("ns,bits,K", [(6, 6, 400_000), (5, 7, 120_000)])
def test_pairwise_fallback_natural_k(ns, bits, K):
    """K past the _cat_safe bound engages the fallback with the real
    int32 limit; adversarial values hit the max digit magnitude 2^{bits-1}
    on the two leading digits (the case where an int32 group accumulation
    could wrap): r = 1/2 - 2^{-bits-1} slices to digits (D, -D, 0, ...)."""
    rng = np.random.default_rng(6)
    assert not ozaki._cat_safe(K, ns, bits)
    v = 0.5 - 2.0 ** (-bits - 1)
    A = np.where(rng.random((4, K)) < 0.5, v, -v)
    B = np.where(rng.random((K, 4)) < 0.5, v, -v)
    exact = A @ B
    got = np.asarray(ozaki.matmul(jnp.asarray(A), jnp.asarray(B), ns, bits))
    assert np.max(np.abs(got - exact)) / np.max(np.abs(exact)) < 1e-9


@pytest.mark.slow
def test_ozaki_dmft_physics_impact():
    """matmul_precision='ozaki6' must not change the physics — the
    correctness bar the reference sets with CPU BLAS dgemm (VERDICT round
    1, item 6). Two comparisons against the exact-f64 matvec, with the
    Lanczos thresholds forced low so the ozaki path carries both the
    spectrum and the GF Krylov chains:

    (1) one full ed_solve at a FIXED bath: docc/egs/G(iw) to ~1e-9;
    (2) one full DMFT iteration (solve + Gloc + Weiss + chi2 fit + solve
        map applied once): docc to ~1e-10, Sigma(iw1) to ~1e-8.

    Longer trajectories CANNOT be compared at this precision — measured on
    this config, the Nbath=4 chi^2 valley is ~1e-3 flat in Delta(iw), so
    any perturbation (ozaki rounding, a different Lanczos seed) walks the
    fit to a different but equivalent bath within ~2 iterations; the
    per-application ozaki effect measured here (1e-13 on docc) is 10
    orders below that discretization floor."""
    import os
    import tempfile
    from dmft_ed_tpu.solver import EDSolver
    from dmft_ed_tpu.models import hm_bethe

    def mkcfg(prec, **kw):
        return EDConfig(norb=1, nbath=4, nspin=1, uloc=(2.0,), beta=50.0,
                        lmats=256, lreal=32, lanc_dim_threshold=8,
                        dense_matmul_threshold=4096, matmul_precision=prec,
                        ed_verbose=0, **kw).validate()

    # --- (1) fixed-bath solve
    results = {}
    for prec in ("ozaki6", "native"):
        cfg = mkcfg(prec)
        hloc = np.zeros((1, 1, 1, 1))
        s = EDSolver(cfg, hloc, log=lambda m: None)
        b = Bath(cfg)
        b.e[:] = np.array([-0.9, -0.2, 0.2, 0.9])
        b.v[:] = np.array([0.4, 0.5, 0.5, 0.4])
        from dmft_ed_tpu.bath import pack_bath
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as d:
            os.chdir(d)
            try:
                results[prec] = s.solve(pack_bath(b))
            finally:
                os.chdir(cwd)
    r_oz, r_f64 = results["ozaki6"], results["native"]
    np.testing.assert_allclose(r_oz.egs, r_f64.egs, atol=1e-9)
    np.testing.assert_allclose(r_oz.observables.docc, r_f64.observables.docc,
                               atol=1e-9)
    np.testing.assert_allclose(r_oz.gmats, r_f64.gmats, atol=1e-8)

    # --- (2) one application of the full DMFT map
    traj = {}
    for prec in ("ozaki6", "native"):
        cfg = mkcfg(prec, nloop=1, dmft_error=1e-15)
        cwd = os.getcwd()
        with tempfile.TemporaryDirectory() as d:
            os.chdir(d)
            try:
                traj[prec] = hm_bethe.run(cfg, le=300, wmixing=0.5)
            finally:
                os.chdir(cwd)
    t_oz, t_f64 = traj["ozaki6"], traj["native"]
    assert t_oz.iterations == t_f64.iterations == 1
    np.testing.assert_allclose(t_oz.docc, t_f64.docc, atol=1e-10)
    np.testing.assert_allclose(t_oz.smats[0, 0, 0, 0, 0],
                               t_f64.smats[0, 0, 0, 0, 0], atol=1e-8)


def test_fused_two_sided_matmul():
    """ozaki.fused_two_sided: [Hdw | lam*V] @ [lam*V; HupT] must equal
    Hdw@V + V@HupT to the digit-truncation class, including when |V| is
    orders below |H| (the normalized-Krylov regime the lambda equalizer
    exists for)."""
    rng = np.random.default_rng(3)
    for (m, k), vscale in [((120, 80), 1.0), ((90, 90), 1e-5)]:
        Hdw = rng.normal(size=(m, m)) * 4
        HupT = rng.normal(size=(k, k)) * 4
        V = rng.normal(size=(m, k)) * vscale
        exact = Hdw @ V + V @ HupT
        for ns, bits in [(5, 7), (6, 6)]:
            got = np.asarray(ozaki.fused_two_sided(
                jnp.asarray(Hdw), jnp.asarray(HupT), jnp.asarray(V),
                ns, bits))
            rel = np.max(np.abs(got - exact)) / np.max(np.abs(exact))
            assert rel < 3e-9, (m, k, vscale, ns, bits, rel)


@pytest.mark.parametrize("prec", ["ozaki5x7"])
def test_matvec_op_fused_vs_native(prec, monkeypatch):
    """make_matvec_op with DMFT_ED_OZAKI_FUSED=1 (default) encodes the
    single-block spin parts as ONE fused two-orientation product ('ozf'
    spec) and matches the native-f64 matvec; =0 restores the separate
    pre-sliced products with identical results."""
    from dmft_ed_tpu.hamiltonian import make_matvec_op, apply_op
    from dmft_ed_tpu import device as dev_mod

    cfg = EDConfig(norb=1, nbath=6, nspin=1, uloc=(2.0,),
                   matmul_precision=prec).validate()
    rng = np.random.default_rng(4)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, cfg.nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(3, 4)
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
    x = rng.normal(size=sec.dim)
    x /= np.linalg.norm(x)
    V = unflatten_blocks(jnp.asarray(x), sec)

    spec_n, arr_n, _ = make_matvec_op(ham, cfg.replace(
        matmul_precision="native"))
    y_ref = np.asarray(flatten_blocks(apply_op(spec_n, arr_n, V)))

    dev_mod.ozaki_fused.cache_clear()
    monkeypatch.setenv("DMFT_ED_OZAKI_FUSED", "1")
    spec_f, arr_f, _ = make_matvec_op(ham, cfg)
    assert any(s[0] == "ozf" for s in spec_f[3]), spec_f[3]
    y_f = np.asarray(flatten_blocks(apply_op(spec_f, arr_f, V)))
    np.testing.assert_allclose(y_f, y_ref, atol=3e-9 * np.max(np.abs(y_ref)))

    dev_mod.ozaki_fused.cache_clear()
    monkeypatch.setenv("DMFT_ED_OZAKI_FUSED", "0")
    spec_s, arr_s, _ = make_matvec_op(ham, cfg)
    assert all(s[0] != "ozf" for s in spec_s[3])
    y_s = np.asarray(flatten_blocks(apply_op(spec_s, arr_s, V)))
    np.testing.assert_allclose(y_s, y_ref, atol=3e-9 * np.max(np.abs(y_ref)))
    dev_mod.ozaki_fused.cache_clear()


def test_digit_extraction_exactness_properties():
    """The digit extraction must be robust WITHOUT exact f64 elementwise
    arithmetic (the TPU backend's emulated f64 is ~2-ulp pair arithmetic
    whose round() collapses per-word at ties — measured round 4, see
    _digits_list): digits bounded (never near the int8 wrap), and the
    truncated reconstruction exact to the 2^{-bits*P} class, including on
    adversarial near-tie inputs."""
    rng = np.random.default_rng(9)
    vals = np.concatenate([
        rng.normal(size=4000) * np.exp(rng.normal(size=4000) * 6),
        # f32-boundary adversarial: x = (n + 1/2 + eps) * 2^-24 patterns
        (rng.integers(-2**23, 2**23, 2000) + 0.5) * 2.0 ** -24,
        (rng.integers(-2**23, 2**23, 2000)
         + rng.normal(0, 1e-8, 2000)) * 2.0 ** -24,
        [0.0, 1.0, -1.0, 0.5, 2.0 ** -30, -2.0 ** 40],
    ])
    A = vals.reshape(2, -1)
    for ns, bits in [(5, 7), (6, 6)]:
        ds, sc = ozaki._digits_list(jnp.asarray(A), ns, scale_axis=1,
                                    bits=bits)
        ds = [np.asarray(d).astype(np.int64) for d in ds]
        sc = np.asarray(sc)
        dmax = (1 << (bits - 1)) + 1
        for d in ds:
            assert np.max(np.abs(d)) <= dmax, (ns, bits, np.max(np.abs(d)))
        rec = sum(d * 2.0 ** (-bits * (p + 1)) for p, d in enumerate(ds))
        rec = rec * sc
        err = np.abs(rec - A)
        # bound: scale * 2^{-bits*ns} * (1/2 + slack) + second-word tail
        bound = np.broadcast_to(sc, A.shape) * (2.0 ** (-bits * ns)) \
            * 0.75 + np.abs(A) * 2.0 ** -45
        assert np.all(err <= bound), (ns, bits, np.max(err / bound))
