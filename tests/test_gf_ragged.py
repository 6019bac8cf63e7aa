"""Ragged-sector resolvent batching: different-dimension GF target sectors
zero-embed into one bucket shape and run as ONE stacked Lanczos scan
(gf_common.ResolventBatch._run_ragged). Exactness bar: identical results to
the serial per-sector path, which is itself Lehmann-validated
(ED_GF_NORMAL.f90:580-632 per-channel serial chains in the reference)."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.diag import diagonalize
from dmft_ed_tpu.gf_normal import build_gf_normal
from dmft_ed_tpu import gf_common


def _cfg(**kw):
    base = dict(norb=1, nbath=4, nspin=2, uloc=(2.0,), beta=50.0,
                lmats=24, lreal=8, wini=-3, wfin=3, eps=0.05,
                lanc_dim_threshold=4096, xmu=0.15)
    base.update(kw)
    return EDConfig(**base).validate()


def _bath(cfg, seed=7):
    rng = np.random.default_rng(seed)
    b = Bath(cfg)
    b.e[:] = rng.normal(size=b.e.shape) * 0.7
    b.v[:] = rng.uniform(0.3, 0.8, size=b.v.shape)
    return b


def _gf_with_spy(cfg, bath, hloc, finite_t, monkeypatch, disable=False):
    """Counts the batched GF routes: the wide-concat sweep backend
    (_run_sweep_concat, round 5) or the zero-embedded ragged buckets
    (_run_ragged); disable=True forces the serial/stacked baseline."""
    calls = {"batched": 0}
    monkeypatch.setenv("DMFT_ED_RAGGED", "1")  # tests run host-only
    if disable:
        monkeypatch.setattr(gf_common.ResolventBatch, "_bucket_key",
                            lambda self, e: None)
        monkeypatch.setattr(gf_common.ResolventBatch, "_run_sweep_concat",
                            lambda self, entries: iter(()))
    else:
        orig_r = gf_common.ResolventBatch._run_ragged
        orig_s = gf_common.ResolventBatch._run_sweep_concat

        def spy_r(self, ents, ddw_pad, dup_pad):
            calls["batched"] += 1
            return orig_r(self, ents, ddw_pad, dup_pad)

        def spy_s(self, entries):
            n0 = len(entries)
            yield from orig_s(self, entries)
            if len(entries) < n0:
                calls["batched"] += 1

        monkeypatch.setattr(gf_common.ResolventBatch, "_run_ragged", spy_r)
        monkeypatch.setattr(gf_common.ResolventBatch, "_run_sweep_concat",
                            spy_s)
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr = build_gf_normal(cfg, slist, zeta, bath, hloc, finite_t)
    return Gm, Gr, calls["batched"]


@pytest.mark.parametrize("finite_t", [False, True])
def test_ragged_matches_serial(finite_t, monkeypatch):
    """ns=5 half-filled: the (nup-1, ndw)/(nup, ndw-1) removal sectors have
    transposed shapes (10,5)/(5,10) in one power-of-two class — the ragged
    bucket pads both to (10,10) and must reproduce the per-sector path."""
    cfg = _cfg()
    if finite_t:
        cfg = cfg.replace(beta=4.0, lanc_nstates_total=40, cutoff=1e-9)
    bath = _bath(cfg)
    hloc = np.zeros((2, 2, 1, 1))
    with monkeypatch.context() as m:
        Gm1, Gr1, n_batched = _gf_with_spy(cfg, bath, hloc, finite_t, m)
    assert n_batched > 0, "no batched GF route was taken"
    with monkeypatch.context() as m:
        Gm0, Gr0, _ = _gf_with_spy(cfg, bath, hloc, finite_t, m,
                                   disable=True)
    np.testing.assert_allclose(Gm1, Gm0, rtol=1e-8, atol=1e-11)
    # real axis: near-pole points amplify benign f64 rounding differences
    # of the padded-shape matmuls by ~1/eps^2 — loose bar there
    np.testing.assert_allclose(Gr1, Gr0, rtol=2e-3, atol=1e-6)


def test_ragged_offdiag_hybrid_matches_serial(monkeypatch):
    """2-orbital hybrid bath: off-diagonal (cnorm2-weighted combined)
    channels ride the same ragged buckets."""
    cfg = EDConfig(norb=2, nbath=2, nspin=2, uloc=(1.5, 1.5), ust=0.7,
                   bath_type="hybrid", beta=40.0, lmats=16, lreal=8,
                   lanc_dim_threshold=4096, xmu=1.2).validate()
    rng = np.random.default_rng(11)
    bath = Bath(cfg)
    bath.e[:] = rng.normal(size=bath.e.shape)
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((2, 2, 2, 2))
    hloc[0, 0] = hloc[1, 1] = np.array([[0.3, 0.15], [0.15, -0.2]])
    with monkeypatch.context() as m:
        Gm1, Gr1, n_batched = _gf_with_spy(cfg, bath, hloc, False, m)
    assert n_batched > 0
    with monkeypatch.context() as m:
        Gm0, Gr0, _ = _gf_with_spy(cfg, bath, hloc, False, m, disable=True)
    np.testing.assert_allclose(Gm1, Gm0, rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(Gr1, Gr0, rtol=2e-3, atol=1e-6)


def test_ragged_sector_sweep_vs_dense(monkeypatch):
    """Sector sweep with a low Lanczos threshold: the deferred ARPACK-path
    sectors of one size class must solve as ONE stacked thick-restart
    (diag._solve_deferred_ragged) and reproduce the all-dense sweep's kept
    spectrum."""
    from dmft_ed_tpu import lanczos as lz

    monkeypatch.setenv("DMFT_ED_RAGGED", "1")  # tests run host-only
    cfg = _cfg(nbath=5, lanc_dim_threshold=150, lanc_nstates_sector=2)
    bath = _bath(cfg, seed=3)
    hloc = np.zeros((2, 2, 1, 1))

    calls = {"stacked": 0}
    orig = lz.eigs_lanczos_op_stacked

    def spy(*a, **kw):
        calls["stacked"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(lz, "eigs_lanczos_op_stacked", spy)
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    assert calls["stacked"] > 0, "stacked ragged sweep path never taken"

    cfg_d = cfg.replace(lanc_dim_threshold=10 ** 9)
    slist_d, zeta_d, _ = diagonalize(cfg_d, bath, hloc, None)

    e1 = sorted(s.energy for s in slist)
    e0 = sorted(s.energy for s in slist_d)
    assert len(e1) == len(e0)
    np.testing.assert_allclose(e1, e0, rtol=0, atol=5e-9)
    sec1 = sorted(s.sector.qn for s in slist)
    sec0 = sorted(s.sector.qn for s in slist_d)
    assert sec1 == sec0


def test_ragged_sweep_kanamori_jx_jp(monkeypatch):
    """Multi-orbital Kanamori with spin-exchange/pair-hopping: Jx/Jp add
    MixTerms inside single-block normal sectors (Hint.f90 Jhflag), so the
    route plan must NOT send these sectors down the padded ragged path
    (which requires a mix-free single block). Regression: round-3 struct_mix
    only checked Tud/P and diagonalize crashed under DMFT_ED_RAGGED=1."""
    monkeypatch.setenv("DMFT_ED_RAGGED", "1")
    cfg = EDConfig(norb=2, nbath=2, nspin=2, uloc=(1.8, 1.8), ust=0.9,
                   jh=0.3, jx=0.25, jp=0.25, beta=30.0, lmats=8, lreal=4,
                   lanc_dim_threshold=40, lanc_nstates_sector=2,
                   xmu=0.9).validate()
    rng = np.random.default_rng(5)
    bath = Bath(cfg)
    bath.e[:] = rng.normal(size=bath.e.shape) * 0.6
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((2, 2, 2, 2))
    hloc[0, 0] = hloc[1, 1] = np.diag([0.2, -0.2])

    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)  # must not raise
    cfg_d = cfg.replace(lanc_dim_threshold=10 ** 9)
    slist_d, _, _ = diagonalize(cfg_d, bath, hloc, None)
    e1 = sorted(s.energy for s in slist)
    e0 = sorted(s.energy for s in slist_d)
    assert len(e1) == len(e0)
    np.testing.assert_allclose(e1, e0, rtol=0, atol=5e-8)
