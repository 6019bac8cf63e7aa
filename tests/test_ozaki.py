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
    for ns, tol in [(4, 1e-5), (6, 1e-9), (8, 1e-12)]:
        got = np.asarray(ozaki.matmul(jnp.asarray(A), jnp.asarray(B), ns))
        assert np.max(np.abs(got - exact)) / scale < tol, ns


def test_sliced_operands():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(90, 90))
    B = rng.normal(size=(90, 90))
    exact = A @ B
    left = ozaki.SlicedMatrix(A, 6)
    got = np.asarray(ozaki.sliced_matmul(left.digits, left.scales,
                                         jnp.asarray(B), 6))
    np.testing.assert_allclose(got, exact, atol=1e-9 * np.max(np.abs(exact)))
    right = ozaki.SlicedRightOperand(B, 6)
    got2 = np.asarray(ozaki.right_sliced_matmul(jnp.asarray(A), right.digits,
                                                right.scales, 6))
    np.testing.assert_allclose(got2, exact, atol=1e-9 * np.max(np.abs(exact)))


def test_matvec_ozaki_vs_native():
    cfg = EDConfig(norb=1, nbath=6, nspin=1, uloc=(2.0,),
                   matmul_precision="ozaki6").validate()
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
    monkeypatch.setattr(ozaki, "_INT32_LIM", 4096.0 * 40)  # kmax = 39 < 97
    got = np.asarray(ozaki.matmul(jnp.asarray(A), jnp.asarray(B), 6))
    assert np.max(np.abs(got - exact)) / np.max(np.abs(exact)) < 1e-9


@pytest.mark.slow
def test_pairwise_fallback_natural_k():
    """K past the _cat_safe bound engages the fallback with the real
    int32 limit; adversarial near-1 values maximize digit magnitudes
    (the case where the old int32 group accumulation wrapped)."""
    rng = np.random.default_rng(6)
    K = 300_000
    assert not ozaki._cat_safe(K, 6)
    v = 1.0 - 32.0 / 4096.0 * (64.0 / 63.0)   # digits ~ (64, -32, -32, ...)
    A = np.where(rng.random((4, K)) < 0.5, v, -v)
    B = np.where(rng.random((K, 4)) < 0.5, v, -v)
    exact = A @ B
    got = np.asarray(ozaki.matmul(jnp.asarray(A), jnp.asarray(B), 6))
    assert np.max(np.abs(got - exact)) / np.max(np.abs(exact)) < 1e-9
