"""Pallas digit-matmul kernel (interpreter mode on CPU) vs the XLA Ozaki
composition and exact f64."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmft_ed_tpu import ozaki
from dmft_ed_tpu import pallas_kernels as pk


@pytest.mark.parametrize("shape", [(256, 300, 256), (300, 128, 500)])
def test_fused_digit_matmul_accuracy(shape):
    m, k, n = shape
    rng = np.random.default_rng(0)
    A = rng.normal(size=(m, k)) * np.exp(rng.normal(size=(m, 1)) * 2)
    B = rng.normal(size=(k, n)) * np.exp(rng.normal(size=(1, n)) * 2)
    exact = A @ B
    scale = np.max(np.abs(exact))
    got = np.asarray(pk.matmul_fused(jnp.asarray(A), jnp.asarray(B), 6,
                                     tm=128, tn=128, interpret=True))
    assert got.shape == exact.shape
    assert np.max(np.abs(got - exact)) / scale < 1e-9
    # agrees with the XLA composition to the compensated-sum level
    ref = np.asarray(ozaki.matmul(jnp.asarray(A), jnp.asarray(B), 6))
    assert np.max(np.abs(got - ref)) / scale < 1e-9
