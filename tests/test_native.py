"""Native (C++) combinatorics kernels vs the pure-numpy implementations."""

import numpy as np
import pytest
from math import comb

pytestmark = pytest.mark.skipif(
    __import__("dmft_ed_tpu.fock", fromlist=["_native"])._native is None,
    reason="native toolchain unavailable")

from dmft_ed_tpu import native  # noqa: E402
from dmft_ed_tpu import fock  # noqa: E402


def _numpy_spin_states(ns, n):
    dim = comb(ns, n)
    out = np.empty(dim, dtype=np.int64)
    if n == 0:
        out[0] = 0
        return out
    v = (1 << n) - 1
    for i in range(dim):
        out[i] = v
        c = v & -v
        r = v + c
        v = (((r ^ v) >> 2) // c) | r
    return out


@pytest.mark.parametrize("ns,n", [(10, 5), (14, 7), (16, 8)])
def test_native_spin_states_and_rank(ns, n):
    st = native.spin_states(ns, n)
    ref = _numpy_spin_states(ns, n)
    assert np.array_equal(st, ref)
    assert np.array_equal(native.rank_states(ref, ns), np.arange(ref.size))


def test_native_hop_matches_numpy():
    ns, n = 14, 7
    st = _numpy_spin_states(ns, n)
    for (i, j) in [(0, 1), (3, 9), (13, 0), (5, 5)]:
        r1, c1, s1 = native.hop_coo(ns, n, i, j)
        # numpy reference (bypass native dispatch)
        if i == j:
            idx = np.nonzero((st >> j) & 1)[0]
            r2, c2, s2 = idx, idx, np.ones(idx.size, dtype=np.int64)
        else:
            ok = (((st >> j) & 1) == 1) & (((st >> i) & 1) == 0)
            src = np.nonzero(ok)[0]
            s0 = st[src]
            g1 = fock.parity_below(s0, j)
            sm = s0 & ~np.int64(1 << j)
            g2 = fock.parity_below(sm, i)
            s2_ = sm | np.int64(1 << i)
            tbl_rank = fock.rank_states.__wrapped__ if hasattr(
                fock.rank_states, "__wrapped__") else None
            r2 = np.searchsorted(st, s2_)
            c2, s2 = src, (g1 * g2).astype(np.int64)
        order1 = np.lexsort((r1, c1))
        order2 = np.lexsort((r2, c2))
        assert np.array_equal(r1[order1], np.asarray(r2)[order2])
        assert np.array_equal(c1[order1], np.asarray(c2)[order2])
        assert np.array_equal(s1[order1], np.asarray(s2)[order2])


def test_native_ladder_adjoint():
    ns, n = 14, 6
    for i in (0, 7, 13):
        r1, c1, s1 = native.ladder_coo(ns, n, i, True)    # n -> n+1
        r2, c2, s2 = native.ladder_coo(ns, n + 1, i, False)
        A = fock.coo_to_dense(r1, c1, s1, (comb(ns, n + 1), comb(ns, n)))
        B = fock.coo_to_dense(r2, c2, s2, (comb(ns, n), comb(ns, n + 1)))
        assert np.array_equal(A.T, B)
