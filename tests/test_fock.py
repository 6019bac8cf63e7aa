"""Unit tests for bit ops / combinadic ranking (SURVEY.md §4 test pyramid, unit level)."""

import numpy as np
from math import comb

from dmft_ed_tpu import fock


def test_spin_states_dims():
    for ns in range(1, 10):
        for n in range(ns + 1):
            st = fock.spin_states(ns, n)
            assert st.size == comb(ns, n)
            assert np.all(np.diff(st) > 0)  # ascending
            assert np.all(fock.popcount(st) == n)


def test_rank_roundtrip():
    for ns in (3, 5, 8, 11):
        for n in range(ns + 1):
            st = fock.spin_states(ns, n)
            r = fock.rank_states(st, ns)
            assert np.array_equal(r, np.arange(st.size))


def test_parity_below():
    rng = np.random.default_rng(0)
    for _ in range(200):
        x = int(rng.integers(0, 1 << 16))
        pos = int(rng.integers(0, 16))
        expect = (-1) ** bin(x & ((1 << pos) - 1)).count("1")
        assert fock.parity_below(np.array([x]), np.array([pos]))[0] == expect


def test_hop_op_vs_manual():
    """c†_i c_j matrix elements vs sequential bit application."""
    ns, n = 5, 2
    st = fock.spin_states(ns, n)
    for i in range(ns):
        for j in range(ns):
            rows, cols, vals = fock.hop_op(ns, n, i, j)
            M = fock.coo_to_dense(rows, cols, vals, (st.size, st.size))
            Mref = np.zeros((st.size, st.size))
            for c, s in enumerate(st):
                if not (s >> j) & 1:
                    continue
                sg1 = (-1) ** bin(s & ((1 << j) - 1)).count("1")
                s1 = s & ~(1 << j)
                if (s1 >> i) & 1:
                    continue
                sg2 = (-1) ** bin(s1 & ((1 << i) - 1)).count("1")
                s2 = s1 | (1 << i)
                r = int(np.searchsorted(st, s2))
                Mref[r, c] = sg1 * sg2
            assert np.array_equal(M, Mref), (i, j)


def test_cdg_c_adjoint():
    ns, n = 6, 3
    for i in range(ns):
        r1, c1, v1 = fock.cdg_op(ns, n, i)       # n -> n+1
        r2, c2, v2 = fock.c_op(ns, n + 1, i)     # n+1 -> n
        A = fock.coo_to_dense(r1, c1, v1, (comb(ns, n + 1), comb(ns, n)))
        B = fock.coo_to_dense(r2, c2, v2, (comb(ns, n), comb(ns, n + 1)))
        assert np.array_equal(A.T, B)


def test_occupations():
    ns, n = 4, 2
    st = fock.spin_states(ns, n)
    occ = fock.occupations(ns, n)
    assert occ.shape == (st.size, ns)
    assert np.all(occ.sum(1) == n)


def test_randomized_large_ns_roundtrip():
    """Property-style check at large Ns: rank/enumeration/operator adjoints
    on random samples up to Ns=24 (native kernel range)."""
    rng = np.random.default_rng(99)
    for ns, n in [(18, 9), (21, 7), (24, 5)]:
        st = fock.spin_states(ns, n)
        assert st.size == comb(ns, n)
        # random sample ranks round-trip
        idx = rng.integers(0, st.size, size=200)
        assert np.array_equal(fock.rank_states(st[idx], ns), idx)
        # adjointness of ladder ops on a random level
        i = int(rng.integers(0, ns))
        r1, c1, v1 = fock.cdg_op(ns, n, i)
        r2, c2, v2 = fock.c_op(ns, n + 1, i)
        o1 = np.lexsort((r1, c1))
        o2 = np.lexsort((c2, r2))
        assert np.array_equal(r1[o1], c2[o2])
        assert np.array_equal(c1[o1], r2[o2])
        assert np.array_equal(v1[o1], v2[o2])
