"""Fock-space combinatorics: bit codecs, combinadic ranking, per-spin bases.

TPU-first replacement for the reference's bit machinery
(``bdecomp``/``bjoin`` ED_SETUP.f90:1234-1261, ``c``/``cdg`` with
Jordan-Wigner signs ED_SETUP.f90:1080-1106, and the per-element
``binary_search`` ED_SETUP.f90:1307).

Everything here is *setup-time host code* (vectorized numpy; a C++ fast path
lives in native/edcore.cpp for very large bases). The outputs are plain index
/value arrays that become device constants of the jitted compute path.

Conventions (identical to the reference):
  * A spin configuration is an integer whose bit ``p`` (0-based) is the
    occupation of level ``p+1`` in Fortran terms. Levels are
    [orbital_1..orbital_Norb, bath...] per `getBathStride` (ED_SETUP.f90:450-468).
  * A full state is ``m = i_up + i_dw * 2**Ns`` (build_sector, ED_SETUP.f90:905-916).
  * Jordan-Wigner: ``c_p`` / ``c†_p`` carry sign ``(-1)^{#occupied bits < p}``
    counted over the *full* 2*Ns-bit word — so a single down-spin operator
    carries an extra global ``(-1)^{N_up}``.
  * Within a sector, states are ordered with the up index fastest:
    ``sector_index = idw_rank * dim_up + iup_rank`` where the per-spin ranks
    follow ascending numeric order of the spin configurations.
"""

from __future__ import annotations

from functools import lru_cache
from math import comb

import numpy as np

try:  # optional C++ fast path (native/edcore.cpp), compiled on first use
    from . import native as _native
    _native._load()
except Exception:  # pragma: no cover - numpy fallback is always correct
    _native = None

# dimension above which the native kernels win over vectorized numpy
_NATIVE_MIN = 4096


# ----------------------------------------------------------------------
# bit utilities (vectorized)
# ----------------------------------------------------------------------

def popcount(x: np.ndarray) -> np.ndarray:
    """Number of set bits of each element (int64-safe)."""
    x = np.asarray(x, dtype=np.uint64)
    c = np.zeros(x.shape, dtype=np.int64)
    while np.any(x):
        c += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return c


def parity_below(x: np.ndarray, pos) -> np.ndarray:
    """(-1)^{# set bits of x strictly below bit `pos`} — the JW string sign."""
    x = np.asarray(x, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    mask = (np.int64(1) << pos) - 1
    return 1 - 2 * (popcount(x & mask) & 1)


def bdecomp(states: np.ndarray, nbits: int) -> np.ndarray:
    """Binary decomposition: [..., nbits] occupation array (ED_SETUP.f90:1234)."""
    states = np.asarray(states, dtype=np.int64)
    bits = np.arange(nbits, dtype=np.int64)
    return ((states[..., None] >> bits) & 1).astype(np.int8)


# ----------------------------------------------------------------------
# fixed-popcount spin bases + combinadic (colex) ranking
# ----------------------------------------------------------------------

@lru_cache(maxsize=None)
def spin_states(ns: int, n: int) -> np.ndarray:
    """All ns-bit integers with exactly n set bits, ascending.

    Ascending numeric order == colexicographic order of the set-bit position
    tuples, which is what makes closed-form ranking possible.
    """
    if n < 0 or n > ns:
        return np.empty(0, dtype=np.int64)
    if _native is not None and comb(ns, n) > _NATIVE_MIN:
        return _native.spin_states(ns, n)
    dim = comb(ns, n)
    out = np.empty(dim, dtype=np.int64)
    if n == 0:
        out[0] = 0
        return out
    v = (1 << n) - 1
    for i in range(dim):
        out[i] = v
        # Gosper's hack: next integer with same popcount
        c = v & -v
        r = v + c
        v = (((r ^ v) >> 2) // c) | r
    return out


@lru_cache(maxsize=None)
def _binom_table(ns: int) -> np.ndarray:
    """C(p, k) for p in [0, ns], k in [0, ns]."""
    tbl = np.zeros((ns + 1, ns + 2), dtype=np.int64)
    for p in range(ns + 1):
        for k in range(min(p, ns + 1) + 1):
            tbl[p, k] = comb(p, k)
    return tbl


def rank_states(states: np.ndarray, ns: int) -> np.ndarray:
    """Colex rank of each fixed-popcount state within `spin_states(ns, n)`.

    rank = sum_k C(p_k, k) over set-bit positions p_1 < p_2 < ... (0-based),
    k = 1..n. O(ns) per state, fully vectorized — replaces the reference's
    per-element binary_search (ED_SETUP.f90:1307).
    """
    states = np.asarray(states, dtype=np.int64)
    if _native is not None and states.size > _NATIVE_MIN:
        return _native.rank_states(states, ns)
    tbl = _binom_table(ns)
    rank = np.zeros(states.shape, dtype=np.int64)
    kcount = np.zeros(states.shape, dtype=np.int64)
    for p in range(ns):
        is_set = (states >> p) & 1
        kcount += is_set
        rank += is_set * tbl[p, np.minimum(kcount, ns)]
    return rank


# ----------------------------------------------------------------------
# per-spin operator matrices (COO) on a fixed-popcount basis
# ----------------------------------------------------------------------

def hop_op(ns: int, n: int, i: int, j: int):
    """COO of ``c†_i c_j`` restricted to the n-particle basis (0-based levels).

    Returns (rows, cols, signs): for each source state (column c) with bit j
    set and (i == j or bit i clear), the target rank (row), with the in-spin
    JW sign. Matches the reference's sequential c/cdg application
    (ED_HAMILTONIAN/stored/Himp.f90 UP branch).
    """
    if _native is not None and comb(ns, n) > _NATIVE_MIN:
        return _native.hop_coo(ns, n, i, j)
    st = spin_states(ns, n)
    if i == j:
        occ = ((st >> j) & 1).astype(bool)
        idx = np.nonzero(occ)[0]
        return idx, idx, np.ones(idx.size, dtype=np.int64)
    ok = (((st >> j) & 1) == 1) & (((st >> i) & 1) == 0)
    src = np.nonzero(ok)[0]
    s0 = st[src]
    sgn1 = parity_below(s0, j)              # c_j on s0
    s1 = s0 & ~np.int64(1 << j)
    sgn2 = parity_below(s1, i)              # c†_i on s1
    s2 = s1 | np.int64(1 << i)
    rows = rank_states(s2, ns)
    return rows, src, (sgn1 * sgn2).astype(np.int64)


def cdg_op(ns: int, n: int, i: int):
    """COO of ``c†_i`` : n-particle basis -> (n+1)-particle basis.

    Returns (rows, cols, signs) with rows in the (n+1) basis. Sign is the
    *in-spin* JW string; callers add the (-1)^{N_up} factor for down-spin
    operators (constant per block).
    """
    if _native is not None and comb(ns, n) > _NATIVE_MIN:
        return _native.ladder_coo(ns, n, i, True)
    st = spin_states(ns, n)
    ok = ((st >> i) & 1) == 0
    src = np.nonzero(ok)[0]
    s0 = st[src]
    sgn = parity_below(s0, i)
    s1 = s0 | np.int64(1 << i)
    rows = rank_states(s1, ns)
    return rows, src, sgn.astype(np.int64)


def c_op(ns: int, n: int, i: int):
    """COO of ``c_i`` : n-particle basis -> (n-1)-particle basis."""
    if _native is not None and comb(ns, n) > _NATIVE_MIN:
        return _native.ladder_coo(ns, n, i, False)
    st = spin_states(ns, n)
    ok = ((st >> i) & 1) == 1
    src = np.nonzero(ok)[0]
    s0 = st[src]
    sgn = parity_below(s0, i)
    s1 = s0 & ~np.int64(1 << i)
    rows = rank_states(s1, ns)
    return rows, src, sgn.astype(np.int64)


def occupations(ns: int, n: int, levels: np.ndarray | None = None) -> np.ndarray:
    """[dim, len(levels)] occupation numbers of each basis state (float64)."""
    st = spin_states(ns, n)
    if levels is None:
        levels = np.arange(ns)
    levels = np.asarray(levels, dtype=np.int64)
    return ((st[:, None] >> levels[None, :]) & 1).astype(np.float64)


def coo_to_dense(rows, cols, vals, shape) -> np.ndarray:
    out = np.zeros(shape, dtype=np.result_type(np.asarray(vals).dtype, np.float64))
    np.add.at(out, (rows, cols), vals)
    return out


# ----------------------------------------------------------------------
# Jz-basis support: per-spin orbital angular momentum classes
# ----------------------------------------------------------------------

# t2g effective orbital angular momenta (ED_VARS_GLOBAL.f90:207-208)
LZDIAG_T2G = (-1, +1, 0)
SZDIAG = (+1, -1)


@lru_cache(maxsize=None)
def lz_values(ns: int, n: int, norb: int) -> np.ndarray:
    """twoLz = Σ_levels 2·Lz(orb)·n_level for each state of the (ns, n)
    basis; orbital character repeats every `norb` levels (replica-bath
    layout, the only one jz_basis supports — ED_SETUP.f90:880-885)."""
    assert norb == 3, "Jz basis defined for t2g (Norb=3)"
    st = spin_states(ns, n)
    orb_lz = np.array([LZDIAG_T2G[lv % norb] for lv in range(ns)])
    occ = bdecomp(st, ns).astype(np.int64)
    return 2 * (occ * orb_lz[None, :]).sum(axis=1)


@lru_cache(maxsize=None)
def lz_classes(ns: int, n: int, norb: int):
    """{twoLz: colex-index array} partition of the (ns, n) basis."""
    lz = lz_values(ns, n, norb)
    return {int(l): np.nonzero(lz == l)[0] for l in np.unique(lz)}


@lru_cache(maxsize=None)
def lz_class_pos(ns: int, n: int, norb: int):
    """{twoLz: position array}: global colex rank -> position within the
    class (or -1)."""
    out = {}
    dim = comb(ns, n)
    for l, idx in lz_classes(ns, n, norb).items():
        pos = np.full(dim, -1, dtype=np.int64)
        pos[idx] = np.arange(idx.size)
        out[l] = pos
    return out


def restrict_coo(rows, cols, vals, row_pos, col_pos):
    """Filter a COO to a (row, col) sub-basis pair, remapping indices."""
    ok = (row_pos[rows] >= 0) & (col_pos[cols] >= 0)
    return row_pos[rows[ok]], col_pos[cols[ok]], vals[ok]
