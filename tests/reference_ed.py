"""Brute-force full-Fock-space ED, written as a *literal* transcription of the
reference term semantics (ED_HAMILTONIAN/stored/*.f90, ED_SETUP.f90 c/cdg).

Deliberately independent of dmft_ed_tpu internals: integer states over
2*Ns bits, sequential operator application with full-word Jordan-Wigner signs,
O(4^Ns) loops. Used only as the correctness oracle for tiny systems.
"""

from __future__ import annotations

import numpy as np


def popcount_int(x: int) -> int:
    return bin(x).count("1")


def c_op(pos: int, state: int):
    """c_{pos} |state> (0-based pos over 2*Ns bits). Returns (new, sign) or None."""
    if not (state >> pos) & 1:
        return None
    sign = (-1) ** popcount_int(state & ((1 << pos) - 1))
    return state & ~(1 << pos), sign


def cdg_op(pos: int, state: int):
    if (state >> pos) & 1:
        return None
    sign = (-1) ** popcount_int(state & ((1 << pos) - 1))
    return state | (1 << pos), sign


def apply_quad(H, basis_index, state, amp, p_dag, p_ann):
    """Accumulate amp * c†_{p_dag} c_{p_ann} |state> into column basis_index[state]."""
    r1 = c_op(p_ann, state)
    if r1 is None:
        return
    s1, sg1 = r1
    r2 = cdg_op(p_dag, s1)
    if r2 is None:
        return
    s2, sg2 = r2
    if s2 in basis_index:
        H[basis_index[s2], basis_index[state]] += amp * sg1 * sg2


def build_full_H(ns, norb, Tuu, Tdd, Tud, P, uloc, ust, jh, jx, jp,
                 hfmode, states):
    """Dense H over the given list of full-word states (ints).

    Tuu/Tdd/Tud: [ns, ns] quadratic amplitudes; P: [ns] pairing;
    uloc: [norb]. Convention H = Σ T[i,j] c†_i c_j (+ pairing + h.c.).
    Up levels = bits 0..ns-1, down = bits ns..2ns-1.
    """
    dim = len(states)
    index = {s: i for i, s in enumerate(states)}
    H = np.zeros((dim, dim), dtype=complex)
    for s in states:
        col = index[s]
        nup = [(s >> a) & 1 for a in range(ns)]
        ndw = [(s >> (ns + a)) & 1 for a in range(ns)]
        # quadratic same-spin
        for i in range(ns):
            for j in range(ns):
                if Tuu[i, j] != 0:
                    if i == j:
                        H[col, col] += Tuu[i, i] * nup[i]
                    else:
                        apply_quad(H, index, s, Tuu[i, j], i, j)
                if Tdd[i, j] != 0:
                    if i == j:
                        H[col, col] += Tdd[i, i] * ndw[i]
                    else:
                        apply_quad(H, index, s, Tdd[i, j], ns + i, ns + j)
                # spin flip c†_{i,up} c_{j,dw} + h.c.
                if Tud[i, j] != 0:
                    apply_quad(H, index, s, Tud[i, j], i, ns + j)
                    apply_quad(H, index, s, np.conj(Tud[i, j]), ns + j, i)
        # pairing P[l] (c_l,up c_l,dw + c†_l,dw c†_l,up) — order as Hbath.f90
        for l in range(ns):
            if P[l] == 0:
                continue
            r1 = c_op(l, s)
            if r1 is not None:
                s1, sg1 = r1
                r2 = c_op(ns + l, s1)
                if r2 is not None:
                    s2, sg2 = r2
                    if s2 in index:
                        H[index[s2], col] += P[l] * sg1 * sg2
            r1 = cdg_op(ns + l, s)
            if r1 is not None:
                s1, sg1 = r1
                r2 = cdg_op(l, s1)
                if r2 is not None:
                    s2, sg2 = r2
                    if s2 in index:
                        H[index[s2], col] += P[l] * sg1 * sg2
        # interaction (Hint.f90)
        h = 0.0
        for a in range(norb):
            h += uloc[a] * nup[a] * ndw[a]
        if norb > 1:
            for a in range(norb):
                for b in range(a + 1, norb):
                    h += ust * (nup[a] * ndw[b] + nup[b] * ndw[a])
                    h += (ust - jh) * (nup[a] * nup[b] + ndw[a] * ndw[b])
        if hfmode:
            for a in range(norb):
                h += -0.5 * uloc[a] * (nup[a] + ndw[a]) + 0.25 * uloc[a]
            if norb > 1:
                for a in range(norb):
                    for b in range(a + 1, norb):
                        h += -0.5 * ust * (nup[a] + ndw[a] + nup[b] + ndw[b]) \
                            + 0.25 * ust
                        h += -0.5 * (ust - jh) * (nup[a] + ndw[a] + nup[b] + ndw[b]) \
                            + 0.25 * (ust - jh)
        H[col, col] += h
        # spin exchange Jx: c†_a,up c†_b,dw c_a,dw c_b,up (a != b)
        if norb > 1 and (jx != 0 or jp != 0):
            for a in range(norb):
                for b in range(norb):
                    if a == b:
                        continue
                    # S-E, ref order: c(b,up), c(a,dw), cdg(b,dw), cdg(a,up)
                    seq = [(c_op, b), (c_op, ns + a), (cdg_op, ns + b), (cdg_op, a)]
                    st, sg = s, 1
                    ok = True
                    for fn, pos in seq:
                        r = fn(pos, st)
                        if r is None:
                            ok = False
                            break
                        st, g = r
                        sg *= g
                    if ok and st in index:
                        H[index[st], col] += jx * sg
                    # P-H, ref order: c(b,up), c(b,dw), cdg(a,dw), cdg(a,up)
                    seq = [(c_op, b), (c_op, ns + b), (cdg_op, ns + a), (cdg_op, a)]
                    st, sg = s, 1
                    ok = True
                    for fn, pos in seq:
                        r = fn(pos, st)
                        if r is None:
                            ok = False
                            break
                        st, g = r
                        sg *= g
                    if ok and st in index:
                        H[index[st], col] += jp * sg
    return H


def sector_states_normal(ns, nup, ndw):
    """Reference ordering: idw outer ascending, iup inner (ED_SETUP.f90:905)."""
    ups = [u for u in range(1 << ns) if popcount_int(u) == nup]
    dws = [d for d in range(1 << ns) if popcount_int(d) == ndw]
    return [u + (d << ns) for d in dws for u in ups]


def sector_states_superc(ns, sz):
    out = []
    for d in range(1 << ns):
        for u in range(1 << ns):
            if popcount_int(u) - popcount_int(d) == sz:
                out.append(u + (d << ns))
    return out


def sector_states_nonsu2(ns, n):
    out = []
    for d in range(1 << ns):
        for u in range(1 << ns):
            if popcount_int(u) + popcount_int(d) == n:
                out.append(u + (d << ns))
    return out
