"""High-precision matrix multiplication on the int8 MXU (Ozaki scheme).

TPU f64 matmuls are software-emulated (~85x slower than f32 on v5e). This
module reaches near-f64 accuracy at a fraction of that cost by slicing each
f64 operand into B-bit integer digits and contracting digit pairs on the
int8 MXU, where accumulation into int32 is *exact*:

    A = diag(sa) · Σ_p 2^{-B(p+1)} A_p ,   A_p ∈ int8, |A_p| ≤ 2^{B-1}
    B = Σ_q 2^{-B(q+1)} B_q · diag(sb)
    A·B = diag(sa) [ Σ_{p+q<P} 2^{-B(p+q+2)} (A_p·B_q) ] diag(sb)

Operands are scaled into [-1/2, 1/2] (one extra power of two beyond the
row max) so that EVERY digit — leading included — is bounded by 2^{B-1}
after round-to-nearest: no int8 overflow for B ≤ 7 and a tight int32
exactness bound. Truncation at P slice-pairs gives ~2^{-B·P} relative
error. Two accuracy-equivalent schedules:

    P=6, B=6 ("ozaki6"):   2^-36 class, P(P+1)/2 = 21 digit-pair products
    P=5, B=7 ("ozaki5x7"): 2^-35 class, 15 digit-pair products — 1.4x
                           fewer int8 MACs for the same ~1e-10 accuracy

(vs ~1e-6 for a plain f32 matmul). B=7 is the int8 ceiling: B=8 digits
reach ±128 and overflow.

Scheduling (measured on v5e, 3432^3): the naive form — P(P+1)/2 separate
int8 matmuls each followed by an emulated-f64 scale-and-add over the full
[M, N] output — runs at 4.5 effective TF/s, accumulate-bound. Two
rearrangements make it matmul-bound at the device's int8 dot rate
(~165-176 TOPS via XLA):

1. **K-concatenation**: all digit products sharing one scale s = p+q are a
   single matmul over a concatenated contraction axis,
       C_s = Σ_{p+q=s} A_p·B_q = [A_0 | … | A_s] @ [B_s; …; B_0],
   where the blocks are *contiguous prefix/suffix slices* of the digit
   stacks Acat = [A_0 | … | A_{P-1}] (built once for a reused operand) and
   Bcat = [B_{P-1}; …; B_0] (rebuilt per call, sliced directly in the
   operand's own layout — no transposes, which otherwise dominate). P
   large-K matmuls replace P(P+1)/2 small ones at identical FLOPs.
2. **f32-pair epilogue**: each exact int32 group C_s is split losslessly
   into (hi, lo) f32 and accumulated into a TwoSum-compensated f32 pair
   (~2^-48 effective), converted to f64 once at the end — no emulated-f64
   elementwise traffic (the TPU lowers f64 adds to ~10 f32 ops).

Exactness bound: with every digit ≤ D = 2^{B-1}, the worst concatenated
group (s = P-1, contraction length P·k) is bounded by P·k·D² < 2^31
(k < 349k for B=6 P=6; k < 104k for B=7 P=5). Beyond that the pairwise
fallback is used: each (p, q) product enters the f32-pair accumulator
individually (exact while k·D² < 2^31), with the contraction axis chunked
past k = 2^31/D² so no int32 sum ever wraps.

This is the TPU equivalent of "use the tensor cores for f64" known from the
Ozaki-splitting literature; the reference gets f64 for free from its CPUs
(BLAS dgemm) — on TPU this is how the same physics precision rides the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BITS = 6              # default digit width ("ozakiN" == N slices of 6 bits)
_INT32_LIM = 2.0 ** 31


def parse_precision(s: str):
    """matmul_precision string -> (nslices, bits).

    "ozaki6" -> (6, 6) (N slices of 6-bit digits); "ozaki5x7" -> (5, 7)
    (N slices of B-bit digits). bits must be ≤ 7 (int8 digit ceiling).
    """
    part = s[5:] or "6"
    if "x" in part:
        n, b = part.split("x")
        nslices, bits = int(n), int(b)
    else:
        nslices, bits = int(part), _BITS
    if not (1 <= bits <= 7):
        raise ValueError(f"ozaki digit width must be 1..7, got {bits} ({s})")
    return nslices, bits


def _pow2_f32(e):
    """2^e as EXACT f32 via the exponent bit field (no exp2 transcendental
    — see _digits_list's exactness note). e: int32 array, clipped to the
    normal range."""
    eb = (jnp.clip(e + 127, 1, 254).astype(jnp.int32)) << 23
    return jax.lax.bitcast_convert_type(eb, jnp.float32)


def _ceil_log2_f32(m):
    """ceil(log2(m)) for m >= 0 f32, exactly, from the IEEE bit fields
    (m == 0 maps to the minimum exponent — its digits vanish anyway)."""
    b = jax.lax.bitcast_convert_type(m, jnp.int32)
    expo = ((b >> 23) & 0xFF) - 127
    frac = b & 0x7FFFFF
    return expo + (frac != 0).astype(jnp.int32)


def _two_sum_f32(a, b):
    """Knuth TwoSum: s + err == a + b exactly (native f32 ops)."""
    s = a + b
    bp = s - a
    err = (a - (s - bp)) + (b - bp)
    return s, err


def slice_digits(A, nslices: int, axis: int, bits: int = _BITS):
    """(digits [nslices, ...] int8, scales) with
    A ≈ scales·Σ_p 2^{-bits(p+1)}·D_p.

    axis: the non-contraction axis (rows of the left operand, cols of the
    right operand) along which the scaling is constant.
    """
    digits, scales = _digits_list(
        A, nslices, scale_axis=1 - axis if A.ndim == 2 else None, bits=bits)
    return jnp.stack(digits), scales


def _digits_list(A, nslices: int, scale_axis, bits: int = _BITS):
    """Digit slices of A in A's own layout (no transposes), scales constant
    along `scale_axis` (0: per-column scales, 1: per-row scales).

    EXACTNESS (TPU): the extraction uses ONLY native f32 arithmetic, exact
    casts and integer bit fields — never an emulated-f64 elementwise chain.
    Measured on the axon v5e backend (round 4), emulated f64 is ~2-ulp
    pair arithmetic (even x/4 is inexact on ~1/3 of inputs) and its
    round() collapses per-word at ties (round(-50.50000109) -> -50), which
    corrupted the old f64 residual chain on ~3e-6 of entries — digit
    reconstruction errors up to 2^-25 and occasional int8 WRAPS that put
    the on-device ozaki5x7 matmul at 7.9e-4 instead of ~1e-9 at 3432^3.
    Here: x splits into two exact f32 words (bits 1-24 via an exact cast,
    bits 25-48 via one Sterbenz-exact f64 subtract whose ~2^-51 device
    slop sits far below the 36-bit digit target), the per-level remainder
    is carried as an exact f32 TwoSum pair, every subtract is exact by
    construction, and digits are clipped so no corner case can ever wrap
    int8. Power-of-two scales come from IEEE exponent fields, not
    log2/exp2 approximations.
    """
    A = jnp.asarray(A)
    a32 = A.astype(jnp.float32)                    # exact cast (measured)
    m = jnp.max(jnp.abs(a32), axis=scale_axis, keepdims=True)
    E = _ceil_log2_f32(m) + 1                      # scale exponent, int32
    inv = _pow2_f32(-E)
    u1 = a32 * inv                                 # exact f32 pow2 scale
    S64 = _pow2_f32(E).astype(jnp.float64)
    # second word: bits 25-48 of A/S (the true difference is exactly
    # representable — Sterbenz — so the device's few-ulp f64 slop only
    # touches bits ~51+, below the nslices*bits <= 49 target)
    u2 = (A - u1.astype(jnp.float64) * S64).astype(jnp.float32) * inv
    stepB = np.float32(2.0 ** bits)
    t, c = u1, u2
    digits = []
    for p in range(nslices):
        y = t * stepB                              # exact: |y| <= 2^{B-1}
        cB = c * stepB
        s, e2 = _two_sum_f32(y, cB)
        q = jnp.round(s)                           # native f32 round
        d = s - q                                  # exact (|d| <= 1/2 + eps)
        t, c = _two_sum_f32(d, e2)
        digits.append(jnp.clip(q, -127.0, 127.0).astype(jnp.int8))
    return digits, S64


def _cat_left(A, nslices: int, bits: int):
    """Left operand A [m, k]: (Acat [m, P*k] = [A_0 | … | A_{P-1}],
    row scales [m, 1])."""
    digits, sa = _digits_list(A, nslices, scale_axis=1, bits=bits)
    return jnp.concatenate(digits, axis=1), sa


def _cat_right(B, nslices: int, bits: int):
    """Right operand B [k, n]: (Bcat [P*k, n] = [B_{P-1}; …; B_0],
    column scales [1, n])."""
    digits, sb = _digits_list(B, nslices, scale_axis=0, bits=bits)
    return jnp.concatenate(digits[::-1], axis=0), sb


def _group_combine(pairs, bits: int):
    """Σ 2^{-bits(s+2)} g over (s, g) exact-int32 terms via a TwoSum f32
    pair."""
    shape = pairs[0][1].shape
    hi = jnp.zeros(shape, jnp.float32)
    lo = jnp.zeros(shape, jnp.float32)
    for s, g in pairs:
        ghi = g.astype(jnp.float32)                  # lossless split of g
        glo = (g - ghi.astype(jnp.int32)).astype(jnp.float32)
        sc = np.float32(2.0 ** (-bits * (s + 2)))
        x = ghi * sc
        t = hi + x
        bp = t - hi
        err = (hi - (t - bp)) + (x - bp)
        hi, lo = t, lo + err + glo * sc
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _dot_i32(a, b):
    return jax.lax.dot_general(a, b,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _cat_groups(Acat, Bcat, nslices: int):
    """(s, C_s) with C_s = Acat[:, :(s+1)k] @ Bcat[(P-1-s)k:, :]."""
    k = Acat.shape[1] // nslices
    return [(s, _dot_i32(Acat[:, :(s + 1) * k],
                         Bcat[(nslices - 1 - s) * k:, :]))
            for s in range(nslices)]


def _cat_safe(k: int, nslices: int, bits: int = _BITS) -> bool:
    """Worst-case exactness of the concatenated int32 group sums: every
    digit is ≤ D = 2^{bits-1}+1 (the [-1/2, 1/2] scaling bounds the
    leading digit at 2^{bits-1}; +1 covers a near-tie round in the f32
    extraction), so group s = P-1 sums (P·k) products each ≤ D²."""
    dmax = (1 << (bits - 1)) + 1
    return nslices * k * dmax * dmax < _INT32_LIM


def _pairwise(Ad, Bd_T, nslices: int, bits: int):
    """Fallback: per-(p, q) int8 products, each combined INDIVIDUALLY into
    the f32 TwoSum pair at scale 2^{-bits(p+q+2)} — never summed in int32,
    since a group sum of s+1 products can exceed 2^31 exactly in the
    large-K regime where this fallback is selected. A single product is
    exact while D²·k < 2^31; beyond that the contraction axis is chunked
    and each exact chunk product enters the pair separately."""
    k = Ad[0].shape[1]
    dmax = (1 << (bits - 1)) + 1
    kmax = int(_INT32_LIM // (dmax * dmax)) - 1
    bounds = list(range(0, k, kmax)) + [k] if k > kmax else [0, k]
    pairs = []
    for s in range(nslices):
        for p in range(s + 1):
            q = s - p
            for c0, c1 in zip(bounds[:-1], bounds[1:]):
                pairs.append(
                    (s, _dot_i32(Ad[p][:, c0:c1], Bd_T[q][c0:c1, :])))
    return pairs


@partial(jax.jit, static_argnums=(2, 3))
def matmul(A, B, nslices: int = 6, bits: int = _BITS):
    """A @ B in near-f64 precision via int8 digit products.

    A: [m, k] f64, B: [k, n] f64.
    """
    k = A.shape[1]
    Acat, sa = _cat_left(A, nslices, bits)
    Bcat, sb = _cat_right(B, nslices, bits)
    if _cat_safe(k, nslices, bits):
        groups = _cat_groups(Acat, Bcat, nslices)
    else:
        Ad = [Acat[:, p * k:(p + 1) * k] for p in range(nslices)]
        Bd = [Bcat[(nslices - 1 - q) * k:(nslices - q) * k, :]
              for q in range(nslices)]
        groups = _pairwise(Ad, Bd, nslices, bits)
    return _group_combine(groups, bits) * sa * sb


@partial(jax.jit, static_argnums=(3, 4))
def fused_two_sided(Hdw, HupT, V, nslices: int, bits: int = _BITS):
    """Hdw @ V + V @ HupT as ONE K-concat Ozaki product set.

    The factorized sector matvec (hamiltonian.make_matvec_op) spends its
    FLOPs in two same-shape digit-matmul families per iteration — the dw
    orientation (Hdw @ V) and the up orientation (V @ HupT). Both are
    linear in V, so they merge into a single product over a doubled
    contraction axis:

        [Hdw | λV] @ [λV ; HupT] = λ (Hdw @ V + V @ HupT)

    with λ a dynamic power of two equalizing the magnitude of the
    normalized Krylov operand (|V| ~ dim^-1/2) to the Hamiltonian blocks —
    without it the combined row/col scales are H-dominated and the digit
    truncation error is amplified by |H|/|V| (~3 decades at headline
    shapes). λ is exact (power of two), so the merge changes only the
    digit decomposition, not the represented product.

    Measured OUTCOME (v5e headline loop, round 4): 7.49e9 nnz/s vs
    1.095e10 for the two separate pre-sliced products — the fusion LOSES
    1.46x despite identical MACs, one epilogue instead of two, and the
    doubled contraction axis (the s8 rate is size-bound in K, 160 TOPS at
    K=17k vs 237 at 8k^3, which motivated the experiment). The deficit is
    HBM traffic: both concatenated f64 operands (~380 MB) and both int8
    digit stacks (~240 MB) rematerialize EVERY iteration here, while the
    separate path slices H once per sector and streams only V's digits.
    Kept as an opt-in (device.ozaki_fused, DMFT_ED_OZAKI_FUSED=1) and as
    the measured record of the orientation-fusion dead end.

    Hdw: [ddw, ddw] f64; HupT: [dup, dup] f64 (already transposed — the
    matvec applies V @ HupT); V: [ddw, dup] f64.
    """
    mh = jnp.maximum(jnp.max(jnp.abs(Hdw)), jnp.max(jnp.abs(HupT)))
    mv = jnp.max(jnp.abs(V))
    lam = jnp.exp2(jnp.ceil(jnp.log2(
        jnp.where(mv > 0, jnp.where(mh > 0, mh, 1.0) / mv, 1.0))))
    Vl = lam * V
    L = jnp.concatenate([Hdw, Vl], axis=1)          # [ddw, ddw+dup]
    R = jnp.concatenate([Vl, HupT], axis=0)         # [ddw+dup, dup]
    k = L.shape[1]
    Acat, sa = _cat_left(L, nslices, bits)
    Bcat, sb = _cat_right(R, nslices, bits)
    if _cat_safe(k, nslices, bits):
        groups = _cat_groups(Acat, Bcat, nslices)
    else:
        Ad = [Acat[:, p * k:(p + 1) * k] for p in range(nslices)]
        Bd = [Bcat[(nslices - 1 - q) * k:(nslices - q) * k, :]
              for q in range(nslices)]
        groups = _pairwise(Ad, Bd, nslices, bits)
    return _group_combine(groups, bits) * (sa * sb / lam)


class SlicedMatrix:
    """A pre-sliced constant LEFT operand A of A @ B (e.g. the per-spin
    Hamiltonian blocks, reused across hundreds of Lanczos iterations).

    digits: [m, P*k] int8 — digit blocks concatenated ascending along the
    contraction axis; scales: [m, 1].
    """

    def __init__(self, A, nslices: int = 6, bits: int = _BITS):
        self.nslices = nslices
        self.bits = bits
        self.shape = A.shape
        self.digits, self.scales = _cat_left(jnp.asarray(A), nslices, bits)

    def __matmul__(self, B):
        return sliced_matmul(self.digits, self.scales, jnp.asarray(B),
                             self.nslices, self.bits)


@partial(jax.jit, static_argnums=(3, 4))
def sliced_matmul(Acat, sa, B, nslices: int, bits: int = _BITS):
    """(pre-sliced A) @ B: Acat [m, P*k] ascending digit blocks, sa [m, 1]."""
    k = Acat.shape[1] // nslices
    Bcat, sb = _cat_right(B, nslices, bits)
    if _cat_safe(k, nslices, bits):
        groups = _cat_groups(Acat, Bcat, nslices)
    else:
        Ad = [Acat[:, p * k:(p + 1) * k] for p in range(nslices)]
        Bd = [Bcat[(nslices - 1 - q) * k:(nslices - q) * k, :]
              for q in range(nslices)]
        groups = _pairwise(Ad, Bd, nslices, bits)
    return _group_combine(groups, bits) * sa * sb


class SlicedRightOperand:
    """Pre-sliced constant RIGHT operand A of B @ A, scaled per column.

    digits: [P*k, n] int8 — digit blocks concatenated DESCENDING along the
    contraction axis ([A_{P-1}; …; A_0]); scales: [1, n].
    """

    def __init__(self, A, nslices: int = 6, bits: int = _BITS):
        self.nslices = nslices
        self.bits = bits
        self.shape = A.shape
        self.digits, self.scales = _cat_right(jnp.asarray(A), nslices, bits)

    def __rmatmul__(self, B):
        return right_sliced_matmul(jnp.asarray(B), self.digits, self.scales,
                                   self.nslices, self.bits)


@partial(jax.jit, static_argnums=(3, 4))
def right_sliced_matmul(B, Acat, sa, nslices: int, bits: int = _BITS):
    """B @ (pre-sliced A): Acat [P*k, n] descending digit blocks, sa [1, n];
    B [m, k] sliced per row on the fly (its digit blocks concatenate
    ascending along the contraction axis: C_s = [B_0|…|B_s] @ [A_s;…;A_0])."""
    k = Acat.shape[0] // nslices
    digits, sb = _digits_list(B, nslices, scale_axis=1, bits=bits)  # sb [m,1]
    Bcat = jnp.concatenate(digits, axis=1)                # [m, P*k]
    if _cat_safe(k, nslices, bits):
        groups = _cat_groups(Bcat, Acat, nslices)
    else:
        Bd = digits
        Ad = [Acat[(nslices - 1 - q) * k:(nslices - q) * k, :]
              for q in range(nslices)]
        groups = _pairwise(Bd, Ad, nslices, bits)
    return _group_combine(groups, bits) * sb * sa
