"""Pallas TPU kernels for the hot compute paths.

`digit_matmul`: the fused core of the Ozaki high-precision scheme
(ozaki.py). The XLA composition runs P(P+1)/2 separate int8 matmuls each
followed by an emulated-f64 scale-and-add over the full [M, N] output
(21 HBM-resident f64 accumulations for P=6). This kernel keeps one output
tile resident in VMEM, runs all digit products on the int8 MXU with exact
int32 accumulation, and combines them with a compensated (TwoSum) f32
accumulator pair — equivalent to ~2^-48 accumulation error, comfortably
below the 2^-36 truncation of the 6-slice scheme. Output is the (hi, lo)
f32 pair; the f64 combine + row/col scaling is two cheap XLA ops.

Falls back transparently to the XLA composition when Pallas/TPU is
unavailable (ozaki.matmul remains the reference implementation; the unit
tests run this kernel in interpreter mode on CPU).

KNOWN ISSUE: the axon remote-compile Mosaic build in this container fails
to legalize gridded matmul kernels ('func.return' legalization error) even
for plain f32 dots, while ungridded kernels compile fine — the kernel is
correct under the interpreter and pending a Mosaic toolchain update for
on-TPU use (see PERF_NOTES.md). Production uses the XLA ozaki composition.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

_BITS = 6


def _digit_matmul_kernel(nslices, tn, *refs):
    """One [TM, 2*TN] output tile (hi | lo packed along columns).

    refs = ad_0..ad_{P-1} [TM, K] int8, bd_0..bd_{P-1} [K, TN] int8, out.
    """
    ad = refs[:nslices]
    bd = refs[nslices:2 * nslices]
    out_ref = refs[2 * nslices]
    hi = jnp.zeros((ad[0].shape[0], tn), dtype=jnp.float32)
    lo = jnp.zeros((ad[0].shape[0], tn), dtype=jnp.float32)
    for p in range(nslices):
        for q in range(nslices - p):
            prod = jax.lax.dot_general(
                ad[p][:], bd[q][:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            x = prod.astype(jnp.float32) * np.float32(
                2.0 ** (-_BITS * (p + q + 2)))
            # TwoSum compensated accumulation: (hi, lo) += x
            s = hi + x
            bp = s - hi
            err = (hi - (s - bp)) + (x - bp)
            hi = s
            lo = lo + err
    out_ref[:, :tn] = hi
    out_ref[:, tn:] = lo


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def digit_matmul_tiles(ad, bd, nslices: int, tm: int = 256, tn: int = 256,
                       interpret: bool = False):
    """C_unscaled = Σ_{p+q<P} 2^{-6(p+q+2)} Ad[p] @ Bd[q] as (hi, lo) f32.

    ad: [P, M, K] int8 digit slices of the row-scaled left operand,
    bd: [P, K, N] int8 digit slices of the column-scaled right operand.
    M, N must be multiples of (tm, tn). Returns (hi [M, N], lo [M, N]).
    """
    P, M, K = ad.shape
    N = bd.shape[2]
    grid = (M // tm, N // tn)
    kernel = partial(_digit_matmul_kernel, nslices, tn)
    # NB: index-map constants must stay i32 — a literal 0 traces as i64
    # under jax_enable_x64 and Mosaic fails to legalize the mixed-type
    # index-map return ('func.return' (i32, i64) legalization error).
    a_specs = [pl.BlockSpec((tm, K), lambda i, j: (i, j * 0))
               for _ in range(nslices)]
    b_specs = [pl.BlockSpec((K, tn), lambda i, j: (i * 0, j))
               for _ in range(nslices)]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=a_specs + b_specs,
        out_specs=pl.BlockSpec((tm, 2 * tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, 2 * N), jnp.float32),
        interpret=interpret,
    )(*[ad[p] for p in range(nslices)], *[bd[p] for p in range(nslices)])
    # unpack the column-packed (hi | lo) tiles
    out = out.reshape(M, N // tn, 2, tn)
    hi = out[:, :, 0, :].reshape(M, N)
    lo = out[:, :, 1, :].reshape(M, N)
    return hi, lo


def matmul_fused(A, B, nslices: int = 6, tm: int = 256, tn: int = 256,
                 interpret: bool = False):
    """A @ B in near-f64 precision via the fused Pallas digit kernel.

    Shapes are padded up to the tile multiples; scaling mirrors
    ozaki.matmul.
    """
    from .ozaki import slice_digits
    M, K = A.shape
    N = B.shape[1]
    Ad, sa = slice_digits(A, nslices, axis=0)
    Bd_t, sb = slice_digits(B.T, nslices, axis=0)
    sb = sb.T
    Bd = jnp.swapaxes(Bd_t, 1, 2)                   # [P, K, N]
    Mp = -(-M // tm) * tm
    Np = -(-N // tn) * tn
    if Mp != M:
        Ad = jnp.pad(Ad, ((0, 0), (0, Mp - M), (0, 0)))
    if Np != N:
        Bd = jnp.pad(Bd, ((0, 0), (0, 0), (0, Np - N)))
    hi, lo = digit_matmul_tiles(Ad, Bd, nslices, tm, tn, interpret)
    out = hi.astype(jnp.float64) + lo.astype(jnp.float64)
    return out[:M, :N] * sa * sb
