"""Hybrid host/accelerator placement for the Krylov hot path.

TPU-native architecture decision (no reference equivalent — the reference
runs everything on the CPU ranks): the *Krylov recurrences and sector
matvecs* are the only FLOP-dense part of a solve and belong on the
accelerator; the small complex frequency-domain algebra (Dyson inversions,
bath analytics, chi^2 fits, pole accumulation) stays on the host CPU
backend, which natively supports complex128 (TPUs do not) and where the
O(Lmats*Norb^2) work is trivial.

Activation: run with ``JAX_PLATFORMS=cpu,axon`` (or ``cpu,tpu``) so the
*default* jax backend is CPU while the accelerator is still visible; this
module then auto-routes every op-form Krylov call (lanczos.py entry
points) to the accelerator, skipping ops whose dtype the accelerator
cannot hold (complex128). When jax runs single-platform (tests: cpu;
kernel bench: axon) everything stays on the default device and this
module is a no-op. Override with DMFT_ED_KRYLOV_DEVICE=cpu|axon|tpu|none.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp

# platforms with no complex128 support on device
_NO_C128 = ("tpu", "axon")

# Offload placement is a TWO-LEVEL decision (crossover scan,
# bench_crossover.py / PERF_NOTES.md; re-measured round 5 with the
# whole-sweep concat engines, artifacts/crossover.json):
#
# 1. PROBLEM level: the hybrid placement only pays off when the problem's
#    LARGEST sector crosses the CPU/TPU crossover — measured steady-state
#    (round 5, concat engines + adaptive niter both sides): CPU wins at
#    dim 1.6e4 (7.1 vs 9.8 s/iter at Nbath=8), the hybrid wins from
#    6.4e4 (5.8x at Nbath=9, 3.7x at 2.1e5, 15x at 8.5e5). Below the
#    threshold everything stays on the host (DMFT_ED_OFFLOAD_MIN_DIM,
#    solver calls note_problem_dim with the sector table's max).
# 2. SECTOR level: once offloading, a LOW per-sector floor wins — the
#    tunnel cost is per-dispatch and the concat/ragged batchers amortize
#    it best when they get the whole sector population (round 5 at
#    Nbath=10: floor 2048 = 15.6 s/iter vs round-4's floor-32768 80.5
#    and floor-131072 140; at Nbath=8/9 floor 2048 beats floor 32768 by
#    ~1.6x). DMFT_ED_KRYLOV_MIN_DIM keeps tiny blocks host-side.
_MIN_DIM = int(os.environ.get("DMFT_ED_KRYLOV_MIN_DIM", 2048))
_OFFLOAD_MIN = int(os.environ.get("DMFT_ED_OFFLOAD_MIN_DIM", 32768))

# largest sector dim of the problem currently being solved (None =
# unknown -> offload decisions fall back to per-call sizes only)
_PROBLEM_MAX_DIM = None


def note_problem_dim(max_dim: int) -> None:
    """Record the problem scale (largest sector dimension) so the hybrid
    placement can make the problem-level offload decision. Called by
    EDSolver/diagonalize with the sector table's max dim."""
    global _PROBLEM_MAX_DIM
    _PROBLEM_MAX_DIM = int(max_dim)


def _problem_offloads() -> bool:
    return _PROBLEM_MAX_DIM is None or _PROBLEM_MAX_DIM >= _OFFLOAD_MIN


@lru_cache(maxsize=1)
def krylov_device():
    """The device Krylov work should be committed to, or None to stay on
    the jax default device."""
    choice = os.environ.get("DMFT_ED_KRYLOV_DEVICE", "auto").lower()
    if choice in ("none", ""):
        return None
    if choice != "auto":
        try:
            return jax.devices(choice)[0]
        except RuntimeError:
            return None
    # auto: only route when the default backend is CPU but an accelerator
    # platform is also registered (the hybrid JAX_PLATFORMS=cpu,... mode)
    if jax.default_backend() != "cpu":
        return None
    for plat in ("tpu", "axon", "gpu"):
        try:
            return jax.devices(plat)[0]
        except RuntimeError:
            continue
    return None


def ragged_batching(total_elems: int, dtype=None) -> bool:
    """Whether ragged (zero-embedded) Krylov batching should run for a
    bucket whose stacked padded problem holds `total_elems` vector
    elements of scalar type `dtype` (None = assumed placeable).

    Batching collapses per-sector dispatches and compile keys — a win
    when every dispatch crosses the accelerator tunnel (20-40 ms each),
    a LOSS on the host backend where the lockstep stacked restart makes
    fast members wait for the slowest (measured 4.5x slower on the CPU
    ns=9 sweep). auto: only when the batched scan actually lands on an
    accelerator (accelerator default backend, or hybrid placement with
    the stack above the offload threshold AND a dtype the accelerator
    can hold — complex128 stacks stay host-side, where lockstep loses).
    Override with DMFT_ED_RAGGED=1|0."""
    choice = os.environ.get("DMFT_ED_RAGGED", "auto").lower()
    if choice in ("1", "on", "always"):
        return True
    if choice in ("0", "off", "never"):
        return False
    if jax.default_backend() in ("tpu", "axon", "gpu"):
        return True
    dev = krylov_device()
    if dev is None or total_elems < _MIN_DIM or not _problem_offloads():
        return False
    return dtype is None or _holds(dev, dtype)


@lru_cache(maxsize=1)
def ozaki_fused() -> bool:
    """Whether the two-orientation fused Ozaki matvec (ozaki.fused_two_sided:
    [Hdw | λV] @ [λV; HupT], one K-concat product set + one TwoSum epilogue
    per iteration) encodes in make_matvec_op. Default OFF — measured on the
    v5e headline loop (round 4): 1.024e10 vs 1.447e10 nnz/s for the
    separate pre-sliced products (with the fast f32-native slicing; with
    the old emulated-f64 slicing: 7.49e9 vs 1.095e10), i.e. the fusion
    LOSES ~1.4x despite identical MACs and a halved epilogue. The deficit
    is the per-iteration operand rebuild: both concatenated f64 operands
    (~380 MB) and both int8 digit stacks (~240 MB) are rematerialized
    every call (HBM-traffic-bound), where the separate path digit-slices H
    once per sector and streams only V's digits. Opt in with
    DMFT_ED_OZAKI_FUSED=1 (accuracy is the same ~1e-10 class — see
    test_ozaki.py)."""
    return os.environ.get("DMFT_ED_OZAKI_FUSED", "0").lower() \
        in ("1", "on", "always")


def _holds(dev, dtype) -> bool:
    if dev.platform in _NO_C128 and jnp.dtype(dtype) == jnp.complex128:
        return False
    return True


def place_krylov(arrays, v0):
    """device_put (arrays, v0) onto the Krylov accelerator when active and
    the dtypes are representable there; no-op (and no transfer) otherwise
    or when already committed."""
    dev = krylov_device()
    if dev is None or not _problem_offloads():
        return arrays, v0
    size = sum(v.size for v in v0) if isinstance(v0, tuple) \
        else jnp.asarray(v0).size
    if size < _MIN_DIM:
        return arrays, v0
    dts = [a.dtype for a in arrays] + (
        [v.dtype for v in v0] if isinstance(v0, tuple)
        else [jnp.asarray(v0).dtype])
    if not all(_holds(dev, dt) for dt in dts):
        return arrays, v0
    arrays = tuple(jax.device_put(a, dev) for a in arrays)
    if isinstance(v0, tuple):
        v0 = tuple(jax.device_put(v, dev) for v in v0)
    else:
        v0 = jax.device_put(v0, dev)
    return arrays, v0
