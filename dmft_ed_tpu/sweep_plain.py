"""Whole-sweep lockstep plain-Lanczos engine (round 5).

The TPU-first form of the reference's serial sector loop
(ED_DIAG.f90:71-212 with sp_lanc_eigh): ALL mix-free single-block
sectors of a sweep solve their two-pass ground states in ONE lockstep
``lax.scan``, with the matvec exploiting the block-Kronecker structure
ACROSS sectors:

* ``H_up`` depends only on n_up and ``H_dw`` only on n_dw
  (hamiltonian._spin_quadratic), so the sweep shares ONE operator per
  (spin, n) — sliced once per sweep for the ozaki path (the per-sector
  encode re-sliced each H up to Ns+1 times redundantly).
* The dw-products of every sector sharing n_dw run as ONE wide matmul
  ``H_dw @ [V_a | V_b | ...]`` (columns concatenated), and the
  up-products of every sector sharing n_up as ``[V_a ; V_b ; ...] @
  H_upᵀ`` (rows concatenated). At sweep scale the MXU sees ~Ns wide
  matmuls per orientation instead of hundreds of skinny per-sector
  products — measured on the dim-853k workload, a single 924-class
  sector runs ~27 ms/Lanczos iteration while the 3432-class headline
  runs 12 ms: the small-shape s8 rate is the bottleneck the concat
  repairs (PERF_NOTES round-5).
* Per-sector (alpha, beta) come from per-sector reductions inside the
  same scan; breakdown is masked per sector (exact invariant subspaces
  freeze, as in lanczos._lanczos_tridiag_impl).

Zero sector padding is involved — every vector keeps its exact shape —
so the only lockstep waste is the shared (convergence-adaptive,
quantized) scan length.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from .config import EDConfig
from .hamiltonian import SectorHamiltonian
from .lanczos import _pdot_pair, _BREAKDOWN


def sweep_supported(cfg: EDConfig, hams: List[SectorHamiltonian]) -> bool:
    """All sectors single-block, mix-free, per-spin dims dense-class."""
    thr = cfg.dense_matmul_threshold
    for h in hams:
        if len(h.sector.blocks) != 1 or h.mix:
            return False
        b = h.sector.blocks[0]
        if max(b.ddw, b.dup) > thr:
            return False
        if h.sector.subsel is not None:
            return False
    return True


def make_sweep_op(cfg: EDConfig, hams: List[SectorHamiltonian]):
    """Build (spec, arrays) for the whole-sweep collection matvec.

    spec is hashable (compile key): per-sector (ddw, dup, dw_gid, up_gid)
    plus the per-group operator slots and dtype/ozaki parameters. arrays
    is the flat tuple of device constants (per-group operator data +
    per-sector diagonals)."""
    is_cplx = any(np.issubdtype(h.dtype, np.complexfloating) for h in hams)
    rdtype = jnp.dtype(cfg.dtype)
    cdtype = jnp.dtype(jnp.complex128 if rdtype == jnp.float64
                       else jnp.complex64)
    vdtype = cdtype if is_cplx else rdtype
    ozaki_n = ozaki_b = 0
    if cfg.matmul_precision.startswith("ozaki") and not is_cplx \
            and rdtype == jnp.float64:
        from . import ozaki as _oz
        ozaki_n, ozaki_b = _oz.parse_precision(cfg.matmul_precision)

    arrays = []

    def push(*arrs):
        i0 = len(arrays)
        arrays.extend(arrs)
        return tuple(range(i0, len(arrays)))

    # ---- shared per-(spin, n) operators, encoded once. The diagonal
    # ships in FACTORED form (hamiltonian.SectorHamiltonian.dfac): per
    # dw group (d_dw, nd) and per up group (d_up_c, nu) — a few KB per
    # (spin, n) — and the dense [ddw, dup] diagonals are rebuilt ON
    # DEVICE once per jit call (prepare below): at Ns=12 this removes
    # ~134 MB/iteration of host->device diagonal traffic through the
    # tunnel. Sectors without factors fall back to dense diag transfer.
    have_fac = all(h.dfac is not None for h in hams)
    w_idx = c_idx = -1
    if have_fac:
        w_idx = push(jnp.asarray(hams[0].dfac[0], dtype=rdtype))[0]
        c_idx = push(jnp.asarray(hams[0].dfac[1], dtype=rdtype))[0]
    dw_groups = {}      # ndw -> group id
    up_groups = {}
    dw_ops = []         # per gid: ("ozl"/"dense", idx...)
    up_ops = []
    dw_fac = []         # per gid: (d_dw_idx, nd_idx) in fact mode
    up_fac = []
    sec_entries = []
    diag_idx = []
    diag_seen = {}      # repeated sectors (GF chains) share one diagonal
    for h in hams:
        blk = h.sector.blocks[0]
        nup, ndw = blk.nup, blk.ndw
        if ndw not in dw_groups:
            from . import ozaki as _oz
            dense = h.hdw[0].to_dense()
            if ozaki_n:
                op = _oz.SlicedMatrix(dense, ozaki_n, ozaki_b)
                dw_ops.append(("ozl",) + push(op.digits, op.scales))
            else:
                dw_ops.append(("dense",)
                              + push(jnp.asarray(dense, dtype=vdtype)))
            if have_fac:
                d_dw, _, nd, _ = h.dfac[2][0]
                dw_fac.append(push(jnp.asarray(d_dw, dtype=rdtype),
                                   jnp.asarray(nd, dtype=rdtype)))
            dw_groups[ndw] = len(dw_ops) - 1
        if nup not in up_groups:
            from . import ozaki as _oz
            dense = h.hup[0].to_dense()
            if ozaki_n:
                op = _oz.SlicedRightOperand(dense.T, ozaki_n, ozaki_b)
                up_ops.append(("ozr",) + push(op.digits, op.scales))
            else:
                up_ops.append(("dense",)
                              + push(jnp.asarray(dense, dtype=vdtype)))
            if have_fac:
                _, d_up, _, nu = h.dfac[2][0]
                up_fac.append(push(jnp.asarray(d_up, dtype=rdtype),
                                   jnp.asarray(nu, dtype=rdtype)))
            up_groups[nup] = len(up_ops) - 1
        if not have_fac:
            if id(h) not in diag_seen:
                diag_seen[id(h)] = push(jnp.asarray(h.diag[0],
                                                    dtype=rdtype))[0]
            diag_idx.append(diag_seen[id(h)])
        sec_entries.append((blk.ddw, blk.dup, dw_groups[ndw],
                            up_groups[nup]))

    spec = (tuple(sec_entries), tuple(diag_idx), tuple(dw_ops),
            tuple(up_ops), str(vdtype), ozaki_n, ozaki_b,
            (w_idx, c_idx, tuple(dw_fac), tuple(up_fac))
            if have_fac else None)
    return spec, tuple(arrays)


@lru_cache(maxsize=64)
def _sweep_applier(spec):
    (sec_entries, diag_idx, dw_ops, up_ops, _, ozaki_n, ozaki_b,
     fac) = spec
    n_dw_groups = len(dw_ops)
    n_up_groups = len(up_ops)
    dw_members = [[] for _ in range(n_dw_groups)]
    up_members = [[] for _ in range(n_up_groups)]
    for s, (ddw, dup, dg, ug) in enumerate(sec_entries):
        dw_members[dg].append(s)
        up_members[ug].append(s)

    def prepare(arrays):
        """Per-sector dense diagonals, rebuilt on device from the
        factored form once per jit call (closed over by the scan body,
        so XLA computes them once, outside the loop). Same expression
        and add order as SectorHamiltonian.diag — bit-identical f64 on
        a native-f64 backend."""
        if fac is None:
            return tuple(arrays[diag_idx[s]]
                         for s in range(len(sec_entries)))
        w_idx, c_idx, dw_fac, up_fac = fac
        W, const = arrays[w_idx], arrays[c_idx]
        cache = {}
        Ds = []
        for ddw, dup, dg, ug in sec_entries:
            if (dg, ug) not in cache:
                d_dw, nd = arrays[dw_fac[dg][0]], arrays[dw_fac[dg][1]]
                d_up, nu = arrays[up_fac[ug][0]], arrays[up_fac[ug][1]]
                cache[(dg, ug)] = (nd @ W @ nu.T + d_up[None, :]
                                   + d_dw[:, None] + const)
            Ds.append(cache[(dg, ug)])
        return tuple(Ds)

    def matvec(arrays, Ds, V):
        from . import ozaki as _oz
        Y = [Ds[s] * V[s] for s in range(len(sec_entries))]
        # dw family: one wide product per n_dw group
        for g, members in enumerate(dw_members):
            if not members:
                continue
            C = jnp.concatenate([V[s] for s in members], axis=1) \
                if len(members) > 1 else V[members[0]]
            kind = dw_ops[g][0]
            if kind == "ozl":
                dg_, sc = arrays[dw_ops[g][1]], arrays[dw_ops[g][2]]
                R = _oz.sliced_matmul(dg_, sc, C, ozaki_n, ozaki_b)
            else:
                R = arrays[dw_ops[g][1]] @ C
            off = 0
            for s in members:
                dup = sec_entries[s][1]
                Y[s] = Y[s] + R[:, off:off + dup]
                off += dup
        # up family: one wide product per n_up group
        for g, members in enumerate(up_members):
            if not members:
                continue
            C = jnp.concatenate([V[s] for s in members], axis=0) \
                if len(members) > 1 else V[members[0]]
            kind = up_ops[g][0]
            if kind == "ozr":
                dg_, sc = arrays[up_ops[g][1]], arrays[up_ops[g][2]]
                R = _oz.right_sliced_matmul(C, dg_, sc, ozaki_n, ozaki_b)
            else:
                R = C @ arrays[up_ops[g][1]].T
            off = 0
            for s in members:
                ddw = sec_entries[s][0]
                Y[s] = Y[s] + R[off:off + ddw]
                off += ddw
        return tuple(Y)

    return prepare, matvec


@partial(jax.jit, static_argnums=(0, 2))
def sweep_tridiag(spec, arrays, niter: int, V0):
    """Lockstep 3-term recurrence over the whole collection.

    V0: tuple of per-sector [ddw, dup] start vectors (normalized).
    Returns (alphas [niter, S], betas [niter, S] reference layout,
    nsteps [S])."""
    prepare, matvec = _sweep_applier(spec)
    Ds = prepare(arrays)
    S = len(V0)
    rdt = jnp.float64 if V0[0].dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32

    def step(carry, _):
        Vp, V, bp, alive = carry
        W = matvec(arrays, Ds, V)
        a = jnp.stack([_pdot_pair(v, w) for v, w in zip(V, W)])  # [S]
        W = tuple(w - a[s] * v - bp[s] * vp
                  for s, (w, v, vp) in enumerate(zip(W, V, Vp)))
        b = jnp.sqrt(jnp.stack([_pdot_pair(w, w) for w in W]))
        ok = alive & (b > _BREAKDOWN)
        Vn = tuple(jnp.where(ok[s], w / jnp.where(b[s] > 0, b[s], 1.0),
                             jnp.zeros_like(w))
                   for s, w in enumerate(W))
        Vp_n = tuple(jnp.where(ok[s], v, vp)
                     for s, (v, vp) in enumerate(zip(V, Vp)))
        out_a = jnp.where(alive, a, 0.0).astype(rdt)
        out_b = jnp.where(ok, b, 0.0).astype(rdt)
        return (Vp_n, Vn, jnp.where(ok, b, 0.0), ok), (out_a, out_b, alive)

    init = (tuple(jnp.zeros_like(v) for v in V0), V0,
            jnp.zeros(S, rdt), jnp.ones(S, bool))
    _, (alphas, betas, alive) = jax.lax.scan(step, init, None, length=niter)
    nsteps = jnp.sum(alive.astype(jnp.int32), axis=0)
    betas_out = jnp.concatenate([jnp.ones((1, S), rdt), betas[:-1]], axis=0)
    return alphas, betas_out, nsteps


@partial(jax.jit, static_argnums=(0, 2))
def sweep_rebuild(spec, arrays, niter: int, V0, alphas, betas, Y0):
    """Dot-free lockstep rebuild: |gs_s> = Σ_j Y0[j, s] |v_j(s)>.

    alphas/betas [niter, S] (reference layout), Y0 [niter, S] zero-padded
    past each sector's chain. Masking past a sector's breakdown keeps the
    replay finite (Y0 is zero there, so the accumulators are exact)."""
    prepare, matvec = _sweep_applier(spec)
    Ds = prepare(arrays)
    S = len(V0)
    rdt = jnp.float64 if V0[0].dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    alphas = alphas.astype(rdt)
    betas = betas.astype(rdt)
    Y0 = Y0.astype(rdt)
    beta_next = jnp.concatenate([betas[1:], jnp.zeros((1, S), rdt)], axis=0)

    def step(carry, j):
        Vp, V, acc = carry
        acc = tuple(a + Y0[j, s] * v for s, (a, v) in enumerate(zip(acc, V)))
        W = matvec(arrays, Ds, V)
        W = tuple(w - alphas[j, s] * v - betas[j, s] * vp
                  for s, (w, v, vp) in enumerate(zip(W, V, Vp)))
        bn = beta_next[j]
        Vn = tuple(jnp.where(bn[s] > _BREAKDOWN,
                             w / jnp.where(bn[s] > 0, bn[s], 1.0),
                             jnp.zeros_like(w))
                   for s, w in enumerate(W))
        return (V, Vn, acc), None

    init = (tuple(jnp.zeros_like(v) for v in V0), V0,
            tuple(jnp.zeros_like(v) for v in V0))
    carry, _ = jax.lax.scan(step, init, jnp.arange(niter))
    acc = carry[2]
    return tuple(a / jnp.linalg.norm(a) for a in acc)
