"""Spectrum determination: the sector sweep.

Replaces ED_DIAG.f90: per-sector choice of dense eigh vs (thick-restart)
Lanczos, T=0 ground-state windowing vs finite-T capacity-bounded state list,
Boltzmann trimming with `lanc_nstates_total` auto-tuning and per-sector
`neigen_sector` feedback (ED_DIAG.f90:49-565).

The reference's serial sector loop is kept host-side (sectors have distinct
static shapes); the per-sector solves are jit-compiled device computations.
Independent sectors can additionally be dispatched concurrently (the
reference never does this — SURVEY.md §2c).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .config import EDConfig
from .sectors import Sector, SectorTable, sector_table, sector_label
from .bath import Bath
from .eigenspace import StateList
from .hamiltonian import (build_sector_hamiltonian, assemble_dense,
                          make_matvec_op, flatten_blocks, unflatten_blocks)
from .lanczos import eigs_lanczos_op, lanczos_tridiag_op, tridiag_eigh


@dataclass
class DiagState:
    """Mutable across-DMFT-iteration solver memory (neigen feedback etc.)."""
    neigen_sector: Dict[int, int] = field(default_factory=dict)
    lanc_nstates_total: int = 1
    trim_counter: int = 0
    # per-sector converged plain-Lanczos iteration counts: DMFT iterations
    # revisit near-identical baths, so the previous count (+headroom)
    # replaces the blind lanc_niter-length scan (see _solve_sector_lanczos)
    lanc_niter_sector: Dict[int, int] = field(default_factory=dict)


def sectors_mask(cfg: EDConfig, table: SectorTable,
                 suffix: str = "") -> np.ndarray:
    """ed_sectors restriction from sectors_list restart file
    (ed_pre_diag, ED_DIAG.f90:263-363).

    Two-quantum-number sectors read two-column rows: (nup, ndw) for
    normal mode and (n, 2Jz) for nonsu2 with jz_basis
    (ED_DIAG.f90:322-343), each qn shifted independently by
    ed_sectors_shift. (The reference's inner n-shift loop accumulates M
    across the sign loop — a transcription slip; the intended independent
    +/-shift of each qn is implemented here.) The candidate audit trail
    goes to ``list_of_sectors<suffix>.ed`` as in ED_DIAG.f90:283-356."""
    mask = np.ones(len(table), dtype=bool)
    if not cfg.ed_sectors:
        return mask
    path = f"sectors_list{suffix}.restart"
    if not os.path.exists(path):
        return mask
    mask[:] = False
    with open(path) as fh:
        rows = [tuple(int(float(x)) for x in ln.split())
                for ln in fh if ln.strip()]
    sh = cfg.ed_sectors_shift
    two_qn = cfg.ed_mode == "normal" or \
        (cfg.ed_mode == "nonsu2" and cfg.jz_basis)
    audit = []    # (sector index | 0, matched?, qns) per candidate
    for row in rows:
        if two_qn:
            a, b = row[0], row[1]
            cands = [(a, b)]
            for s in range(1, sh + 1):
                cands += [(a + s, b), (a - s, b),
                          (a, b + s), (a, b - s)]
        else:
            q = row[0]
            cands = [(q,)] + [(q + s * sgn,) for s in range(1, sh + 1)
                              for sgn in (-1, 1)]
        for c in cands:
            sec = table.get(*c)
            if sec is not None:
                mask[sec.index] = True
                audit.append((sec.index + 1, True, c))
            else:
                audit.append((0, False, c))
    try:
        with open(f"list_of_sectors{suffix}.ed", "w") as fh:
            for idx, ok, c in audit:
                fh.write(f"{idx:6d} {'T' if ok else 'F'} "
                         + " ".join(f"{q:4d}" for q in c) + "\n")
    except OSError:
        pass
    return mask


def _is_self_twin(cfg: EDConfig, sec) -> bool:
    """Whether a sector coincides with its ed_twin conjugate (no mirror
    state to add; ED_DIAG.f90:220-236 adds twins only when the sectors
    differ)."""
    if sec.qn[0] == "normal":
        return sec.qn[1] == sec.qn[2]
    if sec.qn[0] == "superc":
        return sec.qn[1] == 0
    if sec.qn[0] == "nonsu2jz":
        return sec.qn[1] == cfg.ns and sec.qn[2] == 0
    return sec.qn[1] == cfg.ns


def _solve_sector_dense(ham, neigen: int):
    H = assemble_dense(ham)
    evals, evecs = np.linalg.eigh(H)
    return evals[:neigen], jnp.asarray(evecs[:, :neigen].T)


def _draw_v0(cfg: EDConfig, cplx: bool, dim: int, rng):
    """Normalized random Krylov start vector (one rng draw per sector, in
    sweep order, so serial and ragged-batched sweeps see the same stream)."""
    v0 = rng.normal(size=dim)
    if cplx:
        v0 = v0 + 1j * rng.normal(size=dim)
    v0 = jnp.asarray(v0, dtype=jnp.complex128 if cplx
                     else jnp.dtype(cfg.dtype))
    return v0 / jnp.linalg.norm(v0)


def _tridiag_e0(al, be, k: int) -> float:
    """Ground Ritz value of the leading k x k tridiagonal block (host)."""
    import scipy.linalg as sla
    if k <= 1:
        return float(al[0])
    return float(sla.eigh_tridiagonal(al[:k], be[1:k],
                                      select="i",
                                      select_range=(0, 0))[0][0])


def _min_converged(al, be, n: int, tol: float) -> int:
    """Smallest k with |E0(k) - E0(n)| <= tol*max(1, |E0(n)|): the point
    the reference's per-iteration deltaE test would have stopped at
    (PLAIN_LANCZOS.f90:235-259). E0(k) decreases monotonically in k
    (variational), so binary search applies."""
    e_n = _tridiag_e0(al, be, n)
    thr = tol * max(1.0, abs(e_n))
    lo, hi = 1, n
    while lo < hi:
        mid = (lo + hi) // 2
        if _tridiag_e0(al, be, mid) - e_n <= thr:
            hi = mid
        else:
            lo = mid + 1
    return lo


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _solve_sector_lanczos(cfg: EDConfig, ham, neigen: int, rng, mesh=None,
                          v0=None, timers=None, niter_mem=None):
    from contextlib import nullcontext
    tm = timers if timers is not None else (lambda name: nullcontext())
    sec = ham.sector
    if mesh is not None and mesh.shape.get("rows", 1) > 1 \
            and sec.dim >= cfg.shard_dim_threshold:
        # production distributed path: row-sharded Krylov over the mesh
        # (the analogue of the reference's MPI sector solve,
        # ED_MAIN.f90:284-327)
        from .parallel.hxv import solve_sector_sharded
        return solve_sector_sharded(cfg, ham, neigen, rng, mesh, v0=v0)
    with tm("diag.encode"):
        spec, arrays, blocks = make_matvec_op(ham, cfg)
    cplx = spec[-1].startswith("complex")
    if v0 is None:
        v0 = _draw_v0(cfg, cplx, sec.dim, rng)
    if cfg.lanc_method.lower() == "lanczos":
        # plain-Lanczos T=0 path (lanc_method='lanczos'): two-pass ground
        # state — tridiagonalize once, then replay the recurrence with the
        # STORED (alpha, beta) to accumulate |gs> (2n matvecs total,
        # dot-free second pass; PLAIN_LANCZOS.f90:189-397).
        #
        # Convergence-adaptive length (round 5): the reference stops the
        # recurrence when the tridiagonal's E0 stops moving
        # (PLAIN_LANCZOS.f90:235-259) — a fixed lanc_niter scan wastes the
        # tail. In-scan host checks don't fit one jit, so instead the
        # CONVERGED COUNT from the previous DMFT iteration (niter_mem,
        # DiagState.lanc_niter_sector) sizes this iteration's scan; the
        # result is convergence-verified on the host from the tridiagonal
        # and the scan doubles on a miss.
        #
        # Scan lengths are QUANTIZED to quarters of lanc_niter and the
        # rebuild replays the same length as the tridiag pass: a jitted
        # scan's length is part of its compile key, and through the
        # tunnel every new key costs seconds of XLA compilation — with
        # fine-grained (32-rounded n_conv) lengths the keys changed every
        # DMFT iteration and the compile storm cost MORE than the saved
        # matvecs (measured: steady 133 -> 250 s/iter on the dim-853k
        # loop). Four reusable keys per sector amortize immediately.
        from .lanczos import lanczos_rebuild_gs_op
        from .device import place_krylov
        # commit operands once: tridiag + rebuild then see already-placed
        # arrays instead of re-shipping the operator per pass
        arrays, v0 = place_krylov(arrays, v0)
        niter_max = min(sec.dim, cfg.lanc_niter)
        # f32-class Krylov (dryruns/benches): E0 jitters at ~1e-6 — a
        # tighter test would never pass and the scan would always extend
        tol = max(cfg.lanc_tolerance,
                  1e-5 if spec[-1] in ("float32", "complex64") else 1e-14)
        q = max(32, niter_max // 4)
        hint = niter_mem.get(sec.index) if niter_mem is not None else None
        ni = niter_max if hint is None \
            else min(niter_max, _round_up(max(hint + 16, 32), q))
        while True:
            with tm("diag.tridiag"):
                al, be, ns_ = lanczos_tridiag_op(spec, blocks, arrays,
                                                 v0, ni)
            n = max(int(ns_), 1)
            al_h = np.asarray(al[:n], dtype=np.float64)
            be_h = np.asarray(be[:n], dtype=np.float64)
            if n < ni or ni >= niter_max:
                break    # breakdown (exact subspace) or at the cap
            # converged if the last 8 steps moved E0 by < tol
            e_n = _tridiag_e0(al_h, be_h, n)
            if _tridiag_e0(al_h, be_h, max(1, n - 8)) - e_n \
                    <= tol * max(1.0, abs(e_n)):
                break
            ni = min(niter_max, ni * 2)    # hint too small: extend (rare)
        if niter_mem is not None:
            niter_mem[sec.index] = _min_converged(al_h, be_h, n, tol)
        evals, Y = tridiag_eigh(al_h, be_h)
        with tm("diag.rebuild"):
            gs = lanczos_rebuild_gs_op(spec, blocks, arrays, v0, al, be,
                                       Y[:, 0], n)
        return np.array([evals[0]]), gs[None, :]
    ncv = min(sec.dim,
              cfg.lanc_ncv_factor * max(neigen, cfg.lanc_nstates_sector)
              + cfg.lanc_ncv_add)
    evals, evecs, _ = eigs_lanczos_op(spec, blocks, arrays, v0, neigen, ncv,
                                      maxiter=min(sec.dim, cfg.lanc_niter),
                                      tol=cfg.lanc_tolerance)
    return np.asarray(evals), evecs


def _solve_deferred_ragged(cfg: EDConfig, tasks, results, rng):
    """Solve deferred single-block ARPACK-path sector tasks, batching
    sectors whose flat dims share a power-of-two class into ONE stacked
    thick-restart over zero-embedded operators
    (hamiltonian.make_padded_matvec_op + lanczos.eigs_lanczos_op_stacked).

    Exact: a Krylov chain started from a zero-padded vector never leaves
    the embedded subspace, so the Ritz spectrum is the original sector's;
    per-member convergence and exact-subspace breakdown (a member whose
    true dim < shared ncv) are finalized/frozen individually by the
    stacked restart logic. The reference solves these sectors serially
    per MPI rank (ED_DIAG.f90:104-161); here the sweep becomes a device
    batch axis, collapsing per-sector dispatches and compile keys.

    tasks: list of (sector, ham, neigen, v0); results[sec.index] is
    filled with (evals, evecs)."""
    from .hamiltonian import make_padded_matvec_op
    from .lanczos import eigs_lanczos_op_stacked
    buckets = {}
    for t in tasks:
        p2 = 1 << (t[0].dim - 1).bit_length()
        cplx = np.issubdtype(t[1].dtype, np.complexfloating)
        buckets.setdefault((cplx, p2), []).append(t)
    for (cplx, p2), ts in sorted(buckets.items(),
                                 key=lambda kv: (kv[0][1], kv[0][0])):
        from .device import ragged_batching
        ddw_pad = max(t[0].blocks[0].ddw for t in ts)
        dup_pad = max(t[0].blocks[0].dup for t in ts)
        vdt = np.result_type(np.dtype(cfg.dtype),
                             np.complex64 if cplx else np.float32)
        if len(ts) < 2 or ddw_pad * dup_pad > 2 * p2 \
                or not ragged_batching(len(ts) * ddw_pad * dup_pad, vdt):
            # singleton, pathological aspect-ratio mix, or host-bound
            # Krylov (lockstep batching loses there): plain per-sector
            for sec, ham, neigen, v0 in ts:
                results[sec.index] = _solve_sector_lanczos(cfg, ham, neigen,
                                                           rng, v0=v0)
            continue
        nnz_up = max(t[1].hup[0].rows.size for t in ts)
        nnz_dw = max(t[1].hdw[0].rows.size for t in ts)
        spec_p = blocks_p = None
        ops = []
        V0 = np.zeros((len(ts), ddw_pad * dup_pad),
                      dtype=np.complex128 if cplx else np.dtype(cfg.dtype))
        for s, (sec, ham, neigen, v0) in enumerate(ts):
            sp, ar, bl = make_padded_matvec_op(ham, cfg, ddw_pad, dup_pad,
                                               nnz_up, nnz_dw)
            if spec_p is None:
                spec_p, blocks_p = sp, bl
            else:
                assert sp == spec_p, "bucket key must force a common spec"
            ops.append(ar)
            blk = sec.blocks[0]
            V0[s].reshape(ddw_pad, dup_pad)[:blk.ddw, :blk.dup] = \
                np.asarray(v0).reshape(blk.ddw, blk.dup)
        arrays_stacked = tuple(jnp.stack([op[i] for op in ops])
                               for i in range(len(ops[0])))
        k = max(t[2] for t in ts)
        ncv = max(min(t[0].dim, cfg.lanc_ncv_factor
                      * max(t[2], cfg.lanc_nstates_sector)
                      + cfg.lanc_ncv_add) for t in ts)
        maxiter = max(min(t[0].dim, cfg.lanc_niter) for t in ts)
        evals_b, evecs_b, _ = eigs_lanczos_op_stacked(
            spec_p, blocks_p, arrays_stacked, jnp.asarray(V0), k, ncv,
            maxiter=maxiter, tol=cfg.lanc_tolerance)
        for s, (sec, ham, neigen, v0) in enumerate(ts):
            blk = sec.blocks[0]
            ev = np.asarray(evals_b[s])
            kk = min(neigen, int(np.sum(np.isfinite(ev))),
                     evecs_b[s].shape[0])
            vec = np.asarray(evecs_b[s])[:kk].reshape(-1, ddw_pad, dup_pad)
            vec = vec[:, :blk.ddw, :blk.dup].reshape(kk, sec.dim)
            results[sec.index] = (ev[:kk], jnp.asarray(vec))


def _solve_deferred_plain(cfg: EDConfig, tasks, results, rng, timers=None,
                          niter_mem=None):
    """Whole-sweep lockstep plain-Lanczos (sweep_plain.py): every
    mix-free single-block Krylov sector of the sweep runs its two-pass
    ground-state solve inside ONE lockstep scan whose matvec shares the
    per-(spin, n) operators across sectors and concatenates their
    vectors into ~Ns wide MXU products per orientation.

    Round-5 motivation (PERF_NOTES): per-sector, a 924-class ozaki
    matvec runs at ~27 ms/Lanczos iteration (small-shape s8 rates +
    per-sector dispatch/encode) vs 12 ms for the 3432-class headline;
    zero-embedded p2-bucket stacking (vmap) made it WORSE (padding +
    batched small matmuls). The concat form enlarges the actual matmul
    shapes and encodes each per-spin operator once per sweep. Scan
    lengths follow the shared convergence-adaptive quantized scheme of
    _solve_sector_lanczos."""
    from contextlib import nullcontext
    tm = timers if timers is not None else (lambda name: nullcontext())
    from .device import ragged_batching, place_krylov
    from .sweep_plain import (sweep_supported, make_sweep_op, sweep_tridiag,
                              sweep_rebuild)
    hams = [t[1] for t in tasks]
    cplx = any(np.issubdtype(h.dtype, np.complexfloating) for h in hams)
    vdt = np.result_type(np.dtype(cfg.dtype),
                         np.complex64 if cplx else np.float32)
    total = sum(t[0].dim for t in tasks)
    if len(tasks) < 2 or not sweep_supported(cfg, hams) \
            or not ragged_batching(total, vdt):
        for sec, ham, neigen, v0 in tasks:
            results[sec.index] = _solve_sector_lanczos(
                cfg, ham, neigen, rng, v0=v0, timers=timers,
                niter_mem=niter_mem)
        return
    S = len(tasks)
    with tm("diag.encode"):
        spec, arrays = make_sweep_op(cfg, hams)
        V0 = tuple(jnp.asarray(np.asarray(t[3]).reshape(
            t[0].blocks[0].ddw, t[0].blocks[0].dup)) for t in tasks)
        # commit operands to the Krylov device ONCE (tridiag + rebuild
        # then see already-placed arrays — no re-transfer)
        arrays, V0 = place_krylov(arrays, V0)
    niter_maxes = [min(t[0].dim, cfg.lanc_niter) for t in tasks]
    nm = max(niter_maxes)
    q = max(32, nm // 4)
    tol = max(cfg.lanc_tolerance,
              1e-5 if np.dtype(vdt) in (np.dtype(np.float32),
                                        np.dtype(np.complex64))
              else 1e-14)
    hints = [niter_mem.get(t[0].index) if niter_mem is not None
             else None for t in tasks]
    ni = nm if any(h is None for h in hints) \
        else min(nm, _round_up(max(h + 16 for h in hints), q))
    while True:
        with tm("diag.tridiag"):
            al, be, ns_ = sweep_tridiag(spec, arrays, ni, V0)
        al_h = np.asarray(al, dtype=np.float64)        # [ni, S]
        be_h = np.asarray(be, dtype=np.float64)
        ns_h = np.asarray(ns_)
        if ni >= nm:
            break
        need_more = False
        for s in range(S):
            n_s = max(int(ns_h[s]), 1)
            if n_s < ni or ni >= niter_maxes[s]:
                continue    # breakdown / member at its cap
            als, bes = al_h[:n_s, s], be_h[:n_s, s]
            e_n = _tridiag_e0(als, bes, n_s)
            if _tridiag_e0(als, bes, max(1, n_s - 8)) - e_n \
                    > tol * max(1.0, abs(e_n)):
                need_more = True
                break
        if not need_more:
            break
        ni = min(nm, ni * 2)
    Ys = np.zeros((al_h.shape[0], S))
    e0s = np.empty(S)
    for s in range(S):
        n_s = max(int(ns_h[s]), 1)
        evals_s, Y_s = tridiag_eigh(al_h[:n_s, s], be_h[:n_s, s])
        Ys[:n_s, s] = Y_s[:, 0]
        e0s[s] = evals_s[0]
        if niter_mem is not None:
            niter_mem[tasks[s][0].index] = _min_converged(
                al_h[:n_s, s], be_h[:n_s, s], n_s, tol)
    with tm("diag.rebuild"):
        GS = sweep_rebuild(spec, arrays, int(al_h.shape[0]), V0,
                           jnp.asarray(al_h), jnp.asarray(be_h),
                           jnp.asarray(Ys))
    for s, (sec, ham, neigen, v0) in enumerate(tasks):
        results[sec.index] = (np.array([e0s[s]]),
                              jnp.asarray(GS[s]).reshape(-1)[None, :])


def diagonalize(cfg: EDConfig, bath: Bath, hloc: np.ndarray,
                state: Optional[DiagState] = None,
                suffix: str = "", log=None, mesh=None,
                timers=None) -> tuple:
    """Full sector sweep. Returns (StateList, zeta, DiagState).

    mesh: optional jax.sharding.Mesh with a 'rows' axis — sectors with
    dim >= cfg.shard_dim_threshold are then solved with row-sharded
    Krylov (the production distributed path; parallel/hxv.py).
    timers: optional timer.Timers — accumulates the sweep's sub-stages
    (ham assembly / Krylov routes / dense eigh) for the e2e stage
    profile (SF_TIMER per-phase timing, ED_DIAG.f90:64,129,250)."""
    from contextlib import nullcontext
    tm = timers if timers is not None else (lambda name: nullcontext())
    table = sector_table(cfg)
    # problem-level offload decision for the hybrid placement (device.py):
    # the largest sector dim decides host-only vs offload-everything
    from .device import note_problem_dim
    note_problem_dim(max((s.dim for s in table.sectors), default=0))
    if state is None:
        state = DiagState(lanc_nstates_total=cfg.lanc_nstates_total)
    if not state.neigen_sector:
        for sec in table.sectors:
            state.neigen_sector[sec.index] = min(sec.dim,
                                                 cfg.lanc_nstates_sector)

    smask = sectors_mask(cfg, table, suffix)
    tmask = table.twin_mask() if cfg.ed_twin else np.ones(len(table), bool)
    finite_t = state.lanc_nstates_total > 1

    slist = StateList()
    oldzero = 1000.0
    rng = np.random.default_rng(cfg.seed + 7)
    t0 = time.time()
    sweep = []
    for sec in table.sectors:
        if not (smask[sec.index] and tmask[sec.index]) or sec.dim == 0:
            continue
        # Jz_max pruning (ED_DIAG.f90:73)
        if cfg.jz_basis and cfg.jz_max and \
                abs(sec.qn[2]) > int(2 * cfg.jz_max_value):
            continue
        tflag = cfg.ed_twin and tmask[sec.index] \
            and not _is_self_twin(cfg, sec)
        sweep.append((sec, tflag,
                      min(sec.dim, state.neigen_sector[sec.index])))

    # ---- route plan (structural — no per-sector H build): dense / serial-
    # Krylov sectors stream one at a time; unsharded ARPACK-path single-
    # block sectors whose dims share a power-of-two class batch as ONE
    # stacked thick-restart over zero-embedded operators
    # (_solve_deferred_ragged) — the device-batch analogue of the
    # reference's per-rank serial sector loop (ED_DIAG.f90:104-161).
    # Whether any sector carries mix terms (and the scalar dtype) is a
    # property of (cfg, bath, hloc) via single_particle_parts, so the plan
    # needs no Hamiltonians.
    from .hamiltonian import single_particle_parts
    Tuu_s, _, Tud_s, P_s = single_particle_parts(cfg, bath, hloc)
    # Spin-exchange/pair-hopping (Hint.f90 Jhflag) add MixTerms inside
    # single-block normal sectors too — they must disqualify the padded
    # ragged path, which requires a mix-free single block.
    struct_mix = bool(np.any(Tud_s)) or bool(np.any(P_s)) \
        or (cfg.norb > 1 and (cfg.jx != 0.0 or cfg.jp != 0.0))
    struct_cplx = np.issubdtype(
        np.result_type(Tuu_s.dtype,
                       np.complex128 if np.any(Tud_s) else np.float64),
        np.complexfloating)
    plain = cfg.lanc_method.lower() == "lanczos"
    buckets: dict = {}
    routes = []
    v0s = {}
    for pos, (sec, tflag, neigen) in enumerate(sweep):
        lanc_solve = (neigen < sec.dim) and (sec.dim > cfg.lanc_dim_threshold)
        sharded = mesh is not None and mesh.shape.get("rows", 1) > 1 \
            and sec.dim >= cfg.shard_dim_threshold
        # Draw every Krylov start vector HERE, in sweep order, so serial,
        # sharded and ragged-batched routings consume the identical rng
        # stream regardless of when a bucket actually solves (the sector
        # scalar dtype is structural, so struct_cplx is exact).
        if lanc_solve:
            v0s[pos] = _draw_v0(cfg, struct_cplx, sec.dim, rng)
        if lanc_solve and len(sec.blocks) == 1 and not struct_mix \
                and not sharded:
            # both Krylov routes batch: ARPACK-path via the stacked thick
            # restart in power-of-two size classes, plain-path via the
            # whole-sweep lockstep concat engine (round 5 — per-sector
            # dispatches and small-shape MXU rates dominated the sweep on
            # the accelerator, see _solve_deferred_plain/sweep_plain.py)
            key = ("sweep",) if plain \
                else (struct_cplx, 1 << (sec.dim - 1).bit_length())
            routes.append(key)
            buckets.setdefault(key, []).append(pos)
        else:
            routes.append(None)

    # ---- sweep: solve + bookkeeping stream per sector (memory stays
    # bounded by one size-class bucket plus the kept state list, like the
    # reference's serial loop); a bucket solves in one stacked restart when
    # its first member is reached, and its results are released as consumed
    pending = {}
    it = 0
    for pos, (sec, tflag, neigen) in enumerate(sweep):
        it += 1
        if log and cfg.ed_verbose >= 3:
            log(f" {it:4d}-Solving sector {sec.index:4d} "
                f"{sector_label(sec)} dim={sec.dim} neigen={neigen}")
        if routes[pos] is None:
            lanc_solve = (neigen < sec.dim) \
                and (sec.dim > cfg.lanc_dim_threshold)
            with tm("diag.ham_build"):
                ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
            if lanc_solve:
                with tm("diag.krylov_serial"):
                    evals, evecs = _solve_sector_lanczos(
                        cfg, ham, neigen, rng, mesh, v0=v0s.pop(pos),
                        timers=timers,
                        niter_mem=state.lanc_niter_sector)
            else:
                with tm("diag.dense_eigh"):
                    evals, evecs = _solve_sector_dense(ham, neigen)
                evals, evecs = evals[:neigen], evecs[:neigen]
            del ham
        else:
            if pos not in pending:
                tasks = []
                with tm("diag.ham_build"):
                    for p in buckets[routes[pos]]:
                        s2, _, n2 = sweep[p]
                        ham2 = build_sector_hamiltonian(cfg, s2, bath, hloc)
                        tasks.append((s2, ham2, n2, v0s.pop(p)))
                res = {}
                with tm("diag.krylov_ragged"):
                    if plain:
                        _solve_deferred_plain(
                            cfg, tasks, res, rng, timers=timers,
                            niter_mem=state.lanc_niter_sector)
                    else:
                        _solve_deferred_ragged(cfg, tasks, res, rng)
                del tasks
                for p in buckets[routes[pos]]:
                    pending[p] = res[sweep[p][0].index]
            evals, evecs = pending.pop(pos)
        _append_eigenvalues(suffix, sec, evals)

        if finite_t:
            for e, v in zip(evals, evecs):
                slist.add(e, v, sec, table, twin=tflag,
                          size=state.lanc_nstates_total)
        else:
            for e, v in zip(evals, evecs):
                if e < oldzero - 10 * cfg.gs_threshold:
                    oldzero = e
                    slist.clear()
                    slist.add(e, v, sec, table, twin=tflag)
                elif abs(e - oldzero) <= cfg.gs_threshold:
                    oldzero = min(oldzero, e)
                    slist.add(e, v, sec, table, twin=tflag)

    # ---- post-diag (ED_DIAG.f90:383-566), shared with diagonalize_sites
    zeta = _post_diag(cfg, table, slist, state, finite_t, suffix, log)
    if log and cfg.ed_verbose >= 2:
        log(f"Diagonalization done in {time.time() - t0:.2f}s: "
            f"{len(slist)} states, Egs={slist.emin:.12f}, Z={zeta:.6f}")
    return slist, zeta, state


def _append_eigenvalues(suffix: str, sec, evals) -> None:
    """eigenvalues_list file (ED_DIAG.f90:238-243, appended per sector)."""
    try:
        with open(f"eigenvalues_list{suffix}.ed", "a") as fh:
            fh.write(f"# sector {sec.index + 1} {sector_label(sec)}\n")
            for e in np.atleast_1d(evals):
                fh.write(f"{e:.12f}\n")
    except OSError:
        pass


def _post_diag(cfg: EDConfig, table, slist, state: DiagState,
               finite_t: bool, suffix: str, log=None) -> float:
    """Finite-T spectrum adaptation after a sector sweep
    (ED_DIAG.f90:445-566): histogram_states file, per-sector
    neigen_sector feedback, Boltzmann-cutoff trimming and
    lanc_nstates_total auto-tuning. Shared between the single-impurity
    sweep and the per-site state lists of diagonalize_sites. Returns the
    partition function."""
    zeta = slist.partition_function(cfg.beta, finite_t)
    if not finite_t:
        return zeta
    # histogram of sectors contributing to the kept spectrum
    # (histogram_states.ed, ED_DIAG.f90:474-490)
    try:
        counts_h = np.zeros(len(table), dtype=int)
        for s in slist:
            counts_h[s.sector.index] += 1
        with open(f"histogram_states{suffix}.ed", "a") as fh:
            for i, c in enumerate(counts_h):
                if c:
                    fh.write(f"{i + 1} {c}\n")
            fh.write("\n")
    except OSError:
        pass
    # per-sector neigen feedback (ED_DIAG.f90:494-515)
    counts = {i: 0 for i in state.neigen_sector}
    for s in slist:
        counts[s.sector.index] += 1
    for i in state.neigen_sector:
        if counts[i] > 0:
            state.neigen_sector[i] += 1
        else:
            state.neigen_sector[i] -= 1
        if state.neigen_sector[i] > counts[i]:
            state.neigen_sector[i] = counts[i] + 1
        if state.neigen_sector[i] <= 0:
            state.neigen_sector[i] = 1
    # Boltzmann-cutoff feedback on total kept states (ED_DIAG.f90:516-565)
    egs, ec = slist.emin, slist.emax
    if np.exp(-cfg.beta * (ec - egs)) > cfg.cutoff:
        state.lanc_nstates_total += cfg.lanc_nstates_step
        if log:
            log(f"Increasing lanc_nstates_total: {state.lanc_nstates_total}")
    else:
        while len(slist) > 1 and np.exp(
                -cfg.beta * (slist.emax - egs)) <= cfg.cutoff:
            slist.pop_last()
        state.lanc_nstates_total = max(len(slist), cfg.lanc_nstates_step) \
            + cfg.lanc_nstates_step
    return zeta


def write_state_list(cfg: EDConfig, slist: StateList, zeta: float,
                     suffix: str = "") -> None:
    """state_list<suffix>.ed + .restart files (print_state_list +
    sectors_list restart, ED_DIAG.f90:396-450)."""
    beta = cfg.beta
    egs = slist.emin
    for name in (f"state_list{suffix}.ed", f"state_list{suffix}.restart"):
        with open(name, "w") as fh:
            fh.write("# i E E-Egs qn sector exp(-beta(E-Egs))/Z\n")
            for i, s in enumerate(slist):
                qn = " ".join(str(q) for q in s.sector.qn[1:])
                w = np.exp(-beta * (s.energy - egs)) / max(zeta, 1e-300)
                fh.write(f"{i + 1:6d} {s.energy:18.12f} {w: .12E} "
                         f"{qn} {s.sector.index + 1:4d}\n")
    with open(f"sectors_list{suffix}.restart", "w") as fh:
        for s in slist:
            fh.write(" ".join(str(q) for q in s.sector.qn[1:]) + "\n")


# ----------------------------------------------------------------------
# site-batched sweep (real-space DMFT): one batched eigh per sector
# ----------------------------------------------------------------------

@jax.jit
def _batched_eigh(H):
    return jnp.linalg.eigh(H)


def diagonalize_sites(cfg: EDConfig, baths, hlocs, states=None, log=None,
                      cfgs=None, mesh=None, suffixes=None):
    """Batched sector sweep over N inequivalent impurity sites.

    `cfgs`: optional per-site configs differing only in interaction /
    level VALUES (e.g. the U stripe modulation of ed_ahm_stripe.f90) —
    the sector structure must match `cfg`. Per-sector the dense
    Hamiltonians of every site are stacked and diagonalized with ONE batched
    device eigh — the 'sites' data-parallel axis of the design
    (parallel/mesh.py), replacing the reference's round-robin MPI site loop
    (ED_MAIN.f90:576-678). Falls back to the per-site path for sectors
    above lanc_dim_threshold.

    `mesh`: optional (sites, rows) jax.sharding.Mesh — the dense eigh batch
    and the stacked large-sector Lanczos shard their site axis over 'sites'
    (the reference's MPI site distribution, ED_MAIN.f90:576-678), and the
    per-site Lanczos fallback row-shards sectors above
    cfg.shard_dim_threshold over 'rows'.

    `suffixes`: per-site file suffixes for the sectors_list restart masks
    (ed_pre_diag, ED_DIAG.f90:263-363); defaults to the lattice convention
    ``_ineq####``. The ed_twin trimming of ED_DIAG.f90:71-101 applies as in
    the single-impurity sweep (twin sectors reconstructed, not solved).

    Returns (list of StateList, list of zeta, list of DiagState).
    """
    nsites = len(baths)
    if cfgs is None:
        cfgs = [cfg] * nsites
    table = sector_table(cfg)
    from .device import note_problem_dim
    note_problem_dim(max((s.dim for s in table.sectors), default=0))
    if states is None:
        states = [None] * nsites
    states = [s or DiagState(lanc_nstates_total=cfg.lanc_nstates_total)
              for s in states]
    for st in states:
        if not st.neigen_sector:
            for sec in table.sectors:
                st.neigen_sector[sec.index] = min(sec.dim,
                                                  cfg.lanc_nstates_sector)
    if suffixes is None:
        suffixes = [f"_ineq{i + 1:04d}" for i in range(nsites)]
    smasks = [sectors_mask(cfgs[i], table, suffixes[i])
              for i in range(nsites)]
    tmask = table.twin_mask() if cfg.ed_twin else np.ones(len(table), bool)
    finite_t = any(st.lanc_nstates_total > 1 for st in states)
    slists = [StateList() for _ in range(nsites)]
    oldzero = [1000.0] * nsites
    rng = np.random.default_rng(cfg.seed + 7)
    for sec in table.sectors:
        if sec.dim == 0 or not tmask[sec.index]:
            continue
        # Jz_max pruning (ED_DIAG.f90:73), as in the single-impurity sweep
        if cfg.jz_basis and cfg.jz_max and \
                abs(sec.qn[2]) > int(2 * cfg.jz_max_value):
            continue
        active = [smasks[i][sec.index] for i in range(nsites)]
        if not any(active):
            continue
        tflag = cfg.ed_twin and tmask[sec.index] \
            and not _is_self_twin(cfg, sec)
        idx = [i for i in range(nsites) if active[i]]
        neigen = [min(sec.dim, st.neigen_sector[sec.index]) for st in states]
        dense_ok = sec.dim <= cfg.lanc_dim_threshold or \
            max(neigen[i] for i in idx) >= sec.dim
        if dense_ok:
            Hs = np.stack([
                assemble_dense(build_sector_hamiltonian(
                    cfgs[i], sec, baths[i], hlocs[i]))
                for i in idx])
            Hs_d, npad = _shard_site_stack(jnp.asarray(Hs), mesh)
            evals_b, evecs_b = _batched_eigh(Hs_d)
            evals_b = np.asarray(evals_b)
            for bi, i in enumerate(idx):
                ne = neigen[i]
                evals, evecs = evals_b[bi][:ne], evecs_b[bi][:, :ne].T
                _append_eigenvalues(suffixes[i], sec, evals)
                _collect(cfg, table, slists[i], sec, evals, evecs,
                         finite_t, states[i], oldzero, i, twin=tflag)
        else:
            # large-sector site-batched Lanczos: stack the structurally
            # identical per-site operators and run ONE lockstep
            # thick-restart over the site axis (eigs_lanczos_op_stacked) —
            # the device batch replacing the reference's round-robin MPI
            # site loop (ED_MAIN.f90:576-678) at Lanczos scale
            from .lanczos import eigs_lanczos_op_stacked
            hams = {i: build_sector_hamiltonian(cfgs[i], sec, baths[i],
                                                hlocs[i]) for i in idx}
            ops = {i: make_matvec_op(hams[i], cfgs[i]) for i in idx}
            specs = {(o[0], o[2]) for o in ops.values()}
            ne = max(neigen[i] for i in idx)
            if len(specs) == 1 and len(idx) > 1:
                spec, _, blocks = ops[idx[0]]
                arrays_stacked = tuple(
                    jnp.stack([ops[i][1][a] for i in idx])
                    for a in range(len(ops[idx[0]][1])))
                cplx = spec[-1].startswith("complex")
                v0 = rng.normal(size=(len(idx), sec.dim))
                if cplx:
                    v0 = v0 + 1j * rng.normal(size=(len(idx), sec.dim))
                v0 = jnp.asarray(v0, dtype=jnp.complex128 if cplx
                                 else jnp.dtype(cfg.dtype))
                ncv = min(sec.dim, cfg.lanc_ncv_factor
                          * max(ne, cfg.lanc_nstates_sector)
                          + cfg.lanc_ncv_add)
                evals_b, evecs_b, _ = eigs_lanczos_op_stacked(
                    spec, blocks, arrays_stacked, v0, ne, ncv,
                    maxiter=min(sec.dim, cfg.lanc_niter),
                    tol=cfg.lanc_tolerance, mesh=mesh)
                for bi, i in enumerate(idx):
                    k = min(neigen[i], len(evecs_b[bi]))
                    _append_eigenvalues(suffixes[i], sec,
                                        np.asarray(evals_b[bi][:k]))
                    _collect(cfg, table, slists[i], sec,
                             np.asarray(evals_b[bi][:k]), evecs_b[bi][:k],
                             finite_t, states[i], oldzero, i, twin=tflag)
            else:
                for i in idx:
                    evals, evecs = _solve_sector_lanczos(
                        cfg, hams[i], neigen[i], rng, mesh,
                        niter_mem=states[i].lanc_niter_sector)
                    _append_eigenvalues(suffixes[i], sec, evals)
                    _collect(cfg, table, slists[i], sec, evals, evecs,
                             finite_t, states[i], oldzero, i, twin=tflag)
    # per-site finite-T post-diag (Boltzmann trimming, neigen feedback,
    # lanc_nstates_total tuning, histogram files) — the FULL ed_post_diag
    # the reference runs per site (ED_DIAG.f90:445-566), shared with the
    # single-impurity sweep
    zetas = [_post_diag(cfg, table, slists[i], states[i], finite_t,
                        suffixes[i], log) for i in range(nsites)]
    return slists, zetas, states


def _shard_site_stack(Hs, mesh):
    """Place a [S, ...] site stack on the mesh 'sites' axis (zero-padding S
    to the axis multiple — padded entries are solved redundantly and
    discarded). Without a mesh the stack stays on the default device."""
    if mesh is None or mesh.shape.get("sites", 1) <= 1:
        return Hs, 0
    ns = mesh.shape["sites"]
    npad = (-Hs.shape[0]) % ns
    if npad:
        Hs = jnp.concatenate([Hs, jnp.zeros((npad,) + Hs.shape[1:],
                                            Hs.dtype)])
    shd = NamedSharding(mesh, P("sites", *([None] * (Hs.ndim - 1))))
    return jax.device_put(Hs, shd), npad


def _collect(cfg, table, slist, sec, evals, evecs, finite_t, state,
             oldzero, i, twin=False):
    if finite_t:
        for e, v in zip(evals, evecs):
            slist.add(e, jnp.asarray(v), sec, table, twin=twin,
                      size=state.lanc_nstates_total)
    else:
        for e, v in zip(evals, evecs):
            if e < oldzero[i] - 10 * cfg.gs_threshold:
                oldzero[i] = e
                slist.clear()
                slist.add(e, jnp.asarray(v), sec, table, twin=twin)
            elif abs(e - oldzero[i]) <= cfg.gs_threshold:
                oldzero[i] = min(oldzero[i], e)
                slist.add(e, jnp.asarray(v), sec, table, twin=twin)
