"""Krylov eigensolvers in pure JAX.

Replaces the reference's L0 sparse linear algebra (SURVEY.md §2b):
  * ``sp_lanc_tridiag`` / ``sp_lanc_eigh`` (plain Lanczos, 3-term recurrence
    with beta-breakdown exit — .repo/PLAIN_LANCZOS.f90:54-180)
  * ``sp_eigh`` (P-ARPACK implicitly-restarted Lanczos — here a
    thick-restart Lanczos with full two-pass reorthogonalization, which is
    the memory-bounded ARPACK equivalent and is numerically *stronger* than
    the reference's un-reorthogonalized plain path).

All routines operate on flat device vectors; ``matvec`` is any jittable
Hermitian operator. Dot products are ``jnp.vdot`` — under a sharded mesh XLA
lowers them to psum over ICI, replacing P-ARPACK's internal MPI allreduce.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BREAKDOWN = 1e-13


def precise_dot(a, b):
    """Re<a|b> — near-f64 accuracy at f32-reduction speed on TPU.

    TPU f64 reductions lower pathologically (~100 ms for 1e7 elements on
    v5e, vs ~0.5 ms for the f32 tree reduction — PERF_NOTES.md). For real
    f64 operands on an accelerator this uses the Dekker-split compensated
    form: each operand is split into (hi, lo) f32 parts and the product is
    accumulated as Σ hi·hi + Σ(hi·lo + lo·hi) in f32 tree reductions —
    measured coefficient error ~6e-10 on dim-1.2e7 Lanczos vectors, a 6x
    end-to-end Lanczos speedup. CPU and complex dtypes use the exact vdot.
    """
    if a.dtype == jnp.float64 and jax.default_backend() == "tpu":
        a32 = a.astype(jnp.float32)
        al = (a - a32.astype(jnp.float64)).astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        bl = (b - b32.astype(jnp.float64)).astype(jnp.float32)
        d1 = jnp.sum(a32 * b32, dtype=jnp.float32)
        d2 = jnp.sum(a32 * bl + al * b32, dtype=jnp.float32)
        return d1.astype(jnp.float64) + d2.astype(jnp.float64)
    return jnp.real(jnp.vdot(a, b))


# ----------------------------------------------------------------------
# plain Lanczos tridiagonalization (GF resolvent path)
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 2))
def lanczos_tridiag(matvec: Callable, v0: jnp.ndarray, niter: int):
    """3-term Lanczos recurrence from normalized v0.

    Returns (alpha[niter], beta[niter], nsteps): alpha_j = <v_j|H|v_j>,
    beta[j] = ||w_{j}|| coupling v_{j-1} -> v_j (beta[0] = 1 sentinel,
    matching the reference convention where blanc(1) is unused,
    PLAIN_LANCZOS.f90:127-180). After breakdown (beta < 1e-13) the recurrence
    is frozen and nsteps records the usable count.
    """
    dt = v0.dtype
    rdt = jnp.float64 if dt in (jnp.float64, jnp.complex128) else jnp.float32

    def step(carry, _):
        v_prev, v, b_prev, alive = carry
        w = matvec(v)
        a = precise_dot(v, w)
        w = w - a * v - b_prev * v_prev
        b = jnp.sqrt(precise_dot(w, w))
        ok = alive & (b > _BREAKDOWN)
        v_next = jnp.where(ok, w / jnp.where(b > 0, b, 1.0), jnp.zeros_like(w))
        out_a = jnp.where(alive, a, 0.0)
        out_b = jnp.where(ok, b, 0.0)
        return (jnp.where(ok, v, v_prev), v_next, jnp.where(ok, b, 0.0), ok), \
            (out_a.astype(rdt), out_b.astype(rdt), alive)

    init = (jnp.zeros_like(v0), v0, jnp.asarray(0.0, rdt), jnp.asarray(True))
    _, (alphas, betas, alive) = jax.lax.scan(step, init, None, length=niter)
    nsteps = jnp.sum(alive.astype(jnp.int32))
    # shift: beta[j] couples step j-1 to j (reference stores beta_{j} at j+1)
    betas_out = jnp.concatenate([jnp.ones(1, rdt), betas[:-1]])
    return alphas, betas_out, nsteps


def tridiag_eigh(alpha: np.ndarray, beta: np.ndarray):
    """Eigendecomposition of the symmetric tridiagonal (host, LAPACK ste*).

    alpha: diag [n]; beta: [n] with beta[0] unused (reference layout).
    Mirrors the `eigh(diag, subdiag)` call in add_to_lanczos_gf_normal
    (ED_GF_NORMAL.f90:617-618).
    """
    import scipy.linalg as sla
    n = len(alpha)
    if n == 1:
        return np.asarray(alpha), np.ones((1, 1))
    return sla.eigh_tridiagonal(np.asarray(alpha), np.asarray(beta[1:n]))


# ----------------------------------------------------------------------
# thick-restart Lanczos with full reorthogonalization (ARPACK replacement)
# ----------------------------------------------------------------------

def _expand(matvec, V, T, j0: int, m: int):
    """Grow the orthonormal basis V[j0..m] and projection T columns j0..m-1.

    V: [m+1, dim] with rows < j0 filled (orthonormal), row j0 = next start
    vector. T: [m+1, m+1] projected operator (arrowhead+tridiag after
    restarts). Rows of V beyond the current step are zero, so the full-basis
    Gram-Schmidt products need no masking. Two orthogonalization passes give
    machine-precision orthogonality (the 'Lanczos hygiene' obligation,
    SURVEY.md §7 hard parts).
    """

    def step(carry, j):
        V, T = carry
        v = V[j]
        w = matvec(v)
        h1 = V.conj() @ w
        w = w - V.T @ h1
        h2 = V.conj() @ w
        w = w - V.T @ h2
        h = h1 + h2
        b = jnp.sqrt(jnp.real(jnp.vdot(w, w)))
        safe = b > _BREAKDOWN
        vnext = jnp.where(safe, 1.0, 0.0) * w / jnp.where(safe, b, 1.0)
        V = V.at[j + 1].set(vnext)
        T = T.at[:, j].set(h)
        T = T.at[j, :].set(jnp.conj(h))      # Hermitian fill
        T = T.at[j + 1, j].set(b)
        T = T.at[j, j + 1].set(b)
        return (V, T), b

    (V, T), betas = jax.lax.scan(step, (V, T), jnp.arange(j0, m))
    return V, T, betas


def eigs_lanczos(matvec: Callable,
                 v0: jnp.ndarray,
                 neigen: int,
                 ncv: int,
                 maxiter: int = 512,
                 tol: float = 1e-12) -> Tuple[np.ndarray, jnp.ndarray, int]:
    """Lowest `neigen` eigenpairs of the Hermitian operator `matvec`.

    Thick-restart Lanczos: expand a Krylov basis to ncv vectors (full reorth),
    Rayleigh-Ritz on the projected (ncv x ncv) matrix, restart with the
    `k = neigen` best Ritz vectors plus the residual direction. Replaces
    ``sp_eigh``/P-ARPACK (ED_DIAG.f90:149-166).

    Returns (evals [neigen] ascending, evecs [neigen, dim], iterations).
    """
    dim = v0.shape[0]
    neigen = min(neigen, dim)
    ncv = int(min(max(ncv, neigen + 2), dim))
    dt = v0.dtype
    k = neigen

    expand = jax.jit(_expand, static_argnums=(0, 3, 4))

    V = jnp.zeros((ncv + 1, dim), dtype=dt)
    V = V.at[0].set(v0 / jnp.linalg.norm(v0))
    T = jnp.zeros((ncv + 1, ncv + 1), dtype=dt)

    niter = 0
    j0 = 0
    restarts = max(1, int(np.ceil(maxiter / max(ncv - k, 1))))
    evals = None
    for it in range(restarts):
        V, T, betas = expand(matvec, V, T, j0, ncv)
        niter += ncv - j0
        betas_h = np.asarray(betas)
        # effective basis size (truncate at breakdown => exact subspace)
        m_eff = ncv
        bad = np.nonzero(betas_h < _BREAKDOWN)[0]
        if bad.size:
            m_eff = j0 + int(bad[0]) + 1
        Th = np.asarray(T[:m_eff, :m_eff])
        evals_all, Y = np.linalg.eigh(Th)
        k_eff = min(k, m_eff)
        evals = evals_all[:k_eff]
        beta_m = float(np.asarray(T[m_eff, m_eff - 1]).real) \
            if m_eff < ncv + 1 else 0.0
        resid = np.abs(beta_m * Y[m_eff - 1, :k_eff])
        if np.all(resid < max(tol, 1e-14) * np.maximum(1.0, np.abs(evals))) \
                or m_eff < ncv or niter >= maxiter:
            Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)
            evecs = (Yk.T @ V[:m_eff])
            return evals, evecs, niter
        # --- thick restart
        Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)
        ritz = Yk.T @ V[:m_eff]                      # [k, dim]
        vres = V[m_eff]                               # normalized residual dir
        V = jnp.zeros((ncv + 1, dim), dtype=dt)
        V = V.at[:k_eff].set(ritz)
        V = V.at[k_eff].set(vres)
        T = jnp.zeros((ncv + 1, ncv + 1), dtype=dt)
        T = T.at[jnp.arange(k_eff), jnp.arange(k_eff)].set(
            jnp.asarray(evals).astype(dt))
        s = jnp.asarray(beta_m * Y[m_eff - 1, :k_eff], dtype=dt)
        T = T.at[k_eff, :k_eff].set(jnp.conj(s))
        T = T.at[:k_eff, k_eff].set(s)
        j0 = k_eff
    Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)
    return evals, (Yk.T @ V[:m_eff]), niter


def lanczos_ground_state(matvec: Callable, v0: jnp.ndarray,
                         niter: int = 512, tol: float = 1e-12):
    """Plain-Lanczos ground state (lanc_method='lanczos', T=0 only;
    PLAIN_LANCZOS.f90:189-397). Two-pass: tridiagonalize, diagonalize the
    small matrix, then rebuild |gs> = Σ_j y_j |v_j> with a second recurrence
    — no basis storage."""
    alphas, betas, nsteps = lanczos_tridiag(matvec, v0, niter)
    n = max(int(nsteps), 1)
    a, b = np.asarray(alphas[:n]), np.asarray(betas[:n])
    evals, Y = tridiag_eigh(a, b)
    y = jnp.asarray(Y[:, 0], dtype=v0.dtype)

    def step(carry, j):
        v_prev, v, b_prev, acc = carry
        acc = acc + y[j] * v
        w = matvec(v)
        aj = alphas[j]
        w = w - aj * v - b_prev * v_prev
        bj = jnp.sqrt(precise_dot(w, w))   # f64 TPU reduce pathology fix
        vn = w / jnp.where(bj > _BREAKDOWN, bj, 1.0)
        return (v, vn, bj, acc), None

    init = (jnp.zeros_like(v0), v0, jnp.asarray(0.0, jnp.result_type(v0.real)),
            jnp.zeros_like(v0))
    carry, _ = jax.lax.scan(step, init, jnp.arange(n))
    gs = carry[3]
    gs = gs / jnp.linalg.norm(gs)
    return float(evals[0]), gs


def lanczos_rebuild_gs_op(spec, blocks, arrays, v0, alphas, betas, y, n: int):
    """Rebuild |gs> = Σ_j y_j |v_j> from a COMPLETED tridiagonalization.

    The two-pass plain-Lanczos scheme (PLAIN_LANCZOS.f90:189-397) needs the
    Krylov basis twice: once to tridiagonalize, once to accumulate the
    ground state. This second pass replays the recurrence reusing the stored
    (alpha, beta) coefficients, so it is DOT-FREE — one matvec per step and
    nothing else. Combined with lanczos_tridiag_op this gives the ground
    state in exactly 2n matvecs (lanczos_ground_state re-tridiagonalizes
    internally, costing 3n; VERDICT r2 weak #3).

    betas: reference layout (betas[0]=1 sentinel; betas[j] couples
    v_{j-1} -> v_j)."""
    from .device import place_krylov
    arrays, v0 = place_krylov(arrays, v0)
    return _rebuild_gs_op_jit(spec, blocks, arrays, v0,
                              jnp.asarray(alphas), jnp.asarray(betas),
                              jnp.asarray(y), n)


@partial(jax.jit, static_argnums=(0, 1, 7))
def _rebuild_gs_op_jit(spec, blocks, arrays, v0, alphas, betas, y, n: int):
    from .hamiltonian import apply_op

    def mv(x):
        V = _unflatten_blocks_static(x, blocks)
        return _flatten_tuple(apply_op(spec, arrays, V))

    rdt = jnp.float64 if v0.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    alphas = alphas.astype(rdt)
    betas = betas.astype(rdt)
    y = y.astype(rdt)
    # beta_next[j] = betas[j+1] normalizes w_j -> v_{j+1}
    beta_next = jnp.concatenate([betas[1:], jnp.ones(1, rdt)])

    def step(carry, j):
        v_prev, v, acc = carry
        acc = acc + y[j] * v
        w = mv(v)
        w = w - alphas[j] * v - betas[j] * v_prev
        bn = beta_next[j]
        vn = w / jnp.where(bn > _BREAKDOWN, bn, 1.0)
        return (v, vn, acc), None

    init = (jnp.zeros_like(v0), v0, jnp.zeros_like(v0))
    carry, _ = jax.lax.scan(step, init, jnp.arange(n))
    gs = carry[2]
    return gs / jnp.linalg.norm(gs)


# ----------------------------------------------------------------------
# spec/arrays operator interface (stable jit keys across DMFT iterations)
# ----------------------------------------------------------------------
# The closure-based entry points above retrace whenever a new matvec closure
# is created (every sector rebuild). These variants take the operator as
# (spec, blocks, arrays) from hamiltonian.make_matvec_op: spec/blocks are
# hashable static arguments, arrays are traced — recompilation happens only
# when the sector *structure* changes.

def _flatten_tuple(Y):
    return jnp.concatenate([y.reshape(-1) for y in Y])


def _unflatten_blocks_static(x, blocks):
    out = []
    off = 0
    for (ddw, dup) in blocks:
        out.append(x[off:off + ddw * dup].reshape(ddw, dup))
        off += ddw * dup
    return tuple(out)


@partial(jax.jit, static_argnums=(0, 1, 4))
def _lanczos_tridiag_op_jit(spec, blocks, arrays, v0, niter: int):
    from .hamiltonian import apply_op

    def mv(x):
        V = _unflatten_blocks_static(x, blocks)
        return _flatten_tuple(apply_op(spec, arrays, V))

    return _lanczos_tridiag_impl(mv, v0, niter)


def lanczos_tridiag_op(spec, blocks, arrays, v0, niter: int):
    """lanczos_tridiag with the operator in spec/arrays form. Routes to
    the Krylov accelerator under hybrid placement (device.py)."""
    from .device import place_krylov
    arrays, v0 = place_krylov(arrays, v0)
    return _lanczos_tridiag_op_jit(spec, blocks, arrays, v0, niter)


def _lanczos_tridiag_impl(matvec, v0, niter: int):
    dt = v0.dtype
    rdt = jnp.float64 if dt in (jnp.float64, jnp.complex128) else jnp.float32

    def step(carry, _):
        v_prev, v, b_prev, alive = carry
        w = matvec(v)
        a = precise_dot(v, w)
        w = w - a * v - b_prev * v_prev
        b = jnp.sqrt(precise_dot(w, w))
        ok = alive & (b > _BREAKDOWN)
        v_next = jnp.where(ok, w / jnp.where(b > 0, b, 1.0),
                           jnp.zeros_like(w))
        out_a = jnp.where(alive, a, 0.0)
        out_b = jnp.where(ok, b, 0.0)
        return (jnp.where(ok, v, v_prev), v_next, jnp.where(ok, b, 0.0),
                ok), (out_a.astype(rdt), out_b.astype(rdt), alive)

    init = (jnp.zeros_like(v0), v0, jnp.asarray(0.0, rdt), jnp.asarray(True))
    _, (alphas, betas, alive) = jax.lax.scan(step, init, None, length=niter)
    nsteps = jnp.sum(alive.astype(jnp.int32))
    betas_out = jnp.concatenate([jnp.ones(1, rdt), betas[:-1]])
    return alphas, betas_out, nsteps


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _expand_op(spec, blocks, arrays, V, T, j0: int, m: int):
    """`_expand` with the operator in spec/arrays form."""
    from .hamiltonian import apply_op

    def mv(x):
        Vb = _unflatten_blocks_static(x, blocks)
        return _flatten_tuple(apply_op(spec, arrays, Vb))

    return _expand(mv, V, T, j0, m)


def eigs_lanczos_op(spec, blocks, arrays, v0, neigen, ncv, maxiter=512,
                    tol=1e-12):
    """Thick-restart Lanczos with stable compile keys (see eigs_lanczos)."""
    from .device import place_krylov
    arrays, v0 = place_krylov(arrays, v0)
    dim = v0.shape[0]
    neigen = min(neigen, dim)
    ncv = int(min(max(ncv, neigen + 2), dim))
    dt = v0.dtype
    k = neigen
    V = jnp.zeros((ncv + 1, dim), dtype=dt)
    V = V.at[0].set(v0 / jnp.linalg.norm(v0))
    T = jnp.zeros((ncv + 1, ncv + 1), dtype=dt)
    niter = 0
    j0 = 0
    restarts = max(1, int(np.ceil(maxiter / max(ncv - k, 1))))
    evals = None
    for it in range(restarts):
        V, T, betas = _expand_op(spec, blocks, arrays, V, T, j0, ncv)
        niter += ncv - j0
        betas_h = np.asarray(betas)
        m_eff = ncv
        bad = np.nonzero(betas_h < _BREAKDOWN)[0]
        if bad.size:
            m_eff = j0 + int(bad[0]) + 1
        Th = np.asarray(T[:m_eff, :m_eff])
        evals_all, Y = np.linalg.eigh(Th)
        k_eff = min(k, m_eff)
        evals = evals_all[:k_eff]
        beta_m = float(np.asarray(T[m_eff, m_eff - 1]).real) \
            if m_eff < ncv + 1 else 0.0
        resid = np.abs(beta_m * Y[m_eff - 1, :k_eff])
        if np.all(resid < max(tol, 1e-14) * np.maximum(1.0, np.abs(evals))) \
                or m_eff < ncv or niter >= maxiter:
            Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)
            return evals, (Yk.T @ V[:m_eff]), niter
        Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)
        ritz = Yk.T @ V[:m_eff]
        vres = V[m_eff]
        V = jnp.zeros((ncv + 1, dim), dtype=dt)
        V = V.at[:k_eff].set(ritz)
        V = V.at[k_eff].set(vres)
        T = jnp.zeros((ncv + 1, ncv + 1), dtype=dt)
        T = T.at[jnp.arange(k_eff), jnp.arange(k_eff)].set(
            jnp.asarray(evals).astype(dt))
        s = jnp.asarray(beta_m * Y[m_eff - 1, :k_eff], dtype=dt)
        T = T.at[k_eff, :k_eff].set(jnp.conj(s))
        T = T.at[:k_eff, k_eff].set(s)
        j0 = k_eff
    Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)
    return evals, (Yk.T @ V[:m_eff]), niter


@partial(jax.jit, static_argnums=(0, 1, 4))
def _lanczos_tridiag_op_batched_jit(spec, blocks, arrays, V0, niter: int):
    from .hamiltonian import apply_op

    def mv(x):
        V = _unflatten_blocks_static(x, blocks)
        return _flatten_tuple(apply_op(spec, arrays, V))

    def one(v0):
        return _lanczos_tridiag_impl(mv, v0, niter)

    return jax.vmap(one)(V0)


def lanczos_tridiag_op_batched(spec, blocks, arrays, V0, niter: int):
    """vmapped 3-term recurrence: V0 [B, dim] -> (alphas [B, niter],
    betas [B, niter], nsteps [B]). One compiled scan serves every GF
    channel targeting the same sector — the device-side batching the
    reference's per-channel serial Lanczos loops never had."""
    from .device import place_krylov
    arrays, V0 = place_krylov(arrays, V0)
    return _lanczos_tridiag_op_batched_jit(spec, blocks, arrays, V0, niter)


@partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _expand_op_stacked(spec, blocks, arrays_stacked, V, T, j0: int, m: int):
    """vmapped `_expand_op` over a stack of structurally identical
    operators: V [S, m+1, dim], T [S, m+1, m+1]."""
    from .hamiltonian import apply_op

    def one(arrays, Vs, Ts):
        def mv(x):
            Vb = _unflatten_blocks_static(x, blocks)
            return _flatten_tuple(apply_op(spec, arrays, Vb))
        return _expand(mv, Vs, Ts, j0, m)

    return jax.vmap(one)(arrays_stacked, V, T)


def eigs_lanczos_op_stacked(spec, blocks, arrays_stacked, V0, neigen, ncv,
                            maxiter=512, tol=1e-12, mesh=None):
    """Lockstep thick-restart Lanczos over S structurally identical
    operators (the same sector on S inequivalent lattice sites): ONE
    compiled basis expansion serves every site per restart — the
    large-sector replacement of the reference's round-robin MPI site loop
    (ED_MAIN.f90:576-678). Same Rayleigh-Ritz/restart logic as
    eigs_lanczos_op, run per site on the host over the small projected
    matrices; a site that converges (or hits an exact-subspace breakdown)
    is finalized and frozen while the rest keep restarting.

    V0: [S, dim]. With `mesh`, the site axis is sharded over its 'sites'
    axis (padding S to the axis multiple by repeating the last site; padded
    results are discarded) — the multi-chip form of the reference's MPI
    site distribution. Returns (evals [S, neigen], evecs list of
    [k_eff, dim], iterations)."""
    S_orig = V0.shape[0]
    if mesh is not None and mesh.shape.get("sites", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ns = mesh.shape["sites"]
        npad = (-S_orig) % ns
        if npad:
            arrays_stacked = tuple(
                jnp.concatenate([a, jnp.repeat(a[-1:], npad, axis=0)])
                for a in arrays_stacked)
            V0 = jnp.concatenate([V0, jnp.repeat(V0[-1:], npad, axis=0)])

        def _shd(a):
            return NamedSharding(mesh, P("sites", *([None] * (a.ndim - 1))))
        arrays_stacked = tuple(jax.device_put(a, _shd(a))
                               for a in arrays_stacked)
        V0 = jax.device_put(V0, _shd(V0))
    else:
        from .device import place_krylov
        arrays_stacked, V0 = place_krylov(arrays_stacked, V0)
    S, dim = V0.shape
    neigen = min(neigen, dim)
    ncv = int(min(max(ncv, neigen + 2), dim))
    dt = V0.dtype
    k = neigen
    V = jnp.zeros((S, ncv + 1, dim), dtype=dt)
    V = V.at[:, 0].set(V0 / jnp.linalg.norm(V0, axis=1, keepdims=True))
    T = jnp.zeros((S, ncv + 1, ncv + 1), dtype=dt)
    if mesh is not None and mesh.shape.get("sites", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        V = jax.device_put(V, NamedSharding(mesh, P("sites", None, None)))
        T = jax.device_put(T, NamedSharding(mesh, P("sites", None, None)))
    niter = 0
    j0 = 0
    restarts = max(1, int(np.ceil(maxiter / max(ncv - k, 1))))
    done = np.zeros(S, dtype=bool)
    out_evals = [None] * S
    out_evecs = [None] * S
    for it in range(restarts):
        V, T, betas = _expand_op_stacked(spec, blocks, arrays_stacked, V, T,
                                         j0, ncv)
        niter += ncv - j0
        betas_h = np.asarray(betas)                      # [S, ncv - j0]
        Th = np.asarray(T)
        finish, Yks, meffs = [], {}, {}
        for s in range(S):
            if done[s]:
                continue
            m_eff = ncv
            bad = np.nonzero(betas_h[s] < _BREAKDOWN)[0]
            if bad.size:
                m_eff = j0 + int(bad[0]) + 1
            evals_all, Y = np.linalg.eigh(Th[s, :m_eff, :m_eff])
            k_eff = min(k, m_eff)
            beta_m = float(Th[s, m_eff, m_eff - 1].real) \
                if m_eff < ncv + 1 else 0.0
            resid = np.abs(beta_m * Y[m_eff - 1, :k_eff])
            conv = np.all(resid < max(tol, 1e-14)
                          * np.maximum(1.0, np.abs(evals_all[:k_eff])))
            if conv or m_eff < ncv or niter >= maxiter \
                    or it == restarts - 1:
                finish.append(s)
                done[s] = True
                out_evals[s] = evals_all[:k_eff]
            Yks[s] = (Y, m_eff, k_eff, evals_all)
            meffs[s] = m_eff
        for s in finish:
            Y, m_eff, k_eff, _ = Yks[s]
            Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)
            out_evecs[s] = Yk.T @ V[s, :m_eff]
        if done.all():
            break
        # --- thick restart for the sites still running (m_eff == ncv for
        # all of them, so the update is uniform and vectorizes)
        Ystack = np.zeros((S, ncv, k), dtype=np.asarray(Th).dtype)
        svals = np.zeros((S, k), dtype=Ystack.dtype)
        evs = np.zeros((S, k), dtype=float)
        for s in range(S):
            if done[s] or s not in Yks:
                continue
            Y, m_eff, k_eff, evals_all = Yks[s]
            Ystack[s] = Y[:, :k]
            beta_m = float(Th[s, m_eff, m_eff - 1].real)
            svals[s] = beta_m * Y[m_eff - 1, :k]
            evs[s] = evals_all[:k]
        Yk_d = jnp.asarray(Ystack, dtype=dt)
        ritz = jnp.einsum("sjk,sjd->skd", Yk_d, V[:, :ncv])
        vres = V[:, ncv]
        V_new = jnp.zeros((S, ncv + 1, dim), dtype=dt)
        V_new = V_new.at[:, :k].set(ritz)
        V_new = V_new.at[:, k].set(vres)
        Tn = np.zeros((S, ncv + 1, ncv + 1), dtype=np.asarray(Th).dtype)
        for s in range(S):
            Tn[s, np.arange(k), np.arange(k)] = evs[s]
            Tn[s, k, :k] = np.conj(svals[s])
            Tn[s, :k, k] = svals[s]
        keep = jnp.asarray(done)[:, None, None]
        V = jnp.where(keep, V, V_new)
        T = jnp.where(keep, T, jnp.asarray(Tn, dtype=dt))
        j0 = k
    evals = np.stack([np.pad(e, (0, k - len(e)), constant_values=np.inf)
                      for e in out_evals[:S_orig]])
    return evals, out_evecs[:S_orig], niter


@partial(jax.jit, static_argnums=(0, 1, 7))
def _rebuild_gs_op_stacked_jit(spec, blocks, arrays_stacked, V0, alphas,
                               betas, y, n: int):
    from .hamiltonian import apply_op

    def one(arrays, v0, al, be, yv):
        def mv(x):
            V = _unflatten_blocks_static(x, blocks)
            return _flatten_tuple(apply_op(spec, arrays, V))
        rdt = jnp.float64 if v0.dtype in (jnp.float64, jnp.complex128) \
            else jnp.float32
        al = al.astype(rdt)
        be = be.astype(rdt)
        yv = yv.astype(rdt)
        beta_next = jnp.concatenate([be[1:], jnp.zeros(1, rdt)])

        def step(carry, j):
            v_prev, v, acc = carry
            acc = acc + yv[j] * v
            w = mv(v)
            w = w - al[j] * v - be[j] * v_prev
            bn = beta_next[j]
            # zero past a member's breakdown point (betas are 0 there from
            # the masked tridiag pass): the lockstep replay stays finite
            # and, with yv zero-padded beyond the member's chain, exact
            vn = jnp.where(bn > _BREAKDOWN,
                           w / jnp.where(bn > 0, bn, 1.0),
                           jnp.zeros_like(w))
            return (v, vn, acc), None

        init = (jnp.zeros_like(v0), v0, jnp.zeros_like(v0))
        carry, _ = jax.lax.scan(step, init, jnp.arange(n))
        gs = carry[2]
        return gs / jnp.linalg.norm(gs)

    return jax.vmap(one)(arrays_stacked, V0, alphas, betas, y)


def lanczos_rebuild_gs_op_stacked(spec, blocks, arrays_stacked, V0, alphas,
                                  betas, y, n: int):
    """Stacked two-pass rebuild: |gs_s> = Σ_j y[s, j] |v_j(s)> for S
    structurally identical operators in ONE lockstep dot-free scan — the
    rebuild companion of lanczos_tridiag_op_stacked. V0 [S, dim],
    alphas/betas/y [S, >=n] (y zero-padded past each member's chain
    length). Returns [S, dim] normalized ground states."""
    from .device import place_krylov
    arrays_stacked, V0 = place_krylov(arrays_stacked, V0)
    return _rebuild_gs_op_stacked_jit(spec, blocks, arrays_stacked, V0,
                                      jnp.asarray(alphas),
                                      jnp.asarray(betas),
                                      jnp.asarray(y), n)


def lanczos_tridiag_op_stacked(spec, blocks, arrays_stacked, V0, niter: int):
    """Doubly-vmapped 3-term recurrence over a stack of structurally
    identical operators: arrays_stacked is the spec's array tuple with a
    leading group axis [S, ...] (same spec, different values — e.g. the
    same sector on S inequivalent lattice sites, or S equal-shape
    sectors), V0 [S, B, dim] -> (alphas [S, B, niter], betas, nsteps).
    One compiled scan serves every (operator, channel) pair — the sites/
    sectors axis the reference distributes round-robin over MPI ranks
    (ED_MAIN.f90:576-678) becomes a device batch axis."""
    from .hamiltonian import apply_op
    from .device import place_krylov
    arrays_stacked, V0 = place_krylov(arrays_stacked, V0)

    def one(arrays, v0):
        def mv(x):
            V = _unflatten_blocks_static(x, blocks)
            return _flatten_tuple(apply_op(spec, arrays, V))
        return _lanczos_tridiag_impl(mv, v0, niter)

    return jax.vmap(lambda arrays, vs: jax.vmap(partial(one, arrays))(vs))(
        arrays_stacked, V0)


# ----------------------------------------------------------------------
# block-tuple Krylov: the distributed production form
# ----------------------------------------------------------------------
# Vectors stay as tuples of per-block matrices V_b [ddw_b, dup_b] (rows
# shardable over the mesh 'rows' axis — parallel/hxv.py pads each block to
# the mesh multiple). All reductions use the precise-dot form so the TPU
# f64-reduction pathology never enters the distributed hot loop, and under
# GSPMD they lower to psum over ICI — the XLA-native replacement of the
# reference's MPI allreduce inside P-ARPACK (ED_HAMILTONIAN_STORED_HxV.f90
# :147-197, .repo/ARPACK_LANCZOS.f90).

def _pdot_pair(a, b):
    """Re<a|b> of two equally-shaped arrays, full reduction, precise on TPU
    (see precise_dot). Works for any rank."""
    if a.dtype == jnp.float64 and jax.default_backend() == "tpu":
        a32 = a.astype(jnp.float32)
        al = (a - a32.astype(jnp.float64)).astype(jnp.float32)
        b32 = b.astype(jnp.float32)
        bl = (b - b32.astype(jnp.float64)).astype(jnp.float32)
        d1 = jnp.sum(a32 * b32, dtype=jnp.float32)
        d2 = jnp.sum(a32 * bl + al * b32, dtype=jnp.float32)
        return d1.astype(jnp.float64) + d2.astype(jnp.float64)
    return jnp.real(jnp.sum(jnp.conj(a) * b))


def tuple_real_dot(A, B):
    """Re<A|B> over a block tuple."""
    return sum(_pdot_pair(a, b) for a, b in zip(A, B))


def _constrain(V, shd):
    if shd is None:
        return V
    return tuple(jax.lax.with_sharding_constraint(v, shd) for v in V)


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def lanczos_tridiag_blocks(spec, blocks, arrays, V0, niter: int, shd=None):
    """3-term Lanczos recurrence in the block-tuple layout.

    V0: tuple of per-block matrices (rows shardable); shd: optional
    NamedSharding pinned onto every Krylov vector each step (static —
    NamedSharding is hashable). Same contract as lanczos_tridiag_op:
    returns (alphas [niter], betas [niter] with the beta[0]=1 sentinel,
    nsteps)."""
    from .hamiltonian import apply_op
    dt = V0[0].dtype
    rdt = jnp.float64 if dt in (jnp.float64, jnp.complex128) else jnp.float32

    def mv(V):
        return _constrain(apply_op(spec, arrays, _constrain(V, shd)), shd)

    def axpy(c, X, Y):          # Y - c*X per leaf
        return tuple(y - c * x for x, y in zip(X, Y))

    def step(carry, _):
        v_prev, v, b_prev, alive = carry
        w = mv(v)
        a = tuple_real_dot(v, w)
        w = axpy(a, v, w)
        w = axpy(b_prev, v_prev, w)
        b = jnp.sqrt(tuple_real_dot(w, w))
        ok = alive & (b > _BREAKDOWN)
        binv = jnp.where(b > 0, 1.0 / jnp.where(b > 0, b, 1.0), 0.0)
        v_next = tuple(jnp.where(ok, wb * binv, jnp.zeros_like(wb))
                       for wb in w)
        out_a = jnp.where(alive, a, 0.0)
        out_b = jnp.where(ok, b, 0.0)
        v_keep = tuple(jnp.where(ok, vb, pb)
                       for vb, pb in zip(v, v_prev))
        return (v_keep, _constrain(v_next, shd), jnp.where(ok, b, 0.0), ok), \
            (out_a.astype(rdt), out_b.astype(rdt), alive)

    zeros = tuple(jnp.zeros_like(v) for v in V0)
    init = (zeros, _constrain(V0, shd), jnp.asarray(0.0, rdt),
            jnp.asarray(True))
    _, (alphas, betas, alive) = jax.lax.scan(step, init, None, length=niter)
    nsteps = jnp.sum(alive.astype(jnp.int32))
    betas_out = jnp.concatenate([jnp.ones(1, rdt), betas[:-1]])
    return alphas, betas_out, nsteps


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def lanczos_tridiag_blocks_batched(spec, blocks, arrays, V0, niter: int,
                                   shd=None):
    """Batched block-tuple recurrence: V0 leaves [B, ddw_b, dup_b]; one
    compiled scan serves B channels of one (possibly sharded) sector —
    the GF batching axis composed with the row sharding. shd applies to
    the batched leaves (e.g. P(None, 'rows', None))."""
    from .hamiltonian import apply_op
    dt = V0[0].dtype
    rdt = jnp.float64 if dt in (jnp.float64, jnp.complex128) else jnp.float32

    def mv(V):
        Y = jax.vmap(lambda Vb: apply_op(spec, arrays, Vb))(V)
        return _constrain(Y, shd)

    def bdot(A, B):
        # per-batch Re<a|b>: reduce all but the leading axis
        def one(a, b):
            if a.dtype == jnp.float64 and jax.default_backend() == "tpu":
                a32 = a.astype(jnp.float32)
                al = (a - a32.astype(jnp.float64)).astype(jnp.float32)
                b32 = b.astype(jnp.float32)
                bl = (b - b32.astype(jnp.float64)).astype(jnp.float32)
                d1 = jnp.sum(a32 * b32, axis=(-2, -1), dtype=jnp.float32)
                d2 = jnp.sum(a32 * bl + al * b32, axis=(-2, -1),
                             dtype=jnp.float32)
                return d1.astype(jnp.float64) + d2.astype(jnp.float64)
            return jnp.real(jnp.sum(jnp.conj(a) * b, axis=(-2, -1)))
        return sum(one(a, b) for a, b in zip(A, B))

    def step(carry, _):
        v_prev, v, b_prev, alive = carry
        w = mv(v)
        a = bdot(v, w)                                     # [B]
        w = tuple(wb - a[:, None, None] * vb for vb, wb in zip(v, w))
        w = tuple(wb - b_prev[:, None, None] * pb
                  for pb, wb in zip(v_prev, w))
        b = jnp.sqrt(bdot(w, w))
        ok = alive & (b > _BREAKDOWN)
        binv = jnp.where(b > 0, 1.0 / jnp.where(b > 0, b, 1.0), 0.0)
        v_next = tuple(jnp.where(ok[:, None, None], wb * binv[:, None, None],
                                 jnp.zeros_like(wb)) for wb in w)
        v_keep = tuple(jnp.where(ok[:, None, None], vb, pb)
                       for vb, pb in zip(v, v_prev))
        return (v_keep, _constrain(v_next, shd), jnp.where(ok, b, 0.0), ok), \
            (jnp.where(alive, a, 0.0).astype(rdt),
             jnp.where(ok, b, 0.0).astype(rdt), alive)

    B = V0[0].shape[0]
    zeros = tuple(jnp.zeros_like(v) for v in V0)
    init = (zeros, _constrain(V0, shd), jnp.zeros(B, rdt),
            jnp.ones(B, dtype=bool))
    _, (alphas, betas, alive) = jax.lax.scan(step, init, None, length=niter)
    nsteps = jnp.sum(alive.astype(jnp.int32), axis=0)        # [B]
    ones = jnp.ones((1, B), rdt)
    betas_out = jnp.concatenate([ones, betas[:-1]], axis=0)
    return alphas.T, betas_out.T, nsteps                     # [B, niter]


def _proj_rows(V, w):
    """h[k] = Σ conj(V[k])·w over the trailing axes — the Gram-Schmidt
    projection of the thick-restart expand. Precise f32-pair form for real
    f64 on TPU (a plain f64 einsum would hit the emulated-reduce
    pathology); exact einsum elsewhere."""
    if V.dtype == jnp.float64 and jax.default_backend() == "tpu":
        V32 = V.astype(jnp.float32)
        Vl = (V - V32.astype(jnp.float64)).astype(jnp.float32)
        w32 = w.astype(jnp.float32)
        wl = (w - w32.astype(jnp.float64)).astype(jnp.float32)
        d1 = jnp.einsum("kij,ij->k", V32, w32,
                        preferred_element_type=jnp.float32)
        d2 = jnp.einsum("kij,ij->k", V32, wl,
                        preferred_element_type=jnp.float32) \
            + jnp.einsum("kij,ij->k", Vl, w32,
                         preferred_element_type=jnp.float32)
        return d1.astype(jnp.float64) + d2.astype(jnp.float64)
    return jnp.einsum("kij,ij->k", jnp.conj(V), w)


@partial(jax.jit, static_argnums=(0, 1, 5, 6, 7))
def _expand_blocks(spec, blocks, arrays, V, T, j0: int, m: int, shd=None):
    """Thick-restart basis expansion in the block-tuple layout.

    V: tuple of [m+1, ddw_b, dup_b] basis stacks (rows shardable on the
    middle axis); T: [m+1, m+1] projected operator. Two Gram-Schmidt
    passes as in _expand."""
    from .hamiltonian import apply_op

    def step(carry, j):
        V, T = carry
        v = tuple(Vb[j] for Vb in V)
        w = apply_op(spec, arrays, v)
        h1 = sum(_proj_rows(Vb, wb) for Vb, wb in zip(V, w))
        w = tuple(wb - jnp.einsum("k,kij->ij", h1.astype(Vb.dtype), Vb)
                  for Vb, wb in zip(V, w))
        h2 = sum(_proj_rows(Vb, wb) for Vb, wb in zip(V, w))
        w = tuple(wb - jnp.einsum("k,kij->ij", h2.astype(Vb.dtype), Vb)
                  for Vb, wb in zip(V, w))
        h = h1 + h2
        b = jnp.sqrt(tuple_real_dot(w, w))
        safe = b > _BREAKDOWN
        scale = jnp.where(safe, 1.0, 0.0) / jnp.where(safe, b, 1.0)
        V = tuple(Vb.at[j + 1].set(wb * scale) for Vb, wb in zip(V, w))
        T = T.at[:, j].set(h.astype(T.dtype))
        T = T.at[j, :].set(jnp.conj(h).astype(T.dtype))
        T = T.at[j + 1, j].set(b.astype(T.dtype))
        T = T.at[j, j + 1].set(b.astype(T.dtype))
        return (V, T), b

    if shd is not None:
        V = tuple(jax.lax.with_sharding_constraint(v, shd) for v in V)
    (V, T), betas = jax.lax.scan(step, (V, T), jnp.arange(j0, m))
    return V, T, betas


def eigs_lanczos_blocks(spec, blocks, arrays, V0, neigen, ncv, maxiter=512,
                        tol=1e-12, shd=None):
    """Thick-restart Lanczos in the block-tuple layout (the distributed
    eigs path wired into diagonalize() for sectors above
    shard_dim_threshold; same restart logic as eigs_lanczos_op).

    V0: block tuple; shd: optional NamedSharding for the [ncv+1, ddw, dup]
    basis stacks (e.g. P(None, 'rows', None)).
    Returns (evals [k], evecs — tuple of [k, ddw_b, dup_b], niter)."""
    dim = sum(int(np.prod(v.shape)) for v in V0)
    neigen = min(neigen, dim)
    ncv = int(min(max(ncv, neigen + 2), dim))
    dt = V0[0].dtype
    k = neigen
    nrm = jnp.sqrt(tuple_real_dot(V0, V0))
    V = tuple(jnp.zeros((ncv + 1,) + v.shape, dtype=dt).at[0].set(v / nrm)
              for v in V0)
    T = jnp.zeros((ncv + 1, ncv + 1), dtype=dt)
    niter = 0
    j0 = 0
    restarts = max(1, int(np.ceil(maxiter / max(ncv - k, 1))))
    evals = None
    for it in range(restarts):
        V, T, betas = _expand_blocks(spec, blocks, arrays, V, T, j0, ncv,
                                     shd)
        niter += ncv - j0
        betas_h = np.asarray(betas)
        m_eff = ncv
        bad = np.nonzero(betas_h < _BREAKDOWN)[0]
        if bad.size:
            m_eff = j0 + int(bad[0]) + 1
        Th = np.asarray(T[:m_eff, :m_eff])
        evals_all, Y = np.linalg.eigh(Th)
        k_eff = min(k, m_eff)
        evals = evals_all[:k_eff]
        beta_m = float(np.asarray(T[m_eff, m_eff - 1]).real) \
            if m_eff < ncv + 1 else 0.0
        resid = np.abs(beta_m * Y[m_eff - 1, :k_eff])
        Yk = jnp.asarray(Y[:, :k_eff], dtype=dt)

        def ritz_vecs():
            return tuple(jnp.einsum("mk,mij->kij", Yk, Vb[:m_eff])
                         for Vb in V)

        if np.all(resid < max(tol, 1e-14) * np.maximum(1.0, np.abs(evals))) \
                or m_eff < ncv or niter >= maxiter:
            return evals, ritz_vecs(), niter
        ritz = ritz_vecs()
        vres = tuple(Vb[m_eff] for Vb in V)
        V = tuple(jnp.zeros((ncv + 1,) + Vb.shape[1:], dtype=dt)
                  .at[:k_eff].set(r).at[k_eff].set(vr)
                  for Vb, r, vr in zip(V, ritz, vres))
        T = jnp.zeros((ncv + 1, ncv + 1), dtype=dt)
        T = T.at[jnp.arange(k_eff), jnp.arange(k_eff)].set(
            jnp.asarray(evals).astype(dt))
        s = jnp.asarray(beta_m * Y[m_eff - 1, :k_eff], dtype=dt)
        T = T.at[k_eff, :k_eff].set(jnp.conj(s))
        T = T.at[:k_eff, k_eff].set(s)
        j0 = k_eff
    return evals, tuple(jnp.einsum("mk,mij->kij", Yk, Vb[:m_eff])
                        for Vb in V), niter
