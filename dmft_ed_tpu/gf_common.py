"""Shared Krylov Green's-function machinery.

Replaces ED_GF_SHARED.f90 + the per-module `add_to_lanczos_*` accumulators:
the Lanczos resolvent of an excitation vector yields (weights, poles), and the
spectral accumulation Σ_j w_j/(z - p_j) is one vectorized outer-product sum
over all frequencies (ED_GF_NORMAL.f90:580-632 pole loop, vectorized per
SURVEY.md §7 principle 6).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .config import EDConfig
from .sectors import Sector
from .bath import Bath
from .eigenspace import StateList
from .hamiltonian import (SectorHamiltonian, build_sector_hamiltonian,
                          make_matvec, make_matvec_op, flatten_blocks,
                          unflatten_blocks)
from .lanczos import lanczos_tridiag_op, tridiag_eigh


class HamCache:
    """Per-solve cache of sector operators in spec/arrays form.

    The GF pass revisits each neighbor sector once per state/channel, and
    the DMFT loop revisits every sector each iteration with new bath values:
    the spec/arrays split keeps the jit compile keys stable across
    iterations (only the structure, not the values, keys the compile)."""

    def __init__(self, cfg: EDConfig, bath: Bath, hloc: np.ndarray,
                 mesh=None):
        self.cfg, self.bath, self.hloc = cfg, bath, hloc
        self.mesh = mesh
        self._ham: Dict[int, SectorHamiltonian] = {}
        self._op: Dict[int, tuple] = {}
        self._op_sharded: Dict[int, tuple] = {}

    def ham(self, sector: Sector) -> SectorHamiltonian:
        key = sector.index
        if key not in self._ham:
            self._ham[key] = build_sector_hamiltonian(self.cfg, sector,
                                                      self.bath, self.hloc)
        return self._ham[key]

    def op(self, sector: Sector):
        key = sector.index
        if key not in self._op:
            self._op[key] = make_matvec_op(self.ham(sector), self.cfg)
        return self._op[key]

    def sharded(self, sector: Sector) -> bool:
        """Whether this sector's Krylov runs row-sharded over the mesh."""
        return (self.mesh is not None
                and self.mesh.shape.get("rows", 1) > 1
                and sector.dim >= self.cfg.shard_dim_threshold)

    def op_sharded(self, sector: Sector):
        """(spec, arrays, blocks, sector_padded, shd, shd_b) of the padded
        row-sharded operator (parallel.hxv.sharded_sector_op)."""
        key = sector.index
        if key not in self._op_sharded:
            from .parallel.hxv import sharded_sector_op
            self._op_sharded[key] = sharded_sector_op(self.ham(sector),
                                                      self.cfg, self.mesh)
        return self._op_sharded[key]


def krylov_poles(cfg: EDConfig, cache: HamCache, jsec: Sector,
                 vvinit: np.ndarray, state_e: float,
                 egs: float, zeta: float, finite_t: bool,
                 cnorm2=None) -> Tuple[np.ndarray, np.ndarray]:
    """Tridiagonalize H_jsec from vvinit and return (weights, dE poles).

    weights_j = pesoBZ * |<v0|ritz_j>|^2 with the Boltzmann prefactor
    (add_to_lanczos_gf_normal, ED_GF_NORMAL.f90:580-615); poles are
    dE_j = E_j - E_i (caller applies the ±isign and z-grid).
    """
    norm2 = float(np.real(np.vdot(vvinit, vvinit)))
    if norm2 < 1e-300:
        return np.zeros(0, dtype=complex), np.zeros(0)
    v0 = jnp.asarray(vvinit / np.sqrt(norm2))
    nlanc = min(jsec.dim, cfg.lanc_ngfiter)
    spec, arrays, blocks = cache.op(jsec)
    alphas, betas, nsteps = lanczos_tridiag_op(spec, blocks, arrays, v0,
                                               nlanc)
    n = max(int(nsteps), 1)
    evals, Z = tridiag_eigh(np.asarray(alphas[:n]), np.asarray(betas[:n]))
    beta_T = cfg.beta
    if finite_t and beta_T * (state_e - egs) < 200:
        peso_bz = np.exp(-beta_T * (state_e - egs)) / zeta
    elif not finite_t:
        peso_bz = 1.0 / zeta
    else:
        peso_bz = 0.0
    amp = norm2 if cnorm2 is None else cnorm2 * norm2
    weights = amp * peso_bz * Z[0, :] ** 2
    poles = evals - state_e
    return np.asarray(weights, dtype=complex), np.asarray(poles)


def accumulate_poles(z: np.ndarray, weights: np.ndarray, poles: np.ndarray,
                     isign: int) -> np.ndarray:
    """G(z) += Σ_j w_j / (z - isign*dE_j), vectorized over (poles x freqs).

    Host numpy on purpose: this is O(npoles * L) complex128 work — trivial
    on CPU and unrepresentable on TPU (no complex128); under hybrid
    placement (device.py) only the Krylov recurrences ride the
    accelerator."""
    if weights.size == 0:
        return np.zeros(z.shape, dtype=complex)
    zz = np.asarray(z)[None, :]
    pp = isign * np.asarray(poles)[:, None]
    ww = np.asarray(weights)[:, None]
    return np.sum(ww / (zz - pp), axis=0)


def state_iter(slist: StateList):
    """(sector, energy, flat vector) for each kept state (twin-reconstructed)."""
    for s in slist:
        yield s.sector, s.energy, np.asarray(s.get_vector())


class ResolventBatch:
    """Collects excitation channels and batches the Krylov resolvents on
    TWO device axes before running:

    - channels targeting the same sector stack on a vmap batch axis
      (lanczos_tridiag_op_batched — one compiled scan per sector);
    - *structurally identical* target operators — the same sector on
      different inequivalent sites (the lattice DP axis), or equal-shape
      sectors of one impurity — stack on a second vmap axis over the
      operator arrays (lanczos_tridiag_op_stacked).

    The reference runs every one of these Lanczos chains serially
    (lanc_build_gf_normal_c state/channel loops; round-robin sites,
    ED_MAIN.f90:576-678). Grouping key: the operator spec (structure +
    shapes), which is value-independent by construction (hamiltonian.py
    spec/arrays split).

    Single-impurity use: ResolventBatch(cfg, cache, egs, zeta, finite_t);
    multi-site use: ResolventBatch(cfg) + add_site(site, ...) per site,
    channel metas carry the site for routing."""

    def __init__(self, cfg: EDConfig, cache: Optional[HamCache] = None,
                 egs: float = 0.0, zeta: float = 1.0,
                 finite_t: bool = False):
        self.cfg = cfg
        self.sites: Dict[int, tuple] = {}
        if cache is not None:
            self.add_site(0, cache, egs, zeta, finite_t)
        self.jobs: Dict[tuple, list] = {}
        self.jsecs: Dict[tuple, Sector] = {}

    def add_site(self, site: int, cache: HamCache, egs: float, zeta: float,
                 finite_t: bool) -> None:
        self.sites[site] = (cache, egs, zeta, finite_t)

    def add(self, jsec: Sector, vvinit: np.ndarray, state_e: float,
            meta, site: int = 0) -> None:
        norm2 = float(np.real(np.vdot(vvinit, vvinit)))
        if norm2 < 1e-300:
            return
        key = (site, jsec.index)
        self.jsecs[key] = jsec
        self.jobs.setdefault(key, []).append(
            (vvinit / np.sqrt(norm2), norm2, state_e, meta))

    def _weights_poles(self, site, joblist, al, be, ns):
        cfg = self.cfg
        _, egs, zeta, finite_t = self.sites[site]
        for b, (v0, norm2, state_e, meta) in enumerate(joblist):
            n = max(int(ns[b]), 1)
            evals, Z = tridiag_eigh(al[b, :n], be[b, :n])
            beta_T = cfg.beta
            if finite_t and beta_T * (state_e - egs) < 200:
                peso_bz = np.exp(-beta_T * (state_e - egs)) / zeta
            elif not finite_t:
                peso_bz = 1.0 / zeta
            else:
                peso_bz = 0.0
            cnorm2 = meta.get("cnorm2", 1.0) if isinstance(meta, dict) \
                else 1.0
            weights = cnorm2 * norm2 * peso_bz * Z[0, :] ** 2
            poles = evals - state_e
            yield meta, np.asarray(weights, dtype=complex), np.asarray(poles)

    def run(self):
        """Yields (meta, weights, poles) per channel."""
        from .lanczos import lanczos_tridiag_op_stacked
        cfg = self.cfg
        # resolve operators, then group structurally identical ones;
        # sectors above shard_dim_threshold run row-sharded on the mesh
        # (channels of one sector still batch on the leading vmap axis)
        entries = []
        for key, joblist in self.jobs.items():
            site, _ = key
            jsec = self.jsecs[key]
            cache = self.sites[site][0]
            if cache.sharded(jsec):
                yield from self._run_sharded(site, cache, jsec, joblist)
                continue
            spec, arrays, blocks = cache.op(jsec)
            nlanc = min(jsec.dim, cfg.lanc_ngfiter)
            entries.append((site, spec, blocks, arrays, nlanc, joblist,
                            cache, jsec))
        yield from self._run_sweep_concat(entries)    # consumes in place
        groups: Dict[tuple, list] = {}
        for e in entries:
            gkey = (e[1], e[2], e[4],
                    tuple((a.shape, str(a.dtype)) for a in e[3]))
            groups.setdefault(gkey, []).append(e)
        # ragged merge: paddable groups whose flat dims share a power-of-two
        # class zero-embed into one bucket shape and run as ONE stacked scan
        # (different-dimension sectors on the same group axis)
        buckets: Dict[tuple, list] = {}
        for gkey, ents in groups.items():
            bkey = self._bucket_key(ents[0])
            if bkey is not None:
                buckets.setdefault(bkey, []).append(gkey)
        consumed = set()
        for bkey, gkeys in buckets.items():
            if len(gkeys) < 2:
                continue
            ents = [e for gk in gkeys for e in groups[gk]]
            ddw_pad = max(e[2][0][0] for e in ents)
            dup_pad = max(e[2][0][1] for e in ents)
            # aspect-ratio guard: in the small, dispatch-bound regime accept
            # up to ~4x the dim class (merging transposed (a,b)/(b,a) target
            # shapes); large sectors are compute-bound — require tight packing
            pad = ddw_pad * dup_pad
            if pad > 2 * bkey[-1] and not (pad <= 4 * bkey[-1]
                                           and pad <= 16384):
                continue
            from .device import ragged_batching
            vdt = np.result_type(np.dtype(ents[0][1][5]),
                                 *(j[0].dtype for e in ents for j in e[5]))
            if not ragged_batching(pad * sum(len(e[5]) for e in ents), vdt):
                continue  # host-bound Krylov: padding buys nothing there
            yield from self._run_ragged(ents, ddw_pad, dup_pad)
            consumed.update(gkeys)
        for gkey, ents in groups.items():
            if gkey in consumed:
                continue
            spec, blocks, nlanc, _ = gkey
            # common channel-count bucket (next power of two) so jit keys
            # stay stable across states/channels with varying counts
            Bmax = max(len(e[5]) for e in ents)
            Bpad = 1 << (Bmax - 1).bit_length()
            v0s = []
            for e in ents:
                stack = [j[0] for j in e[5]]
                stack += [stack[0]] * (Bpad - len(stack))
                v0s.append(np.stack(stack))
            V0 = jnp.asarray(np.stack(v0s))               # [S, Bpad, dim]
            arrays_stacked = tuple(
                jnp.stack([e[3][i] for e in ents])
                for i in range(len(ents[0][3])))
            al, be, ns = lanczos_tridiag_op_stacked(
                spec, blocks, arrays_stacked, V0, nlanc)
            al, be, ns = np.asarray(al), np.asarray(be), np.asarray(ns)
            for si, e in enumerate(ents):
                yield from self._weights_poles(e[0], e[5], al[si], be[si],
                                               ns[si])
        self.jobs.clear()
        self.jsecs.clear()

    def _run_sweep_concat(self, entries):
        """Round-5 wide-concat GF backend (sweep_plain.py): all (sector,
        channel) Lanczos chains of one site whose target sectors are
        mix-free single blocks run as ONE lockstep scan whose matvec
        shares the per-(spin, n) operators across sectors and
        concatenates chain vectors into wide MXU products — the GF
        analogue of the round-5 sector-sweep engine (the per-sector/
        zero-embedded scans run the MXU at small-shape s8 rates;
        PERF_NOTES). Consumed entries are removed from `entries` by
        index; the rest flow to the vmap/ragged/stacked paths."""
        from .device import ragged_batching, place_krylov
        from .sweep_plain import (sweep_supported, make_sweep_op,
                                  sweep_tridiag)
        consumed = set()
        by_site: Dict[int, list] = {}
        for i, e in enumerate(entries):
            by_site.setdefault(e[0], []).append((i, e))
        for site, idx_ents in by_site.items():
            ents = [e for _, e in idx_ents]
            cache = self.sites[site][0]
            cfg = cache.cfg
            hams = [e[6].ham(e[7]) for e in ents]
            nchains = sum(len(e[5]) for e in ents)
            total = sum(e[7].dim * len(e[5]) for e in ents)
            hams_cplx = any(np.issubdtype(h.dtype, np.complexfloating)
                            for h in hams)
            chain_cplx = any(np.iscomplexobj(j[0])
                             for e in ents for j in e[5])
            cplx = hams_cplx or chain_cplx
            vdt = np.result_type(np.dtype(cfg.dtype),
                                 np.complex64 if cplx else np.float32)
            if nchains < 2 or not sweep_supported(cfg, hams) \
                    or not ragged_batching(total, vdt):
                continue
            if chain_cplx and not hams_cplx \
                    and cfg.matmul_precision.startswith("ozaki"):
                # complex chain vectors against real ozaki-encoded
                # operators: digit slicing is real-only — leave these to
                # the dense/stacked paths
                continue
            # flatten (sector x channel) -> collection members
            members = []    # (entry, job)
            mhams = []
            for e, h in zip(ents, hams):
                for j in e[5]:
                    members.append((e, j))
                    mhams.append(h)
            spec, arrays = make_sweep_op(cfg, mhams)
            dt = np.complex128 if cplx else np.dtype(cfg.dtype)
            V0 = tuple(jnp.asarray(np.asarray(j[0], dtype=dt).reshape(
                e[7].blocks[0].ddw, e[7].blocks[0].dup))
                for e, j in members)
            arrays, V0 = place_krylov(arrays, V0)
            nlanc = max(e[4] for e in ents)
            al, be, ns = sweep_tridiag(spec, arrays, nlanc, V0)
            al = np.asarray(al, dtype=np.float64)    # [nlanc, S]
            be = np.asarray(be, dtype=np.float64)
            ns = np.asarray(ns)
            for s, (e, j) in enumerate(members):
                # clamp to the member's own chain length (prefix-stable
                # Lanczos coefficients, as in _run_ragged_stack)
                n_s = min(int(ns[s]), e[4])
                yield from self._weights_poles(
                    e[0], [j], al[:, s][None, :], be[:, s][None, :], [n_s])
            consumed.update(i for i, _ in idx_ents)
        for i in sorted(consumed, reverse=True):
            del entries[i]

    def _bucket_key(self, e):
        """Ragged-merge bucket of a paddable entry, or None.

        Paddable: single block, no mix terms (every normal-mode sector).
        Bucket: scalar dtype + the cfg fields that drive operator encoding
        + the power-of-two class of the flat dimension — members are within
        2x of each other, so zero-embedding to the in-bucket max shape
        costs at most ~4x the smallest member (guarded again in run())."""
        blocks, cache = e[2], e[6]
        spec = e[1]
        if len(blocks) != 1 or spec[4]:
            return None
        cfg = cache.cfg
        dim = blocks[0][0] * blocks[0][1]
        p2 = 1 << (max(dim, 1) - 1).bit_length()
        return (spec[5], str(cfg.dtype), cfg.matmul_precision,
                cfg.dense_matmul_threshold, p2)

    def _run_ragged(self, ents, ddw_pad, dup_pad):
        """ONE stacked Lanczos scan over sectors of UNEQUAL shape: each
        member operator zero-embeds into the bucket block (ddw_pad,
        dup_pad) via hamiltonian.make_padded_matvec_op — exact, since the
        padded components of H and of the start vectors are identically
        zero, the Krylov chain never leaves the embedded subspace and the
        (alpha, beta) coefficients match the unpadded recurrence. All four
        (nup±1, ndw)/(nup, ndw∓1) GF target sectors of a state thus share
        one compile key and one device dispatch, where the reference runs
        a serial chain per channel (ED_GF_NORMAL.f90:580-632)."""
        from .hamiltonian import make_padded_matvec_op
        nnz_up = max(e[6].ham(e[7]).hup[0].rows.size for e in ents)
        nnz_dw = max(e[6].ham(e[7]).hdw[0].rows.size for e in ents)
        # the bucket key makes padded specs agree for same-cfg members, but
        # heterogeneous per-site cfgs can still diverge after padding (e.g.
        # n_pad crossing one site's dense_matmul_threshold): sub-group by
        # the actual padded spec instead of asserting, so mismatched
        # members just run as their own (possibly singleton) stack
        subgroups: Dict[tuple, list] = {}
        for e in ents:
            sp, ar, bl = make_padded_matvec_op(e[6].ham(e[7]), e[6].cfg,
                                               ddw_pad, dup_pad,
                                               nnz_up, nnz_dw)
            subgroups.setdefault((sp, bl), []).append((e, ar))
        for (sp, bl), sub in subgroups.items():
            yield from self._run_ragged_stack(sp, bl, sub, ddw_pad, dup_pad)

    def _run_ragged_stack(self, spec_p, blocks_p, sub, ddw_pad, dup_pad):
        from .lanczos import lanczos_tridiag_op_stacked
        ents = [e for e, _ in sub]
        ops = [ar for _, ar in sub]
        nlanc = max(e[4] for e in ents)
        Bpad = 1 << (max(len(e[5]) for e in ents) - 1).bit_length()
        # complex excitation vectors (chi combined channels) against a real
        # operator promote the whole stack, exactly as np.stack does on the
        # equal-shape path
        vdt = np.result_type(np.dtype(spec_p[5]),
                             *(j[0].dtype for e in ents for j in e[5]))
        V0 = np.zeros((len(ents), Bpad, ddw_pad * dup_pad), dtype=vdt)
        for si, e in enumerate(ents):
            ddw, dup = e[2][0]
            for b in range(Bpad):
                j = e[5][min(b, len(e[5]) - 1)]
                V0[si, b].reshape(ddw_pad, dup_pad)[:ddw, :dup] = \
                    j[0].reshape(ddw, dup)
        arrays_stacked = tuple(jnp.stack([op[i] for op in ops])
                               for i in range(len(ops[0])))
        al, be, ns = lanczos_tridiag_op_stacked(spec_p, blocks_p,
                                                arrays_stacked,
                                                jnp.asarray(V0), nlanc)
        al, be, ns = np.asarray(al), np.asarray(be), np.asarray(ns)
        for si, e in enumerate(ents):
            # clamp to the member's OWN chain length: the first k Lanczos
            # coefficients don't depend on later steps, so this reproduces
            # the per-sector run exactly (finite-precision Lanczos does not
            # reliably break down at dim, so the shared longer scan would
            # otherwise add spurious duplicate Ritz values)
            yield from self._weights_poles(e[0], e[5], al[si], be[si],
                                           np.minimum(ns[si], e[4]))

    def _run_sharded(self, site, cache, jsec, joblist):
        """Row-sharded batched tridiagonalization of one big target sector:
        the distributed GF pass (the reference scatters excitation vectors
        and Lanczos-iterates under MPI, ED_GF_NORMAL.f90:156-187;
        here the channel batch [B, ddw, dup] shards as P(None,'rows',None)
        and XLA places the collectives)."""
        import jax
        from .lanczos import lanczos_tridiag_blocks_batched
        from .parallel.hxv import pad_flat_to_blocks
        cfg = self.cfg
        spec, arrays, blocks, sec_p, shd, shd_b = cache.op_sharded(jsec)
        nlanc = min(jsec.dim, cfg.lanc_ngfiter)
        cplx = spec[-1].startswith("complex")
        dt = jnp.complex128 if cplx else jnp.dtype(cfg.dtype)
        stacks = [pad_flat_to_blocks(j[0], jsec, sec_p) for j in joblist]
        V0 = tuple(jax.device_put(
            jnp.asarray(np.stack([s[bi] for s in stacks]), dtype=dt), shd_b)
            for bi in range(len(sec_p.blocks)))
        al, be, ns = lanczos_tridiag_blocks_batched(spec, blocks, arrays,
                                                    V0, nlanc, shd_b)
        yield from self._weights_poles(site, joblist, np.asarray(al),
                                       np.asarray(be), np.asarray(ns))
