"""Energy-ordered list of kept eigenstates.

Replaces the reference's linked-list ``state_list`` (ED_EIGENSPACE.f90).
Vectors live on device as flat arrays. Twin states (ed_twin) are stored
vectorless and reconstructed on demand: in the block layout the twin map is
simply a per-block transpose for normal/superc (|{up},{dw}> -> |{dw},{up}>,
cf. flip_state ED_SETUP.f90:1150-1177 — the overall fermionic phase is
sector-constant and cancels in all observables), and a particle-hole
complement gather for nonsu2.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from . import fock
from .sectors import Sector, SectorTable
from .hamiltonian import np_unflatten_blocks, flatten_blocks


@dataclass
class EigenState:
    energy: float
    sector: Sector
    vector: Optional[jnp.ndarray]       # flat [sector.dim]; None for twins
    twin_source: Optional["EigenState"] = None

    def get_vector(self) -> jnp.ndarray:
        if self.vector is not None:
            return self.vector
        src = self.twin_source
        blocks_v = np_unflatten_blocks(np.asarray(src.vector), src.sector)
        mode = self.sector.qn[0]
        out = np.zeros(self.sector.dim, dtype=np.asarray(src.vector).dtype)
        if mode in ("normal", "superc"):
            # twin block (ndw, nup) <- transpose of source block (nup, ndw)
            for bsrc, v in zip(src.sector.blocks, blocks_v):
                bdst = self.sector.block_of(bsrc.ndw, bsrc.nup)
                out[bdst.offset:bdst.offset + bdst.dim] = \
                    np.ascontiguousarray(v.T).ravel()
        elif mode == "nonsu2":  # occupied<->empty complement per spin config
            ns = self.sector.ns
            full = (1 << ns) - 1
            for bsrc, v in zip(src.sector.blocks, blocks_v):
                bdst = self.sector.block_of(ns - bsrc.nup, ns - bsrc.ndw)
                up_src = fock.spin_states(ns, bsrc.nup)
                dw_src = fock.spin_states(ns, bsrc.ndw)
                pu = fock.rank_states(full ^ up_src, ns)
                pd = fock.rank_states(full ^ dw_src, ns)
                tgt = np.zeros((bdst.ddw, bdst.dup), dtype=v.dtype)
                tgt[np.ix_(pd, pu)] = v
                out[bdst.offset:bdst.offset + bdst.dim] = tgt.ravel()
        else:  # nonsu2jz: particle-hole complement within Lz sub-blocks —
            # the (nup, ndw, lup, ldw) sub-block maps onto
            # (Ns-nup, Ns-ndw, -lup, -ldw) because complementing an Lz
            # class of the t2g shell negates twoLz (Σ_levels Lz = 0)
            ns = self.sector.ns
            full = (1 << ns) - 1
            for bi, (bsrc, v) in enumerate(zip(src.sector.blocks, blocks_v)):
                lup, ldw = src.sector.block_lz(bi)
                iu = src.sector.up_sel(bi)
                idw = src.sector.dw_sel(bi)
                bj = self.sector.block_index_of(ns - bsrc.nup, ns - bsrc.ndw,
                                                -lup, -ldw)
                bdst = self.sector.blocks[bj]
                ju = self.sector.up_sel(bj)
                jdw = self.sector.dw_sel(bj)
                ranks_u = fock.rank_states(
                    full ^ fock.spin_states(ns, bsrc.nup)[iu], ns)
                ranks_d = fock.rank_states(
                    full ^ fock.spin_states(ns, bsrc.ndw)[idw], ns)
                pu = np.searchsorted(ju, ranks_u)
                pd = np.searchsorted(jdw, ranks_d)
                assert np.array_equal(ju[pu], ranks_u) and \
                    np.array_equal(jdw[pd], ranks_d), \
                    "complement left the twin Lz class"
                tgt = np.zeros((bdst.ddw, bdst.dup), dtype=v.dtype)
                tgt[np.ix_(pd, pu)] = v
                out[bdst.offset:bdst.offset + bdst.dim] = tgt.ravel()
        return jnp.asarray(out)


@dataclass
class StateList:
    """Sorted by energy ascending; capacity-bounded insertion
    (es_add_state, ED_EIGENSPACE.f90:138-218)."""

    states: List[EigenState] = field(default_factory=list)

    def __len__(self):
        return len(self.states)

    def __iter__(self):
        return iter(self.states)

    @property
    def emin(self) -> float:
        return self.states[0].energy if self.states else np.inf

    @property
    def emax(self) -> float:
        return self.states[-1].energy if self.states else -np.inf

    def clear(self):
        self.states = []

    def add(self, energy: float, vector: Optional[jnp.ndarray], sector: Sector,
            table: Optional[SectorTable] = None, twin: bool = False,
            size: Optional[int] = None):
        if size is not None and len(self.states) >= size and \
                energy >= self.states[-1].energy:
            return
        st = EigenState(float(energy), sector, vector)
        bisect.insort(self.states, st, key=lambda s: s.energy)
        if twin and table is not None:
            tsec = table.twin_sector(sector)
            tw = EigenState(float(energy), tsec, None, twin_source=st)
            bisect.insort(self.states, tw, key=lambda s: s.energy)
        while size is not None and len(self.states) > size:
            self.states.pop()

    def pop_last(self):
        return self.states.pop()

    def gs_degeneracy(self, threshold: float) -> int:
        e0 = self.emin
        return sum(1 for s in self.states if abs(s.energy - e0) <= threshold)

    def partition_function(self, beta: float, finite_t: bool) -> float:
        if not finite_t:
            return float(len(self.states))
        e0 = self.emin
        return float(sum(np.exp(-beta * (s.energy - e0)) for s in self.states))
