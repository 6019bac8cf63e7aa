"""Symmetry sectors as block-factorized tensor-product spaces.

Replaces the reference's sector machinery (``build_sector`` ED_SETUP.f90:886-984
and the getSector/getDim/getCsector/getCDGsector pointer tables,
ED_SETUP.f90:372-808) with an explicit, closed-form representation:

Every sector — in all three ed_modes — is a union of **blocks** ``(n_up, n_dw)``,
each block being the tensor product ``spin_states(Ns, n_dw) ⊗ spin_states(Ns, n_up)``
(up index fastest). The sector vector of dimension ``dim`` is therefore a list
of matrices ``V_b`` of shape ``(dim_dw_b, dim_up_b)``, and every Hamiltonian /
excitation operator becomes block-wise Kronecker algebra (see hamiltonian.py).

* ``normal`` : quantum number (n_up, n_dw) — exactly one block.
  Sector ordering matches the reference: index = n_up*(Ns+1) + n_dw
  (0-based; setup_pointers_normal ED_SETUP.f90:382-393).
* ``superc`` : quantum number Sz = n_up - n_dw — blocks (n, n-Sz) for all
  valid n. Ordering: Sz = -Ns..Ns (setup_pointers_superc ED_SETUP.f90:511-518).
* ``nonsu2`` : quantum number N = n_up + n_dw — blocks (n, N-n).
  Ordering: N = 0..2Ns (setup_pointers_nonsu2 ED_SETUP.f90:669-676).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from math import comb
from typing import Optional, Tuple

import numpy as np

from .config import EDConfig


@dataclass(frozen=True)
class Block:
    nup: int
    ndw: int
    dup: int
    ddw: int
    offset: int  # start of this block inside the flat sector vector

    @property
    def dim(self) -> int:
        return self.dup * self.ddw


@dataclass(frozen=True)
class Sector:
    index: int                 # 0-based position in the sector table
    qn: Tuple                  # ("normal", nup, ndw) | ("superc", sz) |
    #                            ("nonsu2", n) | ("nonsu2jz", n, twoJz)
    blocks: Tuple[Block, ...]  # ordered by ndw ascending
    ns: int
    # Jz basis: per-block (up_idx, dw_idx, lup, ldw) sub-basis selections
    # within the colex-ordered spin bases (None = full tensor product)
    subsel: Optional[Tuple] = field(default=None, compare=False, repr=False)

    @property
    def dim(self) -> int:
        return sum(b.dim for b in self.blocks)

    def block_of(self, nup: int, ndw: int, lup: Optional[int] = None,
                 ldw: Optional[int] = None):
        for i, b in enumerate(self.blocks):
            if b.nup != nup or b.ndw != ndw:
                continue
            if self.subsel is None:
                return b
            _, _, bl_up, bl_dw = self.subsel[i]
            if (lup is None or bl_up == lup) and (ldw is None or bl_dw == ldw):
                return b
        return None

    def block_index_of(self, nup, ndw, lup=None, ldw=None):
        for i, b in enumerate(self.blocks):
            if b.nup != nup or b.ndw != ndw:
                continue
            if self.subsel is None:
                return i
            _, _, bl_up, bl_dw = self.subsel[i]
            if (lup is None or bl_up == lup) and (ldw is None or bl_dw == ldw):
                return i
        return None

    def up_sel(self, bi: int):
        return None if self.subsel is None else self.subsel[bi][0]

    def dw_sel(self, bi: int):
        return None if self.subsel is None else self.subsel[bi][1]

    def block_lz(self, bi: int):
        if self.subsel is None:
            return (None, None)
        return self.subsel[bi][2], self.subsel[bi][3]

    def __repr__(self) -> str:  # pragma: no cover
        return f"Sector({self.qn}, dim={self.dim}, nblocks={len(self.blocks)})"


def _mk_blocks(ns: int, pairs) -> Tuple[Block, ...]:
    blocks = []
    off = 0
    for nup, ndw in pairs:
        dup, ddw = comb(ns, nup), comb(ns, ndw)
        if dup == 0 or ddw == 0:
            continue
        blocks.append(Block(nup, ndw, dup, ddw, off))
        off += dup * ddw
    return tuple(blocks)


@dataclass(frozen=True)
class SectorTable:
    """All sectors of the Fock space for a given (ed_mode, Ns)."""

    ed_mode: str
    ns: int
    sectors: Tuple[Sector, ...]
    _lookup: dict = field(hash=False, compare=False, default_factory=dict)

    def __post_init__(self):
        for s in self.sectors:
            self._lookup[s.qn] = s

    def __len__(self) -> int:
        return len(self.sectors)

    def get(self, *qn) -> Optional[Sector]:
        return self._lookup.get((self.ed_mode,) + tuple(qn))

    # ---- sector transitions under c / c† (getCsector/getCDGsector) -------
    def cdg_sector(self, sector: Sector, spin: int,
                   level: Optional[int] = None) -> Optional[Sector]:
        """Target sector of c†_{level, spin} (spin: 0=up, 1=dw). `level`
        is required only in the Jz basis where the shift depends on the
        orbital character (ED_SETUP.f90:795-799)."""
        if self.ed_mode == "nonsu2jz":
            from .fock import LZDIAG_T2G, SZDIAG
            _, n, twojz = sector.qn
            if n + 1 > 2 * self.ns or level is None:
                return None
            djz = 2 * LZDIAG_T2G[level % 3] + SZDIAG[spin]
            return self.get(n + 1, twojz + djz)
        if self.ed_mode == "normal":
            _, nup, ndw = sector.qn
            nup, ndw = (nup + 1, ndw) if spin == 0 else (nup, ndw + 1)
            if nup > self.ns or ndw > self.ns:
                return None
            return self.get(nup, ndw)
        if self.ed_mode == "superc":
            (_, sz) = sector.qn
            sz = sz + 1 if spin == 0 else sz - 1
            if abs(sz) > self.ns:
                return None
            return self.get(sz)
        if self.ed_mode == "nonsu2":
            (_, n) = sector.qn
            if n + 1 > 2 * self.ns:
                return None
            return self.get(n + 1)
        raise ValueError(self.ed_mode)

    def c_sector(self, sector: Sector, spin: int,
                 level: Optional[int] = None) -> Optional[Sector]:
        """Target sector of c_{level, spin}."""
        if self.ed_mode == "nonsu2jz":
            from .fock import LZDIAG_T2G, SZDIAG
            _, n, twojz = sector.qn
            if n - 1 < 0 or level is None:
                return None
            djz = 2 * LZDIAG_T2G[level % 3] + SZDIAG[spin]
            return self.get(n - 1, twojz - djz)
        if self.ed_mode == "normal":
            _, nup, ndw = sector.qn
            nup, ndw = (nup - 1, ndw) if spin == 0 else (nup, ndw - 1)
            if nup < 0 or ndw < 0:
                return None
            return self.get(nup, ndw)
        if self.ed_mode == "superc":
            (_, sz) = sector.qn
            sz = sz - 1 if spin == 0 else sz + 1
            if abs(sz) > self.ns:
                return None
            return self.get(sz)
        if self.ed_mode == "nonsu2":
            (_, n) = sector.qn
            if n - 1 < 0:
                return None
            return self.get(n - 1)
        raise ValueError(self.ed_mode)

    def twin_sector(self, sector: Sector) -> Sector:
        """Sector with conjugate quantum numbers (get_twin_sector, ED_SETUP.f90:1195).

        Jz basis: the nonsu2 twin is the particle-hole complement
        (occupied<->empty, flip_state ED_SETUP.f90:1178-1186); the filled
        t2g shell has twoJz = 0 (Σ Lz = 0 per spin, Σ Sz = 0), so
        (n, twoJz) -> (2Ns - n, -twoJz)."""
        if self.ed_mode == "normal":
            _, nup, ndw = sector.qn
            return self.get(ndw, nup)
        if self.ed_mode == "superc":
            (_, sz) = sector.qn
            return self.get(-sz)
        if self.ed_mode == "nonsu2":
            (_, n) = sector.qn
            return self.get(2 * self.ns - n)
        if self.ed_mode == "nonsu2jz":
            _, n, twojz = sector.qn
            return self.get(2 * self.ns - n, -twojz)
        raise ValueError(self.ed_mode)

    def twin_mask(self) -> np.ndarray:
        """True for sectors to actually diagonalize when ed_twin
        (setup_pointers_*: normal keeps nup>=ndw; superc keeps sz<=0;
        nonsu2 keeps n<=Ns; Jz basis keeps n<Ns plus the twoJz<=0 half of
        the self-conjugate n=Ns shell)."""
        mask = np.ones(len(self.sectors), dtype=bool)
        for i, s in enumerate(self.sectors):
            if self.ed_mode == "normal":
                _, nup, ndw = s.qn
                mask[i] = not (nup < ndw)
            elif self.ed_mode == "superc":
                (_, sz) = s.qn
                mask[i] = not (sz > 0)
            elif self.ed_mode == "nonsu2":
                (_, n) = s.qn
                mask[i] = not (n > self.ns)
            elif self.ed_mode == "nonsu2jz":
                _, n, twojz = s.qn
                mask[i] = n < self.ns or (n == self.ns and twojz <= 0)
        return mask


@lru_cache(maxsize=None)
def build_sector_table(ed_mode: str, ns: int) -> SectorTable:
    sectors = []
    if ed_mode == "normal":
        idx = 0
        for nup in range(ns + 1):
            for ndw in range(ns + 1):
                blocks = _mk_blocks(ns, [(nup, ndw)])
                sectors.append(Sector(idx, ("normal", nup, ndw), blocks, ns))
                idx += 1
    elif ed_mode == "superc":
        idx = 0
        for sz in range(-ns, ns + 1):
            pairs = [(n, n - sz) for n in range(max(0, sz), min(ns, ns + sz) + 1)]
            blocks = _mk_blocks(ns, sorted(pairs, key=lambda p: p[1]))
            sectors.append(Sector(idx, ("superc", sz), blocks, ns))
            idx += 1
    elif ed_mode == "nonsu2":
        idx = 0
        for n in range(0, 2 * ns + 1):
            pairs = [(nu, n - nu) for nu in range(max(0, n - ns), min(ns, n) + 1)]
            blocks = _mk_blocks(ns, sorted(pairs, key=lambda p: p[1]))
            sectors.append(Sector(idx, ("nonsu2", n), blocks, ns))
            idx += 1
    else:
        raise ValueError(f"unknown ed_mode {ed_mode}")
    return SectorTable(ed_mode, ns, tuple(sectors))


@lru_cache(maxsize=None)
def build_sector_table_jz(ns: int, norb: int) -> SectorTable:
    """nonsu2 with conserved twoJz = twoLz + twoSz (Jz_basis; build_sector
    Jz branch ED_SETUP.f90:940-966 and setup_pointers_nonsu2 :636-660).

    Each (N, twoJz) sector is a union of sub-blocks
    (n_up, n_dw, l_up, l_dw) with l_up + l_dw + n_up - n_dw = twoJz; every
    sub-block is still a tensor product of per-spin Lz-class bases, so the
    block-Kronecker machinery applies unchanged.
    """
    from . import fock
    per_n = {}
    for n in range(0, 2 * ns + 1):
        entries = {}
        for nup in range(max(0, n - ns), min(ns, n) + 1):
            ndw = n - nup
            cls_up = fock.lz_classes(ns, nup, norb)
            cls_dw = fock.lz_classes(ns, ndw, norb)
            for lup, iu in cls_up.items():
                for ldw, idw in cls_dw.items():
                    twojz = lup + ldw + nup - ndw
                    entries.setdefault(twojz, []).append(
                        (nup, ndw, lup, ldw, iu, idw))
        per_n[n] = entries
    sectors = []
    idx = 0
    for n in range(0, 2 * ns + 1):
        for twojz in sorted(per_n[n]):
            blocks = []
            subsel = []
            off = 0
            for (nup, ndw, lup, ldw, iu, idw) in sorted(
                    per_n[n][twojz], key=lambda e: (e[1], e[3], e[2])):
                blocks.append(Block(nup, ndw, len(iu), len(idw), off))
                subsel.append((iu, idw, lup, ldw))
                off += len(iu) * len(idw)
            sectors.append(Sector(idx, ("nonsu2jz", n, twojz),
                                  tuple(blocks), ns, tuple(subsel)))
            idx += 1
    return SectorTable("nonsu2jz", ns, tuple(sectors))


def sector_table(cfg: EDConfig) -> SectorTable:
    if cfg.ed_mode == "nonsu2" and cfg.jz_basis:
        assert cfg.bath_type == "replica", \
            "Jz basis requires the replica bath layout (orbital-periodic levels)"
        return build_sector_table_jz(cfg.ns, cfg.norb)
    return build_sector_table(cfg.ed_mode, cfg.ns)


def sector_label(sector: Sector) -> str:
    """Human-readable quantum numbers, matching reference log lines."""
    if sector.qn[0] == "normal":
        return f"(nup,ndw)=({sector.qn[1]},{sector.qn[2]})"
    if sector.qn[0] == "superc":
        return f"sz={sector.qn[1]}"
    return f"n={sector.qn[1]}"


def bath_stride(cfg: EDConfig, iorb: int, kp: int) -> int:
    """0-based level index of bath site kp (0-based) attached to orbital iorb
    (0-based). Mirrors getBathStride (ED_SETUP.f90:450-468)."""
    if cfg.bath_type == "normal":
        return cfg.norb + iorb * cfg.nbath + kp
    if cfg.bath_type == "hybrid":
        return cfg.norb + kp
    if cfg.bath_type == "replica":
        return iorb + (kp + 1) * cfg.norb
    raise ValueError(cfg.bath_type)
