"""Effective-bath parameters: structured <-> flat-vector codec, init, symmetry ops.

Replaces ``effective_bath`` (ED_VARS_GLOBAL.f90:12-22) + ED_BATH.f90 +
ED_BATH/dmft_aux.f90 + ED_BATH/user_aux.f90. The user-facing bath is the same
flat real vector as the reference (layout: set_dmft_bath,
ED_BATH/dmft_aux.f90:474-777) so drivers/restart files interoperate.

All arrays are host-side numpy (they are tiny); the compute path receives them
as device constants.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .config import EDConfig


@dataclass
class Bath:
    """Structured bath parameters.

    Shapes (matching allocate_dmft_bath, ED_BATH/dmft_aux.f90:4-76):
      e  : [Nspin, Norb(normal/replica) | 1(hybrid), Nbath]  level energies
      d  : like e                  SC pairing amplitudes (superc)
      v  : [Nspin, Norb, Nbath]    spin-conserving hybridization
      u  : [Nspin, Norb, Nbath]    spin-flip hybridization (nonsu2)
      h  : [Nspin, Nspin, Norb, Norb, Nbath] complex replica Hamiltonian
      vr : [Nbath] complex         replica hybridization
      mask : [Nspin, Nspin, Norb, Norb, 2] bool  (replica: Re/Im fit mask)
    """

    cfg: EDConfig
    e: Optional[np.ndarray] = None
    d: Optional[np.ndarray] = None
    v: Optional[np.ndarray] = None
    u: Optional[np.ndarray] = None
    h: Optional[np.ndarray] = None
    vr: Optional[np.ndarray] = None
    mask: Optional[np.ndarray] = None

    def __post_init__(self):
        cfg = self.cfg
        nspin, norb, nbath = cfg.nspin, cfg.norb, cfg.nbath
        e_orb = 1 if cfg.bath_type == "hybrid" else norb
        if self.e is None:
            self.e = np.zeros((nspin, e_orb, nbath))
        if self.v is None:
            self.v = np.zeros((nspin, norb, nbath))
        if cfg.ed_mode == "superc" and self.d is None:
            self.d = np.zeros((nspin, e_orb, nbath))
        if cfg.ed_mode == "nonsu2" and self.u is None:
            self.u = np.zeros((nspin, norb, nbath))
        if cfg.bath_type == "replica":
            if self.h is None:
                self.h = np.zeros((nspin, nspin, norb, norb, nbath), dtype=complex)
            if self.vr is None:
                self.vr = np.zeros(nbath, dtype=complex)

    def copy(self) -> "Bath":
        return Bath(self.cfg,
                    e=None if self.e is None else self.e.copy(),
                    d=None if self.d is None else self.d.copy(),
                    v=None if self.v is None else self.v.copy(),
                    u=None if self.u is None else self.u.copy(),
                    h=None if self.h is None else self.h.copy(),
                    vr=None if self.vr is None else self.vr.copy(),
                    mask=None if self.mask is None else self.mask.copy())


# ----------------------------------------------------------------------
# replica mask (init_dmft_bath_mask, ED_BATH/dmft_aux.f90:261+)
# ----------------------------------------------------------------------

def replica_mask(cfg: EDConfig, hloc: np.ndarray, tol: float = 1e-6) -> np.ndarray:
    """Bool mask [Nspin,Nspin,Norb,Norb,2] of fit-active Re/Im elements from the
    sparsity pattern of impHloc."""
    m = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, 2), dtype=bool)
    m[..., 0] = np.abs(hloc.real) > tol
    m[..., 1] = np.abs(hloc.imag) > tol
    # diagonal real elements always active
    for s in range(cfg.nspin):
        for a in range(cfg.norb):
            m[s, s, a, a, 0] = True
    return m


# ----------------------------------------------------------------------
# dimension of the flat user vector (get_bath_dimension, user_aux.f90:11-129)
# ----------------------------------------------------------------------

def get_bath_dimension(cfg: EDConfig, hloc: Optional[np.ndarray] = None) -> int:
    norb, nbath, nspin = cfg.norb, cfg.nbath, cfg.nspin
    bt, mode = cfg.bath_type, cfg.ed_mode
    if bt == "normal":
        per_spin = {"normal": 2, "superc": 3, "nonsu2": 3}[mode] * norb * nbath
        return nspin * per_spin
    if bt == "hybrid":
        per_spin = {"normal": nbath + norb * nbath,
                    "superc": 2 * nbath + norb * nbath,
                    "nonsu2": nbath + 2 * norb * nbath}[mode]
        return nspin * per_spin
    if bt == "replica":
        if hloc is None:
            raise ValueError("replica bath requires Hloc to size the user vector")
        mask = replica_mask(cfg, hloc)
        if mode in ("normal",):
            maxspin = 1 if cfg.ed_para else min(2, nspin)
            ndx = 0
            for s in range(maxspin):
                for a in range(norb):
                    for b in range(norb):
                        io, jo = a + s * norb, b + s * norb
                        if io < jo:
                            ndx += int(mask[s, s, a, b, 0]) + int(mask[s, s, a, b, 1])
            ndx += maxspin * norb           # real diagonal
            ndx *= nbath
            ndx += nbath                    # real hybridizations
            return ndx
        if mode == "nonsu2":
            if cfg.ed_para:
                return 3 * nbath
            ndx = 0
            for s in range(nspin):
                for s2 in range(nspin):
                    for a in range(norb):
                        for b in range(norb):
                            io, jo = a + s * norb, b + s2 * norb
                            if io < jo:
                                ndx += int(mask[s, s2, a, b, 0]) + int(mask[s, s2, a, b, 1])
            ndx += nspin * norb
            ndx *= nbath
            ndx += nbath
            return ndx
        raise ValueError("superc+replica not supported")
    raise ValueError(bt)


# ----------------------------------------------------------------------
# pack / unpack (get_dmft_bath / set_dmft_bath, dmft_aux.f90:474-1064)
# ----------------------------------------------------------------------

def _stride_fill(dst: np.ndarray, flat: np.ndarray, off: int) -> int:
    """Fill dst[ispin, iorb, i] from flat with the reference's
    ``i + iorb*Nbath + ispin*Nbath*Norb`` ordering (bath index fastest)."""
    n = dst.size
    dst[...] = flat[off:off + n].reshape(dst.shape)
    return off + n


def unpack_bath(cfg: EDConfig, flat: np.ndarray,
                mask: Optional[np.ndarray] = None) -> Bath:
    """Flat user vector -> structured Bath (set_dmft_bath)."""
    b = Bath(cfg)
    flat = np.asarray(flat, dtype=float)
    bt, mode = cfg.bath_type, cfg.ed_mode
    off = 0
    if bt in ("normal", "hybrid"):
        off = _stride_fill(b.e, flat, off)
        if mode == "superc":
            off = _stride_fill(b.d, flat, off)
        off = _stride_fill(b.v, flat, off)
        if mode == "nonsu2":
            off = _stride_fill(b.u, flat, off)
        return b
    # replica
    if mask is None:
        raise ValueError("replica unpack requires the fit mask")
    b.mask = mask
    norb, nbath, nspin = cfg.norb, cfg.nbath, cfg.nspin
    i = 0
    if mode == "normal":
        maxspin = 1 if cfg.ed_para else min(2, nspin)
        for s in range(maxspin):
            for a in range(norb):
                for c in range(norb):
                    io, jo = a + s * norb, c + s * norb
                    if io > jo:
                        continue
                    for k in range(nbath):
                        re = im = 0.0
                        if mask[s, s, a, c, 0]:
                            re = flat[i]; i += 1
                        if mask[s, s, a, c, 1]:
                            im = flat[i]; i += 1
                        b.h[s, s, a, c, k] = re + 1j * im
                        if a != c:
                            b.h[s, s, c, a, k] = re - 1j * im
                        if maxspin == 1 and nspin > 1:
                            b.h[1, 1, a, c, k] = b.h[0, 0, a, c, k]
                            b.h[1, 1, c, a, k] = b.h[0, 0, c, a, k]
        for k in range(nbath):
            b.vr[k] = flat[i]; i += 1
        return b
    if mode == "nonsu2":
        for s in range(nspin):
            for s2 in range(nspin):
                for a in range(norb):
                    for c in range(norb):
                        io, jo = a + s * norb, c + s2 * norb
                        if io > jo:
                            continue
                        for k in range(nbath):
                            re = im = 0.0
                            if mask[s, s2, a, c, 0]:
                                re = flat[i]; i += 1
                            if mask[s, s2, a, c, 1]:
                                im = flat[i]; i += 1
                            b.h[s, s2, a, c, k] = re + 1j * im
                            if s == s2 and a != c:
                                b.h[s, s, c, a, k] = re - 1j * im
                            if s != s2 and a == c:
                                b.h[s2, s, a, a, k] = re - 1j * im
                            if s != s2 and a != c:
                                b.h[s2, s, c, a, k] = re - 1j * im
        for k in range(nbath):
            b.vr[k] = flat[i]; i += 1
        return b
    raise ValueError("superc+replica not supported")


def pack_bath(b: Bath) -> np.ndarray:
    """Structured Bath -> flat user vector (get_dmft_bath)."""
    cfg = b.cfg
    bt, mode = cfg.bath_type, cfg.ed_mode
    if bt in ("normal", "hybrid"):
        parts = [b.e.ravel()]
        if mode == "superc":
            parts.append(b.d.ravel())
        parts.append(b.v.ravel())
        if mode == "nonsu2":
            parts.append(b.u.ravel())
        return np.concatenate(parts)
    # replica
    norb, nbath, nspin = cfg.norb, cfg.nbath, cfg.nspin
    mask = b.mask
    out = []
    if mode == "normal":
        maxspin = 1 if cfg.ed_para else min(2, nspin)
        for s in range(maxspin):
            for a in range(norb):
                for c in range(norb):
                    io, jo = a + s * norb, c + s * norb
                    if io > jo:
                        continue
                    for k in range(nbath):
                        if mask[s, s, a, c, 0]:
                            out.append(b.h[s, s, a, c, k].real)
                        if mask[s, s, a, c, 1]:
                            out.append(b.h[s, s, a, c, k].imag)
        out.extend(b.vr.real.tolist())
        return np.asarray(out)
    if mode == "nonsu2":
        for s in range(nspin):
            for s2 in range(nspin):
                for a in range(norb):
                    for c in range(norb):
                        io, jo = a + s * norb, c + s2 * norb
                        if io > jo:
                            continue
                        for k in range(nbath):
                            if mask[s, s2, a, c, 0]:
                                out.append(b.h[s, s2, a, c, k].real)
                            if mask[s, s2, a, c, 1]:
                                out.append(b.h[s, s2, a, c, k].imag)
        out.extend(b.vr.real.tolist())
        return np.asarray(out)
    raise ValueError("superc+replica not supported")


# ----------------------------------------------------------------------
# initialization (init_dmft_bath, ED_BATH/dmft_aux.f90:78-255)
# ----------------------------------------------------------------------

def init_bath(cfg: EDConfig, hloc: Optional[np.ndarray] = None,
              file_suffix: str = "") -> Bath:
    """Flat band-spread levels in [-hwband, hwband], V = max(0.1, 1/sqrt(Nbath)),
    then overridden from ``<hfile><suffix>.restart`` if present."""
    b = Bath(cfg)
    nbath = cfg.nbath
    rng = np.random.default_rng(cfg.seed)
    noise = rng.random(nbath) * cfg.ed_bath_noise_thr
    hw = cfg.hwband

    if cfg.bath_type != "replica":
        e = np.zeros(nbath)
        if nbath == 1:
            e[0] = 0.0
        else:
            e[0] = -hw
            e[-1] = hw
            nh = nbath // 2
            if nbath % 2 == 0 and nbath >= 4:
                de = hw / max(nh - 1, 1)
                e[nh - 1] = -1e-3
                e[nh] = 1e-3
                for i in range(1, nh - 1):
                    e[i] = -hw + i * de
                    e[nbath - 1 - i] = hw - i * de
            elif nbath % 2 != 0 and nbath >= 3:
                de = hw / nh
                e[nh] = 0.0
                for i in range(1, nh):
                    e[i] = -hw + i * de
                    e[nbath - 1 - i] = hw - i * de
        b.e[:, :, :] = e[None, None, :] + noise[None, None, :]
        b.v[:, :, :] = max(0.1, 1.0 / np.sqrt(nbath)) + noise[None, None, :]
        if cfg.ed_mode == "superc":
            b.d[:, :, :] = cfg.deltasc
        if cfg.ed_mode == "nonsu2":
            b.u[:, :, :] = b.v * cfg.ed_vsf_ratio + noise[None, None, :]
    else:
        if hloc is None:
            raise ValueError("replica bath init requires impHloc")
        b.mask = replica_mask(cfg, hloc)
        eye = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb))
        for s in range(cfg.nspin):
            for a in range(cfg.norb):
                eye[s, s, a, a] = 1.0
        for k in range(nbath):
            b.h[..., k] = hloc - (cfg.xmu + noise[k]) * eye
        b.vr[:] = 0.5 + noise

    path = cfg.hfile + file_suffix + ".restart"
    if os.path.exists(path):
        load_bath(b, path)
    return b


# ----------------------------------------------------------------------
# save/load restart files (save_dmft_bath / read in init_dmft_bath)
# ----------------------------------------------------------------------

def save_bath(b: Bath, path: Optional[str] = None, suffix: str = "") -> None:
    cfg = b.cfg
    if path is None:
        path = cfg.hfile + suffix + ".restart"
    cols = []
    header = []
    if cfg.bath_type == "normal":
        for s in range(cfg.nspin):
            for a in range(cfg.norb):
                header += [f"#ek_s{s+1}_o{a+1}", f"vk_s{s+1}_o{a+1}"] \
                    if cfg.ed_mode == "normal" else []
        for k in range(cfg.nbath):
            row = []
            for s in range(cfg.nspin):
                for a in range(cfg.norb):
                    row.append(b.e[s, a, k])
                    if cfg.ed_mode == "superc":
                        row.append(b.d[s, a, k])
                    row.append(b.v[s, a, k])
                    if cfg.ed_mode == "nonsu2":
                        row.append(b.u[s, a, k])
            cols.append(row)
    elif cfg.bath_type == "hybrid":
        for k in range(cfg.nbath):
            row = []
            for s in range(cfg.nspin):
                row.append(b.e[s, 0, k])
                if cfg.ed_mode == "superc":
                    row.append(b.d[s, 0, k])
                for a in range(cfg.norb):
                    row.append(b.v[s, a, k])
                    if cfg.ed_mode == "nonsu2":
                        row.append(b.u[s, a, k])
            cols.append(row)
    else:  # replica: store vr + h per bath level, Re and Im blocks
        with open(path, "w") as fh:
            nso = cfg.nspin * cfg.norb
            hso = b.h.transpose(0, 2, 1, 3, 4).reshape(nso, nso, cfg.nbath)
            for k in range(cfg.nbath):
                for io in range(nso):
                    lead = (f"{b.vr[k].real:21.12f} {b.vr[k].imag:21.12f}"
                            if io == 0 else " " * 43)
                    re = " ".join(f"{hso[io, jo, k].real:21.12f}" for jo in range(nso))
                    im = " ".join(f"{hso[io, jo, k].imag:21.12f}" for jo in range(nso))
                    fh.write(f"{lead} {re} {im}\n")
                fh.write("\n")
        return
    with open(path, "w") as fh:
        fh.write("#bath\n")
        for row in cols:
            fh.write(" ".join(f"{x:21.12f}" for x in row) + "\n")


def load_bath(b: Bath, path: str) -> None:
    cfg = b.cfg
    if cfg.bath_type == "replica":
        nso = cfg.nspin * cfg.norb
        with open(path) as fh:
            lines = [ln for ln in fh.read().splitlines()]
        k = 0
        i = 0
        while i < len(lines) and k < cfg.nbath:
            if not lines[i].strip():
                i += 1
                continue
            block = lines[i:i + nso]
            i += nso
            first = block[0].split()
            b.vr[k] = float(first[0]) + 1j * float(first[1])
            hso = np.zeros((nso, nso), dtype=complex)
            for io, ln in enumerate(block):
                vals = [float(x) for x in ln.split()]
                if io == 0:
                    vals = vals[2:]
                hso[io] = np.array(vals[:nso]) + 1j * np.array(vals[nso:2 * nso])
            b.h[..., k] = hso.reshape(cfg.nspin, cfg.norb, cfg.nspin, cfg.norb
                                      ).transpose(0, 2, 1, 3)
            k += 1
        return
    data = np.loadtxt(path, comments="#", ndmin=2)
    nrows = min(data.shape[0], cfg.nbath)
    for k in range(nrows):
        row = data[k]
        j = 0
        if cfg.bath_type == "normal":
            for s in range(cfg.nspin):
                for a in range(cfg.norb):
                    b.e[s, a, k] = row[j]; j += 1
                    if cfg.ed_mode == "superc":
                        b.d[s, a, k] = row[j]; j += 1
                    b.v[s, a, k] = row[j]; j += 1
                    if cfg.ed_mode == "nonsu2":
                        b.u[s, a, k] = row[j]; j += 1
        else:
            for s in range(cfg.nspin):
                b.e[s, 0, k] = row[j]; j += 1
                if cfg.ed_mode == "superc":
                    b.d[s, 0, k] = row[j]; j += 1
                for a in range(cfg.norb):
                    b.v[s, a, k] = row[j]; j += 1
                    if cfg.ed_mode == "nonsu2":
                        b.u[s, a, k] = row[j]; j += 1


# ----------------------------------------------------------------------
# user symmetry operations (user_aux.f90:1107-1409) — operate on flat vectors
# ----------------------------------------------------------------------

def break_symmetry_bath(cfg, flat, field, sign, mask=None):
    b = unpack_bath(cfg, flat, mask)
    b.e[0] += sign * field
    b.e[-1] -= sign * field
    return pack_bath(b)


def spin_symmetrize_bath(cfg, flat, mask=None):
    if cfg.nspin == 1:
        return np.asarray(flat)
    b = unpack_bath(cfg, flat, mask)
    b.e[-1] = b.e[0]
    b.v[-1] = b.v[0]
    if cfg.ed_mode == "superc":
        b.d[-1] = b.d[0]
    return pack_bath(b)


def orb_symmetrize_bath(cfg, flat, mask=None):
    if cfg.norb == 1:
        return np.asarray(flat)
    b = unpack_bath(cfg, flat, mask)
    b.e[:] = b.e.mean(axis=1, keepdims=True)
    b.v[:] = b.v.mean(axis=1, keepdims=True)
    return pack_bath(b)


def orb_equality_bath(cfg, flat, indx=0, mask=None):
    if cfg.norb == 1:
        return np.asarray(flat)
    b = unpack_bath(cfg, flat, mask)
    b.e[:] = b.e[:, indx:indx + 1, :]
    b.v[:] = b.v[:, indx:indx + 1, :]
    return pack_bath(b)


def ph_symmetrize_bath(cfg, flat, mask=None):
    b = unpack_bath(cfg, flat, mask)
    nb = cfg.nbath
    if nb == 1:
        return pack_bath(b)
    for i in range(nb // 2):
        b.e[..., nb - 1 - i] = -b.e[..., i]
        b.v[..., nb - 1 - i] = b.v[..., i]
        if cfg.ed_mode == "superc":
            b.d[..., nb - 1 - i] = b.d[..., i]
    if nb % 2 != 0:
        b.e[..., (nb - 1) // 2] = 0.0
    return pack_bath(b)


def ph_trans_bath(cfg, flat, mask=None):
    b = unpack_bath(cfg, flat, mask)
    if cfg.nbath == 1:
        return pack_bath(b)
    if cfg.norb == 1:
        b.e[:] = -b.e
    elif cfg.norb == 2:
        b.e[:] = -b.e[:, ::-1, :]
        b.v[:] = b.v[:, ::-1, :]
    return pack_bath(b)


def enforce_normal_bath(cfg, flat, mask=None):
    b = unpack_bath(cfg, flat, mask)
    if cfg.ed_mode == "superc":
        b.d[:] = 0.0
    return pack_bath(b)
