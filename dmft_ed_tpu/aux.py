"""Auxiliary helpers: index reshapes and chemical-potential search.

Replaces ED_AUX_FUNX.f90: the lso<->nnn array reshapes (:181-447) and the
secant ('charge compressibility') chemical-potential search
(ed_search_variable, :487-561).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .config import EDConfig


# ----------------------------------------------------------------------
# reshapes between [Nspin,Nspin,Norb,Norb,...] and [Nso,Nso,...]
# ----------------------------------------------------------------------

def nn2so(f: np.ndarray, nspin: int, norb: int) -> np.ndarray:
    """[Nspin,Nspin,Norb,Norb,(L)] -> [Nso,Nso,(L)] with io = a + s*Norb."""
    nso = nspin * norb
    if f.ndim == 4:
        return f.transpose(0, 2, 1, 3).reshape(nso, nso)
    return f.transpose(0, 2, 1, 3, 4).reshape(nso, nso, f.shape[-1])


def so2nn(f: np.ndarray, nspin: int, norb: int) -> np.ndarray:
    """[Nso,Nso,(L)] -> [Nspin,Nspin,Norb,Norb,(L)]."""
    if f.ndim == 2:
        return f.reshape(nspin, norb, nspin, norb).transpose(0, 2, 1, 3)
    return f.reshape(nspin, norb, nspin, norb, f.shape[-1]
                     ).transpose(0, 2, 1, 3, 4)


def lso2nnn(f: np.ndarray, nlat: int, nspin: int, norb: int) -> np.ndarray:
    """[Nlat*Nso, Nlat*Nso,(L)] -> [Nlat,Nspin,Nspin,Norb,Norb,(L)]
    (site-diagonal part), io = a + s*Norb + ilat*Nspin*Norb."""
    nso = nspin * norb
    out_shape = (nlat, nspin, nspin, norb, norb) + f.shape[2:]
    out = np.zeros(out_shape, dtype=f.dtype)
    for i in range(nlat):
        blk = f[i * nso:(i + 1) * nso, i * nso:(i + 1) * nso]
        out[i] = so2nn(blk, nspin, norb)
    return out


# ----------------------------------------------------------------------
# spin-orbit helpers (ED_AUX_FUNX.f90:780-1053)
# ----------------------------------------------------------------------

_PAULI = {
    "x": np.array([[0, 1], [1, 0]], dtype=complex),
    "y": np.array([[0, -1j], [1j, 0]], dtype=complex),
    "z": np.array([[1, 0], [0, -1]], dtype=complex),
}


def atomic_soc(nspin: int = 2, norb: int = 3) -> np.ndarray:
    """t2g atomic L·S matrix, [Nspin, Nspin, Norb, Norb] (atomic_SOC,
    ED_AUX_FUNX.f90:926-940: blocks (1,2)=+iσz/2, (1,3)=-iσy/2,
    (2,3)=+iσx/2 in orbital-major/spin-fast ordering + h.c.)."""
    assert nspin == 2 and norb == 3, "atomic SOC defined for t2g (2x3)"
    nso = nspin * norb
    ls_os = np.zeros((nso, nso), dtype=complex)     # os: i = s + 2*orb
    ls_os[0:2, 2:4] = +1j * _PAULI["z"] / 2
    ls_os[0:2, 4:6] = -1j * _PAULI["y"] / 2
    ls_os[2:4, 4:6] = +1j * _PAULI["x"] / 2
    ls_os = ls_os + ls_os.conj().T
    # os (orbital-major, spin-fast) -> nn [Nspin, Nspin, Norb, Norb]
    ls = ls_os.reshape(norb, nspin, norb, nspin).transpose(1, 3, 0, 2)
    return ls


def orbital_lz_rotation(nspin: int = 2, norb: int = 3) -> np.ndarray:
    """{cubic t2g} -> {Lz eigenbasis} rotation, [Nso, Nso] spin-block
    diagonal (orbital_Lz_rotation_NorbNspin, ED_AUX_FUNX.f90). In the
    rotated basis Lz is diagonal = Lzdiag = [-1, +1, 0] — required for
    Jz_basis runs."""
    assert nspin == 2 and norb == 3
    u = np.zeros((3, 3), dtype=complex)
    u[0, 0] = -1j / np.sqrt(2)
    u[1, 1] = 1 / np.sqrt(2)
    u[2, 2] = 1j
    u[0, 1] = -1j / np.sqrt(2)
    u[1, 0] = -1 / np.sqrt(2)
    U = np.zeros((6, 6), dtype=complex)
    U[:3, :3] = u
    U[3:, 3:] = u
    return U


def atomic_soc_jz(nspin: int = 2, norb: int = 3) -> np.ndarray:
    """Atomic L.S expressed in the Lz eigenbasis ([Nspin,Nspin,Norb,Norb]),
    the form used by Jz_basis runs (set_dmft_bath replica/nonsu2 branch:
    hrep = eps·1 + λ·U† (L.S) U, ED_BATH/dmft_aux.f90:699-706).

    NOTE basis ordering: the rotation acts in the orbital-major space but
    our so-layout is spin-major — handled via the nn<->so reshapes."""
    ls_so = nn2so(atomic_soc(nspin, norb), nspin, norb)
    # reference U blocks act in orbital space per spin; in our spin-major
    # so-layout (io = s*Norb + a) that is kron(I_spin, u)
    u = orbital_lz_rotation(nspin, norb)[:3, :3]
    U_so = np.kron(np.eye(nspin), u)
    out_so = U_so.conj().T @ ls_so @ U_so
    return so2nn(out_so, nspin, norb)


# ----------------------------------------------------------------------
# chemical potential search (secant on the density)
# ----------------------------------------------------------------------

def search_variable(cfg: EDConfig, var: float, ntmp: float, state: dict,
                    log=None) -> Tuple[float, bool]:
    """One step of the reference's compressibility-based mu search
    (ed_search_variable). `state` is caller-held mutable memory across DMFT
    iterations. Returns (new_var, density_converged)."""
    count = state.get("count", 0) + 1
    state["count"] = count
    if count == 1:
        chich = cfg.ndelta
        if os.path.exists("var_compressibility.restart"):
            with open("var_compressibility.restart") as fh:
                chich = float(fh.read().split()[0])
        state["chich"] = chich
        state["var_old"] = var
        state["nold"] = ntmp
    else:
        dv = var - state["var_old"]
        if abs(dv) > 1e-12:
            state["chich"] = (ntmp - state["nold"]) / dv
    chich = state["chich"]
    if abs(chich) < 1e-4:
        chich = np.sign(chich or 1.0) * 1e-4
    ndiff = ntmp - cfg.nread
    var_new = var - ndiff / chich
    state["nold"] = ntmp
    state["var_old"] = var
    if log:
        log(f"n    = {ntmp:16.9f} | instead of {cfg.nread:15.9f}")
        log(f"dn   = {ndiff:16.9E} / {cfg.nerr:16.9E}")
        log(f"var  = {var_new:16.9f}")
    try:
        mode = "a" if count > 1 else "w"
        with open("search_variable_iteration_info.ed", mode) as fh:
            if count == 1:
                fh.write("#var,ntmp,ndiff\n")
            fh.write(f"{var_new} {ntmp} {ndiff}\n")
        with open("var_compressibility.used", "w") as fh:
            fh.write(f"{chich}\n")
    except OSError:
        pass
    return float(var_new), bool(abs(ndiff) <= cfg.nerr)
