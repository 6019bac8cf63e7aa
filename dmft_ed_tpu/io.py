"""File IO: the reference's .ed text-file contracts.

Replaces ED_IO.f90 + ED_IO/*.f90 printers/readers. File names and column
layouts follow the reference exactly (they are the de-facto API for
downstream analysis, SURVEY.md §5): complex functions are written as
``x  Im(F)  Re(F)`` (SciFortran splot convention), per-component files
``imp<Name>_l<i><j>_s<s>_<axis><suffix>.ed``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .config import EDConfig
from . import grids


def splot(path: str, x: np.ndarray, f: np.ndarray) -> None:
    arr = np.column_stack([x, np.imag(f), np.real(f)]) \
        if np.iscomplexobj(f) else np.column_stack([x, f])
    np.savetxt(path, arr, fmt="%26.18E")


def sread(path: str) -> np.ndarray:
    d = np.loadtxt(path)
    if d.shape[1] >= 3:
        return d[:, 2] + 1j * d[:, 1]
    return d[:, 1]


def _orb_pairs(cfg: EDConfig):
    if cfg.bath_type == "normal" and not cfg.ed_solve_offdiag_gf:
        return [(a, a) for a in range(cfg.norb)]
    return [(a, b) for a in range(cfg.norb) for b in range(a, cfg.norb)]


def _spin_tags(cfg: EDConfig, spin_offdiag: bool):
    """(s1, s2, tag) triples. Nonsu2 always carries a two-digit spin tag
    over s1<=s2 pairs (print_impSigma_nonsu2,
    ED_IO/print_impSigma.f90:120-215: suffix='_s'//ispin//jspin); other
    modes tag the diagonal spin only ('_s'//ispin)."""
    if spin_offdiag:
        return [(s1, s2, f"_s{s1 + 1}{s2 + 1}")
                for s1 in range(cfg.nspin) for s2 in range(s1, cfg.nspin)]
    return [(s, s, f"_s{s + 1}") for s in range(cfg.nspin)]


def print_function(cfg: EDConfig, name: str, fmats, freal, suffix: str = "",
                   spin_offdiag: bool = False) -> None:
    """Write imp<name>_l<ij>_s<s>_{iw,realw}<suffix>.ed (print_impSigma /
    print_impG / print_impG0 layout)."""
    wm = grids.matsubara_fermionic(cfg)
    wr = grids.real_axis(cfg)
    for s1, s2, stag in _spin_tags(cfg, spin_offdiag):
        for a, b in _orb_pairs(cfg):
            tag = f"_l{a + 1}{b + 1}{stag}"
            if fmats is not None:
                splot(f"imp{name}{tag}_iw{suffix}.ed", wm, fmats[s1, s2, a, b])
            if freal is not None:
                splot(f"imp{name}{tag}_realw{suffix}.ed", wr,
                      freal[s1, s2, a, b])


def read_function(cfg: EDConfig, name: str, suffix: str = "",
                  spin_offdiag: bool = False):
    """Re-ingest printed Sigma/G files (ed_read_impSigma restart path,
    ED_IO/read_impSigma.f90; nonsu2 spin-offdiag variant :117-216)."""
    fm = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, cfg.lmats),
                  dtype=complex)
    fr = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, cfg.lreal),
                  dtype=complex)
    for s1, s2, stag in _spin_tags(cfg, spin_offdiag):
        for a, b in _orb_pairs(cfg):
            tag = f"_l{a + 1}{b + 1}{stag}"
            pm = f"imp{name}{tag}_iw{suffix}.ed"
            pr = f"imp{name}{tag}_realw{suffix}.ed"
            if os.path.exists(pm):
                fm[s1, s2, a, b] = sread(pm)
                fm[s1, s2, b, a] = fm[s1, s2, a, b]
            if os.path.exists(pr):
                fr[s1, s2, a, b] = sread(pr)
                fr[s1, s2, b, a] = fr[s1, s2, a, b]
    return fm, fr


def write_observables(cfg: EDConfig, obs, egs: float, simp, zimp,
                      suffix: str = "") -> None:
    """observables_info/_all/_last .ed files (write_observables,
    ED_OBSERVABLES.f90:1008-1207)."""
    no, ns_ = cfg.norb, cfg.nspin
    cols = []
    labels = []

    def add(vals, base):
        vals = np.atleast_1d(np.asarray(vals, dtype=float))
        for i, v in enumerate(vals.ravel()):
            cols.append(v)
            labels.append(f"{base}_{i + 1}" if vals.size > 1 else base)

    add(obs.dens, "dens")
    if cfg.ed_mode == "superc":
        add(obs.phisc, "phisc")
    add(obs.docc, "docc")
    add(obs.dens_up, "dens_up")
    add(obs.dens_dw, "dens_dw")
    if cfg.ed_mode == "nonsu2":
        add(obs.magx, "magX")
        add(obs.magy, "magY")
    add(obs.magz, "magz")
    add(obs.s2tot, "s2tot")
    add(egs, "egs")
    add(obs.sz2, "sz2")
    add(obs.n2, "n2")
    add(zimp.T, "z")
    add(simp.T, "sig")
    with open(f"observables_info{suffix}.ed", "w") as fh:
        fh.write("#" + " ".join(f"{i + 1}{l}" for i, l in enumerate(labels))
                 + "\n")
    line = " ".join(f"{v:15.9f}" for v in cols)
    with open(f"observables_all{suffix}.ed", "a") as fh:
        fh.write(line + "\n")
    with open(f"observables_last{suffix}.ed", "w") as fh:
        fh.write(line + "\n")
    if cfg.ed_mode == "nonsu2" and cfg.norb > 1:
        with open(f"exciton_last{suffix}.ed", "w") as fh:
            for a in range(no):
                for b in range(a + 1, no):
                    fh.write(" ".join(f"{v:15.9f}" for v in [
                        obs.exct_s0[a, b], obs.exct_tz[a, b],
                        np.real(obs.exct_tx[a, b]), np.imag(obs.exct_tx[a, b]),
                        np.real(obs.exct_ty[a, b]), np.imag(obs.exct_ty[a, b]),
                    ]) + "\n")


def write_energy(cfg: EDConfig, E, suffix: str = "") -> None:
    """energy_info.ed / energy_last.ed (write_energy_info)."""
    labels = ["<Hi>", "<V>=<Hi-Ehf>", "<Eloc>", "<Ehf>", "<Dst>", "<Dnd>",
              "<Dse>", "<Dph>"]
    vals = [E.epot, E.epot - E.ehartree, E.eknot, E.ehartree, E.dust, E.dund,
            E.dse, E.dph]
    with open("energy_info.ed", "w") as fh:
        fh.write("#" + " ".join(f"{i + 1}{l}" for i, l in enumerate(labels))
                 + "\n")
    with open(f"energy_last{suffix}.ed", "w") as fh:
        fh.write(" ".join(f"{v:15.9f}" for v in vals) + "\n")


def write_chi(cfg: EDConfig, name: str, chi_tau, chi_iv, chi_w,
              suffix: str = "") -> None:
    """<name>_l{a}{b}_tau/_iw/_realw files (print_impChi.f90:28-52; the
    Matsubara file carries the reference's `_iw` suffix)."""
    tau = grids.imaginary_time(cfg)
    vm = grids.matsubara_bosonic(cfg)
    wr = grids.real_axis(cfg)
    norb = chi_tau.shape[0]
    for a in range(norb):
        for b in range(norb):
            tag = f"_l{a + 1}{b + 1}"
            if a != b and not np.any(chi_tau[a, b]):
                continue
            splot(f"{name}{tag}_tau{suffix}.ed", tau, chi_tau[a, b])
            splot(f"{name}{tag}_iw{suffix}.ed", vm, chi_iv[a, b])
            splot(f"{name}{tag}_realw{suffix}.ed", wr, chi_w[a, b])
