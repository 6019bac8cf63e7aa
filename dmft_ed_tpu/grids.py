"""Frequency / imaginary-time grids (allocate_grids, ED_AUX_FUNX.f90:449-462)."""

from __future__ import annotations

import numpy as np

from .config import EDConfig


def matsubara_fermionic(cfg: EDConfig) -> np.ndarray:
    """wm_n = pi/beta * (2n-1), n = 1..Lmats."""
    return np.pi / cfg.beta * (2 * np.arange(1, cfg.lmats + 1) - 1)


def matsubara_bosonic(cfg: EDConfig) -> np.ndarray:
    """vm_n = 2 pi n / beta, n = 0..Lmats."""
    return np.pi / cfg.beta * 2 * np.arange(0, cfg.lmats + 1)


def real_axis(cfg: EDConfig) -> np.ndarray:
    return np.linspace(cfg.wini, cfg.wfin, cfg.lreal)


def imaginary_time(cfg: EDConfig) -> np.ndarray:
    ltau = max(int(cfg.beta), cfg.ltau)
    return np.linspace(0.0, cfg.beta, ltau + 1)


def z_mats(cfg: EDConfig) -> np.ndarray:
    return 1j * matsubara_fermionic(cfg)


def z_real(cfg: EDConfig) -> np.ndarray:
    return real_axis(cfg) + 1j * cfg.eps
