"""End-to-end superconducting DMFT (ed_ahm_bethe, BASELINE config 3) +
unit check of the Nambu lattice algebra."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.lattice import bethe_bands, gloc_superc_dos
from dmft_ed_tpu.models import ahm_bethe
from dmft_ed_tpu import grids


def test_gloc_superc_vs_nambu_inversion():
    cfg = EDConfig(norb=1, nbath=2, nspin=1, ed_mode="superc", beta=40.0,
                   lmats=12, xmu=0.1).validate()
    eb, db, h0 = bethe_bands(1, 1.0, 200)
    rng = np.random.default_rng(61)
    sig = (rng.normal(size=cfg.lmats) * 0.1
           - 1j * np.abs(rng.normal(size=cfg.lmats)) * 0.3)
    sa = rng.normal(size=cfg.lmats) * 0.2
    sigma = np.zeros((1, 1, 1, 1, cfg.lmats), dtype=complex)
    sigma_an = np.zeros_like(sigma)
    sigma[0, 0, 0, 0] = sig
    sigma_an[0, 0, 0, 0] = sa
    G, F = gloc_superc_dos(cfg, eb, db, h0, sigma, sigma_an)
    z = grids.z_mats(cfg)
    # explicit 2x2 inversion per (e, freq): H_nambu = [[xi+S, SA],[SA,-xi-S]]
    Gx = np.zeros(cfg.lmats, dtype=complex)
    Fx = np.zeros(cfg.lmats, dtype=complex)
    for i, zz in enumerate(z):
        acc_g = acc_f = 0.0
        for e, d in zip(eb[0], db[0]):
            xi = e + h0[0] - cfg.xmu
            M = np.array([[zz - xi - sig[i], -sa[i]],
                          [-sa[i], zz + xi + np.conj(sig[i])]])
            Mi = np.linalg.inv(M)
            acc_g += d * Mi[0, 0]
            acc_f += d * Mi[0, 1]
        Gx[i], Fx[i] = acc_g, acc_f
    np.testing.assert_allclose(G[0, 0, 0, 0], Gx, atol=1e-10)
    np.testing.assert_allclose(F[0, 0, 0, 0], Fx, atol=1e-10)


def test_ahm_bethe_sc_solution(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(-2.0,), ed_mode="superc",
                   deltasc=0.1, beta=100.0, lmats=200, lreal=60, lfit=200,
                   nloop=25, dmft_error=1e-4, ed_verbose=0,
                   lanc_dim_threshold=2048).validate()
    r = ahm_bethe.run(cfg, le=200, wbethe=1.0, wmixing=0.5,
                      log=lambda m: None)
    assert r.error < 1e-3, r.error
    np.testing.assert_allclose(r.dens, [1.0], atol=0.05)
    # superconducting solution: finite order parameter and anomalous GF
    assert 0.2 < abs(r.phisc[0]) < 0.5, r.phisc
    assert abs(r.fmats[0, 0, 0, 0, 0]) > 0.1
    # attractive U: enhanced double occupancy (> uncorrelated 0.25)
    assert r.docc[0] > 0.3
