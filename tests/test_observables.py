"""Observables / local energy vs exact full-Fock expectation values."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.diag import diagonalize, DiagState
from dmft_ed_tpu.observables import compute_observables, local_energy
from dmft_ed_tpu.hamiltonian import single_particle_parts

import reference_ed as ref


def _exact_gs(cfg, bath, hloc):
    ns, norb = cfg.ns, cfg.norb
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    states = list(range(4 ** ns))
    H = ref.build_full_H(ns, norb, Tuu, Tdd, Tud, P,
                         np.asarray(cfg.uloc_arr[:norb]), cfg.ust, cfg.jh,
                         cfg.jx, cfg.jp, cfg.hfmode, states)
    evals, U = np.linalg.eigh(H)
    return states, evals, U


def _occ_exp(states, psi, pos):
    occ = np.array([(s >> pos) & 1 for s in states], dtype=float)
    return float(np.sum(np.abs(psi) ** 2 * occ))


def test_observables_vs_exact():
    cfg = EDConfig(norb=2, nbath=1, nspin=1, uloc=(2.0, 1.2), ust=0.6,
                   jh=0.15, jx=0.15, jp=0.15, xmu=0.3, beta=100.0,
                   lanc_dim_threshold=10 ** 6).validate()
    rng = np.random.default_rng(9)
    bath = Bath(cfg)
    bath.e[:] = rng.normal(size=bath.e.shape)
    bath.v[:] = rng.uniform(0.4, 0.8, size=bath.v.shape)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.2, 0.1], [0.1, -0.3]])

    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    obs = compute_observables(cfg, slist, zeta, bath, hloc, False)

    states, evals, U = _exact_gs(cfg, bath, hloc)
    # ground state possibly degenerate: average over the degenerate manifold
    deg = np.abs(evals - evals[0]) <= 1e-9
    ndeg = int(deg.sum())
    ns = cfg.ns
    dens_up = np.zeros(2)
    dens_dw = np.zeros(2)
    docc = np.zeros(2)
    for k in np.nonzero(deg)[0]:
        psi = U[:, k]
        for a in range(2):
            nu_ = _occ_exp(states, psi, a)
            nd_ = _occ_exp(states, psi, ns + a)
            dens_up[a] += nu_ / ndeg
            dens_dw[a] += nd_ / ndeg
            both = np.array([((s >> a) & 1) * ((s >> (ns + a)) & 1)
                             for s in states], dtype=float)
            docc[a] += float(np.sum(np.abs(psi) ** 2 * both)) / ndeg
    np.testing.assert_allclose(obs.dens_up, dens_up, atol=1e-8)
    np.testing.assert_allclose(obs.dens_dw, dens_dw, atol=1e-8)
    np.testing.assert_allclose(obs.docc, docc, atol=1e-8)
    np.testing.assert_allclose(obs.dens, dens_up + dens_dw, atol=1e-8)


def test_local_energy_vs_exact():
    cfg = EDConfig(norb=2, nbath=1, nspin=1, uloc=(2.0, 1.2), ust=0.6,
                   jh=0.15, jx=0.2, jp=0.1, xmu=0.3, beta=100.0, hfmode=True,
                   lanc_dim_threshold=10 ** 6).validate()
    rng = np.random.default_rng(10)
    bath = Bath(cfg)
    bath.e[:] = rng.normal(size=bath.e.shape)
    bath.v[:] = rng.uniform(0.4, 0.8, size=bath.v.shape)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.2, 0.12], [0.12, -0.3]])

    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    E = local_energy(cfg, slist, zeta, bath, hloc, False)

    # exact pieces via probe Hamiltonians on the exact ground state
    states, evals, U = _exact_gs(cfg, bath, hloc)
    deg = np.abs(evals - evals[0]) <= 1e-9
    ks = np.nonzero(deg)[0]
    ns, norb = cfg.ns, cfg.norb
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    z2 = np.zeros((ns, ns))
    # Eknot probe: impurity hloc only
    Timp = np.zeros((ns, ns))
    Timp[:norb, :norb] = hloc[0, 0]
    Hknot = ref.build_full_H(ns, norb, Timp, Timp, z2, np.zeros(ns),
                             np.zeros(norb), 0, 0, 0, 0, False, states)
    # Epot probe: interactions without Hartree
    Hint = ref.build_full_H(ns, norb, z2, z2, z2, np.zeros(ns),
                            np.asarray(cfg.uloc_arr[:norb]), cfg.ust, cfg.jh,
                            cfg.jx, cfg.jp, False, states)
    # Hartree probe: full interaction incl. Hartree minus bare interaction
    HintHF = ref.build_full_H(ns, norb, z2, z2, z2, np.zeros(ns),
                              np.asarray(cfg.uloc_arr[:norb]), cfg.ust,
                              cfg.jh, cfg.jx, cfg.jp, True, states)
    eknot = epot = ehf = 0.0
    for k in ks:
        psi = U[:, k]
        eknot += np.real(psi.conj() @ Hknot @ psi) / len(ks)
        epot += np.real(psi.conj() @ Hint @ psi) / len(ks)
        ehf += np.real(psi.conj() @ (HintHF - Hint) @ psi) / len(ks)
    np.testing.assert_allclose(E.eknot, eknot, atol=1e-8)
    np.testing.assert_allclose(E.epot - E.ehartree, epot, atol=1e-8)
    np.testing.assert_allclose(E.ehartree, ehf, atol=1e-8)
