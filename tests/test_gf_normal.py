"""Krylov Green's functions vs exact Lehmann representation on tiny systems
(SURVEY.md §4 integration level: 'GFs must match pole sums')."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.diag import diagonalize, DiagState
from dmft_ed_tpu.gf_normal import build_gf_normal, build_sigma_normal
from dmft_ed_tpu.hamiltonian import single_particle_parts
from dmft_ed_tpu import grids

import reference_ed as ref


def lehmann_gf(cfg, bath, hloc, z, beta, finite_t):
    """Exact G_ab^{ss}(z) by full-Fock dense diagonalization (independent
    oracle: integer-state bit algebra only)."""
    ns, norb = cfg.ns, cfg.norb
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    states = list(range(4 ** ns))
    H = ref.build_full_H(ns, norb, Tuu, Tdd, Tud, P,
                         np.asarray(cfg.uloc_arr[:norb]), cfg.ust, cfg.jh,
                         cfg.jx, cfg.jp, cfg.hfmode, states)
    evals, U = np.linalg.eigh(H)
    e0 = evals[0]
    if finite_t:
        w = np.exp(-beta * (evals - e0))
    else:
        deg = np.abs(evals - e0) <= 1e-9
        w = deg.astype(float)
    Z = w.sum()
    G = np.zeros((cfg.nspin, cfg.nspin, norb, norb, len(z)), dtype=complex)
    for s in range(cfg.nspin):
        for a in range(norb):
            for b in range(norb):
                pa, pb = s * ns + a, s * ns + b
                # dense c†: <m|c†_p|n>
                cdg_a = np.zeros((len(states), len(states)))
                cdg_b = np.zeros((len(states), len(states)))
                for col, st in enumerate(states):
                    for mat, pos in ((cdg_a, pa), (cdg_b, pb)):
                        r = ref.cdg_op(pos, st)
                        if r is not None:
                            mat[r[0], col] = r[1]
                A = U.conj().T @ cdg_a @ U   # A[m,n] = <m|c†_a|n>
                B = U.conj().T @ cdg_b @ U
                # G_ab(z) = 1/Z Σ_{n,m} <n|c_a|m><m|c†_b|n>(w_n+w_m)/(z-(Em-En))
                #         = 1/Z Σ_{m,n} conj(A[m,n]) B[m,n](w_n+w_m)/(z-dE[m,n])
                dE = evals[:, None] - evals[None, :]      # E_m - E_n
                num = np.conj(A) * B * (w[None, :] + w[:, None])
                G_ab = np.array([np.sum(num / (zz - dE)) for zz in z]) / Z
                G[s, s, a, b] = G_ab
    return G


def _bethe_cfg(**kw):
    base = dict(norb=1, nbath=2, nspin=1, uloc=(2.0,), beta=50.0,
                lmats=24, lreal=10, wini=-3, wfin=3, eps=0.05,
                lanc_dim_threshold=2048)
    base.update(kw)
    return EDConfig(**base).validate()


def _rand_bath(cfg, seed=21):
    rng = np.random.default_rng(seed)
    b = Bath(cfg)
    b.e[:] = rng.normal(size=b.e.shape) * 0.8
    b.v[:] = rng.uniform(0.3, 0.8, size=b.v.shape)
    return b


@pytest.mark.parametrize("finite_t", [False, True])
def test_gf_diagonal_vs_lehmann(finite_t):
    cfg = _bethe_cfg(xmu=0.1)
    if finite_t:
        cfg = cfg.replace(beta=5.0, lanc_nstates_total=60, cutoff=1e-10)
    bath = _rand_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    st = DiagState(lanc_nstates_total=cfg.lanc_nstates_total)
    slist, zeta, st = diagonalize(cfg, bath, hloc, st)
    Gm, Gr = build_gf_normal(cfg, slist, zeta, bath, hloc, finite_t)
    zm = grids.z_mats(cfg)
    Gex = lehmann_gf(cfg, bath, hloc, zm, cfg.beta, finite_t)
    np.testing.assert_allclose(Gm[0, 0, 0, 0], Gex[0, 0, 0, 0],
                               atol=2e-7 if finite_t else 1e-9)


def test_gf_offdiag_hybrid_vs_lehmann():
    cfg = EDConfig(norb=2, nbath=1, nspin=1, uloc=(1.5, 1.5), ust=0.7,
                   bath_type="hybrid", beta=40.0, lmats=16, lreal=8,
                   lanc_dim_threshold=2048, xmu=0.2).validate()
    rng = np.random.default_rng(3)
    bath = Bath(cfg)
    bath.e[:] = rng.normal(size=bath.e.shape)
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.array([[0.3, 0.15], [0.15, -0.2]])
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr = build_gf_normal(cfg, slist, zeta, bath, hloc, finite_t=False)
    zm = grids.z_mats(cfg)
    Gex = lehmann_gf(cfg, bath, hloc, zm, cfg.beta, False)
    np.testing.assert_allclose(Gm[0, 0, 0, 0], Gex[0, 0, 0, 0], atol=1e-8)
    np.testing.assert_allclose(Gm[0, 0, 1, 1], Gex[0, 0, 1, 1], atol=1e-8)
    np.testing.assert_allclose(Gm[0, 0, 0, 1], Gex[0, 0, 0, 1], atol=1e-8)


def test_sigma_dyson_identity():
    """Σ must satisfy G = [G0^{-1} - Σ]^{-1} by construction, and decay at
    large Matsubara frequency."""
    cfg = _bethe_cfg(lmats=64)
    bath = _rand_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    Gm, Gr = build_gf_normal(cfg, slist, zeta, bath, hloc, False)
    Sm, Sr, g0m, g0r = build_sigma_normal(cfg, bath, hloc, Gm, Gr)
    # G0 consistency: G = 1/(invG0 - Sigma)
    from dmft_ed_tpu.bath_fns import bath_params, invg0
    import jax.numpy as jnp
    ig0 = np.asarray(invg0(cfg, jnp.asarray(grids.z_mats(cfg)),
                           bath_params(bath), hloc))
    np.testing.assert_allclose(
        Gm[0, 0, 0, 0], 1.0 / (ig0[0, 0, 0, 0] - Sm[0, 0, 0, 0]), atol=1e-10)
