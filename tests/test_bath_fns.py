"""Closed-form bath functions vs direct single-particle matrix inversion
(SURVEY.md §4: 'Δ/G₀ closed forms vs direct bath-matrix inversion')."""

import numpy as np
import jax.numpy as jnp
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.bath_fns import bath_params, delta, g0and, invg0, f0and
from dmft_ed_tpu.hamiltonian import single_particle_parts


def _rand_bath(cfg, seed=11):
    rng = np.random.default_rng(seed)
    b = Bath(cfg)
    b.e[:] = rng.normal(size=b.e.shape)
    b.v[:] = rng.normal(size=b.v.shape) * 0.7
    if b.d is not None:
        b.d[:] = rng.uniform(0.2, 0.6, size=b.d.shape)
    if b.u is not None:
        b.u[:] = rng.normal(size=b.u.shape) * 0.3
    if cfg.bath_type == "replica":
        h = rng.normal(size=b.h.shape) + 1j * rng.normal(size=b.h.shape)
        nso = cfg.nspin * cfg.norb
        hso = h.transpose(0, 2, 1, 3, 4).reshape(nso, nso, cfg.nbath)
        hso = (hso + hso.conj().transpose(1, 0, 2)) / 2
        b.h[:] = hso.reshape(cfg.nspin, cfg.norb, cfg.nspin, cfg.norb,
                             cfg.nbath).transpose(0, 2, 1, 3, 4)
        if cfg.ed_mode == "normal" and cfg.nspin == 2:
            # normal mode: replica h is spin-diagonal (set_dmft_bath fills
            # only same-spin blocks)
            b.h[0, 1] = 0.0
            b.h[1, 0] = 0.0
        b.vr[:] = rng.normal(size=cfg.nbath)
    return b


def _hloc(cfg, seed=12, cplx=False):
    rng = np.random.default_rng(seed)
    nso = cfg.nspin * cfg.norb
    hso = rng.normal(size=(nso, nso))
    if cplx:
        hso = hso + 1j * rng.normal(size=(nso, nso))
    hso = (hso + hso.conj().T) / 2
    return hso.reshape(cfg.nspin, cfg.norb, cfg.nspin, cfg.norb
                       ).transpose(0, 2, 1, 3)


def _g0_exact_normal(cfg, bath, hloc, z):
    """G0 from direct inversion of the full single-particle matrix."""
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    ns = cfg.ns
    T = np.zeros((2 * ns, 2 * ns), dtype=complex)
    T[:ns, :ns] = Tuu
    T[ns:, ns:] = Tdd
    T[:ns, ns:] = Tud
    T[ns:, :ns] = Tud.conj().T
    out = np.zeros((cfg.nspin, cfg.nspin, cfg.norb, cfg.norb, len(z)),
                   dtype=complex)
    for i, zz in enumerate(z):
        G = np.linalg.inv(zz * np.eye(2 * ns) - T)
        for s in range(cfg.nspin):
            for s2 in range(cfg.nspin):
                o1 = 0 if s == 0 else ns
                o2 = 0 if s2 == 0 else ns
                out[s, s2, :, :, i] = G[o1:o1 + cfg.norb, o2:o2 + cfg.norb]
    return out


@pytest.mark.parametrize("bath_type,nspin,norb", [
    ("normal", 1, 1), ("normal", 2, 2), ("hybrid", 1, 2), ("replica", 2, 2)])
def test_g0_normal_mode_vs_inversion(bath_type, nspin, norb):
    cfg = EDConfig(norb=norb, nbath=3, nspin=nspin, bath_type=bath_type,
                   xmu=0.37).validate()
    bath = _rand_bath(cfg)
    hloc = _hloc(cfg, cplx=(bath_type == "replica"))
    if bath_type == "normal":
        # this bath topology has no inter-orbital mixing: G0 is a scalar
        # inverse per (spin, orbital); restrict Hloc accordingly
        hloc = hloc * np.eye(norb)[None, None, :, :]
        hloc = hloc * np.eye(nspin)[:, :, None, None]
    z = 1j * np.pi / 10 * (2 * np.arange(1, 6) - 1) + 0.1
    p = bath_params(bath)
    g0 = np.asarray(g0and(cfg, jnp.asarray(z), p, hloc))
    gex = _g0_exact_normal(cfg, bath, hloc, z)
    if bath_type == "normal":
        # only diagonal components are defined in this bath topology
        for s in range(nspin):
            for a in range(norb):
                np.testing.assert_allclose(g0[s, s, a, a], gex[s, s, a, a],
                                           atol=1e-10)
    else:
        for s in range(nspin):
            np.testing.assert_allclose(g0[s, s], gex[s, s], atol=1e-10)


def test_g0_nonsu2_vs_inversion():
    cfg = EDConfig(norb=1, nbath=3, nspin=2, ed_mode="nonsu2",
                   xmu=0.2).validate()
    bath = _rand_bath(cfg)
    hloc = _hloc(cfg, cplx=True)
    # exact inversion requires the analytic W-form to describe the same H:
    # nonsu2 normal bath couples imp spin s to bath level spin h with W[s,h]
    z = 1j * np.linspace(0.3, 3.0, 5)
    p = bath_params(bath)
    g0 = np.asarray(g0and(cfg, jnp.asarray(z), p, hloc))
    gex = _g0_exact_normal(cfg, bath, hloc, z)
    np.testing.assert_allclose(g0, gex, atol=1e-10)


def test_g0_superc_vs_bdg_inversion():
    cfg = EDConfig(norb=1, nbath=3, nspin=1, ed_mode="superc", xmu=0.15,
                   deltasc=0.3).validate()
    bath = _rand_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    ns = cfg.ns
    wm = np.pi / 10 * (2 * np.arange(1, 8) - 1)
    z = 1j * wm
    p = bath_params(bath)
    g0 = np.asarray(g0and(cfg, jnp.asarray(z), p, hloc))
    f0 = np.asarray(f0and(cfg, jnp.asarray(z), p, hloc))
    for i, zz in enumerate(z):
        # BdG: basis (up particles, down holes)
        H = np.zeros((2 * ns, 2 * ns))
        H[:ns, :ns] = Tuu.real
        H[ns:, ns:] = -Tdd.real
        H[:ns, ns:] = np.diag(P)
        H[ns:, :ns] = np.diag(P)
        G = np.linalg.inv(zz * np.eye(2 * ns) - H)
        np.testing.assert_allclose(g0[0, 0, 0, 0, i], G[0, 0], atol=1e-10)
        assert abs(abs(f0[0, 0, 0, 0, i]) - abs(G[0, ns])) < 1e-10


def test_delta_schur_complement():
    """Δ = (z+mu) - hloc - G0^{-1} for the matrix-valued cases."""
    cfg = EDConfig(norb=2, nbath=2, nspin=1, bath_type="hybrid",
                   xmu=0.1).validate()
    bath = _rand_bath(cfg)
    hloc = _hloc(cfg)
    z = 1j * np.linspace(0.5, 4.0, 4)
    p = bath_params(bath)
    D = np.asarray(delta(cfg, jnp.asarray(z), p))
    ig = np.asarray(invg0(cfg, jnp.asarray(z), p, hloc))
    for i, zz in enumerate(z):
        lhs = (zz + cfg.xmu) * np.eye(2) - hloc[0, 0] - D[0, 0, :, :, i]
        np.testing.assert_allclose(lhs, ig[0, 0, :, :, i], atol=1e-12)
