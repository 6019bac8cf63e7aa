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


def test_gloc_hk_superc_matches_dos_limit():
    """k-sum Nambu Gloc at a single k-point == DOS integral with a delta
    DOS at the same energy, on both axes (gloc_hk_superc vs
    gloc_superc_dos)."""
    from dmft_ed_tpu.lattice import gloc_hk_superc, gloc_superc_dos
    cfg = EDConfig(norb=1, nspin=1, nbath=2, ed_mode="superc", beta=40.0,
                   lmats=40, lreal=30, wini=-3, wfin=3).validate()
    rng = np.random.default_rng(3)
    e0 = 0.37
    hk = np.full((1, 1, 1), e0, dtype=complex)
    eb = np.array([[e0]])
    db = np.array([[1.0]])
    h0 = np.zeros(1)
    for L, axis in ((cfg.lmats, "mats"), (cfg.lreal, "real")):
        sig = (rng.normal(size=(1, 1, 1, 1, L))
               + 1j * rng.normal(size=(1, 1, 1, 1, L)))
        if axis == "real":
            # physical causal structure not required for the identity
            sig = sig + 0.0
        san = rng.normal(size=(1, 1, 1, 1, L)) + 0j
        g1, f1 = gloc_hk_superc(cfg, hk, sig, san, axis)
        g2, f2 = gloc_superc_dos(cfg, eb, db, h0, sig, san, axis)
        np.testing.assert_allclose(g1, g2, atol=1e-10, err_msg=axis)
        np.testing.assert_allclose(f1, f2, atol=1e-10, err_msg=axis)


@pytest.mark.slow
def test_ahm_square_sc_phase(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    """ed_ahm_square: attractive U on the square lattice at half filling
    orders superconductingly."""
    from dmft_ed_tpu.models import ahm_square
    cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(-2.0,), ed_mode="superc",
                   deltasc=0.1, beta=80.0, lmats=200, lreal=40, lfit=200,
                   nloop=20, dmft_error=1e-4, ed_verbose=0,
                   lanc_dim_threshold=2048).validate()
    # phsym (same flag as drivers/ed_ahm_square.f90:25,94): without it the
    # free fit converges to a slightly ph-asymmetric bath (dens ~ 1.009)
    r = ahm_square.run(cfg, nk=16, ts=0.25, wmixing=0.5, phsym=True,
                       log=lambda m: None)
    assert r.error < 1e-3
    np.testing.assert_allclose(r.dens, [1.0], atol=5e-3)
    assert r.phisc[0] > 0.05


def test_stripe_hk_limits():
    """Supercell Bloch builder: hermitian; 1x1 supercell reproduces the
    plain square-lattice band; the k-mean keeps exactly the intra-cell
    (open-boundary flake) bonds — wrapped bonds average to zero."""
    from dmft_ed_tpu.models.ahm_stripe import stripe_hk
    from dmft_ed_tpu.models.nano import square_flake_hij
    hk = stripe_hk(2, 2, nk=6, t=0.3)
    np.testing.assert_allclose(hk, hk.conj().transpose(1, 0, 2), atol=1e-12)
    flake, _ = square_flake_hij(2, 2, t=0.3, pbc=False)
    np.testing.assert_allclose(hk.mean(-1), flake, atol=1e-12)
    hk1 = stripe_hk(1, 1, nk=8, t=0.3)[0, 0]
    ks = np.linspace(-np.pi, np.pi, 8, endpoint=False)
    eps = np.array([-2 * 0.3 * (np.cos(kx) + np.cos(ky))
                    for kx in ks for ky in ks])
    np.testing.assert_allclose(np.sort(hk1.real), np.sort(eps), atol=1e-12)


def test_stack_hk_limits():
    """U-stack superlattice builder (ed_ahm_stackU.f90:212-245): hermitian;
    a single layer with periodic wrap reproduces the full 3D cubic band
    -2t(cos kx + cos ky) - 2 t_perp cos kz; alpha_join scales the U_min
    domain and wrap bonds only."""
    from dmft_ed_tpu.models.ahm_stripe import stack_hk, stack_upattern
    hk = stack_hk(4, 2, nk=4, nkz=4, ts=0.3, t_perp=0.5, alpha_join=0.7)
    np.testing.assert_allclose(hk, hk.conj().transpose(1, 0, 2), atol=1e-12)
    # interior bond 2->3 (outside the U_min domain) keeps full t_perp
    np.testing.assert_allclose(hk[2, 3], -0.5, atol=1e-12)
    # bond 0->1 sits in the U_min domain: scaled by alpha_join
    np.testing.assert_allclose(hk[0, 1], -0.35, atol=1e-12)
    hk1 = stack_hk(1, 0, nk=4, nkz=4, ts=0.3, t_perp=0.5)[0, 0]
    ks = np.linspace(-np.pi, np.pi, 4, endpoint=False)
    eps = np.array([-2 * 0.3 * (np.cos(kx) + np.cos(ky))
                    - 2 * 0.5 * np.cos(kz)
                    for kx in ks for ky in ks for kz in ks])
    np.testing.assert_allclose(np.sort(hk1.real), np.sort(eps), atol=1e-12)
    np.testing.assert_allclose(stack_upattern(4, 2, -1.0, -3.0),
                               [-1.0, -1.0, -3.0, -3.0])


@pytest.mark.slow
def test_ahm_stack_u_heterostructure(tmp_path, monkeypatch):
    """ed_ahm_stackU: two-layer U heterostructure — the strong-|U| layer
    orders more strongly; the junction coupling alpha_join flows through
    the stack Bloch Hamiltonian."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.models import ahm_stripe
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(-3.0,), ed_mode="superc",
                   deltasc=0.1, beta=60.0, lmats=150, lreal=30, lfit=150,
                   nloop=12, dmft_error=1e-3, ed_verbose=0,
                   lanc_dim_threshold=2048).validate()
    r = ahm_stripe.run_stack(cfg, nlayers=2, n_umin=1, nk=6, nkz=4,
                             ts=0.25, t_perp=0.4, alpha_join=0.8,
                             u_min=-1.5, u_max=-3.0, wmixing=0.5,
                             log=lambda m: None)
    assert r.error < 1e-2
    np.testing.assert_allclose(r.dens, 1.0, atol=0.03)
    # layer 0 has U=-1.5, layer 1 has U=-3: stronger pairing on layer 1
    assert r.phisc[1] > r.phisc[0] > 0.0
    assert r.docc[1] > r.docc[0]


@pytest.mark.slow
def test_ahm_stripe_u_modulated_sc(tmp_path, monkeypatch):
    """ed_ahm_stripe: the strong-U stripe orders more strongly than the
    weak-U stripe; per-site U flows through the batched site sweep."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.models import ahm_stripe
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(-3.0,), ed_mode="superc",
                   deltasc=0.1, beta=60.0, lmats=150, lreal=30, lfit=150,
                   nloop=12, dmft_error=1e-3, ed_verbose=0,
                   lanc_dim_threshold=2048).validate()
    r = ahm_stripe.run(cfg, lx=2, ly=1, nk=8, ts=0.25, wmixing=0.5,
                       log=lambda m: None)
    assert r.error < 1e-2
    # exact ph symmetry pins n=1; tolerance set by the nbath=3 fit quality
    np.testing.assert_allclose(r.dens, 1.0, atol=0.03)
    # site 0 has U=-3, site 1 has U=-1.5: stronger pairing on site 0
    assert r.phisc[0] > r.phisc[1] > 0.0
    assert r.docc[0] > r.docc[1]


@pytest.mark.slow
def test_haldane_sc_sublattice_symmetry(tmp_path, monkeypatch):
    """ed_haldane_sc: attractive U on the honeycomb lattice; with mass=0
    the two sublattices are equivalent and both order."""
    monkeypatch.chdir(tmp_path)
    from dmft_ed_tpu.models import haldane_sc
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(-2.5,), ed_mode="superc",
                   deltasc=0.1, beta=60.0, lmats=150, lreal=30, lfit=150,
                   nloop=12, dmft_error=1e-3, ed_verbose=0,
                   lanc_dim_threshold=2048).validate()
    r = haldane_sc.run(cfg, nk=9, t1=0.5, wmixing=0.5, log=lambda m: None)
    assert r.error < 1e-2
    np.testing.assert_allclose(r.dens, 1.0, atol=0.02)
    # Dirac semimetal at half filling: condensate is small but finite
    assert np.all(r.phisc > 0.005)
    np.testing.assert_allclose(r.phisc[0], r.phisc[1], atol=1e-4)


def test_gloc_hk_superc_complex_phase_vs_realspace_bdg():
    """Hole block must carry +H(k), not conj(H(k)) (ED_WRAP_GLOC.f90
    zeta(2,2)+Hk): on a 2-site supercell ring with Peierls phases the
    Bloch matrix is genuinely complex, and the exact-Fourier k-sum of the
    Nambu inverse must equal the real-space BdG inversion of the full
    ring to machine precision."""
    from dmft_ed_tpu.lattice import gloc_hk_lattice_superc
    from dmft_ed_tpu import grids
    cfg = EDConfig(norb=1, nspin=1, nbath=2, ed_mode="superc", beta=25.0,
                   lmats=16, xmu=0.13).validate()
    t, phi, m = 1.0, 0.7, 0.21
    ncell, nsite = 4, 2
    N = ncell * nsite
    # real-space ring: uniform Peierls phase on every bond, staggered onsite
    hrs = np.zeros((N, N), dtype=complex)
    for i in range(N):
        hrs[i, (i + 1) % N] = -t * np.exp(1j * phi)
        hrs[(i + 1) % N, i] = -t * np.exp(-1j * phi)
        hrs[i, i] = m if i % 2 == 0 else -m
    # Bloch matrix of the 2-site cell, H(k)_{ab} = sum_R e^{-ikR} H[a0, bR]
    ks = 2 * np.pi * np.arange(ncell) / ncell
    hk = np.zeros((nsite, nsite, ncell), dtype=complex)
    for n, k in enumerate(ks):
        hab = -t * np.exp(1j * phi) - t * np.exp(-1j * phi) * np.exp(1j * k)
        hk[:, :, n] = np.array([[m, hab], [np.conj(hab), -m]])
    rng = np.random.default_rng(7)
    L = cfg.lmats
    sig = np.zeros((nsite, 1, 1, 1, 1, L), dtype=complex)
    san = np.zeros_like(sig)
    for a in range(nsite):
        sig[a, 0, 0, 0, 0] = (rng.normal(size=L) * 0.2
                              - 1j * np.abs(rng.normal(size=L)) * 0.4)
        san[a, 0, 0, 0, 0] = rng.normal(size=L) * 0.3
    G, F = gloc_hk_lattice_superc(cfg, hk, sig, san, "mats")
    # exact real-space Nambu inversion with the SAME per-cell-site Sigma
    z = grids.z_mats(cfg)
    Gx = np.zeros((nsite, L), dtype=complex)
    Fx = np.zeros((nsite, L), dtype=complex)
    for i, zz in enumerate(z):
        S = np.diag([sig[a % 2, 0, 0, 0, 0, i] for a in range(N)])
        SA = np.diag([san[a % 2, 0, 0, 0, 0, i] for a in range(N)])
        M = np.block([
            [(zz + cfg.xmu) * np.eye(N) - hrs - S, -SA],
            [-SA, (zz - cfg.xmu) * np.eye(N) + hrs + np.conj(S)]])
        Mi = np.linalg.inv(M)
        for a in range(nsite):
            Gx[a, i] = Mi[a, a]
            Fx[a, i] = Mi[a, N + a]
    np.testing.assert_allclose(G[:, 0, 0, 0, 0, :], Gx, atol=1e-12)
    np.testing.assert_allclose(F[:, 0, 0, 0, 0, :], Fx, atol=1e-12)


def test_gloc_superc_realaxis_static_sigma():
    """Real-axis hole-block continuation: Sigma_bar(w) = +conj(Sigma(-w+i0))
    (ED_WRAP_GLOC.f90:335 adds +conjg(Sreal(L-i+1))). A static REAL Sigma=s
    must shift the hole block by +s — checked against the explicit Nambu
    inversion, on both gloc_superc_dos and gloc_hk_superc."""
    from dmft_ed_tpu.lattice import gloc_hk_superc, gloc_superc_dos
    from dmft_ed_tpu import grids
    cfg = EDConfig(norb=1, nspin=1, nbath=2, ed_mode="superc", beta=30.0,
                   lreal=41, wini=-3.0, wfin=3.0, eps=0.08,
                   xmu=0.1).validate()
    s, d0, e0 = 0.33, 0.25, 0.2
    L = cfg.lreal
    sig = np.full((1, 1, 1, 1, L), s, dtype=complex)
    san = np.full((1, 1, 1, 1, L), d0, dtype=complex)
    eb = np.array([[e0]])
    db = np.array([[1.0]])
    hk = np.full((1, 1, 1), e0, dtype=complex)
    G1, F1 = gloc_superc_dos(cfg, eb, db, np.zeros(1), sig, san, "real")
    G2, F2 = gloc_hk_superc(cfg, hk, sig, san, "real")
    z = grids.z_real(cfg)
    xi = e0 - cfg.xmu
    Gx = np.zeros(L, dtype=complex)
    Fx = np.zeros(L, dtype=complex)
    for i, zz in enumerate(z):
        M = np.array([[zz - xi - s, -d0],
                      [-d0, zz + xi + s]])   # +s: static real Sigma shift
        Mi = np.linalg.inv(M)
        Gx[i], Fx[i] = Mi[0, 0], Mi[0, 1]
    np.testing.assert_allclose(G1[0, 0, 0, 0], Gx, atol=1e-10)
    np.testing.assert_allclose(F1[0, 0, 0, 0], Fx, atol=1e-10)
    np.testing.assert_allclose(G2[0, 0, 0, 0], Gx, atol=1e-10)
    np.testing.assert_allclose(F2[0, 0, 0, 0], Fx, atol=1e-10)
