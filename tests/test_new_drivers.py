"""Round-2 driver families: ehm_bethe, ahm_2bands, bhz_afm supercells,
wsm_slab, BLG AA/AB (VERDICT round 1, item 3)."""

import os
import tempfile
from contextlib import contextmanager

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig


@contextmanager
def scratch_dir():
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as d:
        os.chdir(d)
        try:
            yield
        finally:
            os.chdir(cwd)


# ----------------------------------------------------------------------
# pure-lattice identities (fast)
# ----------------------------------------------------------------------

def test_bhz_supercell_hk_matches_primitive():
    """supercell_hk with a 1-site cell reproduces hk_bhz exactly; AFM
    cells preserve the spectral moments of the primitive model (the
    reference hand-writes these matrices, ed_bhz_2d_afm2.f90 hk_model)."""
    from dmft_ed_tpu.models.bhz_afm import (bhz_hops_2d, supercell_hk,
                                            _CELLS)
    from dmft_ed_tpu.models.bhz_2d import hk_bhz
    M, hops = bhz_hops_2d(1.0, 0.3)
    H1 = supercell_hk(M, hops, [[0, 0]], np.eye(2, dtype=int), 8)
    ks = np.linspace(-np.pi, np.pi, 8, endpoint=False)
    ref = np.stack([hk_bhz(kx, ky, 1.0, 0.3) for kx in ks for ky in ks], -1)
    np.testing.assert_allclose(H1, ref, atol=1e-14)
    evp = np.linalg.eigvalsh(np.stack(
        [hk_bhz(kx, ky, 1.0, 0.3)
         for kx in np.linspace(-np.pi, np.pi, 24, endpoint=False)
         for ky in np.linspace(-np.pi, np.pi, 24, endpoint=False)])).ravel()
    for cell in ("afm2", "afm4"):
        pos, A = _CELLS[cell]
        Hs = supercell_hk(M, hops, pos, A, 24)
        evs = np.linalg.eigvalsh(Hs.transpose(2, 0, 1)).ravel()
        for p in (1, 2, 4):
            np.testing.assert_allclose((evs ** p).mean(), (evp ** p).mean(),
                                       atol=1e-10)


def test_bhz_afm_supercell_gloc_matches_primitive_u0():
    """Site-resolved U=0 Gloc on the AFM2 supercell == the primitive-cell
    BHZ Gloc (gauge invariance of the folding)."""
    from dmft_ed_tpu.models.bhz_afm import bhz_hops_2d, supercell_hk, _CELLS
    from dmft_ed_tpu.models.bhz_2d import hk_bhz
    from dmft_ed_tpu.lattice import gloc_hk_lattice, gloc_hk
    cfg = EDConfig(norb=2, nbath=1, nspin=2, lmats=16).validate()
    M, hops = bhz_hops_2d(1.0, 0.3)
    pos, A = _CELLS["afm2"]
    nk = 16
    Hs = supercell_hk(M, hops, pos, A, nk)
    sig0 = np.zeros((2, 2, 2, 2, 2, cfg.lmats), dtype=complex)
    gl = gloc_hk_lattice(cfg, Hs, sig0, "mats")
    # primitive grid must cover the SAME physical k-set: the afm2 cell has
    # 2 sites, its reduced BZ x 2 bands folds the full BZ
    ksf = np.linspace(-np.pi, np.pi, 2 * nk, endpoint=False)
    hp = np.stack([hk_bhz(kx, ky, 1.0, 0.3) for kx in ksf for ky in ksf],
                  -1)
    gp = gloc_hk(cfg, hp, sig0[0], "mats")
    # moments/diagonal agreement to the k-grid discretization level
    np.testing.assert_allclose(gl[0][0, 0, 0, 0], gp[0, 0, 0, 0], atol=2e-3)
    np.testing.assert_allclose(gl[1][0, 0, 1, 1], gp[0, 0, 1, 1], atol=2e-3)


def test_wsm_slab_hk_structure():
    """Slab assembly: hermitian, layer-tridiagonal, and the bz term opens
    the expected Weyl splitting (gapless bulk bands for |mh| < 2 e0 + ...)."""
    from dmft_ed_tpu.models.wsm_slab import wsm_slab_hk
    hk = wsm_slab_hk(8, 3, e0=1.0, mh=2.0, llambda=1.0, bz=0.1)
    assert hk.shape == (12, 12, 64)
    np.testing.assert_allclose(hk, hk.conj().transpose(1, 0, 2), atol=1e-14)
    # no direct 3rd-neighbor layer coupling
    np.testing.assert_allclose(hk[:4, 8:, :], 0.0, atol=1e-14)


def test_blg_hk_physics():
    """Monolayer limit has Dirac nodes; AB stacking keeps the quadratic
    band touching; AA shifts the cones by +-t0; both are hermitian."""
    from dmft_ed_tpu.models.blg import blg_hk
    mono = blg_hk(48, "AA", t=1.0, t0=0.0)
    assert np.abs(np.linalg.eigvalsh(mono.transpose(2, 0, 1))).min() < 1e-10
    ab = blg_hk(48, "AB", t=1.0, t0=0.2)
    np.testing.assert_allclose(ab, ab.conj().transpose(1, 0, 2), atol=1e-14)
    assert np.abs(np.linalg.eigvalsh(ab.transpose(2, 0, 1))).min() < 1e-10
    aa = blg_hk(48, "AA", t=1.0, t0=0.2)
    evs = np.linalg.eigvalsh(aa.transpose(2, 0, 1))
    # AA: the interlayer t0*I commutes with the layer blocks, so the
    # spectrum is the 2-band monolayer spectrum shifted by +-t0
    mono2 = np.linalg.eigvalsh(
        mono[:2, :2].transpose(2, 0, 1))        # t0=0: layer block = mono
    got = np.sort(evs.ravel())
    want = np.sort(np.concatenate([(mono2 + 0.2).ravel(),
                                   (mono2 - 0.2).ravel()]))
    np.testing.assert_allclose(got, want, atol=1e-12)


# ----------------------------------------------------------------------
# DMFT loops (physics anchors)
# ----------------------------------------------------------------------

def test_ehm_bethe_hartree_cancellation():
    """At half filling the W0 Hartree shift cancels exactly against the
    xmu0 = xmu + W0 offset (ed_ehm_bethe.f90:41,88): the W0 = 0.4 loop
    must track the plain Bethe loop."""
    from dmft_ed_tpu.models import ehm_bethe
    kw = dict(norb=1, nbath=3, nspin=1, uloc=(2.0,), beta=20.0, lmats=128,
              lreal=32, nloop=5, dmft_error=1e-15, ed_verbose=0)
    with scratch_dir():
        r_ehm = ehm_bethe.run(EDConfig(**kw).validate(), w0=0.4, le=200)
    with scratch_dir():
        r_0 = ehm_bethe.run(EDConfig(**kw).validate(), w0=0.0, le=200)
    np.testing.assert_allclose(r_ehm.dens, 1.0, atol=1e-5)
    np.testing.assert_allclose(r_ehm.docc, r_0.docc, atol=1e-6)
    # xmu_eff = xmu0 - W0*dens -> back to the bare xmu at half filling
    np.testing.assert_allclose(r_ehm.xmu_eff, 0.0, atol=1e-5)


@pytest.mark.slow
def test_ahm_2bands_orbital_symmetry():
    """alpha=1: the two bands are identical — per-orbital docc and phi
    must coincide; alpha=2: the wider band pairs more weakly (smaller
    |phi|) at fixed U (ed_ahm_2bands_bethe.f90 physics)."""
    from dmft_ed_tpu.models import ahm_2bands
    kw = dict(norb=2, nbath=2, nspin=1, ed_mode="superc",
              uloc=(-2.0, -2.0), beta=20.0, lmats=128, lreal=32, nloop=6,
              dmft_error=1e-15, ed_verbose=0)
    with scratch_dir():
        r1 = ahm_2bands.run(EDConfig(**kw).validate(), alpha=1.0, le=200)
    # orbital symmetry holds to the bath-fit degeneracy floor (the chi^2
    # valley is ~1e-3 flat — see test_ozaki_dmft_physics_impact), not to
    # machine precision: the two orbitals' Krylov chains use different
    # random seeds and the fit walks the flat valley independently
    np.testing.assert_allclose(r1.docc[0], r1.docc[1], atol=1e-3)
    np.testing.assert_allclose(r1.phisc[0], r1.phisc[1], atol=1e-3)
    assert abs(r1.phisc[0]) > 0.05     # superconducting solution
    with scratch_dir():
        r2 = ahm_2bands.run(EDConfig(**kw).validate(), alpha=2.0, le=200)
    assert abs(r2.phisc[1]) < abs(r2.phisc[0])


@pytest.mark.slow
def test_bhz_afm2_staggered_magnetization():
    """Néel-seeded BHZ afm2 cell: the two sublattices carry opposite
    magnetization of equal magnitude (ed_bhz_2d_afm2.f90)."""
    from dmft_ed_tpu.models import bhz_afm
    cfg = EDConfig(norb=2, nbath=1, nspin=2, uloc=(6.0, 6.0), ust=0.0,
                   beta=20.0, lmats=128, lreal=32, nloop=5, sb_field=0.2,
                   dmft_error=1e-15, ed_verbose=0).validate()
    with scratch_dir():
        r = bhz_afm.run(cfg, cell="afm2", nk=8, mh=1.0, llambda=0.3)
    m = r.magz
    np.testing.assert_allclose(m[0], -m[1], atol=1e-4)
    assert np.max(np.abs(m)) > 0.1     # ordered solution survived the seed


@pytest.mark.slow
def test_wsm_slab_dmft_runs():
    """2-layer WSM slab: mirror-equivalent layers, PH-symmetric density at
    xmu=0 (the model is bipartite-PH symmetric at bz!=0 too)."""
    from dmft_ed_tpu.models import wsm_slab
    cfg = EDConfig(norb=2, nbath=1, nspin=2, uloc=(1.0, 1.0), beta=20.0,
                   lmats=96, lreal=32, nloop=3, dmft_error=1e-15,
                   ed_verbose=0).validate()
    with scratch_dir():
        r = wsm_slab.run(cfg, ly=2, nk=6, mh=2.0, llambda=1.0, bz=0.1)
    assert r.iterations == 3
    assert r.smats_ineq.shape[0] == 1          # lrsym: 1 ineq of 2 layers
    np.testing.assert_allclose(np.sum(r.dens, axis=1), 2.0, atol=5e-3)


@pytest.mark.slow
def test_blg_aa_ab_dmft():
    """AA at half filling: all 4 sublattice sites equivalent (dens=1,
    equal docc). AB: dimer (B1/A2) and uncoordinated (A1/B2) sites carry
    different docc."""
    from dmft_ed_tpu.models import blg
    kw = dict(norb=1, nbath=3, nspin=1, uloc=(2.0,), beta=20.0, lmats=96,
              lreal=32, nloop=4, dmft_error=1e-15, ed_verbose=0)
    with scratch_dir():
        r_aa = blg.run(EDConfig(**kw).validate(), stacking="AA", nk=8,
                       t0=0.3)
    np.testing.assert_allclose(r_aa.dens[:, 0], 1.0, atol=3e-4)
    with scratch_dir():
        r_ab = blg.run(EDConfig(**kw).validate(), stacking="AB", nk=8,
                       t0=0.3)
    np.testing.assert_allclose(r_ab.dens[:, 0], 1.0, atol=3e-4)
    # dimer vs uncoordinated sites differ
    assert abs(r_ab.docc[0, 0] - r_ab.docc[1, 0]) > 1e-4


@pytest.mark.slow
def test_nano_sc_flake():
    """2x2 attractive-U flake through the superc real-space loop
    (ed_nano_sc.f90): all four corner sites are symmetry equivalent
    (1 ineq solve), uniform phi > 0 on every site at half filling."""
    from dmft_ed_tpu.models import nano
    cfg = EDConfig(norb=1, nbath=2, nspin=1, ed_mode="superc",
                   uloc=(-3.0,), beta=20.0, lmats=96, lreal=32, nloop=4,
                   dmft_error=1e-15, ed_verbose=0).validate()
    hij, lat2ineq = nano.square_flake_hij(2, 2, t=1.0)
    with scratch_dir():
        r = nano.run_sc(cfg, hij, lat2ineq=lat2ineq)
    assert r.iterations == 4
    np.testing.assert_allclose(r.dens, 1.0, atol=1e-3)
    assert np.all(r.phisc > 0.05)
    assert np.ptp(r.phisc) < 1e-12     # equivalent sites share the solve


def test_effective_exchange_layout_and_limits():
    """ed_get_jeff equivalent: zero for a paramagnetic Sigma; matches a
    literal reimplementation of the reference kernel
    (ed_nano_fix_trans.f90:995-1008) on a spin-split 2-site problem."""
    from dmft_ed_tpu.lattice import gloc_realspace_full, effective_exchange
    from dmft_ed_tpu import grids
    cfg = EDConfig(norb=1, nbath=1, nspin=2, beta=10.0, lreal=200,
                   wini=-4.0, wfin=4.0).validate()
    nlat = 2
    hij = np.zeros((4, 4))
    for s in range(2):               # site-major (site, spin): t=1 dimer
        hij[0 * 2 + s, 1 * 2 + s] = hij[1 * 2 + s, 0 * 2 + s] = -1.0
    # paramagnetic: jeff == 0
    sig = np.zeros((nlat, 2, 2, 1, 1, cfg.lreal), dtype=complex)
    sig[:, 0, 0] = sig[:, 1, 1] = 0.3 - 0.1j
    g = gloc_realspace_full(cfg, hij, sig, "real")
    np.testing.assert_allclose(effective_exchange(cfg, g, sig), 0.0,
                               atol=1e-14)
    # spin-split: compare against the literal reference loop
    rng = np.random.default_rng(3)
    sig[:, 0, 0] += 0.2 + 0.05j * rng.random(cfg.lreal)
    sig[:, 1, 1] -= 0.2 + 0.02j * rng.random(cfg.lreal)
    g = gloc_realspace_full(cfg, hij, sig, "real")
    jeff = effective_exchange(cfg, g, sig)
    wr = grids.real_axis(cfg)
    ref = np.zeros((nlat, nlat))
    for i in range(nlat):
        for j in range(nlat):
            kernel = 0.0
            for n in range(cfg.lreal):
                saux_i = (sig[i, 0, 0, 0, 0, n] - sig[i, 1, 1, 0, 0, n]) / 2
                saux_j = (sig[j, 0, 0, 0, 0, n] - sig[j, 1, 1, 0, 0, n]) / 2
                fermi = 1.0 / (1.0 + np.exp(cfg.beta * wr[n]))
                kernel += (saux_i * g[2 * i, 2 * j, n] * saux_j
                           * g[2 * j + 1, 2 * i + 1, n] * fermi)
            ref[i, j] = np.imag(kernel) / np.pi
    np.testing.assert_allclose(jeff, ref, atol=1e-12)
    np.testing.assert_allclose(jeff, jeff.T, atol=1e-12)


@pytest.mark.slow
def test_soc_ineq_crystal_field_split():
    """ed_SOC_ineq: two t2g+SOC sites with different crystal-field shifts
    carry different densities; per-site SOC operators come out of the
    lattice getter (ED_IO/get_imp_SOC_op.f90 lattice variant)."""
    from dmft_ed_tpu.models import soc_ineq
    cfg = EDConfig(norb=3, nspin=2, nbath=1, uloc=(1.0, 1.0, 1.0),
                   ed_mode="nonsu2", bath_type="replica", beta=20.0,
                   lmats=96, lreal=32, nloop=2, dmft_error=1e-15,
                   ed_verbose=0).validate()
    with scratch_dir():
        r = soc_ineq.run(cfg, nlat=2, nk=4, soc=0.25, shifts=[0.0, 0.6],
                         tperp=0.1)
        ops = r.solver.get_quantum_soc_operators()
    assert r.iterations == 2
    n0, n1 = r.dens.sum(axis=1)
    assert n0 > n1 + 0.01            # shifted site holds fewer electrons
    assert len(ops) == 2
    # SOC partially polarizes L.S on each site; finite and equal-sign
    assert all(abs(o["LS"].real) > 1e-3 for o in ops)


def test_new_hk_builders():
    """hk_square_2nn / hk_daghofer / hk_2bands_hyb_fcc3d structural checks
    vs the reference formulas."""
    from dmft_ed_tpu.models.kspace import (hk_square_2nn, hk_daghofer,
                                           hk_2bands_hyb_fcc3d)
    h = hk_square_2nn(16, ts=0.25, tsp=0.1)
    # index 0 is k = (-pi, -pi): eps = +4 ts - 4 tsp
    assert abs(h[0, 0, 0] - (1.0 - 0.4)) < 1e-12
    d = hk_daghofer(12, alpha=1.0)
    np.testing.assert_allclose(d, d.conj().transpose(1, 0, 2), atol=1e-14)
    assert d.shape == (3, 3, 144)
    # Gamma point: off-diagonals vanish (all sin factors zero)
    ks = np.linspace(-np.pi, np.pi, 12, endpoint=False)
    ig = np.argmin([abs(kx) + abs(ky) for kx in ks for ky in ks])
    np.testing.assert_allclose(d[0, 1, ig], 0.0, atol=1e-14)
    np.testing.assert_allclose(d[0, 2, ig], 0.0, atol=1e-14)
    f = hk_2bands_hyb_fcc3d(6, e0=1.0, mh=0.3, lam=0.5)
    np.testing.assert_allclose(f, f.conj().transpose(1, 0, 2), atol=1e-14)
    # hybridization vanishes on the kx=ky line
    ik = 0  # kx=ky=kz=-pi
    np.testing.assert_allclose(f[0, 1, ik], 0.0, atol=1e-14)


@pytest.mark.slow
def test_nano_adiabatic_gate_sweep_and_enforce():
    """Adiabatic gate drive (ed_nano_adiabatic.f90): the site density
    follows the instantaneous gate potential monotonically, each step
    warm-started. enforce_map (ed_nano_enforce_ineq_symm.f90) pins
    Sigma of site 1 to site 0, making the Weiss fields identical."""
    from dmft_ed_tpu.models import nano
    cfg = EDConfig(norb=1, nbath=2, nspin=1, uloc=(1.5,), beta=20.0,
                   lmats=96, lreal=32, nloop=3, dmft_error=1e-15,
                   ed_verbose=0).validate()

    def hij_of_t(t):
        h = np.array([[0.0, -1.0], [-1.0, 0.0]])
        return h + np.diag([t, 0.0])       # gate ramp on site 0

    with scratch_dir():
        rs = nano.run_adiabatic(cfg, hij_of_t, [0.0, 0.5, 1.0],
                                lat2ineq=[0, 1])
    n0 = [r.dens[0] for r in rs]
    assert n0[0] > n0[1] > n0[2]           # gate empties the driven site
    np.testing.assert_allclose(rs[0].dens[0], rs[0].dens[1], atol=1e-3)
    # enforce_map: pin Sigma_1 := Sigma_0 on an asymmetric dimer
    with scratch_dir():
        r = nano.run(cfg, hij_of_t(0.4), lat2ineq=[0, 1],
                     enforce_map=[((0, 0, 0), (1, 0, 0))])
    np.testing.assert_allclose(r.smats_ineq[0, 0, 0, 0, 0],
                               r.smats_ineq[1, 0, 0, 0, 0], atol=1e-12)
