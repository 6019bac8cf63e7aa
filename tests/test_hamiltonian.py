"""Block-Kronecker sector Hamiltonians vs the brute-force full-Fock oracle.

Integration-level check of SURVEY.md §4: for tiny systems the factorized
assembly must reproduce the reference term semantics *exactly* (same matrix
up to basis permutation — we compare spectra and, for normal mode where the
orderings coincide, matrices)."""

import numpy as np
import pytest

from dmft_ed_tpu import fock
from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.sectors import sector_table
from dmft_ed_tpu.bath import init_bath, Bath
from dmft_ed_tpu.hamiltonian import (
    build_sector_hamiltonian, assemble_dense, single_particle_parts,
    make_matvec, flatten_blocks, unflatten_blocks)

import reference_ed as ref


def _rand_bath(cfg, seed=1):
    rng = np.random.default_rng(seed)
    b = Bath(cfg)
    b.e[:] = rng.normal(size=b.e.shape)
    b.v[:] = rng.normal(size=b.v.shape)
    if b.d is not None:
        b.d[:] = rng.uniform(0.1, 0.5, size=b.d.shape)
    if b.u is not None:
        b.u[:] = rng.normal(size=b.u.shape) * 0.3
    if cfg.bath_type == "replica":
        h = rng.normal(size=b.h.shape) + 0j
        b.h[:] = (h + np.conj(h.transpose(1, 0, 3, 2, 4))) / 2
        b.vr[:] = rng.normal(size=cfg.nbath)
    return b


def _hloc(cfg, seed=2, complex_offdiag=False):
    rng = np.random.default_rng(seed)
    h = rng.normal(size=(cfg.nspin, cfg.nspin, cfg.norb, cfg.norb))
    if complex_offdiag:
        h = h + 1j * rng.normal(size=h.shape)
    # hermitize in (spin, orb) combined space
    nso = cfg.nspin * cfg.norb
    hso = h.transpose(0, 2, 1, 3).reshape(nso, nso)
    hso = (hso + hso.conj().T) / 2
    h = hso.reshape(cfg.nspin, cfg.norb, cfg.nspin, cfg.norb).transpose(0, 2, 1, 3)
    if not complex_offdiag:
        h = h.real
    return h


def _compare_sector(cfg, bath, hloc, sector, states):
    ham = build_sector_hamiltonian(cfg, sector, bath, hloc)
    H1 = assemble_dense(ham)
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    H2 = ref.build_full_H(cfg.ns, cfg.norb, Tuu, Tdd, Tud, P,
                          np.asarray(cfg.uloc_arr[:cfg.norb]), cfg.ust, cfg.jh,
                          cfg.jx, cfg.jp, cfg.hfmode, states)
    assert H1.shape == H2.shape
    # hermiticity of both
    np.testing.assert_allclose(H1, np.conj(H1.T), atol=1e-12)
    np.testing.assert_allclose(H2, np.conj(H2.T), atol=1e-12)
    # spectra must match exactly (basis ordering may differ)
    e1 = np.linalg.eigvalsh(H1)
    e2 = np.linalg.eigvalsh(H2)
    np.testing.assert_allclose(e1, e2, atol=1e-10)
    return ham, H1


def test_normal_mode_matrix_identity():
    """normal mode: our block ordering == reference ordering -> same matrix."""
    cfg = EDConfig(norb=1, nbath=2, nspin=1, uloc=(1.7,), xmu=0.3,
                   hfmode=True).validate()
    bath = _rand_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    table = sector_table(cfg)
    for nup in range(cfg.ns + 1):
        for ndw in range(cfg.ns + 1):
            sec = table.get(nup, ndw)
            states = ref.sector_states_normal(cfg.ns, nup, ndw)
            ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
            H1 = assemble_dense(ham)
            Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
            H2 = ref.build_full_H(cfg.ns, cfg.norb, Tuu, Tdd, Tud, P,
                                  np.asarray(cfg.uloc_arr), cfg.ust, cfg.jh,
                                  cfg.jx, cfg.jp, cfg.hfmode, states)
            np.testing.assert_allclose(H1, H2, atol=1e-12,
                                       err_msg=f"sector ({nup},{ndw})")


def test_normal_multiorb_with_exchange():
    cfg = EDConfig(norb=2, nbath=1, nspin=1, uloc=(2.0, 1.5), ust=0.8, jh=0.2,
                   jx=0.15, jp=0.1, xmu=0.25, hfmode=True).validate()
    bath = _rand_bath(cfg)
    hloc = _hloc(cfg)
    table = sector_table(cfg)
    ns = cfg.ns
    for nup, ndw in [(1, 1), (2, 1), (2, 2), (1, 3), (ns, 0)]:
        sec = table.get(nup, ndw)
        states = ref.sector_states_normal(ns, nup, ndw)
        _compare_sector(cfg, bath, hloc, sec, states)


def test_normal_hybrid_bath():
    cfg = EDConfig(norb=2, nbath=2, nspin=1, uloc=(1.0, 1.0), ust=0.5,
                   bath_type="hybrid", hfmode=False).validate()
    bath = _rand_bath(cfg)
    hloc = _hloc(cfg)
    table = sector_table(cfg)
    for nup, ndw in [(2, 2), (1, 2)]:
        sec = table.get(nup, ndw)
        states = ref.sector_states_normal(cfg.ns, nup, ndw)
        _compare_sector(cfg, bath, hloc, sec, states)


def test_superc_sectors():
    cfg = EDConfig(norb=1, nbath=2, nspin=1, uloc=(-1.5,), ed_mode="superc",
                   deltasc=0.3, xmu=0.2).validate()
    bath = _rand_bath(cfg)
    hloc = np.zeros((1, 1, 1, 1))
    table = sector_table(cfg)
    for sz in range(-cfg.ns, cfg.ns + 1):
        sec = table.get(sz)
        states = ref.sector_states_superc(cfg.ns, sz)
        _compare_sector(cfg, bath, hloc, sec, states)


def test_nonsu2_sectors():
    cfg = EDConfig(norb=2, nbath=1, nspin=2, uloc=(1.2, 1.2), ust=0.4,
                   ed_mode="nonsu2").validate()
    bath = _rand_bath(cfg)
    hloc = _hloc(cfg, complex_offdiag=True)
    table = sector_table(cfg)
    for n in range(0, 2 * cfg.ns + 1):
        sec = table.get(n)
        states = ref.sector_states_nonsu2(cfg.ns, n)
        _compare_sector(cfg, bath, hloc, sec, states)


def test_replica_bath_nonsu2():
    cfg = EDConfig(norb=2, nbath=1, nspin=2, uloc=(1.0, 1.0),
                   ed_mode="nonsu2", bath_type="replica").validate()
    bath = _rand_bath(cfg)
    hloc = _hloc(cfg, complex_offdiag=True)
    table = sector_table(cfg)
    for n in [2, cfg.ns, cfg.ns + 1]:
        sec = table.get(n)
        states = ref.sector_states_nonsu2(cfg.ns, n)
        _compare_sector(cfg, bath, hloc, sec, states)


def test_matvec_matches_dense():
    """The jitted block matvec equals dense H @ v for all modes."""
    import jax
    for cfg in [
        EDConfig(norb=1, nbath=3, nspin=1, uloc=(2.0,)),
        EDConfig(norb=2, nbath=1, nspin=1, uloc=(2.0, 1.0), ust=0.6, jh=0.1,
                 jx=0.1, jp=0.1),
        EDConfig(norb=1, nbath=3, nspin=1, uloc=(-1.0,), ed_mode="superc",
                 deltasc=0.2),
        EDConfig(norb=1, nbath=3, nspin=2, uloc=(1.0,), ed_mode="nonsu2"),
    ]:
        cfg = cfg.validate()
        bath = _rand_bath(cfg)
        hloc = _hloc(cfg) if cfg.ed_mode != "nonsu2" else _hloc(cfg, True)
        table = sector_table(cfg)
        sec = table.sectors[len(table.sectors) // 2]
        ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
        H = assemble_dense(ham)
        matvec, template = make_matvec(ham, cfg)
        rng = np.random.default_rng(5)
        x = rng.normal(size=sec.dim)
        if np.iscomplexobj(H):
            x = x + 1j * rng.normal(size=sec.dim)
        V = unflatten_blocks(np.asarray(x), sec)
        y1 = np.asarray(flatten_blocks(jax.jit(matvec)(tuple(map(np.asarray, V)))))
        y2 = H @ x
        np.testing.assert_allclose(y1, y2, atol=1e-10, err_msg=cfg.ed_mode)

        # sparse path must agree with dense path
        cfg2 = cfg.replace(dense_matmul_threshold=0)
        matvec2, _ = make_matvec(ham, cfg2)
        y3 = np.asarray(flatten_blocks(jax.jit(matvec2)(tuple(map(np.asarray, V)))))
        np.testing.assert_allclose(y3, y2, atol=1e-10)


def test_matvec_op_spec_dtype_string():
    """spec[-1] must be the dtype NAME ('complex128'), not the repr of the
    scalar class — diag/_run_sharded key the v0 dtype off
    spec[-1].startswith('complex'); a wrong string silently made complex
    Lanczos sectors start from a real v0 (scan dtype crash)."""
    from dmft_ed_tpu.config import EDConfig
    from dmft_ed_tpu.bath import Bath
    from dmft_ed_tpu.sectors import sector_table
    from dmft_ed_tpu.hamiltonian import (build_sector_hamiltonian,
                                         make_matvec_op)
    import numpy as np
    hloc = np.zeros((2, 2, 1, 1))
    hloc[0, 1, 0, 0] = hloc[1, 0, 0, 0] = 0.2
    cfg = EDConfig(norb=1, nbath=2, nspin=2, ed_mode="nonsu2").validate()
    b = Bath(cfg)
    sec = sector_table(cfg).get(3)
    spec, _, _ = make_matvec_op(build_sector_hamiltonian(cfg, sec, b, hloc),
                                cfg)
    assert spec[-1] == "complex128"
    cfgn = EDConfig(norb=1, nbath=2, nspin=1).validate()
    secn = sector_table(cfgn).get(1, 1)
    spec, _, _ = make_matvec_op(
        build_sector_hamiltonian(cfgn, secn, Bath(cfgn),
                                 np.zeros((1, 1, 1, 1))), cfgn)
    assert spec[-1] == "float64"
