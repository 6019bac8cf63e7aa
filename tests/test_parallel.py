"""Distributed (sharded) paths vs single-device results on the 8-device CPU
mesh — the analogue of the reference's serial-vs-MPI driver pairs
(SURVEY.md §4 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.sectors import sector_table
from dmft_ed_tpu.hamiltonian import build_sector_hamiltonian, make_matvec
from dmft_ed_tpu.parallel import make_mesh, make_sharded_matvec
from dmft_ed_tpu.parallel.hxv import sharded_lanczos_tridiag
from dmft_ed_tpu.lanczos import lanczos_tridiag, tridiag_eigh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _problem():
    cfg = EDConfig(norb=1, nbath=9, nspin=1, uloc=(2.0,),
                   dense_matmul_threshold=8192).validate()
    rng = np.random.default_rng(71)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, cfg.nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(3, 3)  # dim 120x120, 120 % 8 == 0
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
    return cfg, sec, ham


def test_sharded_matvec_matches_single_device():
    cfg, sec, ham = _problem()
    blk = sec.blocks[0]
    mesh = make_mesh(n_rows=8, n_sites=1)
    mv_sh, shd, dt, pad = make_sharded_matvec(ham, cfg, mesh)
    mv_1, _ = make_matvec(ham, cfg)
    rng = np.random.default_rng(72)
    v = jnp.asarray(rng.normal(size=(blk.ddw, blk.dup)), dtype=dt)
    y1 = np.asarray(mv_1((v,))[0])
    v_sh = jax.device_put(v, shd)
    y8 = np.asarray(jax.jit(mv_sh)(v_sh))
    np.testing.assert_allclose(y8, y1, atol=1e-12)


def test_sharded_lanczos_tridiag_matches():
    """Tridiagonal coefficients from the sharded recurrence must match the
    single-device scan to near machine precision (deterministic
    collectives)."""
    cfg, sec, ham = _problem()
    blk = sec.blocks[0]
    mesh = make_mesh(n_rows=8, n_sites=1)
    mv_sh, shd, dt, pad = make_sharded_matvec(ham, cfg, mesh)
    mv_1, _ = make_matvec(ham, cfg)

    def mv_flat(x):
        return mv_1((x.reshape(blk.ddw, blk.dup),))[0].reshape(-1)

    rng = np.random.default_rng(73)
    v = rng.normal(size=(blk.ddw, blk.dup))
    v = v / np.linalg.norm(v)
    niter = 30
    al1, be1, ns1 = lanczos_tridiag(mv_flat, jnp.asarray(v.reshape(-1)),
                                    niter)
    v_sh = jax.device_put(jnp.asarray(v), shd)
    al8, be8 = sharded_lanczos_tridiag(mv_sh, v_sh, niter)
    al8, be8 = np.asarray(al8), np.asarray(be8)
    np.testing.assert_allclose(np.asarray(al1)[:niter], al8[:niter],
                               atol=1e-9)
    # spectra of the two tridiagonals agree
    e1, _ = tridiag_eigh(np.asarray(al1), np.asarray(be1))
    be8_shift = np.concatenate([[1.0], be8[:-1]])
    e8, _ = tridiag_eigh(al8, be8_shift)
    np.testing.assert_allclose(e1[0], e8[0], atol=1e-9)


def test_site_batched_mesh():
    """(sites, rows) = (2, 4): batched vmap over sites + row sharding."""
    cfg, sec, ham = _problem()
    blk = sec.blocks[0]
    mesh = make_mesh(n_rows=4, n_sites=2)
    mv_sh, shd, dt, pad = make_sharded_matvec(ham, cfg, mesh, batched=True)
    mv_1, _ = make_matvec(ham, cfg)
    rng = np.random.default_rng(74)
    v = jnp.asarray(rng.normal(size=(2, blk.ddw, blk.dup)), dtype=dt)
    y_ref = np.stack([np.asarray(mv_1((v[i],))[0]) for i in range(2)])
    v_sh = jax.device_put(v, shd)
    y_sh = np.asarray(jax.jit(mv_sh)(v_sh))
    np.testing.assert_allclose(y_sh, y_ref, atol=1e-12)


def test_sharded_matvec_padded_rows():
    """Sector row dims not divisible by the mesh are zero-padded."""
    cfg = EDConfig(norb=1, nbath=7, nspin=1, uloc=(2.0,),
                   dense_matmul_threshold=8192).validate()
    rng = np.random.default_rng(75)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, cfg.nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(4, 4)   # dim 70x70, 70 % 8 != 0
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
    blk = sec.blocks[0]
    mesh = make_mesh(n_rows=8, n_sites=1)
    mv_sh, shd, dt, pad = make_sharded_matvec(ham, cfg, mesh)
    assert pad == 2
    mv_1, _ = make_matvec(ham, cfg)
    v = jnp.asarray(rng.normal(size=(blk.ddw, blk.dup)), dtype=dt)
    y1 = np.asarray(mv_1((v,))[0])
    vp = jnp.pad(v, ((0, pad), (0, 0)))
    vp = jax.device_put(vp, shd)
    y8 = np.asarray(jax.jit(mv_sh)(vp))
    np.testing.assert_allclose(y8[:blk.ddw], y1, atol=1e-12)
    np.testing.assert_allclose(y8[blk.ddw:], 0.0, atol=1e-15)


# ----------------------------------------------------------------------
# production distributed solve: full ed_solve on the mesh == single device
# (VERDICT round-1 item 1; the analogue of ED_MAIN.f90:284-327 under MPI)
# ----------------------------------------------------------------------

def _solve_pair(cfg, hloc=None, seed_bath=True):
    """Run EDSolver with and without the 8-device mesh; sharding engages on
    every Lanczos-solved sector (shard_dim_threshold below the sector
    dims)."""
    from dmft_ed_tpu.solver import EDSolver
    from dmft_ed_tpu.bath import Bath, pack_bath
    rng = np.random.default_rng(17)
    results = []
    for mesh in (None, make_mesh(n_rows=8, n_sites=1)):
        s = EDSolver(cfg, hloc, log=lambda m: None, mesh=mesh)
        b = Bath(cfg)
        if seed_bath:
            b.e[:] = np.linspace(-1.2, 1.2, cfg.nbath)[None, None, :]
            b.v[:] = np.linspace(0.3, 0.6, cfg.nbath)[None, None, :]
            if b.d is not None:
                b.d[:] = 0.15
            if b.u is not None:
                b.u[:] = 0.1
        results.append(s.solve(pack_bath(b)))
    return results


def _assert_equiv(r1, r8, atol=1e-8):
    assert abs(r1.egs - r8.egs) < 1e-10
    np.testing.assert_allclose(r8.gmats, r1.gmats, atol=atol)
    np.testing.assert_allclose(r8.smats, r1.smats, atol=1e-6)
    np.testing.assert_allclose(r8.observables.dens, r1.observables.dens,
                               atol=1e-9)
    np.testing.assert_allclose(r8.observables.docc, r1.observables.docc,
                               atol=1e-9)
    if r1.fmats is not None:
        np.testing.assert_allclose(r8.fmats, r1.fmats, atol=atol)


def test_ed_solve_sharded_normal(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(2.0,), beta=50.0,
                   lmats=30, lreal=20, ed_verbose=0,
                   lanc_dim_threshold=24, shard_dim_threshold=25,
                   lanc_nstates_sector=2).validate()
    r1, r8 = _solve_pair(cfg)
    _assert_equiv(r1, r8)


def test_ed_solve_sharded_superc(tmp_path, monkeypatch):
    """Multi-block (Sz) sectors row-shard per block — the modes that most
    need memory scaling (round-1 weak item 3)."""
    monkeypatch.chdir(tmp_path)
    cfg = EDConfig(norb=1, nbath=4, nspin=1, uloc=(-2.0,), ed_mode="superc",
                   deltasc=0.1, beta=50.0, lmats=30, lreal=20, ed_verbose=0,
                   lanc_dim_threshold=60, shard_dim_threshold=61,
                   lanc_nstates_sector=2).validate()
    r1, r8 = _solve_pair(cfg)
    _assert_equiv(r1, r8)


def test_ed_solve_sharded_nonsu2(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    hloc = np.zeros((2, 2, 1, 1))
    hloc[0, 1, 0, 0] = hloc[1, 0, 0, 0] = 0.2   # spin-mixing
    cfg = EDConfig(norb=1, nbath=3, nspin=2, uloc=(1.5,), ed_mode="nonsu2",
                   beta=50.0, lmats=30, lreal=20, ed_verbose=0,
                   lanc_dim_threshold=32, shard_dim_threshold=33,
                   lanc_nstates_sector=2).validate()
    r1, r8 = _solve_pair(cfg, hloc)
    _assert_equiv(r1, r8)


def test_sharded_multiblock_matvec():
    """Row-sharded padded multi-block (superc) operator == unsharded."""
    from dmft_ed_tpu.parallel.hxv import (sharded_sector_op,
                                          pad_flat_to_blocks,
                                          unpad_blocks_to_flat)
    from dmft_ed_tpu.hamiltonian import (make_matvec, unflatten_blocks,
                                         flatten_blocks)
    cfg = EDConfig(norb=1, nbath=5, nspin=1, uloc=(-2.0,), ed_mode="superc",
                   deltasc=0.1, dense_matmul_threshold=8192).validate()
    rng = np.random.default_rng(91)
    bath = Bath(cfg)
    bath.e[:] = np.linspace(-1, 1, cfg.nbath)[None, None, :]
    bath.v[:] = rng.uniform(0.3, 0.7, size=bath.v.shape)
    bath.d[:] = 0.2
    hloc = np.zeros((1, 1, 1, 1))
    sec = sector_table(cfg).get(0)            # Sz = 0, 7 blocks
    assert len(sec.blocks) > 1
    ham = build_sector_hamiltonian(cfg, sec, bath, hloc)
    mesh = make_mesh(n_rows=8, n_sites=1)
    spec, arrays, blocks, sec_p, shd, shd_b = sharded_sector_op(
        ham, cfg, mesh)
    x = rng.normal(size=sec.dim)
    mv1, _ = make_matvec(ham, cfg)
    y1 = np.asarray(flatten_blocks(mv1(unflatten_blocks(jnp.asarray(x),
                                                        sec))))
    from dmft_ed_tpu.hamiltonian import apply_op
    Vp = tuple(jax.device_put(jnp.asarray(v), shd)
               for v in pad_flat_to_blocks(x, sec, sec_p))
    y8 = unpad_blocks_to_flat(
        jax.jit(lambda V: apply_op(spec, arrays, V))(Vp), sec)
    np.testing.assert_allclose(y8, y1, atol=1e-12)
