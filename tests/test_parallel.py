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
