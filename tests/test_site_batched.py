"""Site-batched sweep equals the per-site sweep (lattice DP axis)."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath, unpack_bath, pack_bath
from dmft_ed_tpu.diag import diagonalize, diagonalize_sites


def test_diagonalize_sites_matches_loop():
    cfg = EDConfig(norb=1, nbath=3, nspin=1, uloc=(2.0,), beta=50.0,
                   lanc_dim_threshold=4096).validate()
    rng = np.random.default_rng(120)
    nsites = 3
    baths, hlocs = [], []
    for i in range(nsites):
        b = Bath(cfg)
        b.e[:] = np.sort(rng.normal(size=b.e.shape), axis=-1)
        b.v[:] = rng.uniform(0.3, 0.8, size=b.v.shape)
        baths.append(b)
        h = np.zeros((1, 1, 1, 1))
        h[0, 0, 0, 0] = rng.normal() * 0.3
        hlocs.append(h)
    sl_b, z_b, _ = diagonalize_sites(cfg, baths, hlocs)
    for i in range(nsites):
        sl, z, _ = diagonalize(cfg, baths[i], hlocs[i], None)
        assert abs(sl_b[i].emin - sl.emin) < 1e-10, i
        assert abs(z_b[i] - z) < 1e-10
        assert len(sl_b[i]) == len(sl)
