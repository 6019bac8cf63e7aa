"""Device-mesh helpers.

The distribution design (SURVEY.md §2c / §5): one mesh with axes
``(sites, rows)`` —
  * ``rows``  : partition of each sector vector's down-spin (row) index, the
    analogue of the reference's 1-D MPI row split (ED_HAMILTONIAN.f90:56-62).
    Collectives ride ICI; the reference's AllGatherv-the-whole-vector SpMV
    (ED_HAMILTONIAN_STORED_HxV.f90:163-196) becomes XLA-placed psum /
    reduce-scatter inside the factorized matmuls.
  * ``sites`` : embarrassingly-parallel batching over inequivalent impurity
    sites / independent sectors (the reference's round-robin lattice loop,
    ED_MAIN.f90:576-678).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_rows: Optional[int] = None, n_sites: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_rows is None:
        n_rows = len(devices) // n_sites
    assert n_sites * n_rows <= len(devices), \
        f"need {n_sites * n_rows} devices, have {len(devices)}"
    devs = np.asarray(devices[:n_sites * n_rows]).reshape(n_sites, n_rows)
    return Mesh(devs, axis_names=("sites", "rows"))


def row_sharding(mesh: Mesh, batched: bool = False) -> NamedSharding:
    """Sharding for a block matrix V[ddw, dup] (rows split) or a site-batched
    V[nsites, ddw, dup]."""
    if batched:
        return NamedSharding(mesh, P("sites", "rows", None))
    return NamedSharding(mesh, P("rows", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
