"""dmft_ed_tpu — TPU-native Lanczos exact-diagonalization DMFT impurity solver.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
Fortran+MPI `dmft-ed` code (Lanczos-ED Anderson impurity solver for DMFT):
sector-resolved exact diagonalization, Krylov Green's functions, bath chi^2
fitting and the DMFT self-consistency layer — redesigned TPU-first.

Core design differences from the reference (see SURVEY.md §7):

* Sector Hamiltonians use a **block-Kronecker factorization**: every sector
  basis (for all three ed_modes) is organized as blocks of (n_up, n_dw)
  tensor-product spaces, so H·v becomes batched dense/sparse matmuls
  ``D∘V + H_dw·V + V·H_upᵀ + Σ_k B_k·V·A_kᵀ`` that map straight onto the MXU,
  instead of the reference's scattered CSR SpMV
  (ED_HAMILTONIAN_STORED_HxV.f90).
* State ranking is closed-form combinadic (colex) ranking — the per-element
  ``binary_search`` hot spot of the reference (ED_SETUP.f90:1307) vanishes.
* Krylov solvers (plain + thick-restart Lanczos) are pure JAX ``lax.scan``
  loops replacing P-ARPACK; distribution uses ``jax.sharding`` meshes with
  XLA collectives replacing MPI.
"""

import jax

# The physics requires float64: Lanczos orthogonality and pole extraction
# degrade quickly in f32. TPU f64 is emulated but the hot matmuls can run in
# f32 with f64 accumulation where profiling justifies it.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the axon tunnel re-pays minutes of
# compiles per process without it (see compile_cache.py; disable with
# DMFT_ED_COMPILE_CACHE=0).
from . import compile_cache as _compile_cache  # noqa: E402

_compile_cache.enable()

from .version import __version__  # noqa: E402
from .config import EDConfig, read_input  # noqa: E402
from .bath import Bath, get_bath_dimension  # noqa: E402
from .solver import EDSolver  # noqa: E402

__all__ = [
    "__version__",
    "EDConfig",
    "read_input",
    "Bath",
    "get_bath_dimension",
    "EDSolver",
]
