"""Immutable solver configuration.

Replaces the reference's module-global input system (ED_INPUT_VARS.f90:13-93,
parsed at :121-216) with a frozen dataclass threaded explicitly through the
solver. The same ``KEY=value`` input-file format is read for parity, CLI
overrides (``KEY=value`` argv tokens) are honored, and the resolved config is
echoed back to ``used.<file>`` like SciFortran's ``save_input_file``.
"""

from __future__ import annotations

import dataclasses
import sys
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class EDConfig:
    """All solver inputs. Field names/defaults mirror ED_INPUT_VARS.f90:121-199."""

    # system size / interaction
    norb: int = 1                 # number of impurity orbitals (<=5 here; ref limits 3)
    nbath: int = 6                # bath levels (per orbital for bath_type=normal)
    nspin: int = 1                # spin components of bath/Hloc arrays (max 2)
    uloc: Tuple[float, ...] = (2.0, 0.0, 0.0, 0.0, 0.0)  # intra-orbital U per orbital
    ust: float = 0.0              # inter-orbital opposite-spin U'
    jh: float = 0.0               # Hund's coupling
    jx: float = 0.0               # spin-exchange coupling
    jp: float = 0.0               # pair-hopping coupling
    beta: float = 1000.0          # inverse temperature (IR cutoff at T=0)
    xmu: float = 0.0              # chemical potential
    deltasc: float = 0.02         # SC symmetry-breaking seed (superc)
    nloop: int = 100              # max DMFT iterations
    dmft_error: float = 1e-5      # DMFT convergence threshold
    sb_field: float = 0.1         # symmetry-breaking field for magnetic runs

    # sector scan controls
    ed_twin: bool = False
    ed_sectors: bool = False
    ed_sectors_shift: int = 1
    ed_sparse_h: bool = True      # stored operator (True) vs on-the-fly apply
    ed_solve_offdiag_gf: bool = False
    ed_print_sigma: bool = True
    ed_print_g: bool = True
    ed_print_g0: bool = True

    # frequency grids
    nsuccess: int = 1
    lmats: int = 5000
    lreal: int = 5000
    ltau: int = 1000
    lfit: int = 1000
    nread: float = 0.0            # target density (0 = fixed mu)
    nerr: float = 1e-4
    ndelta: float = 0.1
    ncoeff: float = 1.0
    wini: float = -5.0
    wfin: float = 5.0
    chispin_flag: bool = False
    chidens_flag: bool = False
    chipair_flag: bool = False
    # chi_exct does not exist in this reference version (ED_INPUT_VARS.f90
    # has only spin/dens/pair flags); the field is kept so inputs written
    # for later upstream versions parse, but setting it True errors loudly
    # in validate() instead of silently no-oping.
    chiexct_flag: bool = False
    hfmode: bool = True           # Hartree form U(n-1/2)(n-1/2)
    eps: float = 0.01             # real-axis broadening
    cutoff: float = 1e-9          # Boltzmann cutoff for state retention
    gs_threshold: float = 1e-9    # ground-state degeneracy threshold
    hwband: float = 2.0           # half-bandwidth for bath init

    # Lanczos / spectrum
    lanc_method: str = "arpack"   # "arpack" (thick-restart) | "lanczos" (plain, T=0)
    lanc_nstates_sector: int = 6
    lanc_nstates_total: int = 1
    lanc_nstates_step: int = 2
    lanc_ncv_factor: int = 3
    lanc_ncv_add: int = 5
    lanc_niter: int = 512
    lanc_ngfiter: int = 200
    lanc_tolerance: float = 1e-12
    lanc_dim_threshold: int = 256

    # chi^2 fit
    cg_niter: int = 500
    cg_scheme: str = "weiss"      # "delta" | "weiss"
    cg_ftol: float = 1e-5
    cg_method: int = 0
    cg_stop: int = 0
    cg_eps: float = 1e-6
    cg_weight: int = 0            # 0: 1, 1: 1/n, 2: 1/w

    # mode selection
    ed_mode: str = "normal"       # normal | superc | nonsu2
    ed_para: bool = False
    ed_vsf_ratio: float = 0.1
    ed_bath_noise_thr: float = 0.0
    bath_type: str = "normal"     # normal | hybrid | replica
    hfile: str = "hamiltonian"
    hlocfile: str = "inputHLOC.in"
    logfile: int = 6
    jz_basis: bool = False
    jz_max: bool = False
    jz_max_value: float = 1000.0
    ed_verbose: int = 3

    # TPU-specific knobs (no reference analogue)
    dense_matmul_threshold: int = 4096  # per-spin dim below which H_sigma is dense
    dtype: str = "float64"        # working real dtype for Krylov vectors
    matmul_precision: str = "native"  # "native" | "ozakiN" | "ozakiNxB":
    #   ozakiN runs the dense H·v matmuls as N-slice int8 digit products with
    #   exact int32 accumulation (ozaki.py) — near-f64 accuracy at a fraction
    #   of the TPU f64-emulation cost. Real-valued operators only.
    #   "ozakiNxB" uses B-bit digits (B ≤ 7): "ozaki5x7" matches ozaki6's
    #   ~1e-10 accuracy class with 15 instead of 21 digit-pair MACs (1.4x).
    shard_dim_threshold: int = 1 << 17  # sector dim above which Krylov
    #   solves row-shard over the mesh 'rows' axis when a mesh is given
    #   (the production analogue of the reference's MPI row split,
    #   ED_HAMILTONIAN.f90:56-62); below it, single-device is faster.
    seed: int = 0                 # PRNG seed for bath noise

    # ------------------------------------------------------------------
    @property
    def ns(self) -> int:
        """Total levels per spin (ED_SETUP.f90:96-143)."""
        if self.bath_type == "normal":
            return self.norb * (self.nbath + 1)
        elif self.bath_type == "hybrid":
            return self.norb + self.nbath
        elif self.bath_type == "replica":
            return self.norb * (self.nbath + 1)
        raise ValueError(f"unknown bath_type {self.bath_type}")

    @property
    def nlevels(self) -> int:
        return 2 * self.ns

    @property
    def finite_t(self) -> bool:
        """Finite-temperature if more than one state kept (ED_SETUP.f90:262-287)."""
        return self.lanc_nstates_total > 1

    @property
    def uloc_arr(self) -> Tuple[float, ...]:
        return tuple(self.uloc[: self.norb]) + (0.0,) * max(0, self.norb - len(self.uloc))

    def replace(self, **kw) -> "EDConfig":
        return dataclasses.replace(self, **kw)

    def validate(self) -> "EDConfig":
        """Global sanity checks (ED_SETUP.f90:51-81)."""
        if self.nspin > 2:
            raise ValueError("nspin > 2 is not allowed")
        if self.norb > 5:
            raise ValueError("norb > 5 is not supported")
        if self.ed_mode not in ("normal", "superc", "nonsu2"):
            raise ValueError(f"unknown ed_mode {self.ed_mode}")
        if self.bath_type not in ("normal", "hybrid", "replica"):
            raise ValueError(f"unknown bath_type {self.bath_type}")
        if self.ed_mode == "superc" and self.bath_type == "replica":
            raise ValueError("superc + replica bath is not implemented (as in reference)")
        if self.chiexct_flag:
            raise ValueError(
                "chiexct_flag: excitonic susceptibility is not available in "
                "this reference version (no chi_exct in ED_INPUT_VARS.f90) "
                "and is not implemented here")
        return self


# ----------------------------------------------------------------------
# KEY=value input-file parsing (SF_PARSE_INPUT equivalent)
# ----------------------------------------------------------------------

_BOOL_TRUE = {"t", ".true.", "true", "1", "yes"}
_BOOL_FALSE = {"f", ".false.", "false", "0", "no"}

# map from input-file KEY (upper) to dataclass field
_KEYMAP = {f.name.upper(): f.name for f in dataclasses.fields(EDConfig)}
_KEYMAP["IMPHFILE"] = "hlocfile"  # reference alias (ED_INPUT_VARS.f90:193)


def _coerce(field_obj, raw: str):
    raw = raw.strip()
    t = field_obj.type
    name = field_obj.name
    default = field_obj.default
    if isinstance(default, bool) or t == "bool":
        low = raw.lower()
        if low in _BOOL_TRUE:
            return True
        if low in _BOOL_FALSE:
            return False
        raise ValueError(f"cannot parse bool {name}={raw!r}")
    if isinstance(default, int) and not isinstance(default, bool):
        return int(float(raw.replace("d", "e").replace("D", "e")))
    if isinstance(default, float):
        return float(raw.replace("d", "e").replace("D", "e"))
    if isinstance(default, tuple):
        vals = [float(x.replace("d", "e").replace("D", "e"))
                for x in raw.replace(",", " ").split()]
        return tuple(vals)
    return raw


def read_input(path: str | None = None, argv: list[str] | None = None,
               write_used: bool = True, **overrides) -> EDConfig:
    """Parse a reference-format ``KEY=value`` input file into an EDConfig.

    Mirrors ``ed_read_input`` (ED_INPUT_VARS.f90:103-222): file values first,
    then command-line ``KEY=value`` overrides, then keyword overrides; the
    resolved config is written to ``used.<path>``.
    """
    values: dict = {}
    if path is not None:
        try:
            with open(path) as fh:
                for line in fh:
                    line = line.split("!")[0].split("#")[0].strip()
                    if not line or "=" not in line:
                        continue
                    key, _, raw = line.partition("=")
                    key = key.strip().upper()
                    if key in _KEYMAP:
                        fname = _KEYMAP[key]
                        fobj = next(f for f in dataclasses.fields(EDConfig)
                                    if f.name == fname)
                        values[fname] = _coerce(fobj, raw)
        except FileNotFoundError:
            pass  # like the reference: missing file -> all defaults
    if argv is None:
        argv = sys.argv[1:]
    for tok in argv:
        if "=" not in tok:
            continue
        key, _, raw = tok.partition("=")
        key = key.strip().upper()
        if key in _KEYMAP:
            fname = _KEYMAP[key]
            fobj = next(f for f in dataclasses.fields(EDConfig) if f.name == fname)
            values[fname] = _coerce(fobj, raw)
    values.update(overrides)
    cfg = EDConfig(**values).validate()
    if write_used and path is not None:
        try:
            with open("used." + path.split("/")[-1], "w") as fh:
                for f in dataclasses.fields(cfg):
                    v = getattr(cfg, f.name)
                    if isinstance(v, bool):
                        v = "T" if v else "F"
                    elif isinstance(v, tuple):
                        v = ",".join(str(x) for x in v)
                    fh.write(f"{f.name.upper()}={v}\n")
        except OSError:
            pass
    return cfg
