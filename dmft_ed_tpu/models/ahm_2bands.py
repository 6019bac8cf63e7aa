"""Two-band attractive Hubbard on Bethe lattices of bandwidth ratio alpha
(drivers/ed_ahm_2bands_bethe.f90; the square-lattice variant
ed_ahm_square_2bands.f90 shares the loop with a k-sum Gloc — use
models.ahm_square with norb=2 for that).

W_1 = 1, W_2 = alpha (ed_ahm_2bands_bethe.f90:60-67); the superc DMFT
loop (Nambu Gloc over the two DOS, joint (G, F) bath fit, optional
ph/normal bath symmetrization) is the shared attractive-U machinery of
models.ahm_bethe, which already supports per-orbital bandwidths.
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import EDConfig, read_input
from . import ahm_bethe


def run(cfg: EDConfig | None = None, alpha: float = 1.0, le: int = 500,
        wmixing: float = 1.0, phsym: bool = False, normal_bath: bool = False,
        log=None):
    if cfg is None:
        cfg = EDConfig(norb=2, ed_mode="superc", uloc=(-2.0, -2.0))
    cfg = cfg.validate()
    assert cfg.norb == 2 and cfg.nspin == 1, \
        "ed_ahm_2bands requires Norb=2, Nspin=1 (ed_ahm_2bands_bethe.f90:44)"
    return ahm_bethe.run(cfg, le=le, wbethe=np.array([1.0, alpha]),
                         wmixing=wmixing, phsym=phsym,
                         normal_bath=normal_bath, log=log)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv and "=" not in argv[0] else "inputED.in"
    cfg = read_input(path, argv, ed_mode="superc")
    extras = {}
    for tok in argv:
        if "=" not in tok:
            continue
        k, _, v = tok.partition("=")
        k = k.strip().upper()
        if k == "ALPHA":
            extras["alpha"] = float(v)
        elif k == "LE":
            extras["le"] = int(v)
        elif k == "WMIXING":
            extras["wmixing"] = float(v)
        elif k == "PHSYM":
            extras["phsym"] = v.lower() in ("t", "true", "1", ".true.")
        elif k == "NORMAL":
            extras["normal_bath"] = v.lower() in ("t", "true", "1", ".true.")
    r = run(cfg, **extras)
    print(f"converged={r.converged} iters={r.iterations} dens={r.dens} "
          f"docc={r.docc} phi={r.phisc}")
    return r


if __name__ == "__main__":
    main()
