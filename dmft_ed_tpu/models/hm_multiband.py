"""Degenerate multiband Hubbard models on square / cubic Bloch grids.

Named drivers over the generic k-space loop (kspace.run_kspace):
- 2b_square: two degenerate square-lattice bands
  (drivers/ed_hm_2b_square.f90:128-147, k-sum Gloc + matrix Weiss).
- 3b_square: three square-lattice bands, the third (dxy) raised by
  0.5*ts (drivers/ed_hm_3b_square.f90:133-152).
- 2b_cubic: two degenerate simple-cubic bands
  (drivers/ed_hm_2b_cubic.f90 — same loop in 3d).

Run: ``python -m dmft_ed_tpu.models.hm_multiband [input] MODEL=3b_square
NK=16 TS=0.5``.
"""

from __future__ import annotations

import sys

from ..config import EDConfig, read_input
from .kspace import (run_kspace, KspaceResult,  # noqa: F401
                     hk_multiband_square, hk_multiband_cubic)

_MODELS = {"2b_square": (hk_multiband_square, 2, None),
           "3b_square": (hk_multiband_square, 3, "dxy"),
           "2b_cubic": (hk_multiband_cubic, 2, None)}


def run(cfg: EDConfig | None = None, model: str = "2b_square",
        nk: int = 20, ts: float = 0.5, wmixing: float = 0.5,
        log=None) -> KspaceResult:
    if cfg is None:
        cfg = EDConfig()
    cfg = cfg.validate()
    builder, norb, flavor = _MODELS[model]
    if cfg.norb != norb:
        raise ValueError(f"{model} needs Norb={norb} "
                         "(reference driver guard)")
    shifts = None
    if flavor == "dxy":
        shifts = [0.0, 0.0, 0.5 * ts]      # ed_hm_3b_square.f90:146-150
    hk = builder(nk=nk, ts=ts, norb=norb, shifts=shifts)
    return run_kspace(cfg, hk, wmixing=wmixing, log=log)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv and "=" not in argv[0] else "inputED.in"
    cfg = read_input(path, argv)
    kw = dict(model="2b_square", nk=20, ts=0.5, wmixing=0.5)
    for tok in argv:
        if "=" not in tok:
            continue
        k, v = tok.split("=", 1)
        k = k.upper()
        if k == "MODEL":
            kw["model"] = v.lower()
        elif k == "NK":
            kw["nk"] = int(v)
        elif k == "TS":
            kw["ts"] = float(v)
        elif k == "WMIXING":
            kw["wmixing"] = float(v)
    r = run(cfg, **kw)
    print(f"converged={r.converged} iterations={r.iterations} "
          f"dens={r.dens} docc={r.docc}")
    return r


if __name__ == "__main__":
    main()
