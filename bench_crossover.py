#!/usr/bin/env python
"""Hybrid-placement crossover scan (VERDICT r3 item 6 / weak 4).

Measures the large-config Bethe DMFT iteration cost vs Nbath on BOTH
backends — the CPU node and the hybrid host/TPU placement — to locate
the actual crossover where offloading the Krylov work to the MXU starts
winning, validating (or retuning) DMFT_ED_KRYLOV_MIN_DIM=32768
(device.py). Largest-sector dims per Nbath (Ns = Nbath+1, half filled):

    Nbath  8 -> 15,876     Nbath  9 -> 63,504
    Nbath 10 -> 213,444    Nbath 11 -> 853,776

Run ONE mode at a time on an otherwise-quiet machine (2-core box: any
concurrent load contaminates the CPU numbers):

    python bench_crossover.py --cpu  --nbath 8 9 10
    python bench_crossover.py        --nbath 8 9 10   (hybrid cpu+axon)

Appends per-config lines to artifacts/crossover.json.
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--nbath", type=int, nargs="+", default=[8, 9, 10])
p.add_argument("--nloop", type=int, default=2)
args = p.parse_args()

import jax

jax.config.update("jax_platforms", "cpu" if args.cpu else "cpu,axon")
jax.config.update("jax_enable_x64", True)

from dmft_ed_tpu.config import EDConfig  # noqa: E402
from dmft_ed_tpu.models import hm_bethe  # noqa: E402

ART = os.path.join(REPO, "artifacts", "crossover.json")


def main():
    mode = "cpu" if args.cpu else "tpu-hybrid"
    recs = []
    if os.path.exists(ART):
        with open(ART) as fh:
            recs = json.load(fh)
    cwd = os.getcwd()
    for nb in args.nbath:
        cfg = EDConfig(norb=1, nbath=nb, nspin=1, uloc=(2.0,), beta=100.0,
                       lmats=1024, lreal=256, dmft_error=1e-12,
                       nloop=args.nloop, lanc_niter=256, lanc_ngfiter=200,
                       lanc_method="lanczos",
                       matmul_precision="native" if args.cpu else "ozaki5x7",
                       ed_verbose=0).validate()
        marks = []

        def log(msg):
            if msg.startswith("--- DMFT loop"):
                marks.append(time.time())

        with tempfile.TemporaryDirectory() as d:
            os.chdir(d)
            try:
                t0 = time.time()
                r = hm_bethe.run(cfg, le=300, wmixing=0.5, log=log)
                dt = time.time() - t0
            finally:
                os.chdir(cwd)
        # iterations 2+ exclude this process's XLA compiles (minutes on
        # the tunnel for the hybrid mode, seconds on CPU)
        steady = (t0 + dt - marks[1]) / (len(marks) - 1) \
            if len(marks) >= 2 else None
        from math import comb
        ns = nb + 1
        dim = comb(ns, ns // 2) ** 2
        rec = {"mode": mode, "nbath": nb, "largest_sector_dim": dim,
               "iterations": int(r.iterations),
               "s_per_iteration": round(dt / r.iterations, 2),
               "steady_s_per_iteration": (round(steady, 2)
                                          if steady else None),
               "total_s": round(dt, 2), "docc": float(r.docc[0]),
               "krylov_min_dim": int(os.environ.get(
                   "DMFT_ED_KRYLOV_MIN_DIM", 0)) or None}
        recs = [x for x in recs
                if not (x["mode"] == mode and x["nbath"] == nb
                        and x.get("krylov_min_dim")
                        == rec["krylov_min_dim"])] + [rec]
        print(json.dumps(rec), flush=True)
        os.makedirs(os.path.dirname(ART), exist_ok=True)
        with open(ART, "w") as fh:
            json.dump(sorted(recs, key=lambda x: (x["nbath"], x["mode"])),
                      fh, indent=1)


if __name__ == "__main__":
    main()
