#!/usr/bin/env python
"""Compensated-f32 (Dekker 2-word) digit matmul: accuracy + speed probe.

VERDICT r3 item 7 / r4 item 4: the f32 MXU path runs ~8x faster than
ozaki5x7 at headline shapes, so a 2-word Dekker-split scheme

    A = Ah + Al,  B = Bh + Bl   (f32 words, |Al| <= ulp(Ah)/2 ~ 2^-24|Ah|)
    A@B ~= Ah@Bh + (Ah@Bl + Al@Bh)        [drop Al@Bl ~ 2^-48]

has a theoretical MAC budget of ~3x the ozaki5x7 headline IF it reaches
the ~1e-10 accuracy class. The catch this script quantifies: unlike the
int8 path (exact int32 accumulation), every f32 MXU product accumulates
with f32 round-off — the hh product alone carries ~2^-24*sqrt(K) relative
error at K=3432, i.e. the scheme is ACCUMULATION-bound, not
truncation-bound, and no epilogue can recover digits the MXU already
rounded away. A TwoSum epilogue over K-chunked partial products is also
probed (bounds the best any chunked refinement can do).

Run on the TPU:      python bench_dekker.py
Run on CPU (debug):  JAX_PLATFORMS_OVERRIDE=cpu python bench_dekker.py

Writes artifacts/dekker_f32.json and prints a human summary; the verdict
lands in PERF_NOTES.md.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS_OVERRIDE"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS_OVERRIDE"])
jax.config.update("jax_enable_x64", True)

N = 3432          # headline sector block (Ns=14 half-filled: 3432^2 dim)
PREC = jax.lax.Precision.HIGHEST


def dekker_split(A):
    """f64 -> (hi, lo) f32 words, A == hi + lo exactly in f64."""
    hi = A.astype(jnp.float32)
    lo = (A - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def dekker3_matmul(A, B):
    """3 f32 MXU products (hh + hl + lh; ll dropped), f64 combine."""
    Ah, Al = dekker_split(A)
    Bh, Bl = dekker_split(B)
    hh = jnp.matmul(Ah, Bh, precision=PREC)
    cross = jnp.matmul(Ah, Bl, precision=PREC) \
        + jnp.matmul(Al, Bh, precision=PREC)
    return hh.astype(jnp.float64) + cross.astype(jnp.float64)


def dekker3_chunked(A, B, nchunk: int):
    """Same 3 products with the contraction axis split into `nchunk`
    pieces and TwoSum-compensated f32-pair accumulation across chunks —
    bounds the best a chunked refinement can do against the in-chunk MXU
    round-off (which it cannot touch)."""
    Ah, Al = dekker_split(A)
    Bh, Bl = dekker_split(B)
    k = A.shape[1]
    cs = k // nchunk
    hi = jnp.zeros((A.shape[0], B.shape[1]), jnp.float32)
    lo = jnp.zeros_like(hi)
    for c in range(nchunk):
        s = slice(c * cs, (c + 1) * cs if c < nchunk - 1 else k)
        x = jnp.matmul(Ah[:, s], Bh[s, :], precision=PREC) \
            + jnp.matmul(Ah[:, s], Bl[s, :], precision=PREC) \
            + jnp.matmul(Al[:, s], Bh[s, :], precision=PREC)
        t = hi + x
        bp = t - hi
        err = (hi - (t - bp)) + (x - bp)
        hi, lo = t, lo + err
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def chain_time(fn, A, B, niter=20, repeats=3):
    """Chained data-dependent applications inside ONE jit (the tunnel
    memoizes repeated identical dispatches — see bench.py)."""

    @jax.jit
    def loop(A, V):
        def step(v, _):
            w = fn(A, v)
            return w / jnp.linalg.norm(w), None
        vf, _ = jax.lax.scan(step, V, None, length=niter)
        return vf

    vf = loop(A, B)
    vf.block_until_ready()
    best = np.inf
    for r in range(repeats):
        B2 = B + 1e-9 * (r + 1)
        t0 = time.time()
        loop(A, B2).block_until_ready()
        best = min(best, time.time() - t0)
    return best / niter


def main():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(N, N))
    V = rng.normal(size=(N, N))
    V /= np.linalg.norm(V)
    exact = A @ V                      # host BLAS dgemm, exact reference
    scale = np.max(np.abs(exact))
    Aj, Vj = jnp.asarray(A), jnp.asarray(V)

    out = {"shape": [N, N, N], "device": str(jax.devices()[0])}

    # --- accuracy
    for name, f in [
            ("f32_plain", lambda a, b: jnp.matmul(
                a.astype(jnp.float32), b.astype(jnp.float32),
                precision=PREC).astype(jnp.float64)),
            ("dekker3", dekker3_matmul),
            ("dekker3_chunk27", lambda a, b: dekker3_chunked(a, b, 27)),
    ]:
        got = np.asarray(jax.jit(f)(Aj, Vj))
        rel = float(np.max(np.abs(got - exact)) / scale)
        out[f"relerr_{name}"] = rel
        print(f"{name:18s} max rel err {rel:.3e}", flush=True)

    from dmft_ed_tpu import ozaki
    got = np.asarray(ozaki.matmul(Aj, Vj, 5, 7))
    out["relerr_ozaki5x7"] = float(np.max(np.abs(got - exact)) / scale)
    print(f"{'ozaki5x7':18s} max rel err {out['relerr_ozaki5x7']:.3e}",
          flush=True)

    # --- speed (chained single-orientation products)
    out["s_per_apply_dekker3"] = chain_time(dekker3_matmul, Aj, Vj)
    print(f"dekker3       {out['s_per_apply_dekker3'] * 1e3:.2f} ms/apply",
          flush=True)
    out["s_per_apply_ozaki5x7"] = chain_time(
        lambda a, b: ozaki.matmul(a, b, 5, 7), Aj, Vj)
    print(f"ozaki5x7      {out['s_per_apply_ozaki5x7'] * 1e3:.2f} ms/apply",
          flush=True)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "dekker_f32.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
