"""Closed-form bath functions Δ(z), FΔ(z), G0(z), F0(z), G0^{-1}(z).

Replaces ED_BATH_FUNCTIONS.f90 (2416 lines of per-case loops) with a few
vectorized JAX functions — einsum over (bath level × frequency) instead of
double loops, and batched matrix inversion where the reference inverts
per-frequency. Everything is differentiable, which is what lets the chi^2
bath fit (fit.py) use `jax.grad` instead of the reference's hand-coded
gradients (ED_FIT_CHI2/fitgf_normal_normal.f90:341-359).

Conventions (reference formulas cited inline):
  * x: complex frequency array [L] (i*wm on the Matsubara axis, w+i*eps real)
  * returns [Nspin, Nspin, Norb, Norb, L]
  * `axis` = "mats" | "real" switches the superc denominator
    (Im(x)^2 + e^2 + d^2 vs -x^2 + e^2 + d^2, delta_bath_{mats,real}_main).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import EDConfig
from .bath import Bath


def bath_params(bath: Bath) -> Dict[str, jnp.ndarray]:
    """Bath -> pytree of jnp arrays (fit parameters)."""
    out = {}
    for name in ("e", "d", "v", "u", "h", "vr"):
        a = getattr(bath, name)
        if a is not None:
            out[name] = jnp.asarray(a)
    return out


def _eye_nn(nspin, norb):
    e = np.zeros((nspin, nspin, norb, norb))
    for s in range(nspin):
        for a in range(norb):
            e[s, s, a, a] = 1.0
    return jnp.asarray(e)


def _superc_den(x, e, d, axis):
    # den[k, L]; mats: Im(x)^2 + e^2 + d^2 ; real: x*(-x) + e^2 + d^2
    if axis == "mats":
        return jnp.imag(x)[None, :] ** 2 + (e ** 2 + d ** 2)[:, None] + 0j
    return -x[None, :] ** 2 + (e ** 2 + d ** 2)[:, None]


def delta(cfg: EDConfig, x, p, axis: str = "mats") -> jnp.ndarray:
    """Hybridization Δ(x) [Nspin,Nspin,Norb,Norb,L]."""
    ns_, no = cfg.nspin, cfg.norb
    L = x.shape[0]
    out = jnp.zeros((ns_, ns_, no, no, L), dtype=jnp.complex128)
    bt, mode = cfg.bath_type, cfg.ed_mode
    if bt == "normal":
        if mode in ("normal",):
            # Δ_aa = Σ_k V_a(k)^2 / (x - E_a(k))
            d = jnp.einsum("sak,sakl->sal", p["v"] ** 2,
                           1.0 / (x[None, None, None, :] - p["e"][..., None]))
            for s in range(ns_):
                out = out.at[s, s, jnp.arange(no), jnp.arange(no)].set(d[s])
        elif mode == "superc":
            # Δ_aa = -Σ_k V^2 (x + E) / Den
            den = jax.vmap(jax.vmap(lambda e, d_: _superc_den(x, e, d_, axis),
                                    in_axes=(0, 0)), in_axes=(0, 0))(
                p["e"], p["d"])                        # [s,a,k,L]
            num = (p["v"] ** 2)[..., None] * (x[None, None, None, :]
                                              + p["e"][..., None])
            dd = -jnp.sum(num / den, axis=2)
            for s in range(ns_):
                out = out.at[s, s, jnp.arange(no), jnp.arange(no)].set(dd[s])
        else:  # nonsu2: helicity sum with W matrix (get_Whyb_matrix)
            W = _whyb(cfg, p)                          # [s, h, a, k]
            # helicity index h runs over the spin slot of e: e[h, a, k]
            geh = 1.0 / (x[None, None, None, :] - p["e"][..., None])
            d = jnp.einsum("hakl,shak,zhak->szal", geh, W, W)
            for a in range(no):
                out = out.at[:, :, a, a].set(d[:, :, a])
    elif bt == "hybrid":
        if mode in ("normal",):
            ge = 1.0 / (x[None, None, :] - p["e"][:, 0, :, None])  # [s,k,L]
            d = jnp.einsum("sak,sbk,skl->sabl", p["v"], p["v"], ge)
            for s in range(ns_):
                out = out.at[s, s].set(d[s])
        elif mode == "superc":
            den = jax.vmap(lambda e, d_: _superc_den(x, e, d_, axis))(
                p["e"][:, 0, :], p["d"][:, 0, :])      # [s,k,L]
            num = x[None, None, :] + p["e"][:, 0, :, None]
            d = -jnp.einsum("sak,sbk,skl->sabl", p["v"], p["v"], num / den)
            for s in range(ns_):
                out = out.at[s, s].set(d[s])
        else:  # nonsu2 hybrid
            W = _whyb(cfg, p)                          # [s,h,a,k]
            geh = 1.0 / (x[None, None, :] - p["e"][:, 0, :, None])  # [h,k,L]
            d = jnp.einsum("shak,zhbk,hkl->szabl", W, W, geh)
            out = d
    else:  # replica: Δ = Σ_k vr* (x - h_k)^{-1} vr  (delta_bath_mats:350-390)
        nso = ns_ * no
        hk = p["h"].transpose(4, 0, 2, 1, 3).reshape(cfg.nbath, nso, nso)
        zi = x[:, None, None] * jnp.eye(nso)[None] - hk[:, None, :, :]
        # zi: [k, L, nso, nso]
        inv = jnp.linalg.inv(zi)
        w2 = (jnp.conj(p["vr"]) * p["vr"]).real
        d = jnp.einsum("k,klij->lij", w2.astype(inv.dtype), inv)  # [L,nso,nso]
        out = d.reshape(L, ns_, no, ns_, no).transpose(1, 3, 2, 4, 0)
    return out


def _whyb(cfg: EDConfig, p):
    """W^{s,h}_{a}(k) spin-helicity hybridization (get_Whyb_matrix,
    ED_BATH/dmft_aux.f90:1098-1117)."""
    ns_, no, nb = cfg.nspin, cfg.norb, cfg.nbath
    v, u = p["v"], p["u"]
    W = jnp.zeros((ns_, ns_, no, nb), dtype=v.dtype)
    if cfg.ed_para:
        for s in range(ns_):
            W = W.at[s, s].set(v[0])
        W = W.at[0, ns_ - 1].set(u[0])
        W = W.at[ns_ - 1, 0].set(u[0])
    else:
        for s in range(ns_):
            W = W.at[s, s].set(v[s])
        W = W.at[0, ns_ - 1].set(u[0])
        W = W.at[ns_ - 1, 0].set(u[ns_ - 1])
    return W


def fdelta(cfg: EDConfig, x, p, axis: str = "mats") -> jnp.ndarray:
    """Anomalous FΔ(x) (superc only; fdelta_bath_mats_main)."""
    ns_, no = cfg.nspin, cfg.norb
    L = x.shape[0]
    out = jnp.zeros((ns_, ns_, no, no, L), dtype=jnp.complex128)
    if cfg.ed_mode != "superc":
        return out
    if cfg.bath_type == "normal":
        den = jax.vmap(jax.vmap(lambda e, d_: _superc_den(x, e, d_, axis),
                                in_axes=(0, 0)), in_axes=(0, 0))(
            p["e"], p["d"])                            # [s,a,k,L]
        num = (p["d"] * p["v"] ** 2)[..., None]
        f = jnp.sum(num / den, axis=2)                 # [s,a,L]
        for s in range(ns_):
            out = out.at[s, s, jnp.arange(no), jnp.arange(no)].set(f[s])
    else:  # hybrid
        den = jax.vmap(lambda e, d_: _superc_den(x, e, d_, axis))(
            p["e"][:, 0, :], p["d"][:, 0, :])          # [s,k,L]
        num = p["d"][:, 0, :, None] / den              # [s,k,L]
        f = -jnp.einsum("sak,sbk,skl->sabl", p["v"], p["v"], num)
        for s in range(ns_):
            out = out.at[s, s].set(f[s])
    return out


def invg0(cfg: EDConfig, x, p, hloc, axis: str = "mats") -> jnp.ndarray:
    """G0^{-1}(x) = (x+mu) - Hloc - Δ(x) in the appropriate matrix space
    (invg0_bath_mats_main). For superc this is only the normal (1,1) Nambu
    component; use `g0and`/`f0and` for the full inverse."""
    D = delta(cfg, x, p, axis)
    hl = jnp.asarray(hloc, dtype=jnp.complex128)[..., None]
    zmu = (x + cfg.xmu)[None, None, None, None, :]
    ns_, no = cfg.nspin, cfg.norb
    eye = _eye_nn(ns_, no)[..., None]
    return zmu * eye - hl - D


def g0and(cfg: EDConfig, x, p, hloc, axis: str = "mats") -> jnp.ndarray:
    """Noninteracting impurity G0(x) (g0and_bath_mats/real_main)."""
    ns_, no = cfg.nspin, cfg.norb
    L = x.shape[0]
    ig = invg0(cfg, x, p, hloc, axis)
    bt, mode = cfg.bath_type, cfg.ed_mode
    if mode == "normal":
        if bt == "normal":
            out = jnp.zeros_like(ig)
            for s in range(ns_):
                diag = jnp.stack([1.0 / ig[s, s, a, a] for a in range(no)])
                out = out.at[s, s, jnp.arange(no), jnp.arange(no)].set(diag)
            return out
        # hybrid/replica: invert in orbital space per spin & frequency
        out = jnp.zeros_like(ig)
        for s in range(ns_):
            m = ig[s, s].transpose(2, 0, 1)            # [L,no,no]
            out = out.at[s, s].set(jnp.linalg.inv(m).transpose(1, 2, 0))
        return out
    if mode == "superc":
        F = fdelta(cfg, x, p, axis)
        if bt == "normal":
            out = jnp.zeros_like(ig)
            for s in range(ns_):
                for a in range(no):
                    fg = ig[s, s, a, a]
                    ff = -F[s, s, a, a]
                    det = jnp.abs(fg) ** 2 + ff * ff
                    out = out.at[s, s, a, a].set(jnp.conj(fg) / det)
            return out
        # hybrid: 2Norb x 2Norb Nambu inversion
        out = jnp.zeros_like(ig)
        hl = jnp.asarray(hloc, dtype=jnp.complex128)
        D = delta(cfg, x, p, axis)
        for s in range(ns_):
            blk11 = ((x + cfg.xmu)[:, None, None] * jnp.eye(no)[None]
                     - hl[s, s][None] - D[s, s].transpose(2, 0, 1))
            blk12 = -F[s, s].transpose(2, 0, 1)
            blk22 = ((x - cfg.xmu)[:, None, None] * jnp.eye(no)[None]
                     + hl[s, s][None] + jnp.conj(D[s, s].transpose(2, 0, 1)))
            M = jnp.block([[blk11, blk12], [blk12, blk22]])
            Minv = jnp.linalg.inv(M)
            out = out.at[s, s].set(Minv[:, :no, :no].transpose(1, 2, 0))
        return out
    # nonsu2: invert in the full (spin x orbital) space
    nso = ns_ * no
    m = ig.transpose(4, 0, 2, 1, 3).reshape(L, nso, nso)
    minv = jnp.linalg.inv(m)
    return minv.reshape(L, ns_, no, ns_, no).transpose(1, 3, 2, 4, 0)


def f0and(cfg: EDConfig, x, p, hloc, axis: str = "mats") -> jnp.ndarray:
    """Anomalous noninteracting F0(x) (f0and_bath_mats_main)."""
    ns_, no = cfg.nspin, cfg.norb
    out = jnp.zeros((ns_, ns_, no, no, x.shape[0]), dtype=jnp.complex128)
    if cfg.ed_mode != "superc":
        return out
    ig = invg0(cfg, x, p, hloc, axis)
    F = fdelta(cfg, x, p, axis)
    if cfg.bath_type == "normal":
        for s in range(ns_):
            for a in range(no):
                fg = ig[s, s, a, a]
                ff = -F[s, s, a, a]
                det = jnp.abs(fg) ** 2 + ff * ff
                out = out.at[s, s, a, a].set(ff / det)
        return out
    hl = jnp.asarray(hloc, dtype=jnp.complex128)
    D = delta(cfg, x, p, axis)
    no_ = no
    for s in range(ns_):
        blk11 = ((x + cfg.xmu)[:, None, None] * jnp.eye(no_)[None]
                 - hl[s, s][None] - D[s, s].transpose(2, 0, 1))
        blk12 = -F[s, s].transpose(2, 0, 1)
        blk22 = ((x - cfg.xmu)[:, None, None] * jnp.eye(no_)[None]
                 + hl[s, s][None] + jnp.conj(D[s, s].transpose(2, 0, 1)))
        M = jnp.block([[blk11, blk12], [blk12, blk22]])
        Minv = jnp.linalg.inv(M)
        out = out.at[s, s].set(Minv[:, :no_, no_:].transpose(1, 2, 0))
    return out
