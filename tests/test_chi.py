"""Susceptibilities vs exact full-Fock Lehmann (spin/dens/pair probes)."""

import numpy as np
import pytest

from dmft_ed_tpu.config import EDConfig
from dmft_ed_tpu.bath import Bath
from dmft_ed_tpu.diag import diagonalize
from dmft_ed_tpu import chi as chi_mod
from dmft_ed_tpu import grids
from dmft_ed_tpu.hamiltonian import single_particle_parts

import reference_ed as ref


def _setup():
    cfg = EDConfig(norb=1, nbath=2, nspin=1, uloc=(2.0,), beta=20.0,
                   lmats=8, lreal=12, ltau=25, wini=-4, wfin=4,
                   lanc_dim_threshold=10 ** 6, lanc_ngfiter=150).validate()
    rng = np.random.default_rng(51)
    bath = Bath(cfg)
    bath.e[:] = np.array([-0.7, 0.6])[None, None, :]
    bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 1, 1))
    return cfg, bath, hloc


def _exact_chi(cfg, bath, hloc, op_builder):
    """chi(tau), chi(iv), chi(w) by dense Lehmann with the reference's
    accumulation conventions (both isign branches, /Z)."""
    ns = cfg.ns
    states = list(range(4 ** ns))
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    H = ref.build_full_H(ns, cfg.norb, Tuu, Tdd, Tud, P,
                         np.asarray(cfg.uloc_arr[:cfg.norb]), cfg.ust,
                         cfg.jh, cfg.jx, cfg.jp, cfg.hfmode, states)
    evals, U = np.linalg.eigh(H)
    psi0 = U[:, 0]
    O = op_builder(states, ns)
    Ov = O @ psi0
    amps = U.conj().T @ Ov                     # <m|O|0>
    dE = evals - evals[0]
    w2 = np.abs(amps) ** 2
    tau = grids.imaginary_time(cfg)
    vm = grids.matsubara_bosonic(cfg)
    wr = grids.real_axis(cfg)
    beta = cfg.beta
    chi_tau = np.zeros(len(tau))
    chi_iv = np.zeros(len(vm), dtype=complex)
    chi_w = np.zeros(len(wr), dtype=complex)
    for m in range(len(evals)):
        p, d = w2[m], dE[m]
        if p < 1e-14:
            continue
        ebde = np.exp(-beta * d) if beta * d < 200 else 0.0
        chi_tau += p * (np.exp(np.clip(-tau * d, -200, 200))
                        + np.exp(np.clip(-(beta - tau) * d, -200, 200)))
        if beta * d < 1e-1:
            chi_iv[0] += 2 * p * beta
        else:
            chi_iv[0] += 2 * p * (1 - ebde) / d
        chi_iv[1:] += p * (ebde - 1) / (1j * vm[1:] - d)
        chi_iv[1:] += p * (1 - ebde) / (1j * vm[1:] + d)
        zw = wr + 1j * cfg.eps
        chi_w += p * (ebde - 1) / (zw - d)
        chi_w += p * (1 - ebde) / (zw + d)
    return chi_tau, chi_iv, chi_w


def _sz_builder(states, ns):
    occ_u = np.array([(s >> 0) & 1 for s in states], dtype=float)
    occ_d = np.array([(s >> ns) & 1 for s in states], dtype=float)
    return np.diag(0.5 * (occ_u - occ_d))


def _n_builder(states, ns):
    occ_u = np.array([(s >> 0) & 1 for s in states], dtype=float)
    occ_d = np.array([(s >> ns) & 1 for s in states], dtype=float)
    return np.diag(occ_u + occ_d)


def _pair_builder(states, ns):
    dim = len(states)
    O = np.zeros((dim, dim))
    for col, s in enumerate(states):
        r1 = ref.c_op(0, s)          # c_up
        if r1 is None:
            continue
        s1, g1 = r1
        r2 = ref.c_op(ns, s1)        # c_dw
        if r2 is None:
            continue
        O[r2[0], col] = g1 * r2[1]
    return O


@pytest.mark.parametrize("which,builder", [
    ("spin", _sz_builder), ("dens", _n_builder), ("pair", _pair_builder)])
def test_chi_vs_exact(which, builder):
    cfg, bath, hloc = _setup()
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    fn = {"spin": chi_mod.build_chi_spin, "dens": chi_mod.build_chi_dens,
          "pair": chi_mod.build_chi_pair}[which]
    ct, ci, cw = fn(cfg, slist, zeta, bath, hloc, False)
    et, ei, ew = _exact_chi(cfg, bath, hloc, builder)
    np.testing.assert_allclose(ct[0, 0], et, atol=1e-7)
    np.testing.assert_allclose(ci[0, 0], ei, atol=1e-7)
    np.testing.assert_allclose(cw[0, 0], ew, atol=1e-7)


def _two_orb_setup():
    cfg = EDConfig(norb=2, nbath=1, nspin=1, uloc=(1.5, 1.5), ust=0.7,
                   beta=20.0, lmats=6, lreal=10, ltau=20, wini=-4, wfin=4,
                   lanc_dim_threshold=10 ** 6, lanc_ngfiter=200).validate()
    rng = np.random.default_rng(55)
    bath = Bath(cfg)
    bath.e[:] = -0.5 + rng.normal(size=bath.e.shape) * 0.3
    bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.2, -0.2])
    return cfg, bath, hloc


def _dense_eig(cfg, bath, hloc):
    ns = cfg.ns
    states = list(range(4 ** ns))
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    H = ref.build_full_H(ns, cfg.norb, Tuu, Tdd, Tud, P,
                         np.asarray(cfg.uloc_arr[:cfg.norb]), cfg.ust,
                         cfg.jh, cfg.jx, cfg.jp, cfg.hfmode, states)
    evals, U = np.linalg.eigh(H)
    return states, evals, U


def _gs_multiplet(evals, tol=1e-10):
    """Indices of the (possibly degenerate) ground-state multiplet; the
    T=0 solver keeps every degenerate ground state with weight 1/zeta
    (zeta = multiplet size), and Σ_k |<m|O|ψ_k>|² over an orthonormal
    basis of the degenerate subspace is basis-independent."""
    return np.nonzero(evals - evals[0] < tol)[0]


def _bose_kernels(cfg, weights, dE, isigns):
    """Reference bosonic accumulation (add_to_lanczos_densChi) for one
    channel's (weights, poles): returns (tau, iv, w) contributions."""
    tau = grids.imaginary_time(cfg)
    vm = grids.matsubara_bosonic(cfg)
    wr = grids.real_axis(cfg)
    beta = cfg.beta
    zw = wr + 1j * cfg.eps
    ct = np.zeros(len(tau), complex)
    ci = np.zeros(len(vm), complex)
    cw = np.zeros(len(wr), complex)
    for p, d in zip(weights, dE):
        if abs(p) < 1e-14:
            continue
        ebde = np.exp(-beta * d) if beta * d < 200 else 0.0
        iv0 = p * beta if beta * d < 1e-1 else p * (1 - ebde) / d
        if 1 in isigns:
            ct += p * np.exp(np.clip(-tau * d, -200, 200))
            ci[0] += iv0
            ci[1:] += p * (ebde - 1) / (1j * vm[1:] - d)
            cw += p * (ebde - 1) / (zw - d)
        if -1 in isigns:
            ct += p * np.exp(np.clip(-(beta - tau) * d, -200, 200))
            ci[0] += iv0
            ci[1:] += p * (1 - ebde) / (1j * vm[1:] + d)
            cw += p * (1 - ebde) / (zw + d)
    return ct, ci, cw


def test_chi_dens_offdiag_tau_iv_vs_exact():
    """The RAW off-diagonal τ/iν accumulation (no (1+i) reconstruction —
    the reference applies it to χ(ω) only, ED_GF_CHIDENS.f90:43): the
    (n_a+n_b) both-isign channel plus the two single-isign complex
    channels (n_a ∓ i n_b) with weight i, evaluated by dense Lehmann,
    must match the Krylov build in ALL THREE domains (VERDICT r2 weak #7:
    the τ/iν off-diag file columns were unvalidated)."""
    cfg, bath, hloc = _two_orb_setup()
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    ct, ci, cw = chi_mod.build_chi_dens(cfg, slist, zeta, bath, hloc, False)
    states, evals, U = _dense_eig(cfg, bath, hloc)
    ns = cfg.ns
    gs = _gs_multiplet(evals)
    dE = evals - evals[0]

    def nop(coeffs):
        occ = np.zeros(len(states), complex)
        for orb, cf in coeffs.items():
            occ += cf * np.array([((s >> orb) & 1) + ((s >> (ns + orb)) & 1)
                                  for s in states], float)
        return np.diag(occ)

    def amps2(O):
        w = np.zeros(len(evals))
        for k in gs:
            w += np.abs(U.conj().T @ (O @ U[:, k])) ** 2
        return w / len(gs)

    et = np.zeros(ct.shape[-1], complex)
    ei = np.zeros(ci.shape[-1], complex)
    ew = np.zeros(cw.shape[-1], complex)
    for weights, isigns in [
            (amps2(nop({0: 1.0, 1: 1.0})), (1, -1)),
            (1j * amps2(nop({0: 1.0, 1: -1j})), (1,)),
            (1j * amps2(nop({0: 1.0, 1: 1j})), (-1,))]:
        t_, i_, w_ = _bose_kernels(cfg, weights, dE, isigns)
        et, ei, ew = et + t_, ei + i_, ew + w_
    np.testing.assert_allclose(ct[0, 1], et, atol=1e-7)
    np.testing.assert_allclose(ci[0, 1], ei, atol=1e-7)
    # χ(ω) is NOT raw — it carries the (1+i) reconstruction, validated
    # against the exact cross-correlation in
    # test_chi_dens_offdiag_vs_exact_cross below.


def test_chi_dens_mix_vs_exact():
    """densChi_mix (ED_GF_CHIDENS.f90:490-673): per spin σ, isign=+1 chain
    on c†_{b,σ}c_{a,σ}|0> and isign=-1 chain on c†_{a,σ}c_{b,σ}|0>,
    validated against dense Lehmann for every orbital pair in all three
    domains (diagonal pairs reduce to the n_{a,σ} autocorrelation)."""
    cfg, bath, hloc = _two_orb_setup()
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    ct, ci, cw = chi_mod.build_chi_dens_mix(cfg, slist, zeta, bath, hloc,
                                            False)
    states, evals, U = _dense_eig(cfg, bath, hloc)
    ns = cfg.ns
    gs = _gs_multiplet(evals)
    dE = evals - evals[0]
    dim = len(states)

    def hop_op(spin, src, dst):
        """c†_{dst,spin} c_{src,spin} on the full Fock space."""
        O = np.zeros((dim, dim))
        for col, s in enumerate(states):
            r1 = ref.c_op(src + spin * ns, s)
            if r1 is None:
                continue
            s1, g1 = r1
            r2 = ref.cdg_op(dst + spin * ns, s1)
            if r2 is None:
                continue
            O[r2[0], col] = g1 * r2[1]
        return O

    def amps2(O):
        w = np.zeros(len(evals))
        for k in gs:
            w += np.abs(U.conj().T @ (O @ U[:, k])) ** 2
        return w / len(gs)

    for a in range(2):
        for b in range(2):
            et = np.zeros(ct.shape[-1], complex)
            ei = np.zeros(ci.shape[-1], complex)
            ew = np.zeros(cw.shape[-1], complex)
            for s in range(cfg.nspin):
                t_, i_, w_ = _bose_kernels(cfg, amps2(hop_op(s, a, b)),
                                           dE, (1,))
                et, ei, ew = et + t_, ei + i_, ew + w_
                t_, i_, w_ = _bose_kernels(cfg, amps2(hop_op(s, b, a)),
                                           dE, (-1,))
                et, ei, ew = et + t_, ei + i_, ew + w_
            np.testing.assert_allclose(ct[a, b], et, atol=1e-7,
                                       err_msg=f"tau {a}{b}")
            np.testing.assert_allclose(ci[a, b], ei, atol=1e-7,
                                       err_msg=f"iv {a}{b}")
            np.testing.assert_allclose(cw[a, b], ew, atol=1e-7,
                                       err_msg=f"w {a}{b}")


def test_chi_dens_offdiag_vs_exact_cross():
    """The (1+i)-combination reconstruction of χ_nn^{ab}(ω) equals the exact
    Lehmann cross-correlation (validates ED_GF_CHIDENS.f90:280-470 algebra)."""
    cfg = EDConfig(norb=2, nbath=1, nspin=1, uloc=(1.5, 1.5), ust=0.7,
                   beta=20.0, lmats=6, lreal=10, ltau=20, wini=-4, wfin=4,
                   lanc_dim_threshold=10 ** 6, lanc_ngfiter=200).validate()
    rng = np.random.default_rng(55)
    bath = Bath(cfg)
    bath.e[:] = -0.5 + rng.normal(size=bath.e.shape) * 0.3
    bath.v[:] = rng.uniform(0.4, 0.7, size=bath.v.shape)
    hloc = np.zeros((1, 1, 2, 2))
    hloc[0, 0] = np.diag([0.2, -0.2])
    slist, zeta, _ = diagonalize(cfg, bath, hloc, None)
    ct, ci, cw = chi_mod.build_chi_dens(cfg, slist, zeta, bath, hloc, False)
    ns = cfg.ns
    states = list(range(4 ** ns))
    Tuu, Tdd, Tud, P = single_particle_parts(cfg, bath, hloc)
    H = ref.build_full_H(ns, 2, Tuu, Tdd, Tud, P,
                         np.asarray(cfg.uloc_arr[:2]), cfg.ust, cfg.jh,
                         cfg.jx, cfg.jp, cfg.hfmode, states)
    evals, U = np.linalg.eigh(H)
    psi0 = U[:, 0]

    def nop(orb):
        occ_u = np.array([(s >> orb) & 1 for s in states], float)
        occ_d = np.array([(s >> (ns + orb)) & 1 for s in states], float)
        return np.diag(occ_u + occ_d)

    A = U.conj().T @ nop(0) @ psi0
    B = U.conj().T @ nop(1) @ psi0
    dE = evals - evals[0]
    wr = grids.real_axis(cfg)
    zw = wr + 1j * cfg.eps
    beta = cfg.beta
    cross = np.zeros(len(wr), dtype=complex)
    for m in range(len(evals)):
        p = np.real(A[m] * np.conj(B[m]))
        d = dE[m]
        ebde = np.exp(-beta * d) if beta * d < 200 else 0.0
        cross += p * (ebde - 1) / (zw - d) + p * (1 - ebde) / (zw + d)
    np.testing.assert_allclose(cw[0, 1], cross, atol=1e-10)
