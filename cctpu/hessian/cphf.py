"""Analytic SCF Hessians via AD-native CPHF (orbital-rotation Schur
complement).

Replaces gpu4pyscf's analytic Hessian + CPHF machinery (reference
templates/opt-freq.py:390-398) and retires the 6N finite-difference SCF
sweep at scale (VERDICT round-1 item #9). Formulation: with the converged
orbitals C0 at geometry R0, parametrize

    C(kappa, R) = L(R)^{-T} L0^T C0 U(kappa),   S(R) = L(R) L(R)^T

(Cholesky-transported orthonormal frame — C^T S C = I for every R, no
eigendecomposition is ever differentiated) and U(kappa) the Cayley
transform of the occ-virt rotation. The SCF energy L(kappa, R) is then an
unconstrained smooth function, stationary in kappa at the SCF solution, so

    d2E/dR2 = L_RR - L_Rk . L_kk^{-1} . L_kR      (Schur complement)

where every block is plain JAX AD of ONE scalar energy function:
 - L_kk (the CPHF/orbital-Hessian operator) acts via nested jvp at fixed
   geometry — integrals stay constant, MXU contractions only;
 - L_kR / L_RR differentiate through the McMurchie-Davidson integral
   builders and the Becke-grid XC, i.e. the "skeleton derivative" integrals
   of the textbook CPHF equations come out of AD automatically;
 - the linear solve is conjugate gradient, vmapped over all 3N right-hand
   sides at once (the reference runs 6N serial SCFs instead,
   opt-freq.py:225-267).

Restricted (RHF/RKS) references; closed shell.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _cayley(K):
    """U = (I - K/2)^{-1} (I + K/2); K antisymmetric -> U orthogonal."""
    n = K.shape[0]
    eye = jnp.eye(n, dtype=K.dtype)
    return jnp.linalg.solve(eye - 0.5 * K, eye + 0.5 * K)


def _energy_pieces(mf):
    """Return fns (ints_of_R, e2_of(dm, R), exc_of(dm, R)) reusing the
    gradient-path traced builders."""
    mol = mf.mol
    basis = mol.basis_set
    charges = jnp.asarray(mol.charges)
    func = getattr(mf, "func", None)
    ax = 1.0 if func is None else func.hyb
    has_xc = func is not None and func.exc is not None
    use_df = getattr(mf, "density_fit", False) not in (False, None, "cd")

    from cctpu.ints.one_electron import build_int1e

    if use_df:
        from cctpu.ints.df import build_2c2e, build_3c2e
        aux = mf._jk.aux

        def make_B(R):
            X = build_3c2e(basis, aux, R)
            M = build_2c2e(aux, R)
            w_, V_ = jnp.linalg.eigh(M)
            keep = w_ > 1e-12 * jnp.max(w_)
            inv_sqrt = jnp.where(
                keep, 1.0 / jnp.sqrt(jnp.where(keep, w_, 1.0)), 0.0)
            naux, nao = X.shape[0], X.shape[1]
            return ((V_ * inv_sqrt[None, :]).T
                    @ X.reshape(naux, -1)).reshape(naux, nao, nao)

        def e2_of(dm, R, B=None):
            B = make_B(R) if B is None else B
            Jp = jnp.einsum("pij,ij->p", B, dm)
            e2 = 0.5 * jnp.dot(Jp, Jp)
            if ax:
                ek = jnp.einsum("pik,kl,pjl,ij->", B, dm, B, dm)
                e2 = e2 - 0.25 * ax * ek
            return e2
    else:
        from cctpu.ints.two_electron import (energy_2e_direct, pair_classes,
                                             schwarz_q)
        screen_qs = schwarz_q(pair_classes(basis), mol.coords)

        def e2_of(dm, R, B=None):
            return energy_2e_direct(basis, R, dm, k_weight=ax,
                                    screen_qs=screen_qs)

        make_B = None

    def one_e(dm, R):
        ints = build_int1e(basis, R, charges)
        return jnp.einsum("ij,ij->", dm, ints["T"] + ints["V"])

    def exc_of(dm, R):
        if not has_xc:
            return 0.0
        return mf.exc_of_coords(R, dm)

    def chol(R):
        ints = build_int1e(basis, R, charges)
        return jnp.linalg.cholesky(ints["S"])

    def e_nuc(R):
        return mol.energy_nuc(R)

    return one_e, e2_of, exc_of, chol, e_nuc, make_B


def analytic_hessian(mf, cg_tol: float = 1e-8, cg_maxiter: int = 60,
                     rhs_chunk: int = 12, with_dipole: bool = False):
    """Cartesian Hessian [3N, 3N] of a converged restricted SCF object.

    with_dipole=True additionally returns dmu/dR [3N, 3] for IR
    intensities (reference opt-freq.py IR pipeline) using the same CPHF
    solutions: d mu/dR = mu_R - mu_kappa . X with dkappa/dR = -X."""
    mol = mf.mol
    assert mf.mo_coeff is not None and mf.mo_coeff.ndim == 2, \
        "analytic_hessian: restricted closed-shell reference required"
    func = getattr(mf, "func", None)
    if func is not None and func.rsh is not None:
        # the LR-exchange B_lr factor is frozen at R0 here; its geometry
        # derivative is missing -> second derivatives would be wrong
        raise NotImplementedError(
            "analytic Hessian for range-separated hybrids not implemented "
            "(frozen attenuated-DF factor); use the FD path")
    C0 = jnp.asarray(mf.mo_coeff)
    nmo = C0.shape[1]
    nocc = mol.nelectron // 2
    nvir = nmo - nocc
    R0 = jnp.asarray(mol.coords)
    natm = mol.natm
    n3 = 3 * natm

    one_e, e2_of, exc_of, chol, e_nuc, make_B = _energy_pieces(mf)
    L0chol = chol(R0)

    def dm_of(kappa, R, transported: bool):
        K = jnp.zeros((nmo, nmo), C0.dtype)
        K = K.at[:nocc, nocc:].set(-kappa)
        K = K.at[nocc:, :nocc].set(kappa.T)
        U = _cayley(K)
        C = C0 @ U
        if transported:
            Lr = chol(R)
            # C(R) = L^{-T} L0^T C0 U — orthonormal in S(R) for all R
            C = jax.scipy.linalg.solve_triangular(
                Lr.T, L0chol.T @ C, lower=False)
        Cocc = C[:, :nocc]
        return 2.0 * Cocc @ Cocc.T

    jk = mf.get_jk_builder()
    ints0 = mf.build_ints()
    H0 = ints0["T"] + ints0["V"]
    func = getattr(mf, "func", None)
    ax0 = 1.0 if func is None else func.hyb
    has_xc0 = func is not None and func.exc is not None

    def L_fixedR(kappa):
        """Energy at R0 as a function of the orbital rotation only — all
        integrals constant (cached jk builder / grid chunks), so the CPHF
        operator is pure MXU contractions."""
        dm = dm_of(kappa, R0, transported=False)
        J, K = jk(dm, with_k=bool(ax0))
        e = jnp.einsum("ij,ij->", dm, H0) + 0.5 * jnp.einsum("ij,ij->",
                                                             dm, J)
        if ax0:
            e = e - 0.25 * ax0 * jnp.einsum("ij,ij->", dm, K)
        if func is not None and func.rsh is not None:
            omega, _, beta = func.rsh
            Klr = jk.k_lr(dm, omega)
            e = e - 0.25 * beta * jnp.einsum("ij,ij->", dm, Klr)
        if has_xc0:
            e = e + mf._exc_total(dm)
        if getattr(mf, "_pcm", None) is not None:
            e = e + mf._pcm.energy(R0, dm)
        return e

    def L_full(kappa, R):
        """Energy as a function of (kappa, R) — geometry-traced integrals."""
        dm = dm_of(kappa, R, transported=True)
        e = one_e(dm, R) + e2_of(dm, R) + exc_of(dm, R) + e_nuc(R)
        func = getattr(mf, "func", None)
        if func is not None and func.rsh is not None:
            # LR exchange: constant-omega attenuated DF factor traced in R
            omega, _, beta = func.rsh
            Klr = mf._jk.k_lr(dm, omega)     # frozen B_lr: fixed-R approx
            e = e - 0.25 * beta * jnp.einsum("ij,ij->", dm, Klr)
        if func is not None and getattr(func, "dispersion", None):
            from cctpu.dft.dispersion import dispersion_energy
            e = e + dispersion_energy(func, mol, R)
        if getattr(mf, "_pcm", None) is not None:
            e = e + mf._pcm.energy(R, dm)
        return e

    k0 = jnp.zeros((nocc, nvir))
    g_k = jax.grad(L_full, argnums=0)

    # ---- CPHF operator: v -> L_kk @ v (nested jvp at fixed geometry) ----
    gk_fixed = jax.grad(L_fixedR)

    @jax.jit
    def kk_mv(v):
        return jax.jvp(gk_fixed, (k0,), (v,))[1]

    # ---- mixed block L_kR [nocc*nvir, 3N] and L_RR [3N, 3N] ----
    def gk_of_R(Rflat):
        return g_k(k0, Rflat.reshape(natm, 3)).ravel()

    def gR_of_R(Rflat):
        return jax.grad(lambda R: L_full(k0, R))(
            Rflat.reshape(natm, 3)).ravel()

    R0f = R0.ravel()
    eye = np.eye(n3)
    L_kR = np.zeros((nocc * nvir, n3))
    L_RR = np.zeros((n3, n3))
    jit_kR = jax.jit(lambda t: jax.jvp(gk_of_R, (R0f,), (t,))[1])
    jit_RR = jax.jit(lambda t: jax.jvp(gR_of_R, (R0f,), (t,))[1])
    for k in range(n3):
        t = jnp.asarray(eye[k])
        L_kR[:, k] = np.asarray(jit_kR(t))
        L_RR[:, k] = np.asarray(jit_RR(t))
    L_RR = 0.5 * (L_RR + L_RR.T)

    # ---- CG solve L_kk X = L_kR for all 3N rhs at once ----
    nk = nocc * nvir

    @jax.jit
    def mv_flat(v):
        return kk_mv(v.reshape(nocc, nvir)).ravel()

    def cg_block(Bmat):
        X = np.zeros_like(Bmat)
        for s in range(0, Bmat.shape[1], rhs_chunk):
            cols = Bmat[:, s:s + rhs_chunk]
            x = np.zeros_like(cols)
            r = cols.copy()
            p = r.copy()
            rs = np.einsum("ij,ij->j", r, r)
            for _ in range(cg_maxiter):
                Ap = np.stack([np.asarray(mv_flat(jnp.asarray(p[:, j])))
                               for j in range(p.shape[1])], axis=1)
                alpha = rs / np.maximum(np.einsum("ij,ij->j", p, Ap), 1e-300)
                x += p * alpha[None, :]
                r -= Ap * alpha[None, :]
                rs_new = np.einsum("ij,ij->j", r, r)
                if np.max(np.sqrt(rs_new)) < cg_tol:
                    break
                p = r + p * (rs_new / np.maximum(rs, 1e-300))[None, :]
                rs = rs_new
            X[:, s:s + rhs_chunk] = x
        return X

    X = cg_block(L_kR)
    H = L_RR - L_kR.T @ X
    H = 0.5 * (H + H.T)
    if not with_dipole:
        return H

    from cctpu.ints.one_electron import build_int1e
    charges = jnp.asarray(mol.charges)

    def mu_full(kappa, Rflat):
        R = Rflat.reshape(natm, 3)
        dm = dm_of(kappa, R, transported=True)
        ints = build_int1e(mol.basis_set, R, charges, with_dipole=True)
        el = -jnp.einsum("dij,ij->d", ints["dipole"], dm)
        nuc = jnp.einsum("i,ix->x", charges, R)
        return el + nuc

    M_R = np.asarray(jax.jacfwd(mu_full, argnums=1)(k0, R0f))   # [3, 3N]
    M_k = np.asarray(jax.jacfwd(mu_full, argnums=0)(k0, R0f)
                     ).reshape(3, nocc * nvir)                  # [3, nk]
    dmu_dR = (M_R - M_k @ X).T                                  # [3N, 3]
    return H, dmu_dR
