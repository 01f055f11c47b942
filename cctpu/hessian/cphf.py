"""Analytic SCF Hessians via AD-native CPHF (orbital-rotation Schur
complement).

Replaces gpu4pyscf's analytic Hessian + CPHF machinery (reference
templates/opt-freq.py:390-398, hessian.{RHF,UHF,RKS,UKS} dispatch in
calculate_reaction_energy.py:167-174) and retires the 6N finite-difference
SCF sweep at scale. Formulation: with the converged orbitals C0 at
geometry R0, parametrize

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
 - the linear solve is conjugate gradient over the (spin-stacked) rotation
   vector (the reference runs 6N serial SCFs instead, opt-freq.py:225-267).

Supports RHF/RKS (closed shell) and UHF/UKS references — kappa is a
pytree of per-spin occ-virt blocks flattened with ravel_pytree — and
range-separated hybrids: the erf-attenuated DF factor B_lr is re-traced
in R inside L_full (round-1 VERDICT item #6 lifted both gates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree


def _cayley(K):
    """U = (I - K/2)^{-1} (I + K/2); K antisymmetric -> U orthogonal."""
    n = K.shape[0]
    eye = jnp.eye(n, dtype=K.dtype)
    return jnp.linalg.solve(eye - 0.5 * K, eye + 0.5 * K)


def _traced_B(basis, aux, R, omega=None, rcond=1e-12):
    """Whitened DF factor rebuilt at R (differentiable; gradient path
    twin of ints/df.py DFJK)."""
    from cctpu.ints.df import build_2c2e, build_3c2e
    X = build_3c2e(basis, aux, R, omega=omega)
    M = build_2c2e(aux, R, omega=omega)
    w_, V_ = jnp.linalg.eigh(M)
    keep = w_ > rcond * jnp.max(w_)
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, w_, 1.0)),
                         0.0)
    naux = X.shape[0]
    return ((V_ * inv_sqrt[None, :]).T
            @ X.reshape(naux, -1)).reshape(X.shape)


def _energy_pieces(mf):
    """(one_e, e2_of, exc_of, chol, e_nuc): spin-general energy terms with
    geometry-traced integrals (mirrors grad/scf_grad.py's Lagrangian)."""
    mol = mf.mol
    basis = mol.basis_set
    charges = jnp.asarray(mol.charges)
    func = getattr(mf, "func", None)
    ax = 1.0 if func is None else func.hyb
    rsh = None if func is None else func.rsh
    has_xc = func is not None and func.exc is not None
    use_df = getattr(mf, "density_fit", False) not in (False, None, "cd")

    from cctpu.ints.one_electron import build_int1e

    if use_df:
        aux = mf._jk.aux

        def e2_of(dm, R):
            B = _traced_B(basis, aux, R)
            Dtot = dm.sum(0) if dm.ndim == 3 else dm
            Jp = jnp.einsum("pij,ij->p", B, Dtot)
            e2 = 0.5 * jnp.dot(Jp, Jp)
            if ax or rsh is not None:
                dms = dm if dm.ndim == 3 else 0.5 * dm[None].repeat(2, 0)
            if ax:
                ek = sum(jnp.einsum("pik,kl,pjl,ij->", B, dms[s], B, dms[s])
                         for s in range(2))
                e2 = e2 - 0.5 * ax * ek
            if rsh is not None:
                omega_r, _, beta_r = rsh
                Bl = _traced_B(basis, aux, R, omega=omega_r, rcond=1e-10)
                ekl = sum(jnp.einsum("pik,kl,pjl,ij->", Bl, dms[s], Bl,
                                     dms[s]) for s in range(2))
                e2 = e2 - 0.5 * beta_r * ekl
            return e2
    else:
        from cctpu.ints.two_electron import (energy_2e_direct, pair_classes,
                                             schwarz_q)
        screen_qs = schwarz_q(pair_classes(basis), mol.coords)

        def e2_of(dm, R):
            e2 = energy_2e_direct(basis, R, dm, k_weight=ax,
                                  screen_qs=screen_qs)
            if rsh is not None:
                omega_r, _, beta_r = rsh
                e2 = e2 + (energy_2e_direct(basis, R, dm, k_weight=beta_r,
                                            omega=omega_r,
                                            screen_qs=screen_qs)
                           - energy_2e_direct(basis, R, dm, k_weight=0.0,
                                              omega=omega_r,
                                              screen_qs=screen_qs))
            return e2

    def one_e(dm, R):
        ints = build_int1e(basis, R, charges)
        return jnp.einsum("...ij,ij->", dm, ints["T"] + ints["V"])

    def exc_of(dm, R):
        if not has_xc:
            return 0.0
        return mf.exc_of_coords(R, dm)

    def chol(R):
        ints = build_int1e(basis, R, charges)
        return jnp.linalg.cholesky(ints["S"])

    def e_nuc(R):
        return mol.energy_nuc(R)

    return one_e, e2_of, exc_of, chol, e_nuc


def analytic_hessian(mf, cg_tol: float = 1e-8, cg_maxiter: int = 60,
                     rhs_chunk: int = 12, with_dipole: bool = False):
    """Cartesian Hessian [3N, 3N] of a converged RHF/RKS/UHF/UKS object.

    with_dipole=True additionally returns dmu/dR [3N, 3] for IR
    intensities (reference opt-freq.py IR pipeline) using the same CPHF
    solutions: d mu/dR = mu_R - mu_kappa . X with dkappa/dR = -X."""
    mol = mf.mol
    C_all = jnp.asarray(mf.mo_coeff)
    restricted = C_all.ndim == 2
    R0 = jnp.asarray(mol.coords)
    natm = mol.natm
    n3 = 3 * natm

    if restricted:
        spins = [(C_all, mol.nelectron // 2, 2.0)]
    else:
        spins = [(C_all[0], mol.nalpha, 1.0), (C_all[1], mol.nbeta, 1.0)]
    nmo = spins[0][0].shape[1]

    one_e, e2_of, exc_of, chol, e_nuc = _energy_pieces(mf)
    L0chol = chol(R0)

    def dm_of(kappa, R, transported: bool):
        """kappa: tuple of per-spin [nocc, nvir] blocks."""
        dms = []
        Lr = chol(R) if transported else None
        for (C0s, no, occw), k in zip(spins, kappa):
            K = jnp.zeros((nmo, nmo), C0s.dtype)
            K = K.at[:no, no:].set(-k)
            K = K.at[no:, :no].set(k.T)
            C = C0s @ _cayley(K)
            if transported:
                # C(R) = L^{-T} L0^T C0 U — orthonormal in S(R) for all R
                C = jax.scipy.linalg.solve_triangular(
                    Lr.T, L0chol.T @ C, lower=False)
            dms.append(occw * C[:, :no] @ C[:, :no].T)
        return dms[0] if restricted else jnp.stack(dms)

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
        e = jnp.einsum("...ij,ij->", dm, H0)
        J, K = jk(dm, with_k=bool(ax0))
        if restricted:
            e = e + 0.5 * jnp.einsum("ij,ij->", dm, J)
            if ax0:
                e = e - 0.25 * ax0 * jnp.einsum("ij,ij->", dm, K)
        else:
            Jtot = J[0] + J[1]
            e = e + 0.5 * jnp.einsum("sij,ij->", dm, Jtot)
            if ax0:
                e = e - 0.5 * ax0 * jnp.einsum("sij,sij->", dm, K)
        if func is not None and func.rsh is not None:
            omega, _, beta = func.rsh
            Klr = jk.k_lr(dm, omega)       # frozen B_lr: exact at fixed R
            if restricted:
                e = e - 0.25 * beta * jnp.einsum("ij,ij->", dm, Klr)
            else:
                e = e - 0.5 * beta * jnp.einsum("sij,sij->", dm, Klr)
        if has_xc0:
            e = e + mf._exc_total(dm)
        if getattr(mf, "_pcm", None) is not None:
            e = e + mf._pcm.energy(R0, dm)
        return e

    def L_full(kappa, R):
        """Energy as a function of (kappa, R) — geometry-traced integrals
        (incl. the re-traced attenuated DF factor for RSH functionals)."""
        dm = dm_of(kappa, R, transported=True)
        e = one_e(dm, R) + e2_of(dm, R) + exc_of(dm, R) + e_nuc(R)
        if func is not None and getattr(func, "dispersion", None):
            from cctpu.dft.dispersion import dispersion_energy
            e = e + dispersion_energy(func, mol, R)
        if getattr(mf, "_pcm", None) is not None:
            e = e + mf._pcm.energy(R, dm)
        return e

    k0 = tuple(jnp.zeros((no, nmo - no)) for _, no, _ in spins)
    k0_flat, unravel = ravel_pytree(k0)
    nk = k0_flat.size

    # ---- CPHF operator: v -> L_kk @ v (nested jvp at fixed geometry) ----
    gk_fixed = jax.grad(L_fixedR)

    @jax.jit
    def mv_flat(v):
        tangent = unravel(v)
        out = jax.jvp(gk_fixed, (k0,), (tangent,))[1]
        return ravel_pytree(out)[0]

    # ---- mixed block L_kR [nk, 3N] and L_RR [3N, 3N] ----
    g_k = jax.grad(L_full, argnums=0)

    def gk_of_R(Rflat):
        return ravel_pytree(g_k(k0, Rflat.reshape(natm, 3)))[0]

    def gR_of_R(Rflat):
        return jax.grad(lambda R: L_full(k0, R))(
            Rflat.reshape(natm, 3)).ravel()

    R0f = R0.ravel()
    eye = np.eye(n3)
    L_kR = np.zeros((nk, n3))
    L_RR = np.zeros((n3, n3))
    jit_kR = jax.jit(lambda t: jax.jvp(gk_of_R, (R0f,), (t,))[1])
    jit_RR = jax.jit(lambda t: jax.jvp(gR_of_R, (R0f,), (t,))[1])
    for k in range(n3):
        t = jnp.asarray(eye[k])
        L_kR[:, k] = np.asarray(jit_kR(t))
        L_RR[:, k] = np.asarray(jit_RR(t))
    L_RR = 0.5 * (L_RR + L_RR.T)

    # ---- CG solve L_kk X = L_kR for all 3N rhs at once ----
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

    def mu_full(kflat, Rflat):
        R = Rflat.reshape(natm, 3)
        dm = dm_of(unravel(kflat), R, transported=True)
        Dtot = dm.sum(0) if dm.ndim == 3 else dm
        ints = build_int1e(mol.basis_set, R, charges, with_dipole=True)
        el = -jnp.einsum("dij,ij->d", ints["dipole"], Dtot)
        nuc = jnp.einsum("i,ix->x", charges, R)
        return el + nuc

    M_R = np.asarray(jax.jacfwd(mu_full, argnums=1)(k0_flat, R0f))  # [3,3N]
    M_k = np.asarray(jax.jacfwd(mu_full, argnums=0)(k0_flat, R0f))  # [3,nk]
    dmu_dR = (M_R - M_k @ X).T                                      # [3N, 3]
    return H, dmu_dR
