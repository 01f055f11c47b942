"""Analytic nuclear gradients for HF/DFT via AD of the integral builders.

TPU-native replacement for libcint's derivative integrals + PySCF's
Gradients classes (reference hot loop #1, SURVEY.md §3.2): the standard
analytic-gradient expression

  dE/dR = Tr[D dH/dR] + 1/2 Tr[D dJ/dR D] - (ax/4) Tr[D dK/dR D]
        + dExc/dR|_D - Tr[W dS/dR] + dEnuc/dR

is obtained as ONE jax.grad of a scalar "gradient Lagrangian" L(R) evaluated
at the converged density D and energy-weighted density W — every integral
derivative comes from AD through the McMurchie–Davidson recursions, and the
XC term includes Becke-weight derivatives automatically because the grid
build is traced through the coordinates. No CPHF is needed for SCF
gradients (Hellmann–Feynman + Pulay closure).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.ints.one_electron import build_int1e
from cctpu.ints.two_electron import energy_2e_direct


def _glog(phase: str):
    """Opt-in gradient phase/memory logging (CCTPU_GRAD_LOG=1)."""
    import os
    if os.environ.get("CCTPU_GRAD_LOG", "0") != "1":
        return
    import sys
    try:
        st = jax.devices()[0].memory_stats()
        mem = f"{st['bytes_in_use'] / 1e9:.2f}/{st['bytes_limit'] / 1e9:.0f} GB"
    except Exception:
        mem = "?"
    print(f"# grad: {phase} (hbm {mem})", file=sys.stderr, flush=True)


def _energy_weighted_dm(mf):
    if mf.mo_coeff.ndim == 3:        # unrestricted
        W = 0.0
        for s in range(2):
            C = mf.mo_coeff[s]
            w = mf.mo_occ[s] * mf.mo_energy[s]
            W = W + (C * w[None, :]) @ C.T
        return W
    C = mf.mo_coeff
    w = mf.mo_occ * mf.mo_energy
    return (C * w[None, :]) @ C.T


def gradient(mf):
    """Dispatch: eager per-class accumulation on the TPU backend (the
    remote compiler can't digest the whole Lagrangian as one module),
    single traced module elsewhere. DF gradients stay traced."""
    try:
        import jax as _jax
        platform = _jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    df = getattr(mf, "density_fit", False)
    basis_df = df not in (False, None, "cd")   # 'cd' gradients go direct
    if basis_df and getattr(mf, "_jk", None) is not None \
            and getattr(mf._jk, "_B32", None) is not None \
            and mf._jk._B32.ndim != 3:
        # CompressedDFJK stores B pair-compressed (2-D [naux, npair]);
        # df_e2_gradient_eager assumes the dense [naux, nao, nao] layout
        # (ADVICE r4 high). Until the compressed layout is supported,
        # fall back to the traced DF Lagrangian (pre-r4 behavior) —
        # slower and compile-heavy on the remote TPU, but correct.
        import warnings
        warnings.warn(
            "cctpu.grad: compressed DF layout not yet supported by the "
            "eager DF gradient; falling back to the traced path",
            stacklevel=2)
        return scf_gradient(mf)
    if platform in ("tpu", "axon"):
        return jnp.asarray(scf_gradient_eager(mf, df=basis_df))
    return scf_gradient(mf)


def scf_gradient_eager(mf, df: bool = False) -> np.ndarray:
    """Nuclear gradient assembled term-by-term with per-class compiled
    pieces (TPU-friendly: no single giant module; serialized dispatch).

    Same math as scf_gradient; preferred on the axon TPU where one
    whole-Lagrangian module overwhelms the remote compiler. With
    ``df=True`` the 2e term differentiates the DENSITY-FITTED energy
    (grad/df_grad.py) — consistent with the production DF SCF and the
    path the north-star SCF+gradient benchmark times.
    """
    from cctpu.ints.two_electron import energy_2e_grad_eager

    mol = mf.mol
    basis = mol.basis_set
    charges = jnp.asarray(mol.charges)
    dm = mf.dm
    spin_resolved = dm.ndim == 3
    Dtot = dm[0] + dm[1] if spin_resolved else dm
    W = _energy_weighted_dm(mf)
    func = getattr(mf, "func", None)
    ax = 1.0 if func is None else func.hyb
    has_xc = func is not None and func.exc is not None

    def one_e(R):
        ints = build_int1e(basis, R, charges)
        return (jnp.einsum("ij,ij->", Dtot, ints["T"] + ints["V"])
                - jnp.einsum("ij,ij->", W, ints["S"]))

    _glog("1e start")
    g = np.array(jax.grad(one_e)(jnp.asarray(mol.coords)))
    _glog("1e done")
    if df:
        from cctpu.grad.df_grad import df_e2_gradient_eager
        g += df_e2_gradient_eager(mf)     # includes the RSH LR term
        _glog("df 2e done")
    else:
        g += energy_2e_grad_eager(basis, mol.coords, dm, k_weight=ax)
        if func is not None and func.rsh is not None:
            # LR exchange term: [E(J_lr - beta/2 K_lr)] - [E(J_lr)]
            # isolates -beta/2 Tr[D K_lr D] with the attenuated builders
            omega, _, beta_r = func.rsh
            g += energy_2e_grad_eager(basis, mol.coords, dm,
                                      k_weight=beta_r, omega=omega)
            g -= energy_2e_grad_eager(basis, mol.coords, dm, k_weight=0.0,
                                      omega=omega)
    if func is not None and getattr(func, "dispersion", None):
        from cctpu.dft.dispersion import dispersion_energy
        g += np.asarray(jax.grad(
            lambda R: dispersion_energy(func, mol, R))(
                jnp.asarray(mol.coords)))
    if has_xc:
        _glog("xc start")
        g += np.asarray(jax.grad(
            lambda R: mf.exc_of_coords(R, dm))(jnp.asarray(mol.coords)))
        _glog("xc done")
    if getattr(mf, "_pcm", None) is not None:
        g += np.asarray(jax.grad(
            lambda R: mf._pcm.energy(R, dm))(jnp.asarray(mol.coords)))
    g += np.asarray(jax.grad(
        lambda R: mol.energy_nuc(R))(jnp.asarray(mol.coords)))
    _glog("all done")
    return g


def scf_gradient(mf) -> jnp.ndarray:
    """Nuclear gradient [natm, 3] of a converged SCF object (RHF/UHF/ROHF/
    RKS/UKS, in-core or DF)."""
    mol = mf.mol
    basis = mol.basis_set
    charges = jnp.asarray(mol.charges)
    dm = mf.dm
    spin_resolved = dm.ndim == 3
    Dtot = dm[0] + dm[1] if spin_resolved else dm
    W = _energy_weighted_dm(mf)

    func = getattr(mf, "func", None)
    if func is None:
        ax = 1.0
        has_xc = False
    else:
        ax = func.hyb
        has_xc = func.exc is not None

    use_df = getattr(mf, "density_fit", False) not in (False, None, "cd")
    if not use_df:
        from cctpu.ints.two_electron import pair_classes, schwarz_q
        screen_qs = schwarz_q(pair_classes(basis), mol.coords)
    else:
        screen_qs = None

    def lagrangian(R):
        ints = build_int1e(basis, R, charges)
        H = ints["T"] + ints["V"]
        e = jnp.einsum("ij,ij->", Dtot, H) - jnp.einsum("ij,ij->", W,
                                                        ints["S"])
        if use_df:
            from cctpu.ints.df import build_2c2e, build_3c2e
            aux = mf._jk.aux
            X = build_3c2e(basis, aux, R)
            M = build_2c2e(aux, R)
            w_, V_ = jnp.linalg.eigh(M)
            keep = w_ > 1e-12 * jnp.max(w_)
            inv_sqrt = jnp.where(keep,
                                 1.0 / jnp.sqrt(jnp.where(keep, w_, 1.0)), 0.0)
            naux, nao = X.shape[0], X.shape[1]
            B = ((V_ * inv_sqrt[None, :]).T @ X.reshape(naux, -1)
                 ).reshape(naux, nao, nao)
            Jp = jnp.einsum("pij,ij->p", B, Dtot)
            e2 = 0.5 * jnp.dot(Jp, Jp)
            if ax or (func is not None and func.rsh is not None):
                dms = dm if spin_resolved else 0.5 * dm[None].repeat(2, 0)
            if ax:
                ek = sum(jnp.einsum("pik,kl,pjl,ij->", B, dms[s], B, dms[s])
                         for s in range(2))
                e2 = e2 - 0.5 * ax * ek
            if func is not None and func.rsh is not None:
                omega_r, _, beta_r = func.rsh
                X_lr = build_3c2e(basis, aux, R, omega=omega_r)
                M_lr = build_2c2e(aux, R, omega=omega_r)
                wl, Vl = jnp.linalg.eigh(M_lr)
                keepl = wl > 1e-10 * jnp.max(wl)
                invl = jnp.where(keepl,
                                 1.0 / jnp.sqrt(jnp.where(keepl, wl, 1.0)),
                                 0.0)
                Bl = ((Vl * invl[None, :]).T @ X_lr.reshape(naux, -1)
                      ).reshape(naux, nao, nao)
                ekl = sum(jnp.einsum("pik,kl,pjl,ij->", Bl, dms[s], Bl,
                                     dms[s]) for s in range(2))
                e2 = e2 - 0.5 * beta_r * ekl
        else:
            e2 = energy_2e_direct(basis, R, dm, k_weight=ax,
                                  screen_qs=screen_qs)
            if func is not None and func.rsh is not None:
                omega_r, _, beta_r = func.rsh
                e2 = e2 + (energy_2e_direct(basis, R, dm, k_weight=beta_r,
                                            omega=omega_r,
                                            screen_qs=screen_qs)
                           - energy_2e_direct(basis, R, dm, k_weight=0.0,
                                              omega=omega_r,
                                              screen_qs=screen_qs))
        e = e + e2
        if func is not None and getattr(func, "dispersion", None):
            from cctpu.dft.dispersion import dispersion_energy
            e = e + dispersion_energy(func, mol, R)
        if has_xc:
            e = e + mf.exc_of_coords(R, dm)
        if getattr(mf, "_pcm", None) is not None:
            # solvation term traced through coords: cavity points follow
            # the atoms and the switching function is smooth, so in-solvent
            # geometry optimization gets consistent gradients (reference
            # PCM-opt path, calculate_solvent_effect.py:116-131)
            e = e + mf._pcm.energy(R, dm)
        e = e + mol.energy_nuc(R)
        return e

    return jax.grad(lagrangian)(jnp.asarray(mol.coords))
