"""CASCI / CASSCF with AVAS active-space selection.

Replaces pyscf.mcscf.{CASCI, CASSCF, avas} as the reference uses them
(templates/calculate_casscf.py:74-140, SURVEY.md §7.1 item 8). TPU-first
twist: the orbital optimization treats the CASSCF energy at fixed CI
coefficients as a differentiable function of the orbital-rotation
parameters kappa (integrals re-transformed under C exp(kappa) in JAX), so
the orbital gradient is jax.grad instead of hand-coded generalized-Fock
machinery; a 2-step macro-iteration alternates FCI solves with L-BFGS
orbital relaxation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from cctpu.ints.one_electron import build_int1e
from cctpu.mcscf.fci import FCISolver


def _active_integrals(h_ao, eri_ao, C, ncore, ncas):
    """Effective core energy + active-space (h1, eri) from AO integrals."""
    Cc = C[:, :ncore]
    Ca = C[:, ncore:ncore + ncas]
    dm_core = 2.0 * Cc @ Cc.T
    J = jnp.einsum("pqrs,rs->pq", eri_ao, dm_core)
    K = jnp.einsum("prqs,rs->pq", eri_ao, dm_core)
    veff_core = J - 0.5 * K
    e_core = jnp.einsum("pq,pq->", dm_core, h_ao + 0.5 * veff_core)
    h_eff = Ca.T @ (h_ao + veff_core) @ Ca
    # sequential quarter transforms: O(nao^4 ncas) with nao^3-sized
    # intermediates instead of the one-shot 5-tensor einsum
    t = jnp.einsum("pqrs,sl->pqrl", eri_ao, Ca)
    t = jnp.einsum("pqrl,rk->pqkl", t, Ca)
    t = jnp.einsum("pqkl,qj->pjkl", t, Ca)
    eri_act = jnp.einsum("pjkl,pi->ijkl", t, Ca)
    return e_core, h_eff, eri_act


def _active_integrals_df(h_ao, B, C, ncore, ncas):
    """DF variant: B [naux, nao, nao] with (pq|rs) ~ sum_P B_pq B_rs.

    Replaces the O(nao^4 ncas) in-core transform with
    O(naux nao^2 ncas + naux ncas^4) MXU matmuls — the scaling fix for
    CASSCF beyond cc-pVDZ-size systems (VERDICT r1 weak #8).
    """
    Cc = C[:, :ncore]
    Ca = C[:, ncore:ncore + ncas]
    dm_core = 2.0 * Cc @ Cc.T
    Jp = jnp.einsum("pij,ij->p", B, dm_core)
    J = jnp.einsum("p,pij->ij", Jp, B)
    Bc = jnp.einsum("pij,jk->pik", B, Cc)            # [naux, nao, ncore]
    K = jnp.einsum("pik,pjk->ij", Bc, Bc) * 2.0
    veff_core = J - 0.5 * K
    e_core = jnp.einsum("pq,pq->", dm_core, h_ao + 0.5 * veff_core)
    h_eff = Ca.T @ (h_ao + veff_core) @ Ca
    Ba = jnp.einsum("pij,iu,jv->puv", B, Ca, Ca)     # [naux, ncas, ncas]
    eri_act = jnp.einsum("puv,pxy->uvxy", Ba, Ba)
    return e_core, h_eff, eri_act


class CASCI:
    def __init__(self, mf, ncas: int, nelecas, ncore: Optional[int] = None):
        self.mf = mf
        self.mol = mf.mol
        self.ncas = ncas
        if isinstance(nelecas, int):
            nb = (nelecas - self.mol.spin) // 2
            na = nelecas - nb
            self.nelecas = (na, nb)
        else:
            self.nelecas = tuple(nelecas)
        if ncore is None:
            ncore = (self.mol.nelectron - sum(self.nelecas)) // 2
        self.ncore = ncore
        self.fcisolver = FCISolver(ncas, self.nelecas)
        self.mo_coeff = np.array(mf.mo_coeff)
        self.e_tot = None
        self.ci = None
        self.converged = False

    def _ao_ints(self):
        """(h_ao, two_electron_factor, is_df): the 2e factor is the DF/
        Cholesky B tensor when the SCF ran density-fitted (the scalable
        path), else the in-core ERI."""
        cached = getattr(self, "_ao_ints_cache", None)
        if cached is not None:
            return cached
        mf = self.mf
        ints = build_int1e(self.mol.basis_set, mf.coords,
                           jnp.asarray(self.mol.charges))
        h_ao = ints["T"] + ints["V"]
        jk = mf._jk
        if hasattr(jk, "B"):
            self._ao_ints_cache = (h_ao, jnp.asarray(jk.B), True)
        elif hasattr(jk, "eri"):
            self._ao_ints_cache = (h_ao, jnp.asarray(jk.eri), False)
        else:
            from cctpu.ints.two_electron import build_eri_incore
            self._ao_ints_cache = (h_ao, jnp.asarray(build_eri_incore(
                self.mol.basis_set, mf.coords)), False)
        return self._ao_ints_cache

    def kernel(self, mo_coeff=None):
        if mo_coeff is not None:
            self.mo_coeff = np.array(mo_coeff)
        h_ao, g2, is_df = self._ao_ints()
        xform = _active_integrals_df if is_df else _active_integrals
        e_core, h1, eri = xform(h_ao, g2, jnp.asarray(self.mo_coeff),
                                self.ncore, self.ncas)
        self.fcisolver.nroots = getattr(self.fcisolver, "nroots", 1)
        enuc = float(self.mol.energy_nuc())
        out = self.fcisolver.kernel(np.array(h1), np.array(eri),
                                    ecore=float(e_core) + enuc)
        self.e_tot, self.ci = out
        self.converged = True
        return self.e_tot

    # analysis helpers (reference calculate_casscf.py:142-212 surface)
    def natural_occupations(self, ci=None):
        ci = ci if ci is not None else (
            self.ci[0] if isinstance(self.ci, list) else self.ci)
        dm1 = self.fcisolver.make_rdm1(ci)
        occ, _ = np.linalg.eigh(dm1)
        return occ[::-1]

    def entropy_diagnostic(self, ci=None):
        """Sum of single-orbital entanglement entropies,
        S = -sum_i [nu ln nu + (1-nu) ln(1-nu)], nu = n_i/2."""
        nu = np.clip(self.natural_occupations(ci) / 2.0, 1e-12, 1 - 1e-12)
        return float(-np.sum(nu * np.log(nu) + (1 - nu) * np.log(1 - nu)))


class CASSCF(CASCI):
    def __init__(self, mf, ncas: int, nelecas, ncore: Optional[int] = None,
                 max_cycle_macro: int = 50, conv_tol: float = 1e-7):
        super().__init__(mf, ncas, nelecas, ncore)
        self.max_cycle_macro = max_cycle_macro
        self.conv_tol = conv_tol
        self.weights = None          # state-average weights

    def state_average(self, weights: Sequence[float]):
        self.weights = np.array(weights) / np.sum(weights)
        self.fcisolver.nroots = len(weights)
        return self

    def kernel(self, mo_coeff=None):
        if mo_coeff is not None:
            self.mo_coeff = np.array(mo_coeff)
        h_ao, g2, is_df = self._ao_ints()
        xform = _active_integrals_df if is_df else _active_integrals
        enuc = float(self.mol.energy_nuc())
        nmo = self.mo_coeff.shape[1]
        ncore, ncas = self.ncore, self.ncas
        nocc = ncore + ncas

        # rotation parameters: core-active, core-virtual, active-virtual
        pairs = [(i, a) for i in range(ncore) for a in range(ncore, nmo)]
        pairs += [(t, a) for t in range(ncore, nocc) for a in range(nocc, nmo)]
        pairs = np.array(pairs)

        def orbital_energy(kappa, C0, dm1, dm2):
            K = jnp.zeros((nmo, nmo))
            K = K.at[pairs[:, 0], pairs[:, 1]].set(kappa)
            K = K - K.T
            U = jax.scipy.linalg.expm(K)
            C = C0 @ U
            e_core, h1, eri = xform(h_ao, g2, C, ncore, ncas)
            e = e_core + jnp.einsum("pq,pq->", h1, dm1) \
                + 0.5 * jnp.einsum("pqrs,pqrs->", eri, dm2)
            return e

        e_grad = jax.jit(jax.value_and_grad(orbital_energy))

        e_last = None
        for macro in range(self.max_cycle_macro):
            # 1) FCI at current orbitals
            e_core, h1, eri = xform(
                h_ao, g2, jnp.asarray(self.mo_coeff), ncore, ncas)
            out = self.fcisolver.kernel(np.array(h1), np.array(eri),
                                        ecore=float(e_core) + enuc)
            if self.weights is not None:
                es, cis = out
                e_now = float(np.dot(self.weights, es[:len(self.weights)]))
                dms = [self.fcisolver.make_rdm12(c) for c in
                       cis[:len(self.weights)]]
                dm1 = sum(w * d[0] for w, d in zip(self.weights, dms))
                dm2 = sum(w * d[1] for w, d in zip(self.weights, dms))
                self.ci = cis
                self.e_states = es
            else:
                e_now, ci = out
                dm1, dm2 = self.fcisolver.make_rdm12(ci)
                self.ci = ci
            self.e_tot = float(e_now)
            if e_last is not None and abs(e_now - e_last) < self.conv_tol:
                self.converged = True
                break
            e_last = e_now

            # 2) orbital relaxation at fixed CI (few L-BFGS steps)
            C0 = jnp.asarray(self.mo_coeff)
            d1 = jnp.asarray(dm1)
            d2 = jnp.asarray(dm2)

            def fun(k):
                e, g = e_grad(jnp.asarray(k), C0, d1, d2)
                return float(e) - enuc, np.asarray(g, dtype=np.float64)

            res = minimize(fun, np.zeros(len(pairs)), jac=True,
                           method="L-BFGS-B",
                           options={"maxiter": 12, "ftol": 1e-12})
            K = np.zeros((nmo, nmo))
            K[pairs[:, 0], pairs[:, 1]] = res.x
            K = K - K.T
            import scipy.linalg as sla
            self.mo_coeff = self.mo_coeff @ sla.expm(K)

        return self.e_tot


def avas(mf, ao_labels: Sequence[str], threshold: float = 0.2):
    """Atomic-valence active space selection (pyscf avas analog).

    ao_labels like ['C 2p', 'N 2p', 'O 2p'] select reference AOs by element
    + shell; returns (ncas, nelecas, mo_coeff) with the active orbitals
    rotated into the window, core/virtual canonical-ish.
    """
    mol = mf.mol
    basis = mol.basis_set
    labels = basis.ao_labels(mol.element_symbols)
    sel = []
    for i, lab in enumerate(labels):
        toks = lab.split()
        el = toks[1]
        shell = toks[2][:2]                  # e.g. '2p'
        for want in ao_labels:
            wel, wshell = want.split()
            if el == wel and shell.startswith(wshell):
                sel.append(i)
    sel = np.array(sorted(set(sel)), dtype=int)
    if len(sel) == 0:
        raise ValueError(f"AVAS: no AOs match {ao_labels}")

    S = np.array(mf.build_ints()["S"])
    C = np.array(mf.mo_coeff)
    nocc = mol.nelectron // 2
    # projector onto selected AOs (with AO overlap metric)
    S_sel = S[np.ix_(sel, sel)]
    S_cross = S[:, sel]
    P = S_cross @ np.linalg.inv(S_sel) @ S_cross.T
    w_occ, U_occ = np.linalg.eigh(C[:, :nocc].T @ P @ C[:, :nocc])
    w_vir, U_vir = np.linalg.eigh(C[:, nocc:].T @ P @ C[:, nocc:])
    n_act_occ = int((w_occ > threshold).sum())
    n_act_vir = int((w_vir > threshold).sum())
    Cocc = C[:, :nocc] @ U_occ          # ascending overlap: active at end
    Cvir = C[:, nocc:] @ U_vir[:, ::-1]  # active first
    mo = np.concatenate([Cocc, Cvir], axis=1)
    ncas = n_act_occ + n_act_vir
    nelecas = 2 * n_act_occ
    return ncas, nelecas, mo
