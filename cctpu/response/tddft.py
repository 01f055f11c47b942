"""TDDFT / TDA excited states (UV-Vis), Davidson-solved.

Replaces pyscf.tdscf.TDDFT as used by the reference UV-Vis workflow
(templates/calculate_uv_spectrum.py:92-106, SURVEY.md §3.3): the A-matrix
action is an AO-basis contraction — J/K through the same builders as the
SCF, and the XC kernel as a jax.jvp through the AD vxc (no hand-coded
f_xc!). Singlet excitations of closed-shell references.

TDA (CIS-like) uses the Hermitian Davidson; full TDDFT (RPA) solves the
Casida problem via the Hermitian product form M = (A-B)^(1/2)(A+B)(A-B)^(1/2)
when (A-B) is positive definite, built with matvecs only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core.constants import HARTREE2EV
from cctpu.ints.one_electron import build_int1e
from cctpu.response.davidson import davidson


class TDDFT:
    """td = TDDFT(mf); td.nstates = N; td.kernel() — reference API shape."""

    def __init__(self, mf, nstates: int = 5, tda: bool = False,
                 singlet: bool = True):
        self.mf = mf
        self.nstates = nstates
        self.tda = tda
        self.singlet = singlet
        self.e = None                 # excitation energies (Ha)
        self.xy = None                # (X, Y) amplitudes, Y=0 for TDA
        self.converged = False

    # -- operator pieces -----------------------------------------------------
    def _setup(self):
        mf = self.mf
        C = np.array(mf.mo_coeff)
        if C.ndim == 3:
            return self._setup_unrestricted()
        self.unrestricted = False
        nocc = mf.mol.nelectron // 2
        self.Co = jnp.asarray(C[:, :nocc])
        self.Cv = jnp.asarray(C[:, nocc:])
        e = np.array(mf.mo_energy)
        self.eo = e[:nocc]
        self.ev = e[nocc:]
        self.nocc = nocc
        self.nvir = C.shape[1] - nocc
        self.ediff = (self.ev[None, :] - self.eo[:, None]).ravel()

        func = getattr(mf, "func", None)
        self.ax = 1.0 if func is None else func.hyb
        self.rsh = None if func is None else func.rsh
        self.has_xc = func is not None and func.exc is not None
        self.dm0 = mf.dm
        jk = mf._jk
        if self.rsh is not None:
            jk.prepare_lr(self.rsh[0])

        exc_total = mf._exc_total if self.has_xc else None
        Co, Cv = self.Co, self.Cv
        ax = self.ax
        ediag = (jnp.asarray(self.ev)[None, :] - jnp.asarray(self.eo)[:, None])

        def contract(P, mode):
            """Orbital-Hessian action, occ x vir block.

            TDA  : V = 2 J(P)  - ax K(P)  + 2 fxc[P]        (P = Co X Cv^T)
            A+B  : same with P -> P + P^T
            A-B  : V = -ax K(P - P^T)   (J/fxc of antisymmetric density = 0)
            The factor 2 on J/fxc is the singlet spin sum; fxc is the jvp of
            the AD vxc of E_xc[D_total], whose Hessian is half the singlet
            kernel (see derivation in tests/test_tddft.py).
            """
            if mode == "apb":
                P = P + P.T
            elif mode == "amb":
                P = P - P.T
            V = 0.0
            if self.singlet and mode != "amb":
                V = V + 2.0 * jk(P, with_k=False)[0]
            if ax:
                V = V - ax * jk(P, with_k=True)[1]
            if self.rsh is not None:
                omega, _, beta = self.rsh
                V = V - beta * jk.k_lr(P, omega)
            if self.has_xc and self.singlet and mode != "amb":
                _, fxcP = jax.jvp(lambda d: jax.grad(exc_total)(d),
                                  (self.dm0,), (P,))
                V = V + (fxcP + fxcP.T)
            return Co.T @ V @ Cv

        def make_mv(mode):
            @jax.jit
            def mv(Xb):
                def one(X):
                    P = Co @ X @ Cv.T
                    return X * ediag + contract(P, mode)
                return jax.vmap(one)(Xb)
            return mv

        self._a_mv = make_mv("tda")
        self._apb_mv = make_mv("apb")
        self._amb_mv = make_mv("amb")

    def _setup_unrestricted(self):
        """Spin-resolved excitation space (ia)_alpha + (ia)_beta — the UKS
        TDDFT the reference UV workflow inherits from pyscf.tdscf for
        radicals (templates/calculate_uv_spectrum.py:97)."""
        mf = self.mf
        self.unrestricted = True
        C = np.array(mf.mo_coeff)
        na, nb = mf.mol.nalpha, mf.mol.nbeta
        nmo = C.shape[-1]
        self.nocc_s = (na, nb)
        self.nvir_s = (nmo - na, nmo - nb)
        self.Co_s = (jnp.asarray(C[0][:, :na]), jnp.asarray(C[1][:, :nb]))
        self.Cv_s = (jnp.asarray(C[0][:, na:]), jnp.asarray(C[1][:, nb:]))
        e = np.array(mf.mo_energy)
        ed_a = (e[0][na:][None, :] - e[0][:na][:, None]).ravel()
        ed_b = (e[1][nb:][None, :] - e[1][:nb][:, None]).ravel()
        self.ediff = np.concatenate([ed_a, ed_b])
        self._sizes = (na * (nmo - na), nb * (nmo - nb))

        func = getattr(mf, "func", None)
        self.ax = 1.0 if func is None else func.hyb
        self.rsh = None if func is None else func.rsh
        self.has_xc = func is not None and func.exc is not None
        self.dm0 = mf.dm
        jk = mf._jk
        if self.rsh is not None:
            jk.prepare_lr(self.rsh[0])
        exc_total = mf._exc_total if self.has_xc else None
        Co, Cv = self.Co_s, self.Cv_s
        ax = self.ax
        ediag = (jnp.asarray(ed_a).reshape(na, nmo - na),
                 jnp.asarray(ed_b).reshape(nb, nmo - nb))

        def contract(Pa, Pb, mode):
            if mode == "apb":
                Pa, Pb = Pa + Pa.T, Pb + Pb.T
            elif mode == "amb":
                Pa, Pb = Pa - Pa.T, Pb - Pb.T
            P = jnp.stack([Pa, Pb])
            out = [0.0, 0.0]
            if mode != "amb":
                Jtot = jk(Pa + Pb, with_k=False)[0]
                if Jtot.ndim == 3:      # builder returned per-spin J
                    Jtot = Jtot[0] + Jtot[1]
                out = [Jtot, Jtot]
            if ax:
                K = jk(P, with_k=True)[1]
                out = [out[0] - ax * K[0], out[1] - ax * K[1]]
            if self.rsh is not None:
                omega, _, beta = self.rsh
                Klr = jk.k_lr(P, omega)
                out = [out[0] - beta * Klr[0], out[1] - beta * Klr[1]]
            if self.has_xc and mode != "amb":
                _, fxcP = jax.jvp(lambda d: jax.grad(exc_total)(d),
                                  (self.dm0,), (P,))
                out = [out[0] + 0.5 * (fxcP[0] + fxcP[0].T),
                       out[1] + 0.5 * (fxcP[1] + fxcP[1].T)]
            return (Co[0].T @ out[0] @ Cv[0] if not isinstance(out[0], float)
                    else jnp.zeros((na, nmo - na)),
                    Co[1].T @ out[1] @ Cv[1] if not isinstance(out[1], float)
                    else jnp.zeros((nb, nmo - nb)))

        sa, sb = self._sizes

        def make_mv(mode):
            @jax.jit
            def mv(Vb):                      # [nvec, sa+sb]
                def one(v):
                    Xa = v[:sa].reshape(na, nmo - na)
                    Xb = v[sa:].reshape(nb, nmo - nb)
                    Pa = Co[0] @ Xa @ Cv[0].T
                    Pb = Co[1] @ Xb @ Cv[1].T
                    Va, Vb_ = contract(Pa, Pb, mode)
                    ra = Xa * ediag[0] + Va
                    rb = Xb * ediag[1] + Vb_
                    return jnp.concatenate([ra.ravel(), rb.ravel()])
                return jax.vmap(one)(Vb)
            return mv

        self._a_mv = make_mv("tda")
        self._apb_mv = make_mv("apb")
        self._amb_mv = make_mv("amb")
        self.nocc = None
        self.nvir = None

    def _mv_flat(self, mv):
        if getattr(self, "unrestricted", False):
            def f(V):
                out = mv(jnp.asarray(V.T))
                return np.asarray(out).T
            return f
        no, nv = self.nocc, self.nvir

        def f(V):
            Xb = jnp.asarray(V.T.reshape(-1, no, nv))
            out = mv(Xb)
            return np.asarray(out.reshape(-1, no * nv)).T
        return f

    def _split(self, v):
        """Flat unrestricted vector -> (Xa [na,nva], Xb [nb,nvb])."""
        sa, _ = self._sizes
        na, nb = self.nocc_s
        nva, nvb = self.nvir_s
        return v[:sa].reshape(na, nva), v[sa:].reshape(nb, nvb)

    def _shape_x(self, v):
        """Flat amplitude vector -> per-spin tuple (unrestricted) or
        [no, nv] matrix (restricted)."""
        if getattr(self, "unrestricted", False):
            return self._split(v)
        return v.reshape(self.nocc, self.nvir)

    def _zeros_x(self):
        if getattr(self, "unrestricted", False):
            return self._split(np.zeros(sum(self._sizes)))
        return np.zeros((self.nocc, self.nvir))

    # -- main ----------------------------------------------------------------
    def kernel(self):
        self._setup()
        if getattr(self, "unrestricted", False):
            nov = sum(self._sizes)
        else:
            nov = self.nocc * self.nvir
        nst = min(self.nstates, nov)

        if self.tda:
            w, Y, conv = davidson(self._mv_flat(self._a_mv), self.ediff,
                                  nst, tol=1e-6)
            self.e = w
            self.xy = [(self._shape_x(Y[:, k]), self._zeros_x())
                       for k in range(nst)]
            self.converged = conv
            return self.e

        # Full TDDFT: dense Casida for small problems, paired Davidson
        # (Stratmann-Scuseria-style) beyond.
        apb = self._mv_flat(self._apb_mv)
        amb = self._mv_flat(self._amb_mv)
        if nov > 600:
            from cctpu.response.davidson import rpa_davidson
            w, xpy, xmy, conv = rpa_davidson(apb, amb, self.ediff, nst,
                                             tol=1e-6)
            self.e = w
            self.xy = [(self._shape_x(0.5 * (xpy[:, k] + xmy[:, k])),
                        self._shape_x(0.5 * (xpy[:, k] - xmy[:, k])))
                       for k in range(nst)]
            self.converged = conv
            return self.e
        # nov <= 600 from here on: dense Casida always fits
        I = np.eye(nov)
        APB = apb(I)
        AMB = amb(I)
        w2, sq = np.linalg.eigh(0.5 * (AMB + AMB.T))
        w2 = np.maximum(w2, 1e-12)
        S12 = (sq * np.sqrt(w2)[None, :]) @ sq.T
        M = S12 @ (0.5 * (APB + APB.T)) @ S12
        ww, Z = np.linalg.eigh(0.5 * (M + M.T))
        idx = np.argsort(ww)[:nst]
        self.e = np.sqrt(np.maximum(ww[idx], 0.0))
        self.xy = []
        Sm12 = (sq / np.sqrt(w2)[None, :]) @ sq.T
        for k, i in enumerate(idx):
            w = self.e[k]
            z = Z[:, i]
            # |X+Y> = (A-B)^{1/2} Z / sqrt(w);  |X-Y> = w^{-1}(A+B)|X+Y>
            xpy = S12 @ z / np.sqrt(max(w, 1e-12))
            xmy = Sm12 @ z * np.sqrt(max(w, 1e-12))
            X = 0.5 * (xpy + xmy)
            Yv = 0.5 * (xpy - xmy)
            # normalize <X|X> - <Y|Y> = 1
            nrm = X @ X - Yv @ Yv
            s = 1.0 / np.sqrt(abs(nrm)) if abs(nrm) > 1e-12 else 1.0
            self.xy.append((self._shape_x(X * s), self._shape_x(Yv * s)))
        self.converged = True
        return self.e

    # -- properties ----------------------------------------------------------
    def transition_dipoles(self):
        mf = self.mf
        ints = build_int1e(mf.mol.basis_set, mf.coords,
                           jnp.asarray(mf.mol.charges), with_dipole=True)
        r_ao = np.array(ints["dipole"])          # [3, nao, nao]
        if getattr(self, "unrestricted", False):
            r_ov = [np.einsum("pi,dpq,qa->dia", np.array(self.Co_s[s]),
                              r_ao, np.array(self.Cv_s[s]))
                    for s in range(2)]
            out = []
            for (X, Y) in self.xy:
                t = sum(np.einsum("dia,ia->d", r_ov[s],
                                  np.asarray(X[s]) + np.asarray(Y[s]))
                        for s in range(2))
                out.append(t)
            return np.array(out)
        Co = np.array(self.Co)
        Cv = np.array(self.Cv)
        r_ov = np.einsum("pi,dpq,qa->dia", Co, r_ao, Cv)
        out = []
        for (X, Y) in self.xy:
            t = np.sqrt(2.0) * np.einsum("dia,ia->d", r_ov, X + Y)
            out.append(t)
        return np.array(out)

    def oscillator_strength(self):
        t = self.transition_dipoles()
        return (2.0 / 3.0) * self.e * np.einsum("nd,nd->n", t, t)

    def analyze(self, threshold: float = 0.1, log=print):
        osc = self.oscillator_strength()
        unres = getattr(self, "unrestricted", False)
        for n, (e, f) in enumerate(zip(self.e, osc)):
            ev = e * HARTREE2EV
            nm = 1239.841984 / ev if ev > 0 else float("inf")
            log(f"Excited state {n + 1}: {ev:.4f} eV  {nm:.1f} nm  "
                f"f = {f:.4f}")
            X = self.xy[n][0]
            if unres:
                for s, tag in ((0, "a"), (1, "b")):
                    Xs = np.asarray(X[s])
                    for (i, a) in zip(*np.where(np.abs(Xs) > threshold)):
                        log(f"    {i}{tag} -> {self.nocc_s[s] + a}{tag}"
                            f"   amp {Xs[i, a]:+.3f}")
            else:
                for (i, a) in zip(*np.where(np.abs(X) > threshold)):
                    log(f"    {i} -> {self.nocc + a}   amp {X[i, a]:+.3f}")
        return osc


class TDA(TDDFT):
    def __init__(self, mf, **kw):
        kw["tda"] = True
        super().__init__(mf, **kw)
