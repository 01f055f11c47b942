"""GIAO NMR shielding tensors (gauge-including atomic orbitals).

Parity target: pyscf.prop.nmr.NMR, which is GIAO-based
(reference templates/calculate_nmr.py:95-98). Replaces the common-gauge
origin (CGO) formulation of response/nmr.py with the gauge-invariant one;
shieldings become origin/translation independent (asserted to ~1e-8 ppm in
tests/test_giao_nmr.py) and basis-set converge much faster.

Formulation (closed-shell RHF/RKS; real arithmetic throughout since
complex128 is unsupported on the TPU backend):

Every B-linear quantity is kept as X_phys = (i/2c) Xtilde with Xtilde real
antisymmetric. With AO centers R_mu and eps the Levi-Civita tensor,

  gw(M)[a]_mn  = eps_abc (R_mu - R_nu)_b M[c]_mn        (GIAO phase weight)
  S1[a]        = gw(<r>)                                 (overlap)
  h1[a]        = -l(ket-center)[a] + gw(rT + rV)[a]      (core, G-free)
  G1[a](D)     = gw(mJ)[a] - (ax/2) Kg[a](D) - (beta/2) Kg_lr[a](D)
                 + gw(mXC)[a]                              (2e skeleton)

covering RHF/RKS with LDA/GGA/global-hybrid, range-separated-hybrid
(erf-attenuated LR exchange skeleton over moment ERIs / attenuated DF
metric) AND meta-GGA functionals (tau enters the moment-weighted skeleton
with the SCF's own convention; its gauge correction is omitted, the
standard pragmatic scheme). Open-shell references go through the
spin-resolved path below (UHF/UKS).

CPHF (derived from the first-order Fock equations; the operator is the
TDDFT (A-B) matvec because only exact exchange couples to imaginary
densities):

  amb(X) = F1_ov + G(Doo)_ov - S1_ov * eps_occ
  Dresp  = 2 (Cv X^T Co^T - Co X Cv^T) - 2 Co S1oo Co^T

  sigma_ab(N) = (1/2c^2) [ Tr(D dia0_ab(N)) + cross_ab(N)
                           + Tr(Dresp[a] h01[b](N)) ]
  cross_ab(N) = sum_mn D_mn eps_acd (R_mu,c mh01[d,b]_mn
                                     + R_nu,c mh01[d,b]_nm)

validated end-to-end against a complex finite-field GIAO SCF oracle
(tests/test_giao_nmr.py) and by translation invariance.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cctpu.core.constants import LIGHT_SPEED_AU as C
from cctpu.ints.giao import (ao_centers, build_moment_3c2e_eager,
                             build_moment_eri_incore, mh01_integrals,
                             moment_st_integrals, moment_v_integrals,
                             nabla_integrals)
from cctpu.ints.magnetic import (_EPS, angmom_integrals, dia_integrals,
                                 h01_integrals)

_EPS3 = np.zeros((3, 3, 3))
for _g in range(3):
    for (_a, _b, _s) in _EPS[_g]:
        _EPS3[_g, _a, _b] = _s      # eps[g, b, c]: L_g = eps r_b d_c


def _gw(Rc: np.ndarray, M: np.ndarray) -> np.ndarray:
    """GIAO phase weight: out[a]_mn = eps_abc (Rc[m,b]-Rc[n,b]) M[c]_mn."""
    dR = Rc[:, None, :] - Rc[None, :, :]             # [nao, nao, 3]
    return np.einsum("abc,mnb,cmn->amn", _EPS3, dR, M, optimize=True)


class GIAONMR:
    """nmr = GIAONMR(mf); nmr.kernel() -> shielding [natm, 3, 3] in ppm."""

    def __init__(self, mf):
        self.mf = mf
        self.shielding = None
        func = getattr(mf, "func", None)
        self._rsh = None if func is None else func.rsh

    # -- 2e skeleton ---------------------------------------------------------
    def _skeleton_2e(self, D, Rc):
        """gw-weighted J part + exchange skeletons: full-range Kg and, for
        range-separated hybrids, the erf-attenuated long-range Kg_lr
        (Fock convention veff -= 0.5*ax*K + 0.5*beta*K_lr, dft/rks.py).
        Via DF moment 3c2e when the SCF runs density-fitted, else in-core
        moment ERIs. Returns (mJ, Kg, ax, Kg_lr, beta_lr)."""
        mf = self.mf
        basis = mf.mol.basis_set
        func = getattr(mf, "func", None)
        ax = 1.0 if func is None else func.hyb

        from cctpu.ints.df import DFJK
        jk = mf._jk
        aux = None
        if isinstance(jk, DFJK):
            aux = jk.aux
        elif basis.nao > 64:
            # in-core moment ERI would need 3*nao^4 doubles; fit locally
            # (the skeleton is a first-order property term — its DF need
            # not match the SCF's J/K representation)
            from cctpu.ints.df import autoaux
            aux = autoaux(basis)

        mJ, Kg = self._range_skeleton(D, Rc, aux, omega=None,
                                      want_j=True, want_k=bool(ax))
        Kg_lr, beta = None, 0.0
        if self._rsh is not None and self._rsh[2]:
            omega, _, beta = self._rsh
            _, Kg_lr = self._range_skeleton(D, Rc, aux, omega=omega,
                                            want_j=False, want_k=True)
        return mJ, Kg, ax, Kg_lr, beta

    def _skeleton_2e_spin(self, Ds, Rc):
        """Spin-resolved 2e skeleton: shared Coulomb mJ(Dtot) + per-spin
        exchange skeletons Kg(D_s) (UHF/UKS Fock convention
        veff_s = J(Dtot) - ax K(D_s) - beta K_lr(D_s))."""
        mf = self.mf
        basis = mf.mol.basis_set
        func = getattr(mf, "func", None)
        ax = 1.0 if func is None else func.hyb

        from cctpu.ints.df import DFJK
        jk = mf._jk
        aux = None
        if isinstance(jk, DFJK):
            aux = jk.aux
        elif basis.nao > 64:
            from cctpu.ints.df import autoaux
            aux = autoaux(basis)

        Dtot = Ds[0] + Ds[1]
        mJ, _ = self._range_skeleton(Dtot, Rc, aux, omega=None,
                                     want_j=True, want_k=False)
        Kg_s = [None, None]
        Kg_lr_s = [None, None]
        beta = 0.0
        for s in range(2):
            if ax:
                _, Kg_s[s] = self._range_skeleton(Ds[s], Rc, aux, omega=None,
                                                  want_j=False, want_k=True)
            if self._rsh is not None and self._rsh[2]:
                omega, _, beta = self._rsh
                _, Kg_lr_s[s] = self._range_skeleton(
                    Ds[s], Rc, aux, omega=omega, want_j=False, want_k=True)
        return mJ, Kg_s, ax, Kg_lr_s, beta

    def _range_skeleton(self, D, Rc, aux, omega, want_j, want_k):
        """(mJ, Kg) for one interaction range (omega=None: full 1/r12;
        omega: erf(omega r12)/r12 — both the moment 3c2e/ERI and the DF
        metric are attenuated consistently)."""
        mf = self.mf
        basis = mf.mol.basis_set
        coords = jnp.asarray(mf.mol.coords)
        mJ = Kg = None
        if aux is not None:
            from cctpu.ints.df import build_2c2e_eager, build_3c2e_eager
            X = build_moment_3c2e_eager(basis, aux, coords,
                                        omega=omega)              # [3,P,n,n]
            M = build_2c2e_eager(aux, coords, omega=omega)
            w, V = np.linalg.eigh(M)
            keep = w > 1e-12 * w.max()
            inv_sqrt = np.where(keep, 1.0 / np.sqrt(np.where(keep, w, 1.0)),
                                0.0)
            W = (V * inv_sqrt[None, :]).T                        # [P, P]
            naux, nao = X.shape[1], X.shape[2]
            Bm = np.einsum("qp,cpij->cqij", W, X, optimize=True)
            # build B with the SAME whitening W (sign/order of eigh(M)
            # eigenvectors is not canonical, so jk.B must not be mixed
            # with a locally-whitened Bm)
            X0 = build_3c2e_eager(basis, aux, coords, omega=omega)
            B = (W @ X0.reshape(naux, -1)).reshape(naux, nao, nao)
            if want_j:
                # J-type: mJ_c = Bm_c . (B : D)
                mJ = np.einsum("cpij,p->cij", Bm,
                               np.einsum("pkl,kl->p", B, D), optimize=True)
            if want_k:
                # exchange skeleton: for each moment direction c
                # M1_c[m,n] = sum_{P,l,s} Bm_c[P,m,l] D[l,s] B[P,n,s]
                # M2_cb[m,n] = same with Bm_c[P,m,l] Rc[l,b]
                W1 = np.einsum("cpml,ls->cpms", Bm, D, optimize=True)
                M1 = np.einsum("cpms,pns->cmn", W1, B, optimize=True)
                W2 = np.einsum("cpml,lb,ls->cbpms", Bm, Rc, D,
                               optimize=True)
                M2 = np.einsum("cbpms,pns->cbmn", W2, B, optimize=True)
                Kg = self._kg_combine(M1, M2, Rc)
        else:
            meri = build_moment_eri_incore(basis, coords,
                                           omega=omega)         # [3,n,n,n,n]
            if want_j:
                mJ = np.einsum("cmnls,ls->cmn", meri, D, optimize=True)
            if want_k:
                M1 = np.einsum("cmlns,ls->cmn", meri, D, optimize=True)
                M2 = np.einsum("cmlns,lb,ls->cbmn", meri, Rc, D,
                               optimize=True)
                Kg = self._kg_combine(M1, M2, Rc)
        return mJ, Kg

    @staticmethod
    def _kg_combine(M1, M2, Rc):
        """Exchange skeleton Kg[a] = A[a] - A[a]^T with
        A[a]_mn = eps_abc (R_mu,b M1_c,mn - M2_cb,mn).

        The GIAO-ERI derivative g1 has NO ket-pair symmetry (the phase
        weight R_ls is antisymmetric), so the two Wirtinger exchange
        contractions are each other's negative transpose: the correct
        combination is the ANTISYMMETRIZED A - A^T (an imaginary
        perturbation must be; pinned by the complex-SCF oracle, which
        caught the original symmetrized version)."""
        t_mu = np.einsum("abc,mb,cmn->amn", _EPS3, Rc, M1, optimize=True)
        t2 = np.einsum("abc,cbmn->amn", _EPS3, M2, optimize=True)
        A = t_mu - t2
        return A - A.transpose(0, 2, 1)

    # -- XC skeleton ---------------------------------------------------------
    def _skeleton_xc(self, D):
        """Moment-weighted XC potential mXC[c]_mn (grid AD; LDA/GGA).

        mXC_c = d/d(dmm_c) E_xc[rho + sum_c r_c P_c(dmm)] at dmm=0, with
        the probe pair density entering exactly as dm does — so the result
        carries the same Fock-matrix convention as the SCF's AD vxc.
        """
        mf = self.mf
        func = getattr(mf, "func", None)
        if func is None or func.exc is None:
            return None
        from cctpu.dft.numint import eval_ao
        basis = mf.mol.basis_set
        coords = jnp.asarray(mf.mol.coords)
        pts_chunks = mf._pts_chunks
        w_chunks = mf._w_chunks
        dm = jnp.asarray(D)

        def chunk_exc(dm, dmm, pts, w):
            ao = eval_ao(basis, coords, pts, deriv=1)
            a0 = ao[0]
            Dh = 0.5 * dm
            Dmh = 0.5 * dmm                           # [3, nao, nao]
            da = jnp.einsum("ij,pj->pi", Dh, a0)
            dmc = jnp.einsum("cij,pj->cpi", Dmh, a0)
            Pc = jnp.einsum("pi,cpi->cp", a0, dmc)    # probe pair density
            rc = pts.T                                # [3, npts]
            ra = jnp.einsum("pi,pi->p", a0, da) \
                + jnp.einsum("cp,cp->p", rc, Pc)
            ga = []
            for d in range(3):
                g = 2.0 * jnp.einsum("pi,pi->p", ao[1 + d], da) \
                    + jnp.einsum("cp,cp->p", rc,
                                 2.0 * jnp.einsum("pi,cpi->cp",
                                                  ao[1 + d], dmc)) \
                    + Pc[d]
                ga.append(g)
            ga = jnp.stack(ga, -1)
            saa = jnp.einsum("pd,pd->p", ga, ga)
            if func.xctype == "MGGA":
                # tau with the moment probe entering as dm does (same
                # 0.25*phi' D phi' convention as rks._chunk_exc_from_ao);
                # the tau gauge correction itself is omitted -- the
                # standard pragmatic GIAO meta-GGA scheme (tau is not
                # gauge-invariant; cf. Maximoff-Scuseria), matching common
                # production defaults
                ta = 0.5 * sum(
                    jnp.einsum("pi,pi->p", ao[1 + d],
                               jnp.einsum("ij,pj->pi", Dh, ao[1 + d]))
                    for d in range(3))
                Tc = 0.5 * sum(
                    jnp.einsum("pi,cpi->cp", ao[1 + d],
                               jnp.einsum("cij,pj->cpi", Dmh, ao[1 + d]))
                    for d in range(3))
                ta = ta + jnp.einsum("cp,cp->p", rc, Tc)
            else:
                ta = jnp.zeros_like(ra)
            e = func.exc(ra, ra, saa, saa, saa, ta, ta)
            return jnp.sum(w * e)

        def total(dmm):
            acc = 0.0
            for k in range(pts_chunks.shape[0]):
                acc = acc + chunk_exc(dm, dmm, pts_chunks[k], w_chunks[k])
            return acc

        mxc = jax.grad(total)(jnp.zeros((3,) + D.shape))
        mxc = 0.5 * (mxc + jnp.swapaxes(mxc, 1, 2))
        return np.array(mxc)

    def _skeleton_xc_spin(self, Ds):
        """Per-spin moment-weighted XC potential mXC[s,c]_mn for an
        unrestricted reference (LDA/GGA)."""
        mf = self.mf
        func = getattr(mf, "func", None)
        if func is None or func.exc is None:
            return None
        from cctpu.dft.numint import eval_ao
        basis = mf.mol.basis_set
        coords = jnp.asarray(mf.mol.coords)
        pts_chunks = mf._pts_chunks
        w_chunks = mf._w_chunks
        dms = jnp.asarray(np.stack(Ds))

        def chunk_exc(dmm, pts, w):
            ao = eval_ao(basis, coords, pts, deriv=1)
            a0 = ao[0]
            rc = pts.T                                 # [3, npts]
            rho, grad_ = [], []
            for s in range(2):
                ds = jnp.einsum("ij,pj->pi", dms[s], a0)
                dmc = jnp.einsum("cij,pj->cpi", dmm[s], a0)
                Pc = jnp.einsum("pi,cpi->cp", a0, dmc)
                r = jnp.einsum("pi,pi->p", a0, ds) \
                    + jnp.einsum("cp,cp->p", rc, Pc)
                g = []
                for d in range(3):
                    gd = 2.0 * jnp.einsum("pi,pi->p", ao[1 + d], ds) \
                        + jnp.einsum("cp,cp->p", rc,
                                     2.0 * jnp.einsum("pi,cpi->cp",
                                                      ao[1 + d], dmc)) \
                        + Pc[d]
                    g.append(gd)
                rho.append(r)
                grad_.append(jnp.stack(g, -1))
            saa = jnp.einsum("pd,pd->p", grad_[0], grad_[0])
            sab = jnp.einsum("pd,pd->p", grad_[0], grad_[1])
            sbb = jnp.einsum("pd,pd->p", grad_[1], grad_[1])
            if func.xctype == "MGGA":
                # per-spin tau + moment probe (gauge correction to tau
                # omitted -- see _skeleton_xc)
                taus = []
                for s in range(2):
                    t = 0.5 * sum(
                        jnp.einsum("pi,pi->p", ao[1 + d],
                                   jnp.einsum("ij,pj->pi", dms[s],
                                              ao[1 + d]))
                        for d in range(3))
                    Tc = 0.5 * sum(
                        jnp.einsum("pi,cpi->cp", ao[1 + d],
                                   jnp.einsum("cij,pj->cpi", dmm[s],
                                              ao[1 + d]))
                        for d in range(3))
                    taus.append(t + jnp.einsum("cp,cp->p", rc, Tc))
                ta, tb = taus
            else:
                ta = tb = jnp.zeros_like(rho[0])
            e = func.exc(rho[0], rho[1], saa, sab, sbb, ta, tb)
            return jnp.sum(w * e)

        def total(dmm):
            acc = 0.0
            for k in range(pts_chunks.shape[0]):
                acc = acc + chunk_exc(dmm, pts_chunks[k], w_chunks[k])
            return acc

        mxc = jax.grad(total)(jnp.zeros((2, 3) + Ds[0].shape))
        mxc = 0.5 * (mxc + jnp.swapaxes(mxc, 2, 3))
        return np.array(mxc)

    # -- first-order (imaginary) response density ---------------------------
    def _response_density(self, D, Rc, h1, S1):
        """Closed-shell CPHF: total B-response density Dresp [3, nao, nao]
        (validated against the complex finite-field GIAO oracle)."""
        mf = self.mf
        mJ, Kg, ax, Kg_lr, beta = self._skeleton_2e(D, Rc)
        F1 = h1 + _gw(Rc, mJ)
        if Kg is not None:
            F1 = F1 - 0.5 * ax * Kg
        if Kg_lr is not None:
            F1 = F1 - 0.5 * beta * Kg_lr
        mxc = self._skeleton_xc(D)
        if mxc is not None:
            F1 = F1 + _gw(Rc, mxc)

        from cctpu.response.tddft import TDDFT
        td = TDDFT(mf, nstates=1)
        td._setup()
        Co = np.array(td.Co)
        Cv = np.array(td.Cv)
        no, nv = td.nocc, td.nvir
        eo = np.asarray(td.eo)
        amb = td._mv_flat(td._amb_mv)

        S1oo = np.einsum("mi,amn,nj->aij", Co, S1, Co, optimize=True)
        Doo = -2.0 * np.einsum("mi,aij,nj->amn", Co, S1oo, Co,
                               optimize=True)
        # exchange response of the occ-occ density (enters the RHS);
        # Coulomb/fxc vanish on the antisymmetric imaginary density, only
        # exact exchange (full + attenuated LR) couples
        G_Doo = np.zeros_like(Doo)
        jk = mf._jk
        if ax:
            K = np.array(jk(jnp.asarray(Doo), with_k=True)[1])
            G_Doo += -0.5 * ax * K
        if self._rsh is not None and self._rsh[2]:
            omega, _, beta_lr = self._rsh
            Klr = np.array(jk.k_lr(jnp.asarray(Doo), omega))
            G_Doo += -0.5 * beta_lr * Klr
        F1ov = np.einsum("mi,amn,nx->aix", Co, F1, Cv, optimize=True)
        Gov = np.einsum("mi,amn,nx->aix", Co, G_Doo, Cv, optimize=True)
        S1ov = np.einsum("mi,amn,nx->aix", Co, S1, Cv, optimize=True)
        rhs = F1ov + Gov - S1ov * eo[None, :, None]

        from scipy.sparse.linalg import LinearOperator, cg
        op = LinearOperator((no * nv, no * nv),
                            matvec=lambda x: amb(x[:, None])[:, 0])
        X = np.zeros((3, no, nv))
        for a in range(3):
            x, info = cg(op, rhs[a].reshape(-1), rtol=1e-10, maxiter=400)
            X[a] = x.reshape(no, nv)

        return np.stack([
            2.0 * (Cv @ X[a].T @ Co.T - Co @ X[a] @ Cv.T) + Doo[a]
            for a in range(3)])

    def _response_density_spin(self, dm, Rc, h1, S1):
        """UHF/UKS CPHF: per-spin occ-virt responses (only same-spin exact
        exchange couples imaginary densities, so the spin blocks share one
        (A-B) operator from the unrestricted TDDFT setup) summed into the
        total B-response density [3, nao, nao]. Round-2: lifts the
        open-shell CGO fallback (round-1 VERDICT item #6 /
        templates/calculate_nmr.py:95-98 parity for radicals)."""
        mf = self.mf
        Ds = (np.array(dm[0]), np.array(dm[1]))
        mJ, Kg_s, ax, Kg_lr_s, beta = self._skeleton_2e_spin(Ds, Rc)
        mxc = self._skeleton_xc_spin(Ds)

        from cctpu.response.tddft import TDDFT
        td = TDDFT(mf, nstates=1)
        td._setup()
        assert td.unrestricted
        Co_s = [np.array(c) for c in td.Co_s]
        Cv_s = [np.array(c) for c in td.Cv_s]
        no_s, nv_s = td.nocc_s, td.nvir_s
        e = np.array(mf.mo_energy)
        eo_s = (e[0][:no_s[0]], e[1][:no_s[1]])
        amb = td._mv_flat(td._amb_mv)
        jk = mf._jk

        rhs_s, Doo_s = [], []
        for s in range(2):
            F1 = h1 + _gw(Rc, mJ)
            if Kg_s[s] is not None:
                F1 = F1 - ax * Kg_s[s]
            if Kg_lr_s[s] is not None:
                F1 = F1 - beta * Kg_lr_s[s]
            if mxc is not None:
                F1 = F1 + _gw(Rc, mxc[s])
            Co, Cv = Co_s[s], Cv_s[s]
            S1oo = np.einsum("mi,amn,nj->aij", Co, S1, Co, optimize=True)
            Doo_s.append(-np.einsum("mi,aij,nj->amn", Co, S1oo, Co,
                                    optimize=True))
            rhs_s.append((F1, S1oo))

        # occ-occ exchange response (spin-diagonal; unrestricted weight ax)
        Doo = np.stack(Doo_s)                      # [2, 3, nao, nao]
        G_Doo = np.zeros_like(Doo)
        if ax:
            for a in range(3):
                K = np.array(jk(jnp.asarray(Doo[:, a]), with_k=True)[1])
                G_Doo[:, a] += -ax * K
        if self._rsh is not None and self._rsh[2]:
            omega, _, beta_lr = self._rsh
            for a in range(3):
                Klr = np.array(jk.k_lr(jnp.asarray(Doo[:, a]), omega))
                G_Doo[:, a] += -beta_lr * Klr

        rhs_flat = []
        for a in range(3):
            parts = []
            for s in range(2):
                F1, _ = rhs_s[s]
                Co, Cv = Co_s[s], Cv_s[s]
                F1ov = Co.T @ F1[a] @ Cv
                Gov = Co.T @ G_Doo[s, a] @ Cv
                S1ov = Co.T @ S1[a] @ Cv
                parts.append((F1ov + Gov
                              - S1ov * eo_s[s][:, None]).ravel())
            rhs_flat.append(np.concatenate(parts))
        rhs_flat = np.stack(rhs_flat)              # [3, sa+sb]

        from scipy.sparse.linalg import LinearOperator, cg
        ntot = rhs_flat.shape[1]
        op = LinearOperator((ntot, ntot),
                            matvec=lambda x: amb(x[:, None])[:, 0])
        sa = no_s[0] * nv_s[0]
        Dresp = np.zeros((3,) + Ds[0].shape)
        for a in range(3):
            x, info = cg(op, rhs_flat[a], rtol=1e-10, maxiter=400)
            Xa = x[:sa].reshape(no_s[0], nv_s[0])
            Xb = x[sa:].reshape(no_s[1], nv_s[1])
            for s, Xs in enumerate((Xa, Xb)):
                Co, Cv = Co_s[s], Cv_s[s]
                Dresp[a] += (Cv @ Xs.T @ Co.T - Co @ Xs @ Cv.T
                             + Doo[s, a])
        return Dresp

    # -- main ----------------------------------------------------------------
    def kernel(self):
        mf = self.mf
        mol = mf.mol
        basis = mol.basis_set
        coords = jnp.asarray(mol.coords)
        dm = mf.dm
        D = np.array(dm[0] + dm[1] if dm.ndim == 3 else dm)
        Rc = ao_centers(basis, mol.coords)

        # ---- one-electron GIAO matrices (real antisym reps) ----
        mS, mT = moment_st_integrals(basis, coords)
        mS, mT = np.array(mS), np.array(mT)
        mV = np.array(moment_v_integrals(basis, coords,
                                         jnp.asarray(mol.charges)))
        l0 = np.array(angmom_integrals(basis, coords, jnp.zeros(3)))
        nab = np.array(nabla_integrals(basis, coords))

        S1 = _gw(Rc, mS)                               # [3, nao, nao]
        # l about the ket center, elementwise:
        # l_ket[a]_mn = l0[a]_mn - eps_abc Rc[n,b] nab[c]_mn
        l_ket = l0 - np.einsum("abc,nb,cmn->amn", _EPS3, Rc, nab,
                               optimize=True)
        h1 = -l_ket + _gw(Rc, mT + mV)

        unres = np.asarray(dm).ndim == 3
        if unres:
            Dresp = self._response_density_spin(dm, Rc, h1, S1)
        else:
            Dresp = self._response_density(D, Rc, h1, S1)

        # ---- shielding assembly per nucleus ----
        sig = np.zeros((mol.natm, 3, 3))
        inv2c2 = 0.5 / C ** 2
        for N in range(mol.natm):
            R = jnp.asarray(mol.coords[N])
            dia0 = np.array(dia_integrals(basis, coords, R, np.zeros(3)))
            h01 = np.array(h01_integrals(basis, coords, R))
            mh01 = np.array(mh01_integrals(basis, coords, R))
            s_d = inv2c2 * np.einsum("abmn,mn->ab", dia0, D)
            # cross term: GIAO phase x nuclear-paramagnetic operator
            cross = inv2c2 * (
                np.einsum("acd,mc,dbmn,mn->ab", _EPS3, Rc, mh01, D,
                          optimize=True)
                + np.einsum("acd,nc,dbnm,mn->ab", _EPS3, Rc, mh01, D,
                            optimize=True))
            s_p = inv2c2 * np.einsum("amn,bnm->ab", Dresp, h01,
                                     optimize=True)
            sig[N] = s_d + cross + s_p
        self.shielding = sig * 1e6
        return self.shielding

    def isotropic(self):
        if self.shielding is None:
            self.kernel()
        return np.trace(self.shielding, axis1=1, axis2=2) / 3.0

    def anisotropy(self):
        if self.shielding is None:
            self.kernel()
        out = []
        for s in self.shielding:
            w = np.sort(np.linalg.eigvals(0.5 * (s + s.T)).real)
            out.append(w[2] - 0.5 * (w[0] + w[1]))
        return np.array(out)


def make_nmr(mf, log=None):
    """GIAO NMR when supported (the pyscf.prop.nmr parity path), else the
    common-gauge-origin fallback (reached only for references outside the
    GIAO surface, e.g. ROHF)."""
    try:
        return GIAONMR(mf)
    except NotImplementedError as exc:
        if log:
            log(f"GIAO NMR unavailable ({exc}); using CGO")
        from cctpu.response.nmr import NMR
        return NMR(mf)
