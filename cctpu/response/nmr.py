"""NMR shielding tensors (common gauge origin) via CPHF.

Replaces pyscf.prop.nmr.NMR for the reference NMR workflow
(templates/calculate_nmr.py:90-112). Formulation:

  sigma_ab(N) = sigma^dia_ab + sigma^para_ab
  sigma^dia = (1/2c^2) Tr[D * dia_ints(N)]
  sigma^para = (1/2c^2) Tr[Dresp[a] * h01[b](N)],
  Dresp[a] = -2 (Cv v_a^T Co^T - Co v_a Cv^T),  (A-B) v_a = L_ov[a]

with v the CPHF response to the external-field angular-momentum
perturbation. For pure-imaginary (magnetic) perturbations only exact
exchange couples (Coulomb and real-functional fxc vanish on antisymmetric
densities), so the CPHF operator is exactly the TDDFT (A-B) matvec.

Constants and signs are pinned by the complex finite-field SCF oracle in
tests/test_giao_nmr.py (which exposed and fixed a factor-c error in the
original (2/c^3) para contraction) and the H-atom Lamb value
sigma = alpha^2/3 <1/r> = 17.75 ppm.

Gauge: common origin (per-nucleus by default). This class is the fallback
for cases the GIAO implementation (response/giao_nmr.py — the
pyscf.prop.nmr parity path, used by the workflow) does not cover:
meta-GGA and open shells.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from cctpu.core.constants import LIGHT_SPEED_AU as C
from cctpu.ints.magnetic import angmom_integrals, dia_integrals, \
    h01_integrals
from cctpu.response.davidson import davidson


class NMR:
    def __init__(self, mf, gauge_origin="nucleus"):
        """gauge_origin: 'nucleus' (per-nucleus origin — the accurate CGO
        choice), 'charge-center', or an explicit [3] vector."""
        self.mf = mf
        self.gauge = gauge_origin
        self.shielding = None

    def _origin_for(self, N):
        mol = self.mf.mol
        if isinstance(self.gauge, str):
            if self.gauge == "nucleus":
                return mol.coords[N]
            Z = mol.charges
            return (Z[:, None] * mol.coords).sum(0) / Z.sum()
        return np.asarray(self.gauge)

    def _cphf(self, Lov):
        """Solve (A-B) v = L_ov for each field direction (3 rhs)."""
        mf = self.mf
        td = self._td
        no, nv = td.nocc, td.nvir
        amb = td._mv_flat(td._amb_mv)
        rhs = Lov.reshape(3, no * nv).T          # [nov, 3]
        # (A-B) is SPD near a stable ground state: conjugate-gradient solve
        from scipy.sparse.linalg import LinearOperator, cg
        op = LinearOperator((no * nv, no * nv),
                            matvec=lambda x: amb(x[:, None])[:, 0])
        out = np.zeros_like(rhs)
        for k in range(3):
            x, info = cg(op, rhs[:, k], rtol=1e-8, maxiter=200)
            out[:, k] = x
        return out.T.reshape(3, no, nv)

    def kernel(self):
        mf = self.mf
        mol = mf.mol
        basis = mol.basis_set
        coords = jnp.asarray(mol.coords)
        dm = mf.dm
        Dtot = dm[0] + dm[1] if dm.ndim == 3 else dm

        from cctpu.response.tddft import TDDFT
        self._td = TDDFT(mf, nstates=1)
        self._td._setup()
        Co = np.array(self._td.Co)
        Cv = np.array(self._td.Cv)

        sig = np.zeros((mol.natm, 3, 3))
        v_cache = {}
        for N in range(mol.natm):
            R = mol.coords[N]
            G = self._origin_for(N)
            key = tuple(np.round(G, 10))
            if key not in v_cache:
                Lao = np.array(angmom_integrals(basis, coords,
                                                jnp.asarray(G)))
                Lov = np.einsum("pi,xpq,qa->xia", Co, Lao, Cv)
                v = self._cphf(Lov)
                # response density (real-antisym rep, per unit B_a):
                # perturbation rep is -l => X = -v
                v_cache[key] = np.stack([
                    -2.0 * (Cv @ v[a].T @ Co.T - Co @ v[a] @ Cv.T)
                    for a in range(3)])
            Dresp = v_cache[key]
            dia = np.array(dia_integrals(basis, coords, jnp.asarray(R),
                                         jnp.asarray(G)))
            h01 = np.array(h01_integrals(basis, coords, jnp.asarray(R)))
            s_d = (0.5 / C ** 2) * np.einsum("abpq,pq->ab", dia, Dtot)
            s_p = (0.5 / C ** 2) * np.einsum("amn,bnm->ab", Dresp, h01)
            sig[N] = s_d + s_p
        self.shielding = sig * 1e6              # ppm
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
