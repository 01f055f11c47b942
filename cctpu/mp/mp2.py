"""MP2 (restricted + unrestricted), in-core and density-fitted.

Replaces pyscf.mp.MP2 / gpu4pyscf.mp (reference MP2 path,
templates/calculate_energy.py:117-141 and the counterpoise interaction
workflow). DF-MP2 is the production path: (ia|jb) = sum_P B_P,ia B_P,jb is
a stack of MXU matmuls batched over occupied pairs (SURVEY.md §7.1 item 9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class MP2:
    def __init__(self, mf):
        self.mf = mf
        self.e_corr = None
        self.e_tot = None

    def kernel(self):
        mf = self.mf
        C = np.array(mf.mo_coeff)
        if C.ndim == 3:
            return self._ump2()
        nocc = mf.mol.nelectron // 2
        eo = np.array(mf.mo_energy[:nocc])
        ev = np.array(mf.mo_energy[nocc:])
        Co = jnp.asarray(C[:, :nocc])
        Cv = jnp.asarray(C[:, nocc:])

        if getattr(mf, "density_fit", False):
            B = mf._jk.B                               # [naux, n, n]
            Bov = jnp.einsum("pij,ia,jb->pab", B, Co, Cv)  # [naux,no,nv]
            ovov = jnp.einsum("pia,pjb->iajb", Bov, Bov)
        else:
            eri = mf._jk.eri
            ovov = jnp.einsum("pi,qa,rj,sb,pqrs->iajb", Co, Cv, Co, Cv,
                              jnp.asarray(eri))
        d = (eo[:, None, None, None] - ev[None, :, None, None]
             + eo[None, None, :, None] - ev[None, None, None, :])
        t = ovov / jnp.asarray(d)
        self.e_corr = float(jnp.einsum(
            "iajb,iajb->", t, 2.0 * ovov - jnp.swapaxes(ovov, 1, 3)))
        self.e_tot = float(mf.e_tot) + self.e_corr
        return self.e_corr, self.e_tot

    def _ump2(self):
        mf = self.mf
        C = np.array(mf.mo_coeff)
        na, nb = mf.mol.nalpha, mf.mol.nbeta
        occs = [na, nb]
        eri = jnp.asarray(mf._jk.eri)
        Cs = [jnp.asarray(C[s]) for s in range(2)]
        e_mo = [np.array(mf.mo_energy[s]) for s in range(2)]

        def ov_block(s1, s2):
            Co1 = Cs[s1][:, :occs[s1]]
            Cv1 = Cs[s1][:, occs[s1]:]
            Co2 = Cs[s2][:, :occs[s2]]
            Cv2 = Cs[s2][:, occs[s2]:]
            return jnp.einsum("pi,qa,rj,sb,pqrs->iajb", Co1, Cv1, Co2, Cv2,
                              eri)

        def denom(s1, s2):
            eo1 = e_mo[s1][:occs[s1]]
            ev1 = e_mo[s1][occs[s1]:]
            eo2 = e_mo[s2][:occs[s2]]
            ev2 = e_mo[s2][occs[s2]:]
            return (eo1[:, None, None, None] - ev1[None, :, None, None]
                    + eo2[None, None, :, None] - ev2[None, None, None, :])

        e = 0.0
        for s in range(2):       # same-spin
            v = ov_block(s, s)
            t = (v - jnp.swapaxes(v, 1, 3)) / jnp.asarray(denom(s, s))
            e += 0.25 * float(jnp.einsum(
                "iajb,iajb->", t, v - jnp.swapaxes(v, 1, 3)))
        v = ov_block(0, 1)       # opposite-spin
        t = v / jnp.asarray(denom(0, 1))
        e += float(jnp.einsum("iajb,iajb->", t, v))
        self.e_corr = e
        self.e_tot = float(mf.e_tot) + e
        return self.e_corr, self.e_tot
