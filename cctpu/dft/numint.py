"""Numerical integration: AO evaluation on grids and XC energy assembly.

TPU-native replacement for PySCF's numint + gpu4pyscf's CUDA grid kernels
(SURVEY.md §2.2). Layout rule learned from the v5e memory tiler: keep the
large grid-point axis LAST in every intermediate — a trailing primitive or
cartesian axis of size ~6 gets tile-padded to 128 lanes and multiplies HBM
use by ~20x. All per-group tensors here are [..., npts]; the [npts, nao]
matrix is produced by one final transpose.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from cctpu.core.basis import BasisSet, cart2sph, cart_components, nsph


def eval_ao(basis: BasisSet, coords, pts, deriv: int = 0):
    """AO values (and first derivatives) at grid points.

    Returns ao [npts, nao] if deriv=0 else [4, npts, nao] with
    (value, d/dx, d/dy, d/dz).
    """
    pts = jnp.asarray(pts)
    npts = pts.shape[0]
    nao = basis.nao
    nout = 1 if deriv == 0 else 4
    # planes in [nao, npts] layout; transpose once at the end
    planes = [jnp.zeros((nao, npts)) for _ in range(nout)]

    ptsT = pts.T                                        # [3, npts]
    for l, g in basis.groups.items():
        centers = coords[g.atom_idx]                    # [ns, 3]
        d = ptsT[None, :, :] - centers[:, :, None]      # [ns, 3, npts]
        r2 = jnp.sum(d * d, axis=1)                     # [ns, npts]
        exps = jnp.asarray(g.exps)                      # [ns, np]
        coefs = jnp.asarray(g.coefs)
        ex = jnp.exp(-exps[:, :, None] * r2[:, None, :])   # [ns, np, npts]
        R0 = jnp.einsum("sp,spn->sn", coefs, ex)        # [ns, npts]
        comps = cart_components(l)
        x, y, z = d[:, 0, :], d[:, 1, :], d[:, 2, :]
        M = jnp.stack([x ** ax * y ** ay * z ** az
                       for (ax, ay, az) in comps])      # [ncart, ns, npts]
        T = jnp.asarray(cart2sph(l))                    # [nsph, ncart]
        val = jnp.einsum("mc,csn,sn->msn", T, M, R0)    # [nsph, ns, npts]

        cols = (g.ao_start[:, None] + np.arange(nsph(l)))  # [ns, nsph]
        rows = cols.T.ravel()                           # [nsph*ns]
        planes[0] = planes[0].at[rows].set(
            val.reshape(-1, npts))

        if deriv >= 1:
            R1 = jnp.einsum("sp,sp,spn->sn", coefs, exps, ex)
            for dd in range(3):
                dmons = []
                for (ax, ay, az) in comps:
                    pw = (ax, ay, az)[dd]
                    if pw == 0:
                        dmons.append(jnp.zeros_like(x))
                    else:
                        pws = [ax, ay, az]
                        pws[dd] -= 1
                        dmons.append(pw * x ** pws[0] * y ** pws[1]
                                     * z ** pws[2])
                dM = jnp.stack(dmons)
                dval = jnp.einsum("mc,csn,sn->msn", T, dM, R0) \
                    - 2.0 * jnp.einsum("mc,csn,sn,sn->msn", T, M, R1,
                                       d[:, dd, :])
                planes[1 + dd] = planes[1 + dd].at[rows].set(
                    dval.reshape(-1, npts))

    if deriv == 0:
        return planes[0].T
    return jnp.stack([p.T for p in planes])


def eval_rho(ao, dm, xctype: str = "LDA"):
    """Density quantities on the grid from AO values.

    ao: [npts,nao] (LDA) or [4,npts,nao] (GGA/MGGA); dm symmetric.
    Returns dict with rho (+ grad [npts,3], sigma, tau as needed).
    """
    if xctype == "LDA":
        a0 = ao
        rho = jnp.einsum("pi,ij,pj->p", a0, dm, a0)
        return {"rho": rho}
    a0 = ao[0]
    Da = jnp.einsum("ij,pj->pi", dm, a0)
    rho = jnp.einsum("pi,pi->p", a0, Da)
    grad = jnp.stack([2.0 * jnp.einsum("pi,pi->p", ao[1 + d], Da)
                      for d in range(3)], axis=-1)
    out = {"rho": rho, "grad": grad,
           "sigma": jnp.einsum("pd,pd->p", grad, grad)}
    if xctype == "MGGA":
        tau = 0.5 * sum(jnp.einsum("pi,ij,pj->p", ao[1 + d], dm, ao[1 + d])
                        for d in range(3))
        out["tau"] = tau
    return out
