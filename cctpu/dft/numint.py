"""Numerical integration: AO evaluation on grids and XC energy assembly.

TPU-native replacement for PySCF's numint + gpu4pyscf's CUDA grid kernels
(SURVEY.md §2.2): AO values on a grid chunk are dense [npts, nao] matrices
built per angular-momentum group (static shapes, einsum onto the MXU), and
the XC contribution to the Fock matrix is obtained by AD of the scalar
E_xc[D] — one jax.grad instead of hand-coded vrho/vsigma/vtau chain rules.
"""

from __future__ import annotations

from typing import List, Tuple

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
    planes = [jnp.zeros((npts, nao)) for _ in range(nout)]

    for l, g in basis.groups.items():
        centers = coords[g.atom_idx]                     # [ns, 3]
        d = pts[:, None, :] - centers[None, :, :]        # [npts, ns, 3]
        r2 = jnp.sum(d * d, axis=-1)                     # [npts, ns]
        # radial parts: R0 = sum_p c_p exp(-a_p r^2); R1 = sum_p c_p a_p exp
        ex = jnp.exp(-jnp.asarray(g.exps)[None, :, :] * r2[:, :, None])
        R0 = jnp.einsum("sp,nsp->ns", jnp.asarray(g.coefs), ex)
        comps = cart_components(l)
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        M = jnp.stack([x ** ax * y ** ay * z ** az
                       for (ax, ay, az) in comps], axis=-1)
        T = jnp.asarray(cart2sph(l))                     # [nsph, ncart]
        val = jnp.einsum("ns,nsc,mc->nsm", R0, M, T)     # [npts, ns, nsph]

        cols = (g.ao_start[:, None] + np.arange(nsph(l))).ravel()
        planes[0] = planes[0].at[:, cols].set(val.reshape(npts, -1))

        if deriv >= 1:
            R1 = jnp.einsum("sp,sp,nsp->ns", jnp.asarray(g.coefs),
                            jnp.asarray(g.exps), ex)
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
                dM = jnp.stack(dmons, axis=-1)
                dval = jnp.einsum("ns,nsc,mc->nsm", R0, dM, T) \
                    - 2.0 * jnp.einsum("ns,ns,nsc,mc->nsm", R1, d[..., dd],
                                       M, T)
                planes[1 + dd] = planes[1 + dd].at[:, cols].set(
                    dval.reshape(npts, -1))

    return planes[0] if deriv == 0 else jnp.stack(planes)


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
