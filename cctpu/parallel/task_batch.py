"""Task-batched SCF: many geometries of one molecule in one jit, sharded
over the device mesh.

This is the TPU answer to the reference's serial python loops (SURVEY.md
§2.4): the 6N finite-difference Hessian displacements (opt-freq.py:225-267),
per-bond BDE jobs, per-distance interaction scans and per-solvent runs all
share a topology/basis, so the whole SCF (integrals -> DIIS fixed cycles ->
gradient) vmaps over the geometry axis and shards over the mesh 'task' axis
— one compiled program, T geometries, N devices.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cctpu.core.molecule import Molecule
from cctpu.ints.one_electron import build_int1e
from cctpu.ints.two_electron import build_eri_traced
from cctpu.scf.diis import diis_init, diis_update
from cctpu.scf.hf import _fock_eig, _orthogonalizer, occ_rhf


def _single_scf_with_grad(basis, charges, nelec, n_cycles, with_grad,
                          coords, dm0):
    """One RHF: fixed-cycle DIIS from dm0; returns
    (e_tot, dm, grad, converged)."""
    ints = build_int1e(basis, coords, charges)
    S = ints["S"]
    H = ints["T"] + ints["V"]
    X = _orthogonalizer(S)
    eri = build_eri_traced(basis, coords)
    e_nuc_fn = None

    def jk(dm):
        J = jnp.einsum("ijkl,kl->ij", eri, dm)
        K = jnp.einsum("ikjl,kl->ij", eri, dm)
        return J, K

    nao = S.shape[0]
    diis0 = diis_init(8, nao * nao)

    def cycle(carry, _):
        diis, dm = carry
        J, K = jk(dm)
        F = H + J - 0.5 * K
        e_elec = jnp.einsum("ij,ij->", dm, H + 0.5 * J - 0.25 * K)
        sdf = S @ dm @ F
        err = X.T @ (sdf - sdf.T) @ X
        err_norm = jnp.linalg.norm(err)
        diis, F_x = diis_update(diis, F, err)
        mo_e, mo_c = _fock_eig(F_x, X)
        occ = occ_rhf(mo_e, nelec)
        dm_new = (mo_c * occ[None, :]) @ mo_c.T
        return (diis, dm_new), (e_elec, err_norm, mo_e, mo_c)

    (diis, dm), (es, errs, mo_es, mo_cs) = jax.lax.scan(
        cycle, (diis0, dm0), None, length=n_cycles)
    mo_e = mo_es[-1]
    mo_c = mo_cs[-1]
    # convergence monitor: last DIIS error + energy drift over the final
    # two cycles (VERDICT round-1: fixed-cycle batched SCF had no check)
    err_final = errs[-1]
    de_final = jnp.abs(es[-1] - es[-2]) if n_cycles > 1 else jnp.inf

    # nuclear repulsion (traced)
    Z = charges
    natm = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + jnp.eye(natm))
    e_nuc = 0.5 * jnp.einsum("i,j,ij->", Z, Z,
                             (1.0 - jnp.eye(natm)) / dist)
    e_tot = es[-1] + e_nuc
    converged = (err_final < 1e-6) & (de_final < 1e-8)

    if not with_grad:
        return e_tot, dm, jnp.zeros_like(coords), converged

    occ = occ_rhf(mo_e, nelec)
    W = (mo_c * (occ * mo_e)[None, :]) @ mo_c.T

    def lagrangian(R):
        ints_ = build_int1e(basis, R, charges)
        H_ = ints_["T"] + ints_["V"]
        eri_ = build_eri_traced(basis, R)
        J_ = jnp.einsum("ijkl,kl->ij", eri_, dm)
        K_ = jnp.einsum("ikjl,kl->ij", eri_, dm)
        e = jnp.einsum("ij,ij->", dm, H_ + 0.5 * J_ - 0.25 * K_) \
            - jnp.einsum("ij,ij->", W, ints_["S"])
        diff_ = R[:, None, :] - R[None, :, :]
        dist_ = jnp.sqrt(jnp.sum(diff_ * diff_, -1) + jnp.eye(natm))
        e = e + 0.5 * jnp.einsum("i,j,ij->", Z, Z,
                                 (1.0 - jnp.eye(natm)) / dist_)
        return e

    grad = jax.grad(lagrangian)(coords)
    return e_tot, dm, grad, converged


def batched_rhf(mol: Molecule, coords_batch, dm0, n_cycles: int = 25,
                with_grad: bool = False, mesh: Optional[Mesh] = None):
    """Run RHF on a batch of geometries [T, natm, 3] (shared topology).

    dm0: warm-start density [nao, nao] (broadcast) or [T, nao, nao].
    Returns (e_tot [T], dm [T,n,n], grad [T,natm,3], converged [T]).
    """
    basis = mol.basis_set
    charges = jnp.asarray(mol.charges)
    nelec = mol.nelectron
    coords_batch = jnp.asarray(coords_batch)
    T = coords_batch.shape[0]
    dm0 = jnp.asarray(dm0)
    if dm0.ndim == 2:
        dm0 = jnp.broadcast_to(dm0, (T,) + dm0.shape)

    fn = partial(_single_scf_with_grad, basis, charges, nelec, n_cycles,
                 with_grad)
    vfn = jax.jit(jax.vmap(fn))

    if mesh is not None:
        shard = NamedSharding(mesh, P("task"))
        coords_batch = jax.device_put(coords_batch, shard)
        dm0 = jax.device_put(dm0, shard)
        with mesh:
            return vfn(coords_batch, dm0)
    return vfn(coords_batch, dm0)


def hessian_batched(mol: Molecule, dm0, step: float = 1e-3,
                    mesh: Optional[Mesh] = None,
                    n_cycles: int = 25):
    """Cartesian RHF Hessian: all 6N displaced gradients in ONE sharded
    batch (the reference's serial loop, TPU-parallelized)."""
    natm = mol.natm
    n3 = natm * 3
    coords = mol.coords
    batch = []
    for k in range(n3):
        for sgn in (+1, -1):
            c = coords.copy()
            c[k // 3, k % 3] += sgn * step
            batch.append(c)
    batch = np.stack(batch)
    # pad to mesh divisibility
    T = len(batch)
    ndev = 1 if mesh is None else mesh.devices.size
    npad = (-T) % ndev
    if npad:
        batch = np.concatenate([batch, np.repeat(batch[-1:], npad, 0)])
    _, _, grads, _conv = batched_rhf(mol, batch, dm0, n_cycles=n_cycles,
                              with_grad=True, mesh=mesh)
    grads = np.asarray(grads)[:T].reshape(n3, 2, n3)
    H = (grads[:, 0, :] - grads[:, 1, :]) / (2 * step)
    return 0.5 * (H + H.T)


def _single_rks(basis, charges, nelec, func, grids, grid_chunk, n_cycles,
                coords, dm0):
    """One RKS (pure or global hybrid) with traced integrals + grids:
    vmappable over geometries. Returns (e_tot, dm, converged)."""
    ints = build_int1e(basis, coords, charges)
    S = ints["S"]
    H = ints["T"] + ints["V"]
    X = _orthogonalizer(S)
    eri = build_eri_traced(basis, coords)
    ax = func.hyb

    pts, w = grids.build(coords)
    npts = pts.shape[0]
    npad = (-npts) % grid_chunk
    pts = jnp.pad(pts, ((0, npad), (0, 0)), constant_values=1e6)
    w = jnp.pad(w, (0, npad))
    pts_c = pts.reshape(-1, grid_chunk, 3)
    w_c = w.reshape(-1, grid_chunk)

    from cctpu.dft.numint import eval_ao

    def exc_total(dm):
        def body(acc, chunk):
            p, wt = chunk
            ao = eval_ao(basis, coords, p, deriv=1)
            a0 = ao[0]
            Dh = 0.5 * dm
            da = jnp.einsum("ij,pj->pi", Dh, a0)
            ra = jnp.einsum("pi,pi->p", a0, da)
            ga = jnp.stack([2 * jnp.einsum("pi,pi->p", ao[1 + d], da)
                            for d in range(3)], -1)
            saa = jnp.einsum("pd,pd->p", ga, ga)
            if func.xctype == "MGGA":
                ta = 0.25 * sum(
                    jnp.einsum("pi,ij,pj->p", ao[1 + d], dm, ao[1 + d])
                    for d in range(3))
            else:
                ta = jnp.zeros_like(ra)
            e = func.exc(ra, ra, saa, saa, saa, ta, ta)
            return acc + jnp.sum(wt * e), None

        total, _ = jax.lax.scan(body, 0.0, (pts_c, w_c))
        return total

    nao = S.shape[0]
    diis0 = diis_init(8, nao * nao)

    def cycle(carry, _):
        diis, dm = carry
        J = jnp.einsum("ijkl,kl->ij", eri, dm)
        veff = J
        e2 = 0.5 * jnp.einsum("ij,ij->", dm, J)
        if ax:
            K = jnp.einsum("ikjl,kl->ij", eri, dm)
            veff = veff - 0.5 * ax * K
            e2 = e2 - 0.25 * ax * jnp.einsum("ij,ij->", dm, K)
        if func.exc is not None:
            e2 = e2 + exc_total(dm)
            vxc = jax.grad(exc_total)(dm)
            veff = veff + 0.5 * (vxc + vxc.T)
        F = H + veff
        e_elec = jnp.einsum("ij,ij->", dm, H) + e2
        sdf = S @ dm @ F
        err = X.T @ (sdf - sdf.T) @ X
        err_norm = jnp.linalg.norm(err)
        diis, F_x = diis_update(diis, F, err)
        mo_e, mo_c = _fock_eig(F_x, X)
        occ = occ_rhf(mo_e, nelec)
        dm_new = (mo_c * occ[None, :]) @ mo_c.T
        return (diis, dm_new), (e_elec, err_norm)

    (diis, dm), (es, errs) = jax.lax.scan(cycle, (diis0, dm0), None,
                                          length=n_cycles)
    Z = charges
    natm = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + jnp.eye(natm))
    e_nuc = 0.5 * jnp.einsum("i,j,ij->", Z, Z,
                             (1.0 - jnp.eye(natm)) / dist)
    e_tot = es[-1] + e_nuc
    converged = ((errs[-1] < 1e-6)
                 & (jnp.abs(es[-1] - es[-2]) < 1e-8 if n_cycles > 1
                    else jnp.asarray(False)))
    return e_tot, dm, converged


def batched_rks(mol: Molecule, coords_batch, dm0, xc: str = "b3lyp",
                n_cycles: int = 25, grid_level: int = 2,
                grid_chunk: int = 2048, mesh: Optional[Mesh] = None):
    """Batched restricted Kohn-Sham over geometries [T, natm, 3] (shared
    topology; in-core ERIs — small/medium systems), sharded over the mesh
    'task' axis. Extends batched_rhf to DFT (VERDICT round-1 item #4).
    Returns (e_tot [T], dm [T,n,n], converged [T])."""
    from cctpu.dft.grids import Grids
    from cctpu.dft.xc import get_functional

    func = get_functional(xc)
    basis = mol.basis_set
    charges = jnp.asarray(mol.charges)
    nelec = mol.nelectron
    grids = Grids(mol, level=grid_level)
    coords_batch = jnp.asarray(coords_batch)
    T = coords_batch.shape[0]
    dm0 = jnp.asarray(dm0)
    if dm0.ndim == 2:
        dm0 = jnp.broadcast_to(dm0, (T,) + dm0.shape)

    fn = partial(_single_rks, basis, charges, nelec, func, grids,
                 grid_chunk, n_cycles)
    vfn = jax.jit(jax.vmap(fn))
    if mesh is not None:
        shard = NamedSharding(mesh, P("task"))
        coords_batch = jax.device_put(coords_batch, shard)
        dm0 = jax.device_put(dm0, shard)
        with mesh:
            return vfn(coords_batch, dm0)
    return vfn(coords_batch, dm0)
