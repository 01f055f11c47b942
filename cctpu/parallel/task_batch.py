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
    """One RHF: fixed-cycle DIIS from dm0; returns (e_tot, dm, grad)."""
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
        diis, F_x = diis_update(diis, F, err)
        mo_e, mo_c = _fock_eig(F_x, X)
        occ = occ_rhf(mo_e, nelec)
        dm_new = (mo_c * occ[None, :]) @ mo_c.T
        return (diis, dm_new), (e_elec, mo_e, mo_c)

    (diis, dm), (es, mo_es, mo_cs) = jax.lax.scan(
        cycle, (diis0, dm0), None, length=n_cycles)
    mo_e = mo_es[-1]
    mo_c = mo_cs[-1]

    # nuclear repulsion (traced)
    Z = charges
    natm = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + jnp.eye(natm))
    e_nuc = 0.5 * jnp.einsum("i,j,ij->", Z, Z,
                             (1.0 - jnp.eye(natm)) / dist)
    e_tot = es[-1] + e_nuc

    if not with_grad:
        return e_tot, dm, jnp.zeros_like(coords)

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
    return e_tot, dm, grad


def batched_rhf(mol: Molecule, coords_batch, dm0, n_cycles: int = 25,
                with_grad: bool = False, mesh: Optional[Mesh] = None):
    """Run RHF on a batch of geometries [T, natm, 3] (shared topology).

    dm0: warm-start density [nao, nao] (broadcast) or [T, nao, nao].
    Returns (e_tot [T], dm [T,n,n], grad [T,natm,3]).
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
    _, _, grads = batched_rhf(mol, batch, dm0, n_cycles=n_cycles,
                              with_grad=True, mesh=mesh)
    grads = np.asarray(grads)[:T].reshape(n3, 2, n3)
    H = (grads[:, 0, :] - grads[:, 1, :]) / (2 * step)
    return 0.5 * (H + H.T)
