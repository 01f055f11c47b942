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


def _df_jk_factory(basis, aux, Linv, coords):
    """Traced DF J/K closure (and its factor B): B(R) = Linv0 @ X3(R)
    with a HOST-computed whitening factor (the device must never factor
    the ill-conditioned autoaux metric — round-2 postmortem,
    ints/df.metric_factor). Fully differentiable w.r.t. coords through
    the 3c2e integrals; the frozen metric makes E(R) a smooth frozen-fit
    surface whose AD gradients / FD second derivatives are
    self-consistent."""
    from cctpu.ints.df import build_3c2e

    naux = aux.nao
    X3 = build_3c2e(basis, aux, coords)
    B = (Linv @ X3.reshape(naux, -1)).reshape(
        Linv.shape[0], X3.shape[1], X3.shape[2])

    def jk(dm):
        Jp = jnp.einsum("pij,ij->p", B, dm)
        J = jnp.einsum("p,pij->ij", Jp, B)
        K = jnp.einsum("pik,kl,pjl->ij", B, dm, B)
        return J, K

    return jk, B


def _single_scf_with_grad(basis, charges, nelec, n_cycles, with_grad,
                          df_aux, coords, dm0, Linv=None,
                          with_mp2: bool = False):
    """One RHF: fixed-cycle DIIS from dm0; returns
    (e_tot, dm, grad, converged). df_aux: None for in-core nao^4 ERIs, or
    an auxiliary BasisSet for the DF path (B = Linv @ 3c2e, O(naux*nao^2)
    memory — lifts the in-core gate from FD-Hessian/BDE-tier batches,
    VERDICT r2 next-round item #8). with_mp2 (requires df_aux): adds the
    DF-MP2 correlation energy from the final MOs — makes the MP2
    interaction scan batchable (VERDICT r2 missing #5; reference runs it
    serially, templates/calculate_interaction.py:241-252)."""
    ints = build_int1e(basis, coords, charges)
    S = ints["S"]
    H = ints["T"] + ints["V"]
    X = _orthogonalizer(S)

    if df_aux is not None:
        jk, B_df = _df_jk_factory(basis, df_aux, Linv, coords)
    else:
        eri = build_eri_traced(basis, coords)

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

    if with_mp2:
        # DF-MP2 from the final MOs: (ia|jb) = sum_P W[P,ia] W[P,jb]
        no = nelec // 2
        Co, Cv = mo_c[:, :no], mo_c[:, no:]
        eo, ev = mo_e[:no], mo_e[no:]
        Wov = jnp.einsum("pmn,mi,na->pia", B_df, Co, Cv)
        iajb = jnp.einsum("pia,pjb->iajb", Wov, Wov)
        denom = (eo[:, None, None, None] - ev[None, :, None, None]
                 + eo[None, None, :, None] - ev[None, None, None, :])
        t2 = iajb / denom
        e_tot = e_tot + jnp.sum(
            t2 * (2.0 * iajb - jnp.swapaxes(iajb, 1, 3)))

    if not with_grad:
        return e_tot, dm, jnp.zeros_like(coords), converged

    occ = occ_rhf(mo_e, nelec)
    W = (mo_c * (occ * mo_e)[None, :]) @ mo_c.T

    def lagrangian(R):
        ints_ = build_int1e(basis, R, charges)
        H_ = ints_["T"] + ints_["V"]
        if df_aux is not None:
            J_, K_ = _df_jk_factory(basis, df_aux, Linv, R)[0](dm)
        else:
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


def _df_setup(mol, coords_batch, frozen: bool):
    """Auxiliary basis + HOST-computed whitening factor(s) for the batched
    DF path. frozen=True: ONE factor from the parent metric (FD-Hessian
    displacements — AD/FD self-consistent frozen-fit surface, VERDICT r2
    item #8). frozen=False: one factor per geometry (energy-only sweeps
    whose geometries differ by more than a displacement), zero-padded to
    a common row count so the batch vmaps."""
    from cctpu.ints.df import autoaux, build_2c2e_device, metric_factor

    aux = autoaux(mol.basis_set)
    if frozen:
        M = build_2c2e_device(aux, jnp.asarray(mol.coords))
        return aux, jnp.asarray(metric_factor(M))
    Ls = []
    for c in np.asarray(coords_batch):
        M = build_2c2e_device(aux, jnp.asarray(c))
        Ls.append(np.asarray(metric_factor(M)))
    nk = max(L.shape[0] for L in Ls)
    out = np.zeros((len(Ls), nk, aux.nao))
    for t, L in enumerate(Ls):
        out[t, :L.shape[0]] = L
    return aux, jnp.asarray(out)


def batched_rhf(mol: Molecule, coords_batch, dm0, n_cycles: int = 25,
                with_grad: bool = False, mesh: Optional[Mesh] = None,
                df: bool = False, df_frozen_metric: bool = True,
                with_mp2: bool = False):
    """Run RHF on a batch of geometries [T, natm, 3] (shared topology).

    dm0: warm-start density [nao, nao] (broadcast) or [T, nao, nao].
    df: density-fitted J/K (O(naux*nao^2) per task instead of the in-core
    nao^4 trace — the memory gate-lifter for FD-Hessian batches).
    with_mp2: add DF-MP2 correlation to e_tot (implies df).
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

    df = df or with_mp2
    aux = Linv = None
    if df:
        aux, Linv = _df_setup(mol, coords_batch, df_frozen_metric)
    fn = partial(_single_scf_with_grad, basis, charges, nelec, n_cycles,
                 with_grad, aux, with_mp2=with_mp2)
    if df:
        # Linv threads as an ARGUMENT (a closure constant this size would
        # inline into the serialized HLO — the axon HTTP-413 failure mode)
        vfn = jax.jit(jax.vmap(
            fn, in_axes=(0, 0, None if df_frozen_metric else 0)))
        args = [coords_batch, dm0, Linv]
        sharded = [True, True, not df_frozen_metric]
    else:
        vfn = jax.jit(jax.vmap(fn))
        args = [coords_batch, dm0]
        sharded = [True, True]

    if mesh is not None:
        shard = NamedSharding(mesh, P("task"))
        args = [jax.device_put(a, shard) if s else a
                for a, s in zip(args, sharded)]
        with mesh:
            return vfn(*args)
    return vfn(*args)


def hessian_batched(mol: Molecule, dm0, step: float = 1e-3,
                    mesh: Optional[Mesh] = None,
                    n_cycles: int = 25, df: bool = False):
    """Cartesian RHF Hessian: all 6N displaced gradients in ONE sharded
    batch (the reference's serial loop, TPU-parallelized). df=True runs
    every displacement on the parent-geometry frozen-metric DF surface
    (O(naux*nao^2) instead of nao^4 per task)."""
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
                                     with_grad=True, mesh=mesh, df=df,
                                     df_frozen_metric=True)
    grads = np.asarray(grads)[:T].reshape(n3, 2, n3)
    H = (grads[:, 0, :] - grads[:, 1, :]) / (2 * step)
    return 0.5 * (H + H.T)


def _single_rks(basis, charges, nelec, func, grids, grid_chunk, n_cycles,
                df_aux, coords, dm0, Linv=None):
    """One RKS (pure or global hybrid) with traced integrals + grids:
    vmappable over geometries. Returns (e_tot, dm, converged). df_aux:
    DF J/K with a host-whitened factor (see _single_scf_with_grad)."""
    ints = build_int1e(basis, coords, charges)
    S = ints["S"]
    H = ints["T"] + ints["V"]
    X = _orthogonalizer(S)
    if df_aux is not None:
        df_jk = _df_jk_factory(basis, df_aux, Linv, coords)[0]
    else:
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
        if df_aux is not None:
            J, K = df_jk(dm)
        else:
            J = jnp.einsum("ijkl,kl->ij", eri, dm)
            K = jnp.einsum("ikjl,kl->ij", eri, dm) if ax else None
        veff = J
        e2 = 0.5 * jnp.einsum("ij,ij->", dm, J)
        if ax:
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
                grid_chunk: int = 2048, mesh: Optional[Mesh] = None,
                df: bool = False, df_frozen_metric: bool = False):
    """Batched restricted Kohn-Sham over geometries [T, natm, 3] (shared
    topology), sharded over the mesh 'task' axis. Extends batched_rhf to
    DFT (VERDICT round-1 item #4). df=True swaps the in-core nao^4 ERI
    trace for DF J/K (host-whitened metric; frozen parent metric for
    displacement batches, per-geometry otherwise) — lifts the memory gate
    from the b3lyp BDE tier and FD batches (VERDICT r2 item #8).
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

    aux = Linv = None
    if df:
        aux, Linv = _df_setup(mol, coords_batch, df_frozen_metric)
    fn = partial(_single_rks, basis, charges, nelec, func, grids,
                 grid_chunk, n_cycles, aux)
    if df:
        vfn = jax.jit(jax.vmap(
            fn, in_axes=(0, 0, None if df_frozen_metric else 0)))
        args = [coords_batch, dm0, Linv]
        sharded = [True, True, not df_frozen_metric]
    else:
        vfn = jax.jit(jax.vmap(fn))
        args = [coords_batch, dm0]
        sharded = [True, True]
    if mesh is not None:
        shard = NamedSharding(mesh, P("task"))
        args = [jax.device_put(a, shard) if s else a
                for a, s in zip(args, sharded)]
        with mesh:
            return vfn(*args)
    return vfn(*args)


# ----------------------------------------------------------------------------
# Masked fragment batching: the whole BDE sweep as ONE batched solve
# ----------------------------------------------------------------------------

def ao_mask_for_atoms(basis, atom_ids) -> np.ndarray:
    """[nao] 0/1 mask selecting the AOs centered on `atom_ids`."""
    from cctpu.ints.one_electron import nsph as _nsph
    mask = np.zeros(basis.nao)
    ids = set(int(a) for a in atom_ids)
    for sh in basis.shells:
        if sh.atom in ids:
            mask[sh.ao_start:sh.ao_start + 2 * sh.l + 1] = 1.0
    return mask


def _single_uks_masked(n_cycles, S, T, V_atoms, jk_fn, exc_fn, ax, coords,
                       big, Z, mask, na, nb, dm0):
    """One basis-masked unrestricted SCF, vmappable over fragment tasks.

    All tasks share the parent geometry/basis (the BDE mmff tier inherits
    parent coordinates, reference calculate_bde.py:302-313), so S, T, the
    per-atom nuclear-attraction components V_atoms [natm, nao, nao] and the
    ERI/DF tensors are built ONCE. A fragment is (Z zeroed on ghost atoms,
    AO mask M): masked rows/cols of S and F are replaced by decoupled unit
    diagonals pushed to +``big`` Ha, so its orbitals are never occupied and
    the real-block problem equals the fragment-only-basis SCF exactly.
    Occupations use traced (na, nb) — one compile covers every fragment.
    """
    nao = S.shape[0]
    m2 = mask[:, None] * mask[None, :]
    V = jnp.einsum("a,aij->ij", Z, V_atoms)
    H = (T + V) * m2
    Sm = S * m2 + jnp.diag(1.0 - mask)
    X = _orthogonalizer(Sm)
    shift = jnp.diag((1.0 - mask) * big)

    diis0 = diis_init(8, 2 * nao * nao)

    def fock(dm_s):
        J, K = jk_fn(dm_s)
        veff = jnp.stack([J - ax * K[0], J - ax * K[1]])
        e2 = 0.5 * jnp.einsum("ij,ij->", dm_s[0] + dm_s[1], J) \
            - 0.5 * ax * jnp.einsum("sij,sij->", dm_s, K)
        if exc_fn is not None:
            e2 = e2 + exc_fn(dm_s)
            vxc = jax.grad(exc_fn)(dm_s)
            vxc = 0.5 * (vxc + jnp.swapaxes(vxc, 1, 2))
            veff = veff + vxc
        F = (H[None] + veff) * m2[None] + shift[None]
        e_elec = jnp.einsum("sij,ij->", dm_s, H) + e2
        return F, e_elec

    def cycle(carry, _):
        diis, dm_s = carry
        F, e_elec = fock(dm_s)
        errs = []
        for s in range(2):
            sdf = Sm @ dm_s[s] @ F[s]
            errs.append(X.T @ (sdf - sdf.T) @ X)
        err = jnp.stack(errs)
        err_norm = jnp.linalg.norm(err)
        diis, F_x = diis_update(diis, F, err)
        F_x = F_x.reshape(2, nao, nao)
        dms = []
        for s, nocc in ((0, na), (1, nb)):
            mo_e, mo_c = _fock_eig(F_x[s], X)
            occ = (jnp.arange(nao) < nocc) * 1.0
            dms.append((mo_c * occ[None, :]) @ mo_c.T)
        dm_new = jnp.stack(dms)
        return (diis, dm_new), (e_elec, err_norm)

    (_, dm_s), (es, errs) = jax.lax.scan(cycle, (diis0, dm0), None,
                                         length=n_cycles)
    natm = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, -1) + jnp.eye(natm))
    e_nuc = 0.5 * jnp.einsum("i,j,ij->", Z, Z,
                             (1.0 - jnp.eye(natm)) / dist)
    e_tot = es[-1] + e_nuc
    converged = (errs[-1] < 1e-6) & (jnp.abs(es[-1] - es[-2]) < 1e-9)
    return e_tot, dm_s, converged


def batched_fragment_scf(mol: Molecule, Z_batch, mask_batch, na_batch,
                         nb_batch, xc: Optional[str] = None,
                         density_fit: bool = False, n_cycles: int = 45,
                         grid_level: int = 2, grid_chunk: int = 2048,
                         mesh: Optional[Mesh] = None):
    """Parent + fragment SCFs as one sharded batch (BDE sweep batching,
    round-1 VERDICT item #5; replaces the reference's serial per-bond loop
    calculate_bde.py:574-583 at the mmff tier).

    Z_batch [T, natm]: effective charges (0 on each task's ghost atoms);
    mask_batch [T, nao]; na/nb_batch [T] spin occupations.
    Returns (e_tot [T], converged [T]).
    """
    basis = mol.basis_set
    coords = jnp.asarray(mol.coords)
    charges = np.asarray(mol.charges, dtype=float)
    natm = mol.natm

    from cctpu.ints.one_electron import build_int1e
    ints = build_int1e(basis, coords, jnp.asarray(charges))
    S, T = ints["S"], ints["T"]
    # V is linear in the charges: per-atom unit-charge components let each
    # task contract its own Z on the fly
    V_atoms = jnp.stack([
        build_int1e(basis, coords,
                    jnp.asarray(np.eye(natm)[a]))["V"]
        for a in range(natm)])

    if density_fit:
        from cctpu.ints.df import DFJK
        B = DFJK(mol).B

        def jk_fn(dm_s):
            Dtot = dm_s[0] + dm_s[1]
            Jp = jnp.einsum("pij,ij->p", B, Dtot)
            J = jnp.einsum("p,pij->ij", Jp, B)
            W = jnp.einsum("pik,skl->spil", B, dm_s)
            K = jnp.einsum("spil,pjl->sij", W, B)
            return J, K
    else:
        eri = build_eri_traced(basis, coords)

        def jk_fn(dm_s):
            J = jnp.einsum("ijkl,kl->ij", eri, dm_s[0] + dm_s[1])
            K = jnp.einsum("sikjl,skl->sij",
                           jnp.broadcast_to(eri, (2,) + eri.shape), dm_s)
            return J, K

    ax = 1.0
    exc_fn = None
    if xc is not None:
        from cctpu.dft.grids import Grids
        from cctpu.dft.numint import eval_ao
        from cctpu.dft.xc import get_functional
        func = get_functional(xc)
        ax = func.hyb
        grids = Grids(mol, level=grid_level)
        pts, w = grids.build(coords)
        npts = pts.shape[0]
        npad = (-npts) % grid_chunk
        pts = jnp.pad(pts, ((0, npad), (0, 0)), constant_values=1e6)
        w = jnp.pad(w, (0, npad))
        pts_c = pts.reshape(-1, grid_chunk, 3)
        w_c = w.reshape(-1, grid_chunk)
        is_mgga = func.xctype == "MGGA"

        def exc_fn(dm_s):
            def body(acc, chunk):
                p, wt = chunk
                ao = eval_ao(basis, coords, p, deriv=1)
                a0 = ao[0]
                rho, sig, tau = [], {}, []
                d_ao = []
                for s in range(2):
                    ds = jnp.einsum("ij,pj->pi", dm_s[s], a0)
                    rho.append(jnp.einsum("pi,pi->p", a0, ds))
                    g = jnp.stack(
                        [2 * jnp.einsum("pi,pi->p", ao[1 + d], ds)
                         for d in range(3)], -1)
                    d_ao.append(g)
                    if is_mgga:
                        tau.append(0.5 * sum(
                            jnp.einsum("pi,ij,pj->p", ao[1 + d], dm_s[s],
                                       ao[1 + d]) for d in range(3)))
                    else:
                        tau.append(jnp.zeros_like(rho[s]))
                saa = jnp.einsum("pd,pd->p", d_ao[0], d_ao[0])
                sab = jnp.einsum("pd,pd->p", d_ao[0], d_ao[1])
                sbb = jnp.einsum("pd,pd->p", d_ao[1], d_ao[1])
                e = func.exc(rho[0], rho[1], saa, sab, sbb, tau[0], tau[1])
                return acc + jnp.sum(wt * e), None

            total, _ = jax.lax.scan(body, 0.0, (pts_c, w_c))
            return total

    T_tasks = len(Z_batch)
    Z_batch = jnp.asarray(np.asarray(Z_batch, dtype=float))
    mask_batch = jnp.asarray(np.asarray(mask_batch, dtype=float))
    na_batch = jnp.asarray(np.asarray(na_batch, dtype=np.int32))
    nb_batch = jnp.asarray(np.asarray(nb_batch, dtype=np.int32))

    # SAD-flavoured start: the parent minao density masked down per task,
    # per-spin scaled to the task's electron counts
    from cctpu.scf.hf import UHF
    dm_parent = np.asarray(UHF(mol).init_guess_dm())
    if dm_parent.ndim == 3:
        dm_parent = np.asarray(dm_parent.sum(0))
    ne_parent = float(np.asarray(mol.charges).sum() - mol.charge)
    dm0 = []
    for t in range(T_tasks):
        m2 = np.outer(mask_batch[t], mask_batch[t])
        base = dm_parent * m2
        ne = float(na_batch[t] + nb_batch[t])
        dm0.append(np.stack([
            base * (float(na_batch[t]) / ne_parent),
            base * (float(nb_batch[t]) / ne_parent)]))
        del ne
    dm0 = jnp.asarray(np.stack(dm0))

    fn = partial(_single_uks_masked, n_cycles, S, T, V_atoms, jk_fn,
                 exc_fn, ax, coords, 1e4)
    vfn = jax.jit(jax.vmap(fn))
    args = (Z_batch, mask_batch, na_batch, nb_batch, dm0)
    if mesh is not None:
        npad = (-T_tasks) % mesh.devices.size
        if npad:
            args = tuple(jnp.concatenate(
                [a, jnp.repeat(a[-1:], npad, 0)]) for a in args)
        shard = NamedSharding(mesh, P("task"))
        args = tuple(jax.device_put(a, shard) for a in args)
        with mesh:
            e, _, conv = vfn(*args)
        return np.asarray(e)[:T_tasks], np.asarray(conv)[:T_tasks]
    e, _, conv = vfn(*args)
    return np.asarray(e)[:T_tasks], np.asarray(conv)[:T_tasks]
