"""Pair-compressed DF (cctpu/ints/df_compressed.py) — the big-molecule
memory strategy (VERDICT r2 missing #2 / next-round #5): B stored over
the Schwarz-surviving i<=j AO-pair axis must reproduce the dense DFJK
contractions exactly (same integrals, same whitening, different layout).
"""

import numpy as np
import pytest

from cctpu.core.molecule import Molecule
from cctpu.ints.df import DFJK
from cctpu.ints.df_compressed import CompressedDFJK, PairMap

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


@pytest.fixture(scope="module")
def pair_builders():
    mol = Molecule.from_atoms(WATER, basis="6-31g")
    return mol, DFJK(mol), CompressedDFJK(mol)


def _dm_cocc(mol, seed=3):
    rng = np.random.default_rng(seed)
    n, nocc = mol.nao, mol.nelectron // 2
    C = rng.standard_normal((n, nocc)) * 0.3
    return C @ C.T, C


def test_compressed_matches_dense_jk(pair_builders):
    import jax.numpy as jnp
    mol, dense, comp = pair_builders
    dm, C = _dm_cocc(mol)
    dm = jnp.asarray(dm)
    C = jnp.asarray(C)
    Jd, Kd = dense(dm, cocc=C)
    Jc, Kc = comp(dm, cocc=C)
    # same autoaux + whitening => identical fit; f32 storage in the
    # compressed builder sets the tolerance
    assert np.abs(np.asarray(Jc) - np.asarray(Jd)).max() < 5e-5
    assert np.abs(np.asarray(Kc) - np.asarray(Kd)).max() < 5e-5


def test_compressed_matches_dense_uhf(pair_builders):
    import jax.numpy as jnp
    mol, dense, comp = pair_builders
    dm, C = _dm_cocc(mol)
    dmu = jnp.stack([jnp.asarray(dm), 0.5 * jnp.asarray(dm)])
    coccs = (jnp.asarray(C), jnp.asarray(C) * np.sqrt(0.5))
    Jd, Kd = dense(dmu, cocc=coccs)
    Jc, Kc = comp(dmu, cocc=coccs)
    assert np.abs(np.asarray(Jc) - np.asarray(Jd)).max() < 5e-5
    assert np.abs(np.asarray(Kc) - np.asarray(Kd)).max() < 5e-5


def test_compressed_dense_view(pair_builders):
    mol, dense, comp = pair_builders
    Bd = np.asarray(dense.B)
    Bc = np.asarray(comp.B)
    n = mol.nao
    eri_d = np.einsum("pij,pkl->ijkl", Bd, Bd).reshape(n * n, -1)
    eri_c = np.einsum("pij,pkl->ijkl", Bc, Bc).reshape(n * n, -1)
    assert np.abs(eri_c - eri_d).max() < 5e-5


def test_pairmap_screens_extended_chain():
    # a long chain must actually DROP far pairs (the memory win the
    # builder exists for); water keeps essentially everything
    atoms = "; ".join(f"He 0 0 {2.5 * k:.1f}" for k in range(12))
    mol = Molecule.from_atoms(atoms, basis="6-31g")
    pm = PairMap(mol.basis_set, mol.coords, screen_tol=1e-12)
    nfull = mol.nao * (mol.nao + 1) // 2
    assert pm.npair < 0.55 * nfull
    # every kept pair is i <= j and in range
    assert (pm.pi[:pm.npair] <= pm.pj[:pm.npair]).all()
    assert pm.pj[:pm.npair].max() < mol.nao


def test_compressed_rks_energy_matches_dense():
    # end-to-end: B3LYP/6-31G water SCF through the compressed builder
    # lands on the dense-DF energy
    from cctpu.dft.rks import RKS
    mol = Molecule.from_atoms(WATER, basis="6-31g")
    e_ref = RKS(mol, xc="b3lyp", density_fit=True, conv_tol=1e-9).kernel()
    mf = RKS(mol, xc="b3lyp", density_fit="compressed", conv_tol=1e-9)
    e_c = mf.kernel()
    assert mf.converged
    assert abs(e_c - e_ref) < 5e-6
