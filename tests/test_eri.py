"""Two-electron integral validation (Szabo golden values + invariants)."""

import numpy as np
import jax.numpy as jnp

from cctpu.core.molecule import Molecule
from cctpu.ints.two_electron import build_eri_incore


def test_h2_szabo_eri():
    mol = Molecule(symbols=["H", "H"],
                   coords=np.array([[0, 0, 0], [0, 0, 1.4]]), basis="sto-3g")
    mol.build()
    eri = np.array(build_eri_incore(mol.basis_set, jnp.asarray(mol.coords)))
    assert abs(eri[0, 0, 0, 0] - 0.7746) < 1e-4
    assert abs(eri[0, 0, 1, 1] - 0.5697) < 1e-4
    assert abs(eri[0, 1, 0, 1] - 0.2970) < 1e-4
    assert abs(eri[0, 0, 0, 1] - 0.4441) < 1e-4


def test_eri_symmetry_with_p_shells():
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g")
    mol.build()
    eri = np.array(build_eri_incore(mol.basis_set, jnp.asarray(mol.coords)))
    n = mol.nao
    assert eri.shape == (n, n, n, n)
    assert np.abs(eri - eri.transpose(1, 0, 2, 3)).max() < 1e-12
    assert np.abs(eri - eri.transpose(0, 1, 3, 2)).max() < 1e-12
    assert np.abs(eri - eri.transpose(2, 3, 0, 1)).max() < 1e-12
    # Cauchy-Schwarz: |(ij|kl)|^2 <= (ij|ij)(kl|kl)
    diag = np.einsum("ijij->ij", eri)
    bound = np.sqrt(np.abs(diag[:, :, None, None] * diag[None, None, :, :]))
    assert (np.abs(eri) <= bound + 1e-10).all()


def test_cholesky_df_accuracy_contract():
    """Pivoted-Cholesky JK reproduces in-core SCF to the 1e-8 contract
    (BASELINE.json accuracy gate; basis-set DF floors at ~1e-6)."""
    from cctpu.scf.hf import RHF

    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")
    e_ref = RHF(mol).kernel()
    mf = RHF(mol, density_fit="cd")
    e_cd = mf.kernel()
    assert abs(e_cd - e_ref) < 1e-8, abs(e_cd - e_ref)

