"""One-electron integral validation.

Golden source: Szabo & Ostlund, 'Modern Quantum Chemistry', H2/STO-3G model
problem at R = 1.4 bohr (their tabulated integrals), plus structural
invariants (normalization, symmetry, translation invariance).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cctpu.core.molecule import Molecule
from cctpu.ints.one_electron import build_int1e


def _ints(mol, **kw):
    return build_int1e(mol.basis_set, jnp.asarray(mol.coords),
                       jnp.asarray(mol.charges), **kw)


def test_h2_szabo_values():
    mol = Molecule(symbols=["H", "H"],
                   coords=np.array([[0, 0, 0], [0, 0, 1.4]]), basis="sto-3g")
    o = _ints(mol)
    S, T = np.array(o["S"]), np.array(o["T"])
    assert abs(S[0, 1] - 0.6593) < 1e-4
    assert abs(T[0, 0] - 0.7600) < 1e-4
    assert abs(T[0, 1] - 0.2365) < 1e-4


@pytest.mark.parametrize("basis", ["sto-3g", "6-31g*", "cc-pvdz"])
def test_normalization_and_symmetry(basis):
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692", basis=basis)
    o = _ints(mol)
    S, T, V = (np.array(o[k]) for k in ("S", "T", "V"))
    assert np.abs(np.diag(S) - 1).max() < 1e-12
    assert np.abs(S - S.T).max() < 1e-13
    assert np.abs(T - T.T).max() < 1e-13
    assert np.abs(V - V.T).max() < 1e-13
    # overlap positive definite
    assert np.linalg.eigvalsh(S).min() > 0


def test_translation_invariance():
    m1 = Molecule.from_atoms("C 0 0 0; O 0 0 1.2", basis="6-31g")
    m2 = Molecule.from_atoms("C 1 2 3; O 1 2 4.2", basis="6-31g")
    o1, o2 = _ints(m1), _ints(m2)
    for k in ("S", "T", "V"):
        assert np.abs(np.array(o1[k]) - np.array(o2[k])).max() < 1e-11


def test_dipole_moments():
    # <1s_A | r | 1s_A> = R_A for a normalized s function centered at R_A.
    mol = Molecule(symbols=["H", "H"],
                   coords=np.array([[0.3, -0.2, 0.5], [0, 0, 1.9]]),
                   basis="sto-3g")
    o = _ints(mol, with_dipole=True)
    D = np.array(o["dipole"])
    assert D.shape == (3, 2, 2)
    assert np.allclose(D[:, 0, 0], mol.coords[0], atol=1e-12)
    assert np.allclose(D[:, 1, 1], mol.coords[1], atol=1e-12)
    # off-diagonal element: <A|r|B> = P * S_AB per primitive pair; verify
    # against an explicit primitive-loop reference.
    bs = mol.basis_set
    sh0, sh1 = bs.shells
    ref = np.zeros(3)
    sref = 0.0
    # shell coefs are radial-only (the 1/sqrt(4pi) of Y_00 lives in the
    # cart->sph transform), so normalize the explicit primitive sum by 4pi.
    for ea, ca in zip(sh0.exps, sh0.coefs):
        for eb, cb in zip(sh1.exps, sh1.coefs):
            p = ea + eb
            P = (ea * mol.coords[0] + eb * mol.coords[1]) / p
            ab = mol.coords[0] - mol.coords[1]
            K = np.exp(-ea * eb / p * np.dot(ab, ab))
            s = ca * cb * K * (np.pi / p) ** 1.5 / (4 * np.pi)
            sref += s
            ref += s * P
    assert np.allclose(D[:, 0, 1], ref, atol=1e-12)
    assert abs(np.array(o["S"])[0, 1] - sref) < 1e-12
