"""Analytic nuclear gradients vs finite differences (the definitive check)."""

import numpy as np
import pytest

from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS
from cctpu.grad.scf_grad import scf_gradient
from cctpu.scf.hf import RHF, UHF

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def _fd_grad(make_mf, mol, dm0, components):
    h = 1e-4
    g = {}
    for (ia, d) in components:
        cp = mol.coords.copy()
        cp[ia, d] += h
        cm = mol.coords.copy()
        cm[ia, d] -= h
        ep = make_mf(mol.with_coords(cp)).kernel(dm0=dm0)
        em = make_mf(mol.with_coords(cm)).kernel(dm0=dm0)
        g[(ia, d)] = (ep - em) / (2 * h)
    return g


def test_rhf_gradient_vs_fd():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RHF(mol)
    mf.kernel()
    g = np.array(scf_gradient(mf))
    assert not np.isnan(g).any()
    comps = [(0, 2), (1, 1)]
    fd = _fd_grad(lambda m: RHF(m), mol, mf.dm, comps)
    for (ia, d), v in fd.items():
        assert abs(g[ia, d] - v) < 5e-7
    # translational invariance: columns sum to zero
    assert np.abs(g.sum(axis=0)).max() < 1e-10


def test_b3lyp_gradient_vs_fd():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RKS(mol, xc="b3lyp")
    mf.kernel()
    g = np.array(scf_gradient(mf))
    assert not np.isnan(g).any()
    comps = [(0, 2), (2, 1)]
    fd = _fd_grad(lambda m: RKS(m, xc="b3lyp"), mol, mf.dm, comps)
    for (ia, d), v in fd.items():
        assert abs(g[ia, d] - v) < 5e-7


def test_uhf_gradient_vs_fd():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", spin=1, basis="sto-3g")
    mf = UHF(mol)
    mf.kernel()
    g = np.array(scf_gradient(mf))
    assert not np.isnan(g).any()
    fd = _fd_grad(lambda m: UHF(m), mol, mf.dm, [(1, 2)])
    assert abs(g[1, 2] - fd[(1, 2)]) < 5e-7


@pytest.mark.slow
def test_rhf_df_gradient_vs_fd():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RHF(mol, density_fit=True)
    mf.kernel()
    g = np.array(scf_gradient(mf))
    fd = _fd_grad(lambda m: RHF(m, density_fit=True), mol, mf.dm, [(0, 2)])
    assert abs(g[0, 2] - fd[(0, 2)]) < 5e-7
