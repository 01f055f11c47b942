"""Eager per-class DF gradient (grad/df_grad.py) vs FD and the traced path.

The eager DF gradient is the production TPU path for the north-star
SCF+gradient benchmark (BASELINE.json metric); these tests pin its math
on CPU where true f64 is available.
"""

import numpy as np
import pytest

from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS
from cctpu.grad.df_grad import df_e2_gradient_eager
from cctpu.grad.scf_grad import scf_gradient, scf_gradient_eager
from cctpu.scf.hf import RHF, UHF

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def test_rhf_df_eager_vs_fd():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RHF(mol, density_fit=True)
    mf.kernel()
    g = scf_gradient_eager(mf, df=True)
    assert not np.isnan(g).any()
    h = 1e-4
    for (ia, d) in [(0, 2), (1, 1)]:
        cp = mol.coords.copy()
        cp[ia, d] += h
        cm = mol.coords.copy()
        cm[ia, d] -= h
        ep = RHF(mol.with_coords(cp), density_fit=True).kernel(dm0=mf.dm)
        em = RHF(mol.with_coords(cm), density_fit=True).kernel(dm0=mf.dm)
        fd = (ep - em) / (2 * h)
        # W/Z assembly runs in f32 (device-matched); FD noise ~1e-7
        assert abs(g[ia, d] - fd) < 5e-6
    # translational invariance of the full eager gradient
    assert np.abs(np.asarray(g).sum(axis=0)).max() < 1e-5


def test_b3lyp_df_eager_vs_traced():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RKS(mol, xc="b3lyp", density_fit=True)
    mf.kernel()
    g_eager = scf_gradient_eager(mf, df=True)
    g_traced = np.asarray(scf_gradient(mf))
    # traced path refits B with its own spectral filter: agreement is
    # bounded by fit-tolerance differences + the f32 W/Z assembly
    assert np.abs(g_eager - g_traced).max() < 2e-5


def test_uhf_df_eager_2e_term_vs_fd():
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", spin=1, basis="sto-3g")
    mf = UHF(mol, density_fit=True)
    mf.kernel()
    g = scf_gradient_eager(mf, df=True)
    assert not np.isnan(g).any()
    h = 1e-4
    cp = mol.coords.copy()
    cp[1, 2] += h
    cm = mol.coords.copy()
    cm[1, 2] -= h
    ep = UHF(mol.with_coords(cp), density_fit=True).kernel(dm0=mf.dm)
    em = UHF(mol.with_coords(cm), density_fit=True).kernel(dm0=mf.dm)
    fd = (ep - em) / (2 * h)
    assert abs(g[1, 2] - fd) < 5e-6
