"""Analytic (AD-native CPHF) Hessian vs finite differences."""

import numpy as np
import pytest

from cctpu.core.molecule import Molecule
from cctpu.hessian.cphf import analytic_hessian
from cctpu.hessian.frequencies import hessian_fd
from cctpu.scf.hf import RHF


def _fd(mf, mol, factory):
    H, _ = hessian_fd(factory, mol, dm0=mf.dm, with_dipole=False)
    return H


def test_rhf_water_analytic_vs_fd():
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g")
    mf = RHF(mol)
    mf.kernel()
    assert mf.converged
    H_an = analytic_hessian(mf)
    H_fd = _fd(mf, mol, lambda m: RHF(m))
    assert H_an.shape == H_fd.shape == (9, 9)
    # central-difference truncation at step 1e-3 is ~1e-5 on the stiff
    # modes; the analytic side is the tighter one
    assert np.max(np.abs(H_an - H_fd)) < 5e-5, \
        np.max(np.abs(H_an - H_fd))


@pytest.mark.slow
def test_rks_water_analytic_vs_fd():
    from cctpu.dft.rks import RKS
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g")
    mf = RKS(mol, xc="lda", grid_level=2)
    mf.kernel()
    H_an = analytic_hessian(mf)

    def factory(m):
        k = RKS(m, xc="lda", grid_level=2)
        return k

    H_fd = _fd(mf, mol, factory)
    # FD of gradients over a quadrature grid: looser tolerance
    assert np.max(np.abs(H_an - H_fd)) < 5e-5


def test_uhf_oh_radical_analytic_vs_fd():
    # open-shell reference (round-2: kappa is a per-spin pytree)
    from cctpu.scf.hf import UHF
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", spin=1, basis="sto-3g")
    mf = UHF(mol)
    mf.kernel()
    assert mf.converged
    H_an = analytic_hessian(mf)
    H_fd = _fd(mf, mol, lambda m: UHF(m))
    assert H_an.shape == (6, 6)
    assert np.max(np.abs(H_an - H_fd)) < 5e-5, np.max(np.abs(H_an - H_fd))


@pytest.mark.slow
def test_rsh_h2_analytic_vs_fd():
    # range-separated hybrid: B_lr is re-traced in R (round-1 VERDICT #6)
    from cctpu.dft.rks import RKS
    mol = Molecule.from_atoms("H 0 0 0; H 0 0 0.74", basis="sto-3g")
    mf = RKS(mol, xc="cam-b3lyp", grid_level=2)
    mf.kernel()
    assert mf.converged
    H_an = analytic_hessian(mf)

    def factory(m):
        return RKS(m, xc="cam-b3lyp", grid_level=2)

    H_fd = _fd(mf, mol, factory)
    assert np.max(np.abs(H_an - H_fd)) < 1e-4, np.max(np.abs(H_an - H_fd))
