"""DFT validation: grids, functionals (UEG anchors), and KS-SCF behavior."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cctpu.core.molecule import Molecule
from cctpu.dft.grids import Grids
from cctpu.dft.numint import eval_ao
from cctpu.dft.rks import RKS, UKS
from cctpu.dft.xc import e_c_pw92, e_c_vwn3, e_c_vwn5
from cctpu.scf.hf import RHF

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def test_grid_integrates_density():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RHF(mol)
    mf.kernel()
    g = Grids(mol, level=3)
    pts, w = g.build(jnp.asarray(mol.coords))
    ao = eval_ao(mol.basis_set, jnp.asarray(mol.coords), pts)
    n = float(jnp.sum(w * jnp.einsum("pi,ij,pj->p", ao, mf.dm, ao)))
    assert abs(n - 10.0) < 1e-6


def test_ueg_correlation_anchors():
    """VWN5 and PW92 are independent Ceperley-Alder fits — they must agree;
    VWN3 is the RPA fit (known eps_c(rs=1) ~ -0.0787... more negative)."""
    for rs, qmc in [(1.0, -0.0598), (2.0, -0.0448), (5.0, -0.0281)]:
        rho = 3 / (4 * math.pi * rs ** 3)
        ra = jnp.array([rho / 2])
        v5 = float(e_c_vwn5(ra, ra)[0]) / rho
        pw = float(e_c_pw92(ra, ra)[0]) / rho
        v3 = float(e_c_vwn3(ra, ra)[0]) / rho
        assert abs(v5 - pw) < 6e-4
        assert abs(v5 - qmc) < 6e-4
        assert v3 < v5 < 0  # RPA overbinds


def test_rks_hf_equals_rhf():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    assert abs(RKS(mol, xc="hf").kernel() - RHF(mol).kernel()) < 1e-9


def test_vxc_symmetric_and_matches_fd():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf0 = RHF(mol)
    mf0.kernel()
    dm = mf0.dm
    mf = RKS(mol, xc="b3lyp")
    v = np.array(jax.grad(mf._exc_total)(dm))
    vs = 0.5 * (v + v.T)
    rng = np.random.default_rng(1)
    P = rng.standard_normal(dm.shape)
    P = (P + P.T) / 2
    h = 1e-6
    fd = (float(mf._exc_total(dm + h * jnp.asarray(P)))
          - float(mf._exc_total(dm - h * jnp.asarray(P)))) / (2 * h)
    assert abs(fd - float(np.sum(vs * P))) < 1e-7


def test_lda_water_regression():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    e = RKS(mol, xc="lda").kernel()
    assert abs(e - (-74.73203852)) < 1e-6


def test_uks_matches_rks_closed_shell():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    e_r = RKS(mol, xc="lda").kernel()
    e_u = UKS(mol, xc="lda").kernel()
    assert abs(e_r - e_u) < 1e-7


@pytest.mark.slow
def test_b3lyp_water_631gs_regression():
    r, a = 0.9687, 104.5
    th = math.radians(a / 2)
    atoms = (f"O 0 0 0; H 0 {r*math.sin(th):.6f} {r*math.cos(th):.6f}; "
             f"H 0 {-r*math.sin(th):.6f} {r*math.cos(th):.6f}")
    mol = Molecule.from_atoms(atoms, basis="6-31g*")
    mf = RKS(mol, xc="b3lyp")
    e = mf.kernel()
    assert mf.converged
    # grid-converged value from this code (level 3 vs 4 agree to 1e-7);
    # Gaussian/CCCBDB is ~2 mHa lower due to cartesian 6d convention.
    assert abs(e - (-76.40701311)) < 5e-6
