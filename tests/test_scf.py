"""SCF golden-value and invariance tests.

Golden sources:
 - He RHF/STO-3G = -2.8077839575 Ha (standard literature value).
 - Water RHF/STO-3G at the PySCF-doc geometry = -74.9630231385 Ha
   (widely reproduced PySCF quickstart output — independent cross-check of
   the whole basis->integrals->SCF chain).
 - Formaldehyde RHF/6-31G* regression value pinned from this code after the
   chain was validated against the independent golden values above.
"""

import numpy as np
import pytest

from cctpu.core.molecule import Molecule
from cctpu.scf.hf import RHF, UHF, ROHF

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def test_he_golden():
    he = Molecule(symbols=["He"], coords=np.zeros((1, 3)), basis="sto-3g")
    e = RHF(he).kernel()
    assert abs(e - (-2.8077839575)) < 1e-9


def test_water_sto3g_golden():
    mf = RHF(Molecule.from_atoms(WATER, basis="sto-3g"))
    e = mf.kernel()
    assert mf.converged
    assert abs(e - (-74.9630231385)) < 1e-9
    # HOMO-LUMO sanity
    homo = float(mf.mo_energy[mf.mol.nelectron // 2 - 1])
    lumo = float(mf.mo_energy[mf.mol.nelectron // 2])
    assert homo < 0 < lumo


def test_uhf_h_atom():
    h = Molecule(symbols=["H"], coords=np.zeros((1, 3)), spin=1,
                 basis="sto-3g")
    mf = UHF(h)
    e = mf.kernel()
    # exact = lowest eigenvalue of hcore in this basis
    assert abs(e - (-0.4665818495)) < 1e-7
    s2, mult = mf.spin_square()
    assert abs(s2 - 0.75) < 1e-8


def test_uhf_equals_rhf_closed_shell():
    m = Molecule.from_atoms(WATER, basis="sto-3g")
    e_r = RHF(m).kernel()
    e_u = UHF(m).kernel()
    assert abs(e_r - e_u) < 1e-8


def test_rohf_doublet():
    # OH radical: ROHF energy must lie above UHF (variational ordering)
    m = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", spin=1, basis="sto-3g")
    e_u = UHF(m).kernel()
    e_ro = ROHF(m).kernel()
    assert e_ro >= e_u - 1e-8
    assert abs(e_ro - e_u) < 0.05  # same state, small spin contamination


def test_rotation_invariance_sto3g():
    m = Molecule.from_atoms(WATER, basis="sto-3g")
    e1 = RHF(m).kernel()
    th = 0.7
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    e2 = RHF(m.with_coords(m.coords @ Rz.T)).kernel()
    assert abs(e1 - e2) < 1e-9


def test_warm_start_dm0():
    m = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RHF(m)
    e1 = mf.kernel()
    mf2 = RHF(m)
    e2 = mf2.kernel(dm0=mf.make_rdm1())
    assert abs(e1 - e2) < 1e-10


@pytest.mark.slow
def test_formaldehyde_631gs_regression():
    m = Molecule.from_atoms(
        "C 0 0 0; O 0 0 1.205; H 0.943 0 -0.587; H -0.943 0 -0.587",
        basis="6-31g*")
    e = RHF(m).kernel()
    assert abs(e - (-113.8643165038)) < 1e-8


def test_uhf_breaks_symmetry_stretched_h2():
    # At 3.0 A the UHF minimum is the broken-symmetry (biradical) solution;
    # a spin-symmetric guess is a fixed point of the UHF map, so this pins
    # the HOMO/LUMO-mixed beta guess (round-1 VERDICT item #9).
    m = Molecule.from_atoms("H 0 0 0; H 0 0 3.0", basis="sto-3g")
    e_r = RHF(m).kernel()
    mf = UHF(m)
    e_u = mf.kernel()
    assert e_u < e_r - 0.05
    s2, _ = mf.spin_square()
    assert s2 > 0.9          # ~1.0 for a singlet biradical
