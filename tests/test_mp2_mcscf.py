"""MP2 + FCI/CASSCF validation."""

import numpy as np
import jax.numpy as jnp
import pytest

from cctpu.core.molecule import Molecule
from cctpu.ints.one_electron import build_int1e
from cctpu.ints.two_electron import build_eri_incore
from cctpu.mcscf.casscf import CASCI, CASSCF, avas
from cctpu.mcscf.fci import FCISolver
from cctpu.mp.mp2 import MP2
from cctpu.scf.hf import RHF, UHF

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def _h2(basis="sto-3g"):
    mol = Molecule(symbols=["H", "H"],
                   coords=np.array([[0, 0, 0], [0, 0, 1.4]]), basis=basis)
    mf = RHF(mol)
    mf.kernel()
    return mol, mf


def test_mp2_h2_analytic():
    mol, mf = _h2()
    ec, et = MP2(mf).kernel()
    eri = np.array(build_eri_incore(mol.basis_set, jnp.asarray(mol.coords)))
    C = np.array(mf.mo_coeff)
    mo = np.einsum("pi,qj,rk,sl,pqrs->ijkl", C, C, C, C, eri)
    K = mo[0, 1, 0, 1]
    ref = K * K / (2 * (mf.mo_energy[0] - mf.mo_energy[1]))
    assert abs(ec - float(ref)) < 1e-12


def test_ump2_equals_rmp2_closed_shell():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mfr = RHF(mol)
    mfr.kernel()
    mfu = UHF(mol)
    mfu.kernel()
    ecr, _ = MP2(mfr).kernel()
    ecu, _ = MP2(mfu).kernel()
    assert abs(ecr - ecu) < 1e-9


def test_fci_h2_exact():
    mol, mf = _h2()
    C = np.array(mf.mo_coeff)
    ints = build_int1e(mol.basis_set, jnp.asarray(mol.coords),
                       jnp.asarray(mol.charges))
    h1 = C.T @ np.array(ints["T"] + ints["V"]) @ C
    eri = np.einsum("pi,qj,rk,sl,pqrs->ijkl", C, C, C, C,
                    np.array(build_eri_incore(mol.basis_set,
                                              jnp.asarray(mol.coords))))
    fs = FCISolver(2, (1, 1))
    e, ci = fs.kernel(h1, eri, ecore=float(mol.energy_nuc()))
    # H2/STO-3G FCI at R=1.4 (literature): -1.137276 Ha
    assert abs(e - (-1.1372759436)) < 1e-8
    # RDM energy reconstruction
    dm1, dm2 = fs.make_rdm12(ci)
    e_rdm = (np.einsum("pq,pq->", h1, dm1)
             + 0.5 * np.einsum("pqrs,pqrs->", eri, dm2)
             + float(mol.energy_nuc()))
    assert abs(e_rdm - e) < 1e-10
    s2, mult = fs.spin_square(ci)
    assert abs(s2) < 1e-8


def test_casscf_below_casci():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf = RHF(mol)
    mf.kernel()
    mf.get_jk_builder()
    e_ci = CASCI(mf, 4, 4).kernel()
    mc = CASSCF(mf, 4, 4, max_cycle_macro=30)
    e_scf = mc.kernel()
    assert mc.converged
    assert e_scf <= e_ci + 1e-10
    occ = mc.natural_occupations(mc.ci)
    assert abs(occ.sum() - 4.0) < 1e-8
    assert (occ >= -1e-9).all() and (occ <= 2 + 1e-9).all()


def test_avas_selects_pi_space():
    # formaldehyde: AVAS on 2p should give a reasonable active window
    mol = Molecule.from_atoms(
        "C 0 0 0; O 0 0 1.21; H 0.94 0 -0.54; H -0.94 0 -0.54",
        basis="sto-3g")
    mf = RHF(mol)
    mf.kernel()
    ncas, nelecas, mo = avas(mf, ["C 2p", "O 2p"], threshold=0.2)
    # minimal basis: most valence orbitals overlap the 2p reference space
    assert 2 <= ncas <= 12
    assert 2 <= nelecas <= 12
    assert mo.shape == np.array(mf.mo_coeff).shape
