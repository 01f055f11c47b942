"""TDDFT validation against analytic minimal-basis results.

For H2/STO-3G (1 occ x 1 vir) the response problem is scalar:
  CIS/TDA:  w = de + 2(ia|ia) - (ii|aa)
  TDHF:     w = sqrt((A-B)(A+B)),  B = 2(ia|jb) - (ib|ja) -> (ia|ia)
built from the independently-validated in-core ERIs — an end-to-end check
of the matvec algebra (J/K/fxc factors).
"""

import numpy as np
import jax.numpy as jnp

from cctpu.core.molecule import Molecule
from cctpu.ints.two_electron import build_eri_incore
from cctpu.response.tddft import TDA, TDDFT
from cctpu.scf.hf import RHF
from cctpu.dft.rks import RKS


def _h2():
    mol = Molecule(symbols=["H", "H"],
                   coords=np.array([[0, 0, 0], [0, 0, 1.4]]), basis="sto-3g")
    mf = RHF(mol)
    mf.kernel()
    eri = np.array(build_eri_incore(mol.basis_set, jnp.asarray(mol.coords)))
    C = np.array(mf.mo_coeff)
    mo = np.einsum("pi,qj,rk,sl,pqrs->ijkl", C, C, C, C, eri)
    return mf, mo


def test_h2_cis_analytic():
    mf, mo = _h2()
    de = float(mf.mo_energy[1] - mf.mo_energy[0])
    w_ref = de + 2 * mo[0, 1, 0, 1] - mo[0, 0, 1, 1]
    td = TDA(mf, nstates=1)
    w = td.kernel()
    assert abs(w[0] - w_ref) < 1e-10


def test_h2_tdhf_analytic():
    mf, mo = _h2()
    de = float(mf.mo_energy[1] - mf.mo_energy[0])
    A = de + 2 * mo[0, 1, 0, 1] - mo[0, 0, 1, 1]
    B = 2 * mo[0, 1, 0, 1] - mo[0, 1, 0, 1]
    w_ref = np.sqrt((A - B) * (A + B))
    td = TDDFT(mf, nstates=1)
    w = td.kernel()
    assert abs(w[0] - w_ref) < 1e-10
    f = td.oscillator_strength()
    assert f[0] > 0.1  # sigma->sigma* strongly allowed


def test_water_tddft_b3lyp_ordering():
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g")
    mf = RKS(mol, xc="b3lyp")
    mf.kernel()
    w_tda = TDA(mf, nstates=3).kernel()
    w_rpa = TDDFT(mf, nstates=3).kernel()
    assert (np.diff(w_tda) >= -1e-10).all()
    assert (w_rpa <= w_tda + 1e-8).all()   # RPA below TDA
    assert (w_rpa > 0.1).all()             # water: no low-lying states


def test_unrestricted_tda_contains_restricted_singlets():
    """UKS-based TDA on a closed-shell molecule spans singlets AND
    triplets; the restricted singlet TDA energies must appear in the
    unrestricted spectrum (spin adaptation check)."""
    from cctpu.scf.hf import UHF, RHF

    mol = Molecule.from_atoms("He 0 0 0; He 0 0 1.6", basis="6-31g")
    mf_r = RHF(mol)
    mf_r.kernel()
    w_singlet = TDA(mf_r, nstates=2).kernel()

    mf_u = UHF(mol)
    mf_u.kernel()
    td_u = TDA(mf_u, nstates=4)
    w_u = td_u.kernel()
    assert td_u.unrestricted
    for w in w_singlet:
        assert np.min(np.abs(np.asarray(w_u) - w)) < 1e-4, (w, w_u)


def test_radical_uks_tda_runs():
    """Open-shell UV path (reference inherits UKS TDDFT from pyscf,
    calculate_uv_spectrum.py:97): OH radical TDA gives positive finite
    excitations and oscillator strengths."""
    from cctpu.scf.hf import UHF

    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", spin=1, basis="sto-3g")
    mf = UHF(mol)
    mf.kernel()
    assert mf.converged
    td = TDA(mf, nstates=3)
    w = td.kernel()
    # OH is a 2-Pi ground state: the SOMO <-> degenerate-partner rotation
    # is a physical zero-energy TDA root; all roots must be >= 0
    assert np.all(np.asarray(w) > -1e-8)
    osc = td.oscillator_strength()
    assert np.all(np.isfinite(osc))
