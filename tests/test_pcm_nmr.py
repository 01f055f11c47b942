"""PCM solvation and NMR shielding tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from cctpu.core.molecule import Molecule
from cctpu.scf.hf import RHF
from cctpu.solvent.pcm import PCM, SOLVENT_PARAMS

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def test_pcm_stabilizes_and_orders_by_eps():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    e_gas = RHF(mol).kernel()
    e_wat = PCM(RHF(mol), solvent="water").kernel()
    e_hex = PCM(RHF(mol), solvent="hexane").kernel()
    assert e_wat < e_hex < e_gas
    dg = (e_wat - e_gas) * 627.509
    assert -15 < dg < -1          # water in water: few kcal/mol


def test_pcm_dipole_increases_in_solvent():
    mol = Molecule.from_atoms(WATER, basis="sto-3g")
    mf_g = RHF(mol)
    mf_g.kernel()
    mf_s = PCM(RHF(mol), solvent="water")
    mf_s.kernel()
    mu_g = np.linalg.norm(mf_g.dip_moment())
    mu_s = np.linalg.norm(mf_s.dip_moment())
    assert mu_s > mu_g            # polarization enhances the dipole


def test_solvent_table_matches_reference_set():
    # the reference SOLVENT_PARAMS covers 12 solvents incl. these
    for s in ["water", "methanol", "ethanol", "acetone", "dmso",
              "acetonitrile", "dichloromethane", "chloroform", "thf",
              "toluene", "benzene", "hexane"]:
        assert s in SOLVENT_PARAMS
    assert abs(SOLVENT_PARAMS["water"] - 78.39) < 0.1


def test_nmr_h_atom_lamb():
    """sigma(H atom) = alpha^2/3 <1/r> exactly (pure diamagnetic)."""
    from cctpu.ints.magnetic import dia_integrals
    from cctpu.ints.one_electron import build_int1e
    from cctpu.core.constants import LIGHT_SPEED_AU as C

    h = Molecule(symbols=["H"], coords=np.zeros((1, 3)), spin=1,
                 basis="sto-3g").build()
    ints = build_int1e(h.basis_set, jnp.asarray(h.coords),
                       jnp.asarray(h.charges))
    inv_r = -float(np.array(ints["V"])[0, 0])
    dia = np.array(dia_integrals(h.basis_set, jnp.asarray(h.coords),
                                 jnp.zeros(3), np.zeros(3)))
    sd = (0.5 / C ** 2) * np.trace(dia[:, :, 0, 0].reshape(3, 3)) / 3
    assert abs(sd - inv_r / (3 * C * C)) < 1e-15


@pytest.mark.slow
def test_nmr_h2_isotropic():
    mol = Molecule(symbols=["H", "H"],
                   coords=np.array([[0, 0, -0.7], [0, 0, 0.7]]),
                   basis="6-31g**")
    mf = RHF(mol)
    mf.kernel()
    from cctpu.response.nmr import NMR
    nmr = NMR(mf, gauge_origin=np.zeros(3))
    nmr.kernel()
    iso = nmr.isotropic()
    # accurate sigma(H2) ~ 26.7 ppm; CGO/6-31G** lands ~26
    assert 23 < iso[0] < 30
    assert abs(iso[0] - iso[1]) < 1e-6
