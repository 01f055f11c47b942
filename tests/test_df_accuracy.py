"""DF energy-accuracy regression: max|E_DF - E_incore| pinned per method.

Cited from cctpu/ints/df.py docstrings. The autoaux (even-tempered) fitting
basis floors at ~1e-5 Ha on small organics; pivoted Cholesky is exact to
its pivot tolerance (~1e-8, covered in tests/test_eri.py). This file pins
the production Fock path across HF / hybrid DFT / range-separated hybrids
so regressions in the device-resident build (build_3c2e_device & friends)
show up as energy drift, not just tensor diffs.
"""

import pytest

from cctpu.core.molecule import Molecule

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


@pytest.fixture(scope="module")
def water():
    return Molecule.from_atoms(WATER, basis="6-31g")


def test_df_rhf_vs_incore(water):
    from cctpu.scf.hf import RHF
    e_ref = RHF(water).kernel()
    e_df = RHF(water, density_fit=True).kernel()
    assert abs(e_df - e_ref) < 2e-5, abs(e_df - e_ref)


def test_df_b3lyp_vs_incore(water):
    from cctpu.dft.rks import RKS
    e_ref = RKS(water, xc="b3lyp").kernel()
    e_df = RKS(water, xc="b3lyp", density_fit=True).kernel()
    assert abs(e_df - e_ref) < 2e-5, abs(e_df - e_ref)


@pytest.mark.slow
def test_df_rsh_vs_incore(water):
    # range-separated hybrid: exercises the attenuated-metric k_lr path
    from cctpu.dft.rks import RKS
    e_ref = RKS(water, xc="cam-b3lyp").kernel()
    e_df = RKS(water, xc="cam-b3lyp", density_fit=True).kernel()
    assert abs(e_df - e_ref) < 5e-5, abs(e_df - e_ref)


def test_df_uhf_vs_incore():
    from cctpu.scf.hf import UHF
    mol = Molecule.from_atoms("O 0 0 0; H 0 0 0.97", spin=1, basis="6-31g")
    e_ref = UHF(mol).kernel()
    e_df = UHF(mol, density_fit=True).kernel()
    assert abs(e_df - e_ref) < 2e-5, abs(e_df - e_ref)
