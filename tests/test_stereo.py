"""Stereochemistry: SMILES @/@@ + cis-trans parsing and embedding.

The reference gets stereo-correct 3D structures from RDKit ETKDG
(templates/calculate_energy.py:62-81, calculate_bde.py:57-60); cctpu
parses the markers itself (io/smiles.py) and enforces them as signed-
volume / torsion terms in the embedder (io/embed3d.py). These tests pin
the conventions geometrically.
"""
import numpy as np
import pytest

from cctpu.io.embed3d import embed_molecule, smiles_to_xyz
from cctpu.io.smiles import parse_smiles

pytestmark = pytest.mark.smoke


def _signed_volume(coords, n0, n1, n2, n3):
    r0, r1, r2, r3 = (np.asarray(coords[k]) for k in (n0, n1, n2, n3))
    return float(np.dot(r1 - r0, np.cross(r2 - r0, r3 - r0)))


def test_parse_chiral_order_explicit():
    g = parse_smiles("[C@](F)(Cl)(Br)I")
    assert g.atoms[0].chiral == "@"
    assert g.chiral_order == {0: [1, 2, 3, 4]}


def test_parse_chiral_order_implicit_h():
    # preceding atom first, then the implicit H's slot (-1), then the rest
    g = parse_smiles("C[C@@H](N)O")
    assert g.atoms[1].chiral == "@@"
    assert g.chiral_order == {1: [0, -1, 2, 3]}


def test_parse_directional_bonds():
    g = parse_smiles("F/C=C/F")
    d = {(b.i, b.j): b.direction for b in g.bonds if b.direction}
    assert d == {(0, 1): 1, (2, 3): 1}
    g2 = parse_smiles(r"F/C=C\F")
    d2 = {(b.i, b.j): b.direction for b in g2.bonds if b.direction}
    assert d2 == {(0, 1): 1, (2, 3): -1}


@pytest.mark.parametrize("mark,sign", [("@", -1.0), ("@@", 1.0)])
def test_embed_chirality_sign(mark, sign):
    # looking from the first neighbor toward the center, the remaining
    # three anticlockwise (@) <=> negative signed volume in written order
    symbols, coords = smiles_to_xyz(f"[C{mark}](F)(Cl)(Br)I")
    vol = _signed_volume(coords, 1, 2, 3, 4)
    assert vol * sign > 0.3, (mark, vol)


def test_embed_enantiomers_mirror():
    # bromochlorofluoromethane: H resolves via h_of; volumes must be
    # opposite and both satisfied with margin
    ga = parse_smiles("[C@H](F)(Cl)Br")
    gb = parse_smiles("[C@@H](F)(Cl)Br")
    (sa, xa), (sb, xb) = embed_molecule(ga), embed_molecule(gb)
    assert sa == sb
    # H is appended last (index 4); written order = [-1(H), F, Cl, Br]
    va = _signed_volume(xa, 4, 1, 2, 3)
    vb = _signed_volume(xb, 4, 1, 2, 3)
    assert va < -0.3 and vb > 0.3, (va, vb)


def test_embed_cis_trans_difluoroethylene():
    _, x_trans = smiles_to_xyz("F/C=C/F")
    _, x_cis = smiles_to_xyz(r"F/C=C\F")
    d_trans = np.linalg.norm(x_trans[0] - x_trans[3])
    d_cis = np.linalg.norm(x_cis[0] - x_cis[3])
    # planar C2F2H2: F...F ~2.9 A cis, ~3.6 A trans
    assert d_trans > 3.2, d_trans
    assert d_cis < 3.1, d_cis
    assert d_trans > d_cis + 0.4


def test_embed_cis_trans_butene_energy_differs():
    # 2-butene: the cis isomer is strained (methyl clash) - distinct
    # geometries from the same seed
    _, x_cis = smiles_to_xyz(r"C/C=C\C")
    _, x_trans = smiles_to_xyz("C/C=C/C")
    d_cc_cis = np.linalg.norm(x_cis[0] - x_cis[3])
    d_cc_trans = np.linalg.norm(x_trans[0] - x_trans[3])
    assert d_cc_trans > d_cc_cis + 0.5


def test_chiral_center_in_chain_with_ring():
    # ring-closure neighbor lands in the written slot it was OPENED at
    g = parse_smiles("[C@H]1(F)CC1")
    # order: H(-1), ring partner (via label 1), F, then next chain atom
    assert 0 in g.chiral_order
    order = g.chiral_order[0]
    assert len(order) == 4 and order[0] == -1
    symbols, coords = embed_molecule(g)
    assert len(symbols) == len(coords)


def test_unmarked_smiles_unconstrained():
    g = parse_smiles("CC(N)O")
    assert g.chiral_order == {}
    assert all(b.direction == 0 for b in g.bonds)
