"""Contract the embedded uncontracted derived def2-TZVP tables (S, Cl).

Round-3 context: scripts/derive_basis.py produced good atomic-UHF-optimized
primitive ladders for S/Cl but its segmented-contraction step lost 11-17 Ha,
so the tables were embedded UNCONTRACTED (58 spherical AOs per S vs ~37 for
the published [5s5p2d1f] dimension). Root cause found in round 4: the
coefficient extraction read a single m-component (m=0) of each occupied MO —
for degenerate p shells an atomic SCF mixes p_x/p_y/p_z arbitrarily, so the
z-projection of a "2p" MO can be near zero (then the `coef[:]=1.0` fallback
emitted a garbage contracted function — the Ha-scale loss).

This script replaces that extraction with rotation- and spin-invariant
NATURAL RADIAL ORBITALS: for each angular-momentum channel, the m-averaged,
spin-summed density block in the (nonorthogonal) radial-primitive basis is
diagonalized against the radial overlap metric; eigenvectors with occupation
~2 are the 1s/2s/... (or 2p/3p/...) radial functions, ordered by <r^2>.
Core naturals are then projected (overlap-metric least squares) onto their
segment's primitives, valence primitives stay free — the def2 scheme
(Weigend & Ahlrichs PCCP 7, 3297 (2005): only core is contracted).

Validation: contracted atomic UHF energy vs the uncontracted pin; the loss
must be mHa-scale, not Ha-scale.

Run (CPU):  python scripts/contract_derived.py S Cl
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import devcpu  # noqa: F401  CPU backend + compile cache

import numpy as np

from cctpu.core import basis_data
from cctpu.core.basis import parse_nwchem
from cctpu.core.molecule import Molecule
from cctpu.scf.hf import RHF, UHF

SPIN = {"Si": 2, "P": 3, "S": 2, "Cl": 1, "Br": 1}
HF_LIMIT = {"Si": -288.854362, "P": -340.718780, "S": -397.504896,
            "Cl": -459.482072, "Br": -2572.441332}
# segments (tight-first prim counts) per channel; remaining prims free.
# Published def2-TZVP second row: (14s9p)->[5s5p] = s {7,3,1,1,1,1... -> we
# use [7,3]+4 free = 6s} / p {5,2,1,1 -> [5,2]+2 free = 4p}; slightly looser
# than the official count but same contraction idea (core-only).
SEGMENTS = {0: [7, 3], 1: [5, 2], 2: [5]}
# occupied radial functions per channel (how many naturals to contract):
N_CORE = {"Si": {0: 2, 1: 1}, "P": {0: 2, 1: 1}, "S": {0: 2, 1: 1},
          "Cl": {0: 2, 1: 1}, "Br": {0: 3, 1: 2, 2: 1}}
LSYM = "SPDFG"


def radial_overlap(l, a):
    """Overlap of NORMALIZED primitives of angular momentum l."""
    ai, aj = a[:, None], a[None, :]
    return (2.0 * np.sqrt(ai * aj) / (ai + aj)) ** (l + 1.5)


def radial_r2(l, a):
    """<r^2> matrix over normalized primitives: S_ij * (l+1.5)/(a_i+a_j)."""
    return radial_overlap(l, a) * (l + 1.5) / (a[:, None] + a[None, :])


def natural_radial(mf, l, exps_sorted, row_idx_by_m):
    """Natural radial orbitals of channel l from the converged atomic SCF.

    Returns (coef [nprim, nnat], occ [nnat]) over normalized primitives,
    naturals ordered tight-first (ascending <r^2>).
    """
    C = np.asarray(mf.mo_coeff)
    occ = np.asarray(mf.mo_occ)
    if C.ndim == 2:                       # restricted
        C, occ = C[None], occ[None] / 2.0
        spin_w = 2.0
    else:
        spin_w = 1.0
    nprim = len(exps_sorted)
    D = np.zeros((nprim, nprim))
    for s in range(C.shape[0]):
        for rows in row_idx_by_m:
            Cm = C[s][rows]               # [nprim, nmo]
            D += spin_w * (Cm * occ[s][None, :]) @ Cm.T
    D /= len(row_idx_by_m)
    S = radial_overlap(l, exps_sorted)
    # generalized symmetric eigenproblem D v = lam S v
    w, V = np.linalg.eigh(np.linalg.solve(
        np.linalg.cholesky(S),
        np.linalg.solve(np.linalg.cholesky(S), D.T).T))
    Linv = np.linalg.inv(np.linalg.cholesky(S))
    V = Linv.T @ V                        # back to primitive basis
    order = np.argsort(w)[::-1]           # by occupation, descending
    return V[:, order], w[order]


def project_segment(l, exps_all, v, seg_idx):
    """Overlap-metric least-squares fit of natural v onto segment prims."""
    S = radial_overlap(l, exps_all)
    Sss = S[np.ix_(seg_idx, seg_idx)]
    b = S[seg_idx] @ v
    return np.linalg.solve(Sss, b)


def contract_element(el):
    table = parse_nwchem(basis_data.get_basis_text("def2-tzvp"))
    shells = table[el]
    mol = Molecule.from_atoms(f"{el} 0 0 0", spin=SPIN[el], basis="def2-tzvp")
    mf = (RHF if SPIN[el] == 0 else UHF)(mol, max_cycle=100, conv_tol=1e-8)
    e_unc = float(mf.kernel())
    assert mf.converged
    print(f"# {el}: uncontracted atomic UHF E = {e_unc:.6f}", flush=True)

    bs = mol.basis_set
    out_rows = []
    for l in sorted({sh[0] for sh in shells}):
        prim_shells = [sh for sh in shells if sh[0] == l]
        if any(len(sh[1]) > 1 for sh in prim_shells):
            raise SystemExit(f"{el} l={l} already contracted")
        exps = np.array([float(sh[1][0]) for sh in prim_shells])
        order = np.argsort(exps)[::-1]    # tight first
        exps = exps[order]
        ncore = N_CORE[el].get(l, 0)
        if ncore == 0 or l not in SEGMENTS:
            for a in exps:
                out_rows.append((l, [a], [1.0]))
            continue
        # AO rows of this channel per m, in tight-first prim order
        ao_starts = np.array([sh.ao_start for sh in bs.shells if sh.l == l])
        shell_exps = np.array([float(sh.exps[0]) for sh in bs.shells
                               if sh.l == l])
        prim_order = np.argsort(shell_exps)[::-1]
        rows_by_m = [ao_starts[prim_order] + m for m in range(2 * l + 1)]
        V, wocc = natural_radial(mf, l, exps, rows_by_m)
        # keep the ncore most-occupied naturals, order them tight-first
        Vc = V[:, :ncore]
        R2 = radial_r2(l, exps)
        r2 = np.array([Vc[:, k] @ R2 @ Vc[:, k] /
                       (Vc[:, k] @ radial_overlap(l, exps) @ Vc[:, k])
                       for k in range(ncore)])
        Vc = Vc[:, np.argsort(r2)]
        print(f"#   l={l}: natural occupations {np.round(wocc[:ncore+2], 3)}"
              f" r2 {np.round(np.sort(r2), 2)}", flush=True)
        segs = SEGMENTS[l][:ncore]
        start = 0
        for k, nseg in enumerate(segs):
            seg_idx = np.arange(start, start + nseg)
            coef = project_segment(l, exps, Vc[:, k], seg_idx)
            out_rows.append((l, exps[seg_idx].tolist(), coef.tolist()))
            start += nseg
        for a in exps[start:]:
            out_rows.append((l, [a], [1.0]))

    # emit + validate
    lines = []
    for l, es, cs in out_rows:
        lines.append(f"{el}    {LSYM[l]}")
        for a, c in zip(es, cs):
            lines.append(f"      {a:18.7f}   {c: .10f}")
    text = "BASIS\n" + "\n".join(lines) + "\nEND"
    basis_data.register_custom_basis("contract-tmp", text)
    mol2 = Molecule.from_atoms(f"{el} 0 0 0", spin=SPIN[el],
                               basis="contract-tmp")
    mf2 = (RHF if SPIN[el] == 0 else UHF)(mol2, max_cycle=100, conv_tol=1e-8)
    e_con = float(mf2.kernel())
    loss = 1000 * (e_con - e_unc)
    above = 1000 * (e_con - HF_LIMIT[el])
    print(f"# {el}: contracted E = {e_con:.6f} (conv={mf2.converged}) "
          f"nao {mol.nao}->{mol2.nao}  contraction-loss={loss:+.2f} mHa  "
          f"above-HF-limit={above:+.2f} mHa", flush=True)
    with open(f"/tmp/contracted_{el}.nwchem", "w") as f:
        f.write(text + f"\n# E_atom_UHF = {e_con:.6f}\n")
    return text, e_con, loss


if __name__ == "__main__":
    for el in (sys.argv[1:] or ["S", "Cl"]):
        contract_element(el)
