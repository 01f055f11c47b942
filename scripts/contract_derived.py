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
# Core contractions SHARE the tightest primitives (general contraction,
# the actual def2 construction): every core natural of channel l is
# projected onto the same tight-first SHARED_NPRIM[l] primitives, and
# the remaining loose primitives stay free. (The r3-r5 "loses Ha"
# failures came from DISJOINT segments: projecting the 2s natural onto
# ONLY primitives 7-9 strips its tight-core part — a 2s without its
# orthogonality wiggle costs ~90 Ha.)
# s: (14)->2 contracted over the 8 tightest + 6 free = [8s]; p: (9)->1
# contracted over 5 tight + 4 free = [5p]. Freeing the MID-range
# primitives matters: the valence 3s's tight tail lives there, and with
# only the 4 loosest free the atom lost ~6.5 Ha (measured). A couple of
# functions beyond the published [5s5p] count buys robustness.
SHARED_NPRIM = {0: 8, 1: 5, 2: 5}
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
    # Natural orbitals in a NONORTHOGONAL basis solve D S c = n c —
    # symmetrized: eigh(L^T D L) with S = L L^T, then c = L^{-T} y.
    # (The previous code whitened with S^{-1/2}, i.e. eigh of
    # S^{-1/2} D S^{-1/2}, whose eigenvalues sum to tr(S^{-1} D) — the
    # "non-physical occupations, l=0 sum ~ electron count" failure of
    # rounds 3-4; true occupations sum to tr(D S) per m-channel.)
    L = np.linalg.cholesky(S)
    w, Y = np.linalg.eigh(L.T @ D @ L)
    V = np.linalg.solve(L.T, Y)           # back to primitive basis
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
        if ncore == 0 or l not in SHARED_NPRIM:
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
        nshared = SHARED_NPRIM[l]
        # GENERAL contraction over the channel's FULL primitive list:
        # truncating core naturals to the 8-10 tightest primitives lost
        # 5-6 Ha (the derived well-tempered ladder spreads core
        # character into mid-range primitives), while the full span
        # loses 0.62 mHa (S, measured). Free singles still start at
        # SHARED_NPRIM so the valence stays flexible.
        full = os.environ.get("CCTPU_CONTRACT_FULLSPAN", "1") == "1"
        seg_idx = np.arange(len(exps) if full else nshared)
        for k in range(ncore):
            coef = project_segment(l, exps, Vc[:, k], seg_idx)
            out_rows.append((l, exps[seg_idx].tolist(), coef.tolist()))
        for a in exps[nshared:]:
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
