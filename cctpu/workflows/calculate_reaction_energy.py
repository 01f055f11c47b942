"""Reaction energetics workflow: dE / dE0 / dH / dG and K_eq.

Reference: templates/calculate_reaction_energy.py: stoichiometry parser
('2A + B -> C'), per-species opt+freq+thermo, special cases H+ (E=0) and
H radical (UHF), K_eq = exp(-dG/RT) at 298.15 K.
"""

from __future__ import annotations

import argparse
import math
import re
from typing import List, Tuple

import numpy as np

from cctpu.core import constants as const
from cctpu.geomopt.optimizer import optimize
from cctpu.hessian.frequencies import (harmonic_analysis, hessian_auto,
                                        hessian_fd)
from cctpu.hessian.thermo import thermo
from cctpu.io.embed3d import smiles_to_molecule
from cctpu.workflows.common import (Timer, make_scf, open_reports,
                                    resolve_basis, run_scf, sanitize)


def parse_side(side: str) -> List[Tuple[int, str]]:
    out = []
    for term in side.split("+"):
        term = term.strip()
        m = re.match(r"^(\d+)\s*(.*)$", term)
        if m and m.group(2):
            out.append((int(m.group(1)), m.group(2).strip()))
        else:
            out.append((1, term))
    return out


def species_thermo(smiles: str, method: str, basis: str, density_fit,
                   grid_level, skip_freq=False, log=print):
    """Returns dict with E_elec, E0, H, G (Ha). Special cases per ref."""
    if smiles in ("[H+]",):
        z = {"E": 0.0, "E0": 0.0, "H": 0.0, "G": 0.0}
        # proton: only translational thermal terms
        kT = const.KB_HARTREE * const.T_STANDARD
        z["H"] = 2.5 * kT
        z["G"] = z["H"] - const.T_STANDARD * (108.95 / const.AVOGADRO
                                              / const.HARTREE2J)
        return z
    spin = 1 if smiles in ("[H]",) else 0
    mol = smiles_to_molecule(smiles, spin=spin, basis=basis)
    if mol.natm == 1:
        mf, e = run_scf(mol, method, density_fit, log=log,
                        grid_level=grid_level)
        th = thermo(mol, np.array([]), e)
        return {"E": e, "E0": e, "H": th["H_tot"][0], "G": th["G_tot"][0]}

    def factory(m):
        mf, _ = make_scf(m, method, density_fit, grid_level=grid_level)
        return mf

    res = optimize(factory, mol, maxsteps=50)
    e = res.e_tot
    if skip_freq:
        return {"E": e, "E0": e, "H": e, "G": e}
    H, _ = hessian_auto(res.mf, factory, res.mol, dm0=res.mf.dm,
                        with_dipole=False)
    ha = harmonic_analysis(res.mol, H)
    th = thermo(res.mol, ha.freq_au, e)
    return {"E": e, "E0": th["E_0K"][0], "H": th["H_tot"][0],
            "G": th["G_tot"][0]}


def main(argv=None):
    p = argparse.ArgumentParser(description="reaction energetics")
    p.add_argument("--reaction", required=True,
                   help="e.g. 'CCO + [O] -> CC=O + O'")
    p.add_argument("--method", default="b3lyp")
    p.add_argument("--basis", default="6-31+g*")
    p.add_argument("--density-fit", action="store_true", default=None)
    p.add_argument("--grid-level", type=int, default=3)
    p.add_argument("--skip-freq", action="store_true")
    p.add_argument("--output-dir", default=".")
    p.add_argument("--use-gpu", action="store_true")
    args = p.parse_args(argv)

    class _A:
        smiles = args.reaction
        method = args.method
        basis = args.basis
        output_dir = args.output_dir
    out, short, log, tag = open_reports(_A, "reaction")
    t = Timer()
    basis = resolve_basis(args.basis, out.print)

    lhs, rhs = args.reaction.split("->")
    reactants = parse_side(lhs)
    products = parse_side(rhs)
    out.print(f"=== reaction: {args.reaction}  "
              f"{args.method}/{basis} ===")

    table = {}
    for coef, smi in reactants + products:
        if smi not in table:
            out.print(f"\nspecies {smi} (x{coef})...")
            table[smi] = species_thermo(smi, args.method, basis,
                                        args.density_fit, args.grid_level,
                                        args.skip_freq, log=out.print)
            d = table[smi]
            out.print(f"  E={d['E']:.8f}  G={d['G']:.8f} Ha")

    def tot(side, key):
        return sum(c * table[s][key] for c, s in side)

    dE = tot(products, "E") - tot(reactants, "E")
    dE0 = tot(products, "E0") - tot(reactants, "E0")
    dH = tot(products, "H") - tot(reactants, "H")
    dG = tot(products, "G") - tot(reactants, "G")
    K = const.HARTREE2KCAL
    out.print(f"\ndE  = {dE * K:10.2f} kcal/mol")
    out.print(f"dE0 = {dE0 * K:10.2f} kcal/mol (with ZPE)")
    out.print(f"dH  = {dH * K:10.2f} kcal/mol (298.15 K)")
    out.print(f"dG  = {dG * K:10.2f} kcal/mol (298.15 K)")
    RT = const.KB_HARTREE * const.T_STANDARD
    keq = math.exp(-dG / RT) if abs(dG / RT) < 500 else (
        float("inf") if dG < 0 else 0.0)
    out.print(f"K_eq = {keq:.3e}")
    out.print(f"\nwall time: {t.lap():.1f} s")
    short.close()
    log.close()
    return dE, dH, dG, keq


if __name__ == "__main__":
    main()
