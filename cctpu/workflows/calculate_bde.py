"""All-bond homolytic BDE sweep workflow.

Reference: templates/calculate_bde.py (SURVEY.md §3.4): enumerate single
bonds, homolyze each into two radical fragments (spin=1 doublets),
BDE = E(f1) + E(f2) - E(parent), three optimization tiers
(mmff-equivalent embed / cheap-DFT opt / same-level opt), statistics and
weakest/strongest bond report, TXT + CSV artifacts. The reference's serial
per-bond loop is the canonical TPU task-parallel axis (SURVEY.md §2.4).
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import List, Optional, Tuple

import numpy as np

from cctpu.core.constants import HARTREE2KCAL
from cctpu.core.molecule import Molecule
from cctpu.io.embed3d import embed_molecule
from cctpu.io.smiles import MolGraph, parse_smiles
from cctpu.workflows.common import (Timer, add_common_args, open_reports,
                                    make_scf, resolve_basis, run_scf)


def single_bonds(g: MolGraph) -> List[Tuple[int, int]]:
    """Breakable single, non-aromatic bonds (reference get_all_bonds)."""
    return [(b.i, b.j) for b in g.bonds
            if b.order == 1 and not b.aromatic]


def fragment_graphs(g: MolGraph, bond: Tuple[int, int]):
    """Homolysis: split the graph at `bond`, return two fragment graphs
    (atom index lists). Coordinates are inherited from the parent embed
    (reference create_radical_fragments:302-313)."""
    i0, j0 = bond
    adj = {a.idx: set() for a in g.atoms}
    for b in g.bonds:
        if {b.i, b.j} == {i0, j0}:
            continue
        adj[b.i].add(b.j)
        adj[b.j].add(b.i)
    seen = set()
    comps = []
    for start in range(g.natoms):
        if start in seen:
            continue
        stack = [start]
        comp = []
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.append(x)
            stack.extend(adj[x] - seen)
        comps.append(sorted(comp))
    if len(comps) != 2:
        return None      # ring bond: homolysis doesn't split
    return comps


def bde_sweep(smiles: str, method: str, basis: str, tier: str = "mmff",
              density_fit=None, log=print, limit: Optional[int] = None):
    g = parse_smiles(smiles)
    symbols, coords_ang = embed_molecule(g)
    nheavy = g.natoms

    # full-molecule parent with explicit H list; map H atoms to heavy owners
    parent = Molecule.from_atoms(list(zip(symbols, coords_ang)),
                                 basis=basis)
    # heavy-atom graph bonds; H attachments from embed order:
    # embed appends H's after heavy atoms in order of heavy atom index
    h_owner = {}
    k = nheavy
    for a in g.atoms:
        for _ in range(a.n_h):
            h_owner[k] = a.idx
            k += 1

    def run_opt_sp(mol, dm0=None):
        if tier in ("b3lyp", "same"):
            from cctpu.geomopt.optimizer import optimize
            opt_method = "b3lyp" if tier == "b3lyp" else method
            opt_basis = "6-31g*" if tier == "b3lyp" else basis

            def factory(m):
                mf, _ = make_scf(m, opt_method, density_fit)
                return mf
            res = optimize(factory,
                           mol.with_coords(mol.coords) if
                           mol.basis == opt_basis else
                           Molecule(symbols=list(mol.symbols),
                                    coords=mol.coords.copy(),
                                    charge=mol.charge, spin=mol.spin,
                                    basis=opt_basis),
                           maxsteps=30)
            mol = Molecule(symbols=list(mol.symbols),
                           coords=res.mol.coords.copy(), charge=mol.charge,
                           spin=mol.spin, basis=mol.basis)
        mf, e = run_scf(mol, method, density_fit, dm0=dm0,
                        log=lambda *a: None,
                        conv_tol=1e-6, max_cycle=100)
        return e, mf.converged

    log(f"parent single point ({method}/{basis}, tier={tier})")
    e_parent, conv = run_opt_sp(parent)
    if not conv:
        raise RuntimeError("parent SCF did not converge")

    bonds = single_bonds(g)
    if limit:
        bonds = bonds[:limit]
    results = []
    for (i, j) in bonds:
        comps = fragment_graphs(g, (i, j))
        if comps is None:
            log(f"bond {i}-{j}: ring bond, skipped")
            continue
        try:
            es = []
            for comp in comps:
                atom_ids = [a for a in comp]
                atom_ids += [h for h, own in h_owner.items() if own in comp]
                atom_ids = sorted(atom_ids)
                syms = [symbols[a] for a in atom_ids]
                crd = parent.coords[atom_ids] * 0.52917721092
                frag = Molecule.from_atoms(list(zip(syms, crd)), spin=1,
                                           basis=basis)
                e_f, conv_f = run_opt_sp(frag)
                if not conv_f:
                    raise RuntimeError("fragment SCF not converged")
                es.append(e_f)
            bde = (es[0] + es[1] - e_parent) * HARTREE2KCAL
            lbl = (f"{g.atoms[i].symbol}{i}-{g.atoms[j].symbol}{j}")
            results.append((lbl, i, j, bde))
            log(f"bond {lbl}: BDE = {bde:.2f} kcal/mol")
        except Exception as exc:      # per-bond isolation (reference :585)
            log(f"bond {i}-{j} FAILED: {exc}")
    return e_parent, results


def main(argv=None):
    p = argparse.ArgumentParser(description="homolytic BDE sweep")
    add_common_args(p, default_method="m06-2x", default_basis="def2-tzvp")
    p.add_argument("--tier", default="mmff",
                   choices=["mmff", "b3lyp", "same"],
                   help="fragment-geometry tier (reference 3-tier protocol)")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    out, short, log, tag = open_reports(args, "bde")
    t = Timer()
    basis = resolve_basis(args.basis, out.print)
    method = args.method
    from cctpu.dft.xc import get_functional
    try:
        get_functional(method)
    except ValueError:
        out.print(f"NOTE: functional {method} not yet implemented; "
                  f"using b3lyp")
        method = "b3lyp"

    out.print(f"=== BDE sweep: {args.smiles} {method}/{basis} "
              f"tier={args.tier} ===")
    e_parent, results = bde_sweep(args.smiles, method, basis, args.tier,
                                  args.density_fit, log=out.print,
                                  limit=args.limit)
    if results:
        bdes = np.array([r[3] for r in results])
        out.print(f"\nbonds evaluated: {len(results)}")
        out.print(f"mean BDE: {bdes.mean():.2f}  min: {bdes.min():.2f}  "
                  f"max: {bdes.max():.2f} kcal/mol")
        weakest = results[int(np.argmin(bdes))]
        out.print(f"weakest bond: {weakest[0]} "
                  f"({weakest[3]:.2f} kcal/mol)")
        csv_path = os.path.join(args.output_dir, f"{tag}_bde.csv")
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["bond", "atom_i", "atom_j", "bde_kcal_mol"])
            for r in results:
                w.writerow([r[0], r[1], r[2], f"{r[3]:.3f}"])
        out.print(f"CSV -> {csv_path}")
    out.print(f"\nwall time: {t.lap():.1f} s")
    short.close()
    log.close()
    return results


if __name__ == "__main__":
    main()
