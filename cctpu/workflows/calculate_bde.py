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
    """Breakable single, non-aromatic heavy-heavy bonds."""
    return [(b.i, b.j) for b in g.bonds
            if b.order == 1 and not b.aromatic]


def enumerate_bonds(g: MolGraph, h_owner) -> List[Tuple[int, int]]:
    """All breakable single bonds in GLOBAL atom indexing: heavy-heavy
    single non-aromatic bonds plus every X-H bond (the reference's
    get_all_bonds runs on the RDKit mol WITH explicit hydrogens,
    calculate_bde.py:242-266 — its ethanol headline number is a C-H BDE)."""
    bonds = single_bonds(g)
    bonds += sorted((own, h) for h, own in h_owner.items())
    return bonds


def fragment_atoms(g: MolGraph, h_owner, natm: int,
                   bond: Tuple[int, int]):
    """Homolysis in global indexing (H atoms included): two sorted atom
    lists, or None when `bond` is in a ring."""
    i0, j0 = bond
    adj = {a: set() for a in range(natm)}
    for b in g.bonds:
        adj[b.i].add(b.j)
        adj[b.j].add(b.i)
    for h, own in h_owner.items():
        adj[h].add(own)
        adj[own].add(h)
    adj[i0].discard(j0)
    adj[j0].discard(i0)
    seen = set()
    comps = []
    for start in range(natm):
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
        return None
    return comps


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


def _bde_batched(g, parent, symbols, h_owner, bonds, method, basis,
                 density_fit, log):
    """Whole-sweep batched path (mmff tier): parent + 2 fragments per bond
    as masked tasks of ONE vmapped, mesh-sharded unrestricted SCF.
    Returns (e_parent, results) or None if the batch can't run here."""
    import jax

    from cctpu.parallel.mesh import make_mesh
    from cctpu.parallel.task_batch import (ao_mask_for_atoms,
                                           batched_fragment_scf)

    nao = parent.nao
    Zfull = np.asarray(parent.charges, dtype=float)
    natm = parent.natm
    use_df = bool(density_fit) or nao > 72
    ndev = len(jax.devices())
    # in-core/DF memory gate per device (f64): ERI nao^4 or B ~ naux*nao^2
    est = (8.0 * nao ** 4) if not use_df else (8.0 * 10 * nao ** 3)
    if est > 6e9:
        return None

    xc = None if method == "hf" else method
    tasks = []            # (Z, mask, na, nb)
    meta = []             # bond bookkeeping: list of (label, i, j, t1, t2)
    ne_parent = int(Zfull.sum()) - parent.charge
    tasks.append((Zfull, np.ones(nao), (ne_parent + 1) // 2,
                  ne_parent // 2))
    frag_cache = {}       # identical fragments (e.g. the 3 methyl H's)
    for (i, j) in bonds:
        comps = fragment_atoms(g, h_owner, natm, (i, j))
        if comps is None:
            log(f"bond {i}-{j}: ring bond, skipped")
            continue
        t_ids = []
        for comp in comps:
            key = tuple(comp)
            if key in frag_cache:
                t_ids.append(frag_cache[key])
                continue
            Z = np.zeros(natm)
            Z[comp] = Zfull[comp]
            ne = int(Z.sum())
            frag_cache[key] = len(tasks)
            t_ids.append(len(tasks))
            tasks.append((Z, ao_mask_for_atoms(parent.basis_set, comp),
                          (ne + 1) // 2, ne // 2))
        lbl = f"{symbols[i]}{i}-{symbols[j]}{j}"
        meta.append((lbl, i, j, t_ids[0], t_ids[1]))
    if not meta:
        return None

    mesh = make_mesh((ndev,), ("task",)) if ndev > 1 else None
    log(f"batched BDE sweep: {len(tasks)} masked SCF tasks "
        f"({len(meta)} bonds), nao={nao}, "
        f"{'DF' if use_df else 'in-core'}, "
        f"mesh={'task:%d' % ndev if mesh else 'single-device'}")
    e, conv = batched_fragment_scf(parent, *map(list, zip(*tasks)),
                                   xc=xc, density_fit=use_df, mesh=mesh)
    if not conv[0]:
        log("parent task did not converge in the fixed-cycle batch")
        return None

    e_parent = float(e[0])
    results = []
    for (lbl, i, j, t1, t2) in meta:
        if not (conv[t1] and conv[t2]):
            # per-bond isolation: re-run the stragglers serially
            log(f"bond {lbl}: fragment task unconverged, serial retry")
            try:
                es = []
                for t in (t1, t2):
                    Z, mask, na, nb = tasks[t]
                    ids = [a for a in range(natm) if Z[a] > 0]
                    syms = [symbols[a] for a in ids]
                    crd = parent.coords[ids] * 0.52917721092
                    frag = Molecule.from_atoms(list(zip(syms, crd)),
                                               spin=1, basis=basis)
                    _, e_f = _serial_frag_sp(frag, method, density_fit)
                    es.append(e_f)
                bde = (es[0] + es[1] - e_parent) * HARTREE2KCAL
            except Exception as exc:
                log(f"bond {lbl} FAILED: {exc}")
                continue
        else:
            bde = float(e[t1] + e[t2] - e[0]) * HARTREE2KCAL
        results.append((lbl, i, j, bde))
        log(f"bond {lbl}: BDE = {bde:.2f} kcal/mol")
    return e_parent, results


def _serial_frag_sp(frag, method, density_fit):
    mf, e = run_scf(frag, method, density_fit, log=lambda *a: None,
                    conv_tol=1e-6, max_cycle=100)
    if not mf.converged:
        raise RuntimeError("fragment SCF not converged")
    return mf, e


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

    bonds = enumerate_bonds(g, h_owner)
    if limit:
        bonds = bonds[:limit]

    if tier == "mmff":
        # fragments inherit the parent geometry at this tier, so parent +
        # every fragment share one basis/geometry: run the WHOLE sweep as
        # one mesh-sharded batch of basis-masked SCF tasks (serial loop in
        # reference calculate_bde.py:574-583; VERDICT r1 item #5)
        out = _bde_batched(g, parent, symbols, h_owner, bonds, method,
                           basis, density_fit, log)
        if out is not None:
            return out
        log("batched sweep unavailable; using the serial path")

    log(f"parent single point ({method}/{basis}, tier={tier})")
    e_parent, conv = run_opt_sp(parent)
    if not conv:
        raise RuntimeError("parent SCF did not converge")

    results = []
    for (i, j) in bonds:
        comps = fragment_atoms(g, h_owner, parent.natm, (i, j))
        if comps is None:
            log(f"bond {i}-{j}: ring bond, skipped")
            continue
        try:
            es = []
            for comp in comps:
                syms = [symbols[a] for a in comp]
                crd = parent.coords[comp] * 0.52917721092
                frag = Molecule.from_atoms(list(zip(syms, crd)), spin=1,
                                           basis=basis)
                e_f, conv_f = run_opt_sp(frag)
                if not conv_f:
                    raise RuntimeError("fragment SCF not converged")
                es.append(e_f)
            bde = (es[0] + es[1] - e_parent) * HARTREE2KCAL
            lbl = f"{symbols[i]}{i}-{symbols[j]}{j}"
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
