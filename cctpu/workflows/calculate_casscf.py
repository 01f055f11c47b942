"""CASSCF/CASCI multireference workflow.

Reference: templates/calculate_casscf.py: AVAS auto active space,
(state-averaged) CASSCF, multi-root CASCI, natural occupations, entropy
diagnostic, CI-coefficient stats, <S^2>, Molden export.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cctpu.core.constants import HARTREE2EV
from cctpu.io.molden import write_molden
from cctpu.mcscf.casscf import CASCI, CASSCF, avas
from cctpu.workflows.common import (Timer, add_common_args, build_molecule,
                                    open_reports, run_scf)


def main(argv=None):
    p = argparse.ArgumentParser(description="CASSCF/CASCI")
    add_common_args(p, default_method="hf", default_basis="cc-pvdz")
    p.add_argument("--ncas", type=int, default=None)
    p.add_argument("--nelecas", type=int, default=None)
    p.add_argument("--avas", action="store_true",
                   help="auto-select active space from 2p valence AOs")
    p.add_argument("--avas-threshold", type=float, default=0.2)
    p.add_argument("--nroots", type=int, default=1)
    p.add_argument("--state-average", type=int, default=0,
                   help="number of states to average in CASSCF")
    p.add_argument("--casci-only", action="store_true")
    args = p.parse_args(argv)
    out, short, log, tag = open_reports(args, "casscf")
    t = Timer()

    mol = build_molecule(args, log=out.print)
    out.print(f"=== CASSCF: {args.smiles} /{args.basis} ===")
    mf, e_hf = run_scf(mol, "hf", args.density_fit, log=out.print,
                       conv_tol=1e-8)
    out.print(f"reference {'ROHF' if mol.spin else 'RHF'}: {e_hf:.8f} Ha")

    mo = np.array(mf.mo_coeff)
    if args.avas or args.ncas is None:
        ncas, nelecas, mo = avas(mf, ["C 2p", "N 2p", "O 2p"],
                                 threshold=args.avas_threshold)
        out.print(f"AVAS active space: CAS({nelecas},{ncas})")
        if args.ncas is not None:
            ncas, nelecas = args.ncas, args.nelecas
    else:
        ncas, nelecas = args.ncas, args.nelecas or args.ncas
    # cap for the dense FCI solver
    while ncas > 8:
        ncas -= 1
        nelecas = min(nelecas, 2 * ncas)
    out.print(f"using CAS({nelecas},{ncas})")

    if args.casci_only:
        mc = CASCI(mf, ncas, nelecas)
        mc.fcisolver.nroots = max(args.nroots, 1)
        mc.kernel(mo_coeff=mo)
        es = np.atleast_1d(mc.e_tot)
        for i, e in enumerate(es):
            out.print(f"CASCI root {i}: {e:.8f} Ha"
                      + ("" if i == 0 else
                         f"  (+{(e - es[0]) * HARTREE2EV:.3f} eV)"))
    else:
        mc = CASSCF(mf, ncas, nelecas)
        if args.state_average > 1:
            mc.state_average([1.0 / args.state_average]
                             * args.state_average)
        e = mc.kernel(mo_coeff=mo)
        out.print(f"CASSCF energy: {e:.8f} Ha  "
                  f"(correlation vs HF: {(e - e_hf):.6f} Ha)  "
                  f"converged={mc.converged}")
        if args.state_average > 1:
            for i, ei in enumerate(mc.e_states[:args.state_average]):
                out.print(f"  state {i}: {ei:.8f} Ha")

    ci0 = mc.ci[0] if isinstance(mc.ci, list) else mc.ci
    occ = mc.natural_occupations(ci0)
    out.print(f"\nnatural occupations: {np.array2string(occ, precision=4)}")
    out.print(f"entanglement entropy: {mc.entropy_diagnostic(ci0):.4f}")
    s2, mult = mc.fcisolver.spin_square(ci0)
    out.print(f"<S^2> = {s2:.4f}  multiplicity = {mult:.2f}")
    c2 = np.sort(np.abs(np.ravel(ci0)))[::-1]
    out.print(f"leading CI weights: {np.round(c2[:5] ** 2, 4)}")
    if c2[0] ** 2 < 0.9:
        out.print("NOTE: multireference character detected "
                  f"(leading weight {c2[0] ** 2:.3f} < 0.90)")

    molden_path = os.path.join(args.output_dir, f"{tag}.molden")
    write_molden(molden_path, mol, mc.mo_coeff,
                 mo_occ=np.concatenate([
                     2 * np.ones(mc.ncore),
                     occ, np.zeros(mol.nao - mc.ncore - mc.ncas)]))
    out.print(f"orbitals -> {molden_path}")
    out.print(f"\nwall time: {t.lap():.1f} s")
    short.close()
    log.close()
    return mc


if __name__ == "__main__":
    main()
