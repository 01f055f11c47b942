"""PCM solvent-effect workflow.

Reference: templates/calculate_solvent_effect.py: gas vs PCM energies,
dG_solv, dipole/HOMO-LUMO shifts, multi-solvent comparison table
(SOLVENT_PARAMS, 12 solvents).
"""

from __future__ import annotations

import argparse

import numpy as np

from cctpu.core.constants import HARTREE2EV, HARTREE2KCAL
from cctpu.solvent.pcm import PCM, SOLVENT_PARAMS
from cctpu.workflows.common import (Timer, add_common_args, build_molecule,
                                    homo_lumo, make_scf, open_reports,
                                    run_scf)


def main(argv=None):
    p = argparse.ArgumentParser(description="PCM solvent effects")
    add_common_args(p, default_method="b3lyp", default_basis="6-31g*")
    p.add_argument("--solvent", default="water",
                   choices=sorted(SOLVENT_PARAMS))
    p.add_argument("--compare-solvents", action="store_true",
                   help="run the multi-solvent comparison table")
    p.add_argument("--opt", action="store_true",
                   help="re-optimize the geometry inside the solvent "
                        "(reference calculate_solvent_effect.py:116-131)")
    p.add_argument("--pcm-method", default="ief-pcm",
                   choices=["ief-pcm", "c-pcm"])
    p.add_argument("--maxsteps", type=int, default=50)
    args = p.parse_args(argv)
    out, short, log, tag = open_reports(args, "solvent")
    t = Timer()

    mol = build_molecule(args, log=out.print)
    out.print(f"=== solvent effects: {args.smiles} "
              f"{args.method}/{args.basis} ===")

    mf_gas, e_gas = run_scf(mol, args.method, args.density_fit,
                            log=out.print, grid_level=args.grid_level)
    mu_gas = np.linalg.norm(mf_gas.dip_moment())
    h_g, l_g = homo_lumo(mf_gas)
    out.print(f"gas phase:  E = {e_gas:.8f} Ha   mu = {mu_gas:.3f} D   "
              f"gap = {(l_g - h_g) * HARTREE2EV:.3f} eV")

    _last_dm = [mf_gas.make_rdm1()]

    def pcm_run(solvent, m=None):
        mf, _ = make_scf(m or mol, args.method, args.density_fit,
                         grid_level=args.grid_level)
        mf = PCM(mf, solvent=solvent, method=args.pcm_method)
        # warm start from the previous solvent's density (the solvated
        # densities are much closer to each other than to gas phase)
        e = mf.kernel(dm0=_last_dm[0] if m is None else None)
        _last_dm[0] = mf.make_rdm1()
        return mf, e

    mf_sol, e_sol = pcm_run(args.solvent)

    if args.opt:
        # in-solvent geometry relaxation: PCM nuclear gradients come from
        # AD of PCMModel.energy (grad/scf_grad.py), mirroring the
        # reference's optional PCM-opt (calculate_solvent_effect.py:116)
        from cctpu.geomopt.optimizer import optimize

        def factory(m):
            mf, _ = make_scf(m, args.method, args.density_fit,
                             grid_level=args.grid_level)
            return PCM(mf, solvent=args.solvent, method=args.pcm_method)

        res = optimize(factory, mol, maxsteps=args.maxsteps, verbose=1)
        tag_c = "converged" if res.converged else "NOT converged"
        out.print(f"in-solvent optimization: {tag_c} in "
                  f"{len(res.energies)} steps, "
                  f"dE = {(res.energies[-1] - e_sol) * HARTREE2KCAL:.3f} "
                  f"kcal/mol vs gas-phase geometry")
        mf_sol, e_sol = res.mf, res.energies[-1]
    dg = (e_sol - e_gas) * HARTREE2KCAL
    mu_s = np.linalg.norm(mf_sol.dip_moment())
    h_s, l_s = homo_lumo(mf_sol)
    out.print(f"{args.solvent} (eps={SOLVENT_PARAMS[args.solvent]}):  "
              f"E = {e_sol:.8f} Ha")
    out.print(f"  dG_solv = {dg:.2f} kcal/mol")
    out.print(f"  dipole shift: {mu_gas:.3f} -> {mu_s:.3f} D")
    out.print(f"  gap shift: {(l_g - h_g) * HARTREE2EV:.3f} -> "
              f"{(l_s - h_s) * HARTREE2EV:.3f} eV")

    if args.compare_solvents:
        out.print(f"\n{'solvent':>16} {'eps':>7} {'E (Ha)':>14} "
                  f"{'dG_solv (kcal/mol)':>19}")
        for sol in ["water", "dmso", "acetonitrile", "methanol",
                    "dichloromethane", "toluene", "hexane"]:
            _, e_i = pcm_run(sol)
            out.print(f"{sol:>16} {SOLVENT_PARAMS[sol]:7.2f} {e_i:14.8f} "
                      f"{(e_i - e_gas) * HARTREE2KCAL:19.2f}")
    out.print(f"\nwall time: {t.lap():.1f} s")
    short.close()
    log.close()
    return e_gas, e_sol


if __name__ == "__main__":
    main()
