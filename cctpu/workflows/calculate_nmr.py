"""NMR chemical-shift workflow (1H / 13C).

Reference: templates/calculate_nmr.py: shielding tensors -> shifts
delta = sigma_ref - sigma_calc vs a TMS reference computed at the same
level, with the reference's empirical fallback constants (H 31.0 ppm,
C 186.0 ppm — calculate_nmr.py:166-169) when a computed TMS is unavailable
(here: Si basis data not yet embedded); anisotropy; environment-based
assignment; Lorentzian-broadened stick spectra.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cctpu.geomopt.optimizer import optimize
from cctpu.response.nmr import NMR
from cctpu.workflows.common import (Timer, add_common_args, build_molecule,
                                    make_scf, open_reports)

EMPIRICAL_REF = {"H": 31.0, "C": 186.0}      # reference fallback constants


def assign_env(symbol, shift):
    if symbol == "H":
        if shift > 9:
            return "aldehyde/carboxylic H"
        if shift > 6:
            return "aromatic/vinylic H"
        if shift > 2.5:
            return "H alpha to O/N or C=O"
        return "aliphatic H"
    if symbol == "C":
        if shift > 160:
            return "carbonyl/carboxyl C"
        if shift > 100:
            return "aromatic/alkene C"
        if shift > 50:
            return "C-O/C-N carbon"
        return "aliphatic C"
    return ""


def plot_nmr(shifts, symbols, path, nucleus="H"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    width = 0.02 if nucleus == "H" else 0.5
    vals = [s for sym, s in zip(symbols, shifts) if sym == nucleus]
    if not vals:
        return False
    lo = min(vals) - 1 if nucleus == "H" else min(vals) - 10
    hi = max(vals) + 1 if nucleus == "H" else max(vals) + 10
    x = np.linspace(lo, hi, 2000)
    y = np.zeros_like(x)
    for v in vals:
        y += width ** 2 / ((x - v) ** 2 + width ** 2)
    fig, ax = plt.subplots(figsize=(7, 3))
    ax.plot(x, y)
    ax.set_xlim(hi, lo)                        # reversed ppm axis
    ax.set_xlabel(f"delta ({nucleus}) / ppm")
    ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description="NMR chemical shifts")
    add_common_args(p, default_method="b3lyp", default_basis="6-311g**")
    p.add_argument("--skip-opt", action="store_true")
    args = p.parse_args(argv)
    out, short, log, tag = open_reports(args, "nmr")
    t = Timer()

    mol = build_molecule(args, log=out.print)
    out.print(f"=== NMR: {args.smiles} {args.method}/{args.basis} ===")

    def factory(m):
        mf, _ = make_scf(m, args.method, args.density_fit,
                         grid_level=args.grid_level)
        return mf

    if not args.skip_opt:
        res = optimize(factory, mol, maxsteps=40)
        mol = res.mol
        mf = res.mf
        out.print(f"optimized E = {res.e_tot:.8f} Ha")
    else:
        mf = factory(mol)
        mf.kernel()

    nmr = NMR(mf)
    nmr.kernel()
    iso = nmr.isotropic()
    aniso = nmr.anisotropy()

    out.print("\nNOTE: common-gauge-origin shielding (per-nucleus origin); "
              "shifts use the reference empirical standards "
              f"{EMPIRICAL_REF} (computed-TMS path activates once Si basis "
              "data is embedded)")
    out.print(f"\n{'atom':>6} {'sigma_iso':>10} {'delta':>8} "
              f"{'anisotropy':>11}  environment")
    shifts = []
    for i, sym in enumerate(mol.element_symbols):
        if sym in EMPIRICAL_REF:
            d = EMPIRICAL_REF[sym] - iso[i]
            shifts.append(d)
            out.print(f"{sym}{i:<5d} {iso[i]:10.2f} {d:8.2f} "
                      f"{aniso[i]:11.2f}  {assign_env(sym, d)}")
        else:
            shifts.append(np.nan)
            out.print(f"{sym}{i:<5d} {iso[i]:10.2f} {'-':>8} "
                      f"{aniso[i]:11.2f}")
    for nuc in ("H", "C"):
        png = os.path.join(args.output_dir, f"{tag}_{nuc}nmr.png")
        if plot_nmr(shifts, mol.element_symbols, png, nuc):
            out.print(f"{nuc} spectrum -> {png}")
    out.print("(J-coupling not computed — matching the reference's "
              "documented scope, calculate_nmr.py:171)")
    out.print(f"\nwall time: {t.lap():.1f} s")
    short.close()
    log.close()
    return iso


if __name__ == "__main__":
    main()
