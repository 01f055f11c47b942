"""IR spectrum workflow: opt -> frequencies/intensities -> assignment/plot.

Reference: templates/calculate_ir_spectrum.py: analytic-path IR via the
Hessian + dipole derivatives, wavenumber-window mode assignment heuristics,
transmittance-style plot (reversed 4000->400 axis, sigma=20 cm^-1),
characteristic-peak check windows, thermochemistry summary.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cctpu.geomopt.optimizer import optimize
from cctpu.hessian.frequencies import (harmonic_analysis, hessian_auto,
                                        hessian_fd)
from cctpu.hessian.thermo import thermo
from cctpu.workflows.common import (Timer, add_common_args, build_molecule,
                                    make_scf, open_reports)


def assign_mode(freq: float) -> str:
    """Reference assign_vibration_mode wavenumber windows (:109-130)."""
    rules = [
        (3550, 3800, "O-H stretch (free)"),
        (3200, 3550, "O-H/N-H stretch (H-bonded)"),
        (3000, 3200, "C-H stretch (aromatic/alkene)"),
        (2840, 3000, "C-H stretch (alkane)"),
        (2100, 2300, "C#C / C#N stretch"),
        (1650, 1800, "C=O stretch"),
        (1550, 1650, "C=C stretch / N-H bend"),
        (1350, 1550, "C-H bend"),
        (1000, 1350, "C-O / C-N stretch"),
        (650, 1000, "out-of-plane bend"),
        (0, 650, "skeletal deformation"),
    ]
    for lo, hi, name in rules:
        if lo <= freq < hi:
            return name
    return "other"


def plot_ir(freqs, inten, path, sigma=20.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    x = np.linspace(400, 4000, 1800)
    absorb = np.zeros_like(x)
    for f, i in zip(freqs, inten):
        if f > 0:
            absorb += i * np.exp(-0.5 * ((x - f) / sigma) ** 2)
    if absorb.max() > 0:
        absorb = absorb / absorb.max()
    trans = 100 * (1 - 0.95 * absorb)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(x, trans)
    ax.set_xlim(4000, 400)                      # reversed IR convention
    ax.set_xlabel("wavenumber (cm$^{-1}$)")
    ax.set_ylabel("transmittance (%)")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser(description="IR spectrum")
    add_common_args(p, default_method="b3lyp", default_basis="6-31g*")
    p.add_argument("--maxsteps", type=int, default=50)
    args = p.parse_args(argv)
    out, short, log, tag = open_reports(args, "ir")
    t = Timer()

    mol = build_molecule(args, log=out.print)
    out.print(f"=== IR spectrum: {args.smiles} "
              f"{args.method}/{args.basis} ===")

    def factory(m):
        mf, _ = make_scf(m, args.method, args.density_fit,
                         grid_level=args.grid_level)
        return mf

    res = optimize(factory, mol, maxsteps=args.maxsteps, verbose=1)
    out.print(f"optimized E = {res.e_tot:.10f} Ha")
    H, dmu = hessian_auto(res.mf, factory, res.mol, dm0=res.mf.dm)
    ha = harmonic_analysis(res.mol, H, dmu)

    out.print(f"\n{'freq (cm-1)':>12} {'IR (km/mol)':>12}  assignment")
    for f, i in zip(ha.freq_wavenumber, ha.ir_intensity):
        out.print(f"{f:12.1f} {i:12.2f}  {assign_mode(f)}")

    png = os.path.join(args.output_dir, f"{tag}_ir.png")
    plot_ir(ha.freq_wavenumber, ha.ir_intensity, png)
    out.print(f"IR plot -> {png}")

    th = thermo(res.mol, ha.freq_au, res.e_tot)
    out.print("\nthermochemistry:")
    for k in ("ZPE", "H_tot", "G_tot", "S_tot"):
        v, u = th[k]
        out.print(f"  {k:6s} = {v:.6f} {u}")
    out.print(f"\nwall time: {t.lap():.1f} s")
    short.close()
    log.close()
    return ha


if __name__ == "__main__":
    main()
