"""`cctpu <workflow> ...` — one dispatcher over the twelve workflow CLIs
(the reference ships them as twelve standalone template scripts)."""

from __future__ import annotations

import sys

_WORKFLOWS = {
    "energy": ("cctpu.workflows.calculate_energy", "single-point energy"),
    "opt": ("cctpu.workflows.optimize_geometry", "geometry opt + freq"),
    "opt-freq": ("cctpu.workflows.opt_freq", "production opt+freq+IR"),
    "uv": ("cctpu.workflows.calculate_uv_spectrum", "TDDFT UV-Vis"),
    "ir": ("cctpu.workflows.calculate_ir_spectrum", "IR spectrum"),
    "nmr": ("cctpu.workflows.calculate_nmr", "NMR shifts"),
    "solvent": ("cctpu.workflows.calculate_solvent_effect", "PCM solvation"),
    "bde": ("cctpu.workflows.calculate_bde", "bond dissociation energies"),
    "reaction": ("cctpu.workflows.calculate_reaction_energy",
                 "reaction energetics"),
    "interaction": ("cctpu.workflows.calculate_interaction",
                    "intermolecular interaction + BSSE"),
    "casscf": ("cctpu.workflows.calculate_casscf", "CASSCF/CASCI"),
    "ms-pred": ("cctpu.workflows.ms_pred_gcn_eims", "GCN EI-MS predictor"),
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: cctpu <workflow> [options]\n\nworkflows:")
        for k, (_, desc) in _WORKFLOWS.items():
            print(f"  {k:12s} {desc}")
        return 0
    name = argv[0]
    if name not in _WORKFLOWS:
        print(f"unknown workflow {name!r}; try: {', '.join(_WORKFLOWS)}")
        return 1
    import importlib
    mod = importlib.import_module(_WORKFLOWS[name][0])
    rc = mod.main(argv[1:])
    from cctpu.workflows.common import report_phases
    report_phases()
    # workflow mains return domain values (energies, shift arrays) for
    # library callers; only a bool/int is a process return code
    return rc if isinstance(rc, (bool, int)) else 0


if __name__ == "__main__":
    sys.exit(main())
