"""Shared workflow machinery: flag contract, logging, method dispatch.

Centralizes what the reference duplicates per script (SURVEY.md §7.4): the
``--smiles --method --basis --charge --spin --use-gpu`` CLI contract
(reference README_templates.md:44-51), the MultiWriter dual logger
(calculate_energy.py:23-40), the report-file naming scheme
``{smiles}_{script}_{method}_{basis}_{short|log}_report.txt``
(opt-freq.py:330-347), and the accelerator fallback ladder
(calculate_energy.py:112-206) — here: DF-on-TPU first, in-core fallback.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time
from typing import Optional

import numpy as np

from cctpu.core.molecule import Molecule
from cctpu.io.embed3d import smiles_to_molecule


class MultiWriter:
    """Fan stdout-style writes to several streams (reference MultiWriter)."""

    def __init__(self, *streams):
        self.streams = streams

    def write(self, text):
        for s in self.streams:
            s.write(text)
            s.flush()

    def flush(self):
        for s in self.streams:
            s.flush()

    def print(self, *args, **kw):
        print(*args, file=self, **kw)


def sanitize(smiles: str) -> str:
    return re.sub(r"[^A-Za-z0-9]", "_", smiles)[:40]


def add_common_args(p: argparse.ArgumentParser, default_method="b3lyp",
                    default_basis="6-31g*"):
    p.add_argument("--smiles", required=True, help="input molecule SMILES")
    p.add_argument("--method", default=default_method,
                   help="hf | mp2 | lda | pbe | pbe0 | blyp | b3lyp | ...")
    p.add_argument("--basis", default=default_basis)
    p.add_argument("--charge", type=int, default=None,
                   help="default: formal charge from SMILES")
    p.add_argument("--spin", type=int, default=0, help="2S = Na - Nb")
    p.add_argument("--use-gpu", action="store_true",
                   help="accepted for reference CLI compatibility "
                        "(compute runs on the available TPU/CPU backend)")
    p.add_argument("--density-fit", action="store_true", default=None,
                   help="force density fitting (default: auto by size)")
    p.add_argument("--output-dir", default=".")
    p.add_argument("--grid-level", type=int, default=3)
    p.add_argument("--scf-cache", default=None, metavar="DIR",
                   help="directory for SCF checkpoint/warm-start files "
                        "(restartable sweeps; SURVEY §5 checkpoint/resume)")
    return p


def open_reports(args, script: str):
    configure_run(args)
    os.makedirs(args.output_dir, exist_ok=True)
    tag = f"{sanitize(args.smiles)}_{script}_{args.method}_" \
          f"{args.basis.replace('*', 's').replace('+', 'p')}"
    short = open(os.path.join(args.output_dir, f"{tag}_short_report.txt"),
                 "w")
    log = open(os.path.join(args.output_dir, f"{tag}_log_report.txt"), "w")
    out = MultiWriter(sys.stdout, short, log)
    # config provenance sidecar (SURVEY §5: serialize run config with
    # results) — every run records exactly what produced it
    import json
    try:
        cfg = {k: v for k, v in vars(args).items()
               if isinstance(v, (str, int, float, bool, type(None), list))}
        cfg["_script"] = script
        cfg["_cctpu_version"] = __import__("cctpu").__version__
        with open(os.path.join(args.output_dir, f"{tag}_config.json"),
                  "w") as f:
            json.dump(cfg, f, indent=1)
    except Exception:
        pass
    return out, short, log, tag


_PURE_XC = {"lda", "svwn", "pbe", "blyp", "pw92"}
_HYBRID_XC = {"b3lyp", "b3lyp5", "pbe0", "m06", "m06-2x", "wb97x-d",
              "cam-b3lyp"}


def resolve_basis(name: str, log=None) -> str:
    """All reference-default bases are embedded (def2-TZVP included since
    round 2); unknown names raise at Mole build. Per-ELEMENT gaps inside a
    set fall back down the chain in core/basis.py with a logged warning."""
    return name


def make_scf(mol: Molecule, method: str, density_fit: Optional[bool] = None,
             grid_level: int = 3, **opts):
    """Method string -> SCF object (the reference's per-script GPU/CPU
    dispatch, centralized). Returns (mf, is_mp2)."""
    m = method.lower()
    if density_fit is None:
        density_fit = mol.nao > 160
    is_mp2 = m == "mp2"
    open_shell = mol.spin != 0
    if m in ("hf", "mp2"):
        from cctpu.scf.hf import RHF, UHF
        mf = (UHF if open_shell else RHF)(mol, density_fit=density_fit,
                                          **opts)
    else:
        from cctpu.dft.rks import RKS, UKS
        cls = UKS if open_shell else RKS
        mf = cls(mol, xc=m, density_fit=density_fit, **opts)
        mf.grid_level = grid_level
        mf._setup_xc()
    return mf, is_mp2


# Global run context set once per workflow invocation (open_reports):
# phase timings for the short report + optional SCF checkpoint cache.
PHASES = None      # utils.profiling.PhaseTimer | None
_SCF_CACHE = None  # utils.chkfile.SCFCache | None


def configure_run(args):
    """Install the phase timer and (optionally) the SCF cache from CLI
    flags (SURVEY §5: tracing/profiling + checkpoint/resume wiring)."""
    global PHASES, _SCF_CACHE
    from cctpu.utils.profiling import PhaseTimer
    PHASES = PhaseTimer()
    cache_dir = getattr(args, "scf_cache", None)
    if cache_dir:
        from cctpu.utils.chkfile import SCFCache
        _SCF_CACHE = SCFCache(cache_dir)
    else:
        _SCF_CACHE = None
    return PHASES


def report_phases(log=print):
    if PHASES is not None and PHASES.phases:
        log("\nPhase timings:")
        PHASES.report(log)


def run_scf(mol, method, density_fit=None, dm0=None, log=None, **opts):
    """SCF with the fallback ladder: preferred settings -> damped/level-
    shifted retry (reference 3-rung ladder, opt-freq.py:146-184).
    Warm-starts from / stores to the configured SCF cache."""
    import contextlib
    timer = (PHASES.phase(f"scf:{method}") if PHASES is not None
             else contextlib.nullcontext())
    with timer:
        if dm0 is None and _SCF_CACHE is not None:
            dm0 = _SCF_CACHE.get(mol, method)
            if dm0 is not None and log:
                log("SCF warm start from checkpoint cache")
        mf, is_mp2 = make_scf(mol, method, density_fit, **opts)
        e = mf.kernel(dm0=dm0)
        if not mf.converged:
            if log:
                log("SCF not converged; retrying with level shift + damping")
            mf2, _ = make_scf(mol, method, density_fit,
                              level_shift=0.3, damp=0.3, max_cycle=200,
                              **opts)
            e2 = mf2.kernel(dm0=mf.make_rdm1())
            if mf2.converged:
                mf = mf2
                e = e2
        if _SCF_CACHE is not None and mf.converged:
            try:
                _SCF_CACHE.put(mf, method)
            except Exception:
                pass
    if is_mp2:
        from cctpu.mp.mp2 import MP2
        pt = MP2(mf)
        ec, et = pt.kernel()
        mf.e_corr = ec
        mf.e_tot_mp2 = et
        return mf, et
    return mf, e


def build_molecule(args, basis=None, spin=None, log=None) -> Molecule:
    basis = resolve_basis(basis or args.basis, log)
    mol = smiles_to_molecule(args.smiles, charge=args.charge,
                             spin=args.spin if spin is None else spin,
                             basis=basis)
    return mol


def homo_lumo(mf):
    e = np.array(mf.mo_energy)
    if e.ndim == 2:
        e = e[0]
        nocc = mf.mol.nalpha
    else:
        nocc = mf.mol.nelectron // 2
    return float(e[nocc - 1]), float(e[nocc])


class Timer:
    def __init__(self):
        self.t0 = time.time()

    def lap(self):
        return time.time() - self.t0
