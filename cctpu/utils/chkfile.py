"""Checkpoint/restart for SCF states and workflow artifacts.

SURVEY.md §5 checkpoint/resume: the reference's mechanisms are dm warm
starts (kernel(dm0=dm)), Hessian injection, and torch.save model state.
Here: .npz SCF checkpoints keyed by (geometry hash, method, basis) so
workflow restarts skip converged solves, plus simple save/load helpers.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np


def geometry_key(mol, method: str) -> str:
    h = hashlib.sha256()
    h.update(np.asarray(mol.coords).round(10).tobytes())
    h.update(",".join(mol.symbols).encode())
    h.update(f"{mol.charge}|{mol.spin}|{mol.basis}|{method}".encode())
    return h.hexdigest()[:20]


def save_scf(path: str, mf, method: str = ""):
    np.savez_compressed(
        path,
        e_tot=mf.e_tot,
        mo_coeff=np.asarray(mf.mo_coeff),
        mo_energy=np.asarray(mf.mo_energy),
        mo_occ=np.asarray(mf.mo_occ),
        dm=np.asarray(mf.dm),
        converged=mf.converged,
        coords=np.asarray(mf.mol.coords),
        key=geometry_key(mf.mol, method),
        basis=str(mf.mol.basis),
        nao=int(mf.mol.nao),
    )


def load_dm0(path: str, mol, method: str = "") -> Optional[np.ndarray]:
    """Return the stored density if it is usable as a warm start.

    Exact (geometry, method, basis) match returns the converged dm;
    same basis at a *different* geometry is still a good warm start and is
    returned too; a basis/nao mismatch returns None (the dm would be
    wrong-shaped or wrong-spanned)."""
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path, allow_pickle=False)
        if "nao" in z and int(z["nao"]) != int(mol.nao):
            return None
        if "basis" in z and str(z["basis"]) != str(mol.basis):
            return None
        dm = z["dm"]
        if dm.shape[-1] != int(mol.nao):
            return None
        return dm
    except Exception:
        return None


class SCFCache:
    """Directory-backed dm cache for sweep workflows (BDE bonds, scans)."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def path(self, mol, method: str) -> str:
        return os.path.join(self.dir, geometry_key(mol, method) + ".npz")

    def get(self, mol, method: str):
        return load_dm0(self.path(mol, method), mol, method)

    def put(self, mf, method: str):
        save_scf(self.path(mf.mol, method), mf, method)
