"""Empirical dispersion corrections (DFT-D2, two damping forms).

Grimme's D2 (J. Comput. Chem. 27, 1787 (2006)):
  E_disp = -s6 * sum_{i<j} C6_ij / R_ij^6 * f_damp(R_ij),
  C6_ij = sqrt(C6_i C6_j), Fermi damping f = 1/(1 + exp(-d (R/Rr - 1))),
  d = 20.
Chai-Head-Gordon damping (wB97X-D, PCCP 10, 6615 (2008)):
  f = 1/(1 + a (R/Rr)^{-12}), a = 6.0, s6 = 1.

The energy is a pure function of nuclear coordinates written in jnp, so the
same code serves the SCF energy and (by AD) nuclear gradients/Hessians.
Dispatch is driven by XCFunctional.dispersion ('d2' | 'd2-chg').
Parameters: published D2 tables (C6 in J nm^6/mol, R_r in Angstrom).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cctpu.core.constants import ANG2BOHR

# C6 (J nm^6 mol^-1) and vdW radii (Angstrom) — Grimme 2006 Table 1
_C6 = {1: 0.14, 2: 0.08, 3: 1.61, 4: 1.61, 5: 3.13, 6: 1.75, 7: 1.23,
       8: 0.70, 9: 0.75, 10: 0.63, 11: 5.71, 12: 5.71, 13: 10.79,
       14: 9.23, 15: 7.84, 16: 5.57, 17: 5.07, 18: 4.61,
       19: 10.80, 20: 10.80, 35: 12.47, 53: 31.50}
_R0 = {1: 1.001, 2: 1.012, 3: 0.825, 4: 1.408, 5: 1.485, 6: 1.452,
       7: 1.397, 8: 1.342, 9: 1.287, 10: 1.243, 11: 1.144, 12: 1.364,
       13: 1.639, 14: 1.716, 15: 1.705, 16: 1.683, 17: 1.639, 18: 1.595,
       19: 1.485, 20: 1.474, 35: 1.749, 53: 1.892}

S6 = {"blyp": 1.2, "b3lyp": 1.05, "b3lyp5": 1.05, "pbe": 0.75,
      "pbe0": 0.6, "cam-b3lyp": 1.0, "wb97x-d": 1.0, "m06-2x": 0.06,
      "m06": 0.25}

_JNM6_TO_AU = 17.34527758637742   # J nm^6/mol -> Ha bohr^6


def _pair_tables(Z):
    Z = np.asarray(Z).astype(int)
    c6 = np.array([_C6.get(int(z), 1.75) for z in Z]) * _JNM6_TO_AU
    r0 = np.array([_R0.get(int(z), 1.5) for z in Z]) * ANG2BOHR
    real = (Z > 0).astype(float)          # ghost atoms carry no dispersion
    c6ij = np.sqrt(np.outer(c6, c6)) * np.outer(real, real)
    rrij = r0[:, None] + r0[None, :]
    n = len(Z)
    mask = np.triu(np.ones((n, n)), k=1)
    return jnp.asarray(c6ij * mask), jnp.asarray(rrij)


def d2_energy(mol, coords=None, s6: float = 1.0, damping: str = "fermi",
              d: float = 20.0, a: float = 6.0):
    """D2 dispersion energy in Hartree. Differentiable in ``coords``
    (pass traced coords for gradients); host float when coords is None."""
    c6ij, rrij = _pair_tables(mol.charges)
    R = jnp.asarray(mol.coords if coords is None else coords)
    diff = R[:, None, :] - R[None, :, :]
    r2 = jnp.sum(diff * diff, -1) + jnp.eye(R.shape[0])
    rij = jnp.sqrt(r2)
    x = rij / rrij
    if damping == "chg":
        fd = 1.0 / (1.0 + a * x ** (-12))
    else:
        fd = 1.0 / (1.0 + jnp.exp(-d * (x - 1.0)))
    e = -s6 * jnp.sum(c6ij / rij ** 6 * fd)
    return e if coords is not None else float(e)


def dispersion_energy(func, mol, coords=None):
    """Dispersion term for an XCFunctional (0 when func.dispersion unset).

    Reference surface: the '-D' methods (wB97X-D default in
    templates/calculate_bde.py:503) and the optional -d2 suffix convention.
    """
    kind = getattr(func, "dispersion", None)
    if not kind:
        return 0.0 if coords is None else jnp.asarray(0.0)
    s6key = func.name.lower()
    if s6key not in S6:
        for suf in ("-d2", "-d"):
            if s6key.endswith(suf):
                s6key = s6key[:-len(suf)]
                break
    s6 = S6.get(s6key, 1.0)
    if kind == "d2-chg":
        return d2_energy(mol, coords, s6=s6, damping="chg")
    return d2_energy(mol, coords, s6=s6, damping="fermi")


def dispersion_for(xc_name: str, mol) -> float:
    """Name-suffix driven dispersion (the '-d'/'-d2' method spelling)."""
    key = xc_name.lower()
    if key == "wb97x-d":
        return d2_energy(mol, s6=S6[key], damping="chg")
    if key.endswith("-d") or key.endswith("-d2"):
        key = key.rsplit("-", 1)[0]
        return d2_energy(mol, s6=S6.get(key, 1.0))
    return 0.0
