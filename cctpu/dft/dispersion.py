"""Empirical dispersion corrections (DFT-D2).

Grimme's D2 (J. Comput. Chem. 27, 1787 (2006)): E_disp =
-s6 * sum_{i<j} C6_ij / R_ij^6 * f_damp(R_ij), C6_ij = sqrt(C6_i C6_j),
f_damp = 1/(1 + exp(-d (R/R_r - 1))), d = 20.

Used for the '-d' method variants (the reference exposes wB97X-D,
calculate_bde.py:503; its bespoke D parameters pend — D2 with the
functional-appropriate s6 is the round-1 dispersion channel).
Parameters: published D2 tables (C6 in J nm^6/mol, R_r in Angstrom).
"""

from __future__ import annotations

import numpy as np

from cctpu.core import elements as elem
from cctpu.core.constants import ANG2BOHR

# C6 (J nm^6 mol^-1) and vdW radii (Angstrom) — Grimme 2006 Table 1
_C6 = {1: 0.14, 2: 0.08, 3: 1.61, 4: 1.61, 5: 3.13, 6: 1.75, 7: 1.23,
       8: 0.70, 9: 0.75, 10: 0.63, 11: 5.71, 12: 5.71, 13: 10.79,
       14: 9.23, 15: 7.84, 16: 5.57, 17: 5.07, 18: 4.61,
       35: 12.47, 53: 31.50}
_R0 = {1: 1.001, 2: 1.012, 3: 0.825, 4: 1.408, 5: 1.485, 6: 1.452,
       7: 1.397, 8: 1.342, 9: 1.287, 10: 1.243, 11: 1.144, 12: 1.364,
       13: 1.639, 14: 1.716, 15: 1.705, 16: 1.683, 17: 1.639, 18: 1.595,
       35: 1.749, 53: 1.892}

S6 = {"blyp": 1.2, "b3lyp": 1.05, "b3lyp5": 1.05, "pbe": 0.75,
      "pbe0": 0.6, "cam-b3lyp": 1.0, "wb97x-d": 1.0, "m06-2x": 0.06}

_JNM6_TO_AU = 17.34527758637742   # J nm^6/mol -> Ha bohr^6


def d2_energy(mol, s6: float = 1.0, d: float = 20.0) -> float:
    """D2 dispersion energy in Hartree (host-side numpy; the term is
    classical and geometry-smooth — AD variants trivial if needed)."""
    Z = mol.charges.astype(int)
    R = mol.coords
    e = 0.0
    n = mol.natm
    for i in range(n):
        if Z[i] == 0:
            continue
        for j in range(i + 1, n):
            if Z[j] == 0:
                continue
            c6 = np.sqrt(_C6.get(int(Z[i]), 1.75)
                         * _C6.get(int(Z[j]), 1.75)) * _JNM6_TO_AU
            rr = (_R0.get(int(Z[i]), 1.5)
                  + _R0.get(int(Z[j]), 1.5)) * ANG2BOHR
            rij = np.linalg.norm(R[i] - R[j])
            fd = 1.0 / (1.0 + np.exp(-d * (rij / rr - 1.0)))
            e -= s6 * c6 / rij ** 6 * fd
    return float(e)


def dispersion_for(xc_name: str, mol) -> float:
    key = xc_name.lower()
    if key.endswith("-d") or key.endswith("-d2"):
        key = key.rsplit("-", 1)[0]
        return d2_energy(mol, s6=S6.get(key, 1.0))
    if key in ("wb97x-d",):
        return d2_energy(mol, s6=S6[key])
    return 0.0
