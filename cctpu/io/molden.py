"""Molden orbital-file export (reference save_molden_file,
templates/calculate_casscf.py:214-222)."""

from __future__ import annotations

import numpy as np

from cctpu.core.basis import L_SYMBOLS
from cctpu.core.constants import BOHR


def write_molden(path: str, mol, mo_coeff, mo_energy=None, mo_occ=None):
    basis = mol.basis_set
    C = np.array(mo_coeff)
    n = C.shape[1]
    if mo_energy is None:
        mo_energy = np.zeros(n)
    if mo_occ is None:
        mo_occ = np.zeros(n)
    with open(path, "w") as f:
        f.write("[Molden Format]\n[Atoms] AU\n")
        for i, (s, z, r) in enumerate(zip(mol.element_symbols,
                                          mol.charges, mol.coords)):
            f.write(f"{s:3s} {i + 1:4d} {int(z):3d} "
                    f"{r[0]:14.8f} {r[1]:14.8f} {r[2]:14.8f}\n")
        f.write("[GTO]\n")
        for ia in range(mol.natm):
            f.write(f"{ia + 1} 0\n")
            for sh in basis.shells:
                if sh.atom != ia:
                    continue
                f.write(f" {L_SYMBOLS[sh.l]} {len(sh.exps)} 1.00\n")
                for e, c in zip(sh.exps, sh.coefs):
                    f.write(f"  {e:18.10e} {c:18.10e}\n")
            f.write("\n")
        f.write("[5D]\n[7F]\n[9G]\n")
        f.write("[MO]\n")
        for k in range(n):
            f.write(f" Sym= A\n Ene= {float(mo_energy[k]):.6f}\n"
                    f" Spin= Alpha\n Occup= {float(mo_occ[k]):.6f}\n")
            for i in range(C.shape[0]):
                f.write(f"  {i + 1:4d}  {C[i, k]:18.10e}\n")
