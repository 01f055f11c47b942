"""End-to-end check of the oracle-validated DF builders on the axon TPU.

Expected (after probe_floor H2 finding): build_2c2e_device detects the
(2,0|4,0) corrupt executable via the host-oracle spot check, retries at
bumped padding floors, and the final M matches the CPU f64 reference to
~1e-12. Then the 3c2e X builder is checked the same way.

Usage: python scripts/probe_validated_build.py [2c|3c|all]
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["CCTPU_SPLIT_DOTS"] = "0"

import numpy as np
import jax

t0 = time.time()


def log(m):
    print(f"# {time.time() - t0:7.1f}s {m}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from cctpu.core.molecule import Molecule
    from cctpu.ints.df import (autoaux, build_2c2e_device,
                               build_3c2e_device, build_3c2e_hostassemble)
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")
    aux = autoaux(mol.basis_set)
    ref = np.load("/tmp/probe_fix_ref.npz")
    log(f"backend {jax.devices()} naux={aux.nao}")
    if which in ("2c", "all"):
        M = np.asarray(build_2c2e_device(aux, mol.coords))
        log(f"M validated-build vs cpu: max|d|={np.abs(M - ref['M']).max():.3e}"
            f" (scale {np.abs(ref['M']).max():.2e})")
    if which in ("3c", "all"):
        X = np.asarray(build_3c2e_device(mol.basis_set, aux, mol.coords))
        log(f"X validated-build vs cpu: max|d|={np.abs(X - ref['X']).max():.3e}"
            f" (scale {np.abs(ref['X']).max():.2e})")
    if which == "3ch":
        X = build_3c2e_hostassemble(mol.basis_set, aux, mol.coords)
        log(f"X hostasm-build vs cpu: max|d|={np.abs(X - ref['X']).max():.3e}")


if __name__ == "__main__":
    main()
