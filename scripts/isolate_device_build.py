"""TPU isolation probe for the device-resident DF assembly.

Round-3 finding: phenol device B3LYP is wrong by ~0.05 Ha even with
HOST-f64 metric whitening, so the round-2 regression is not (only) the
metric factorization: suspicion falls on the device-resident 3c2e/2c2e
ASSEMBLY (build_*_device, new in round 2), since round 1 — same quartet
kernels on the same device, but host-side assembly — hit 4.5e-5.

Runs on whatever backend the session provides (axon TPU in production):
compares, stage by stage,
  X_dev  = build_3c2e_device(...)   [device scatter assembly]
  X_eag  = build_3c2e_eager(...)    [host assembly, device kernels]
  M_dev  = build_2c2e_device(...)
  M_eag  = build_2c2e_eager(...)
and reports max abs deviations + the fitted-ERI anchor from each B.

Usage: python scripts/isolate_device_build.py [water|phenol]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

import bench
from cctpu.core.molecule import Molecule
from cctpu.ints.df import (autoaux, build_2c2e_device, build_2c2e_eager,
                           build_3c2e_device, build_3c2e_eager,
                           metric_factor, _whiten_fn)

GEOMS = {
    "water": ("O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
              "6-31g*"),
    "phenol": (bench.PHENOL, "6-31g*"),
}


def main(which):
    atoms, basis = GEOMS[which]
    t0 = time.time()

    def log(m):
        print(f"# {time.time() - t0:7.1f}s {m}", flush=True)

    import jax
    log(f"backend: {jax.devices()}")
    mol = Molecule.from_atoms(atoms, basis=basis)
    aux = autoaux(mol.basis_set)
    log(f"nao={mol.nao} naux={aux.nao}")

    M_dev = np.asarray(build_2c2e_device(aux, mol.coords))
    log("M_dev done")
    M_eag = np.asarray(build_2c2e_eager(aux, mol.coords))
    log(f"M_eag done; max|dM|={np.abs(M_dev - M_eag).max():.3e} "
        f"(scale {np.abs(M_eag).max():.3e})")

    X_dev = np.asarray(build_3c2e_device(mol.basis_set, aux, mol.coords))
    log("X_dev done")
    X_eag = np.asarray(build_3c2e_eager(mol.basis_set, aux, mol.coords))
    dX = np.abs(X_dev - X_eag)
    log(f"X_eag done; max|dX|={dX.max():.3e} (scale "
        f"{np.abs(X_eag).max():.3e}); n>1e-6: {(dX > 1e-6).sum()}")
    if dX.max() > 1e-6:
        idx = np.unravel_index(np.argmax(dX), dX.shape)
        log(f"worst element {idx}: dev={X_dev[idx]:.6e} "
            f"eag={X_eag[idx]:.6e}")
        # localize: which aux rows / AO pairs disagree
        bad = np.argwhere(dX > 1e-6)
        log(f"bad aux rows: {sorted(set(bad[:, 0].tolist()))[:12]}")
        log(f"bad ao rows:  {sorted(set(bad[:, 1].tolist()))[:12]}")

    import jax.numpy as jnp
    Linv = metric_factor(jnp.asarray(M_eag))
    B_dev = np.asarray(_whiten_fn("float64")(Linv, jnp.asarray(X_dev)))
    B_eag = np.asarray(_whiten_fn("float64")(Linv, jnp.asarray(X_eag)))
    err_dev = bench.df_anchor(mol, jnp.asarray(B_dev), atoms=[0, 1, 2])
    err_eag = bench.df_anchor(mol, jnp.asarray(B_eag), atoms=[0, 1, 2])
    log(f"fitted-ERI anchor: dev-B={err_dev:.3e}  eager-B={err_eag:.3e}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "water")
