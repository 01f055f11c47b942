"""Validate the HIGHEST-precision integral-kernel fix on the axon TPU.

Stage 1 (run with JAX_PLATFORMS=cpu):   compute the water 6-31g* autoaux
metric + a 3c2e slab in true f64, save to /tmp/probe_fix_ref.npz.
Stage 2 (run with JAX_PLATFORMS=axon):  build the same tensors with the
device superbatch builders and report max|diff| vs the stored reference.
Expected after the fix: ~1e-7 * scale (f32-grade — the axon device floor);
before the fix the metric was wrong by 5e-2 (bf16-grade contraction).
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np
import jax

t0 = time.time()


def log(m):
    print(f"# {time.time() - t0:7.1f}s {m}", flush=True)


def make_mol():
    from cctpu.core.molecule import Molecule
    return Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")


REF = "/tmp/probe_fix_ref.npz"


def stage_cpu():
    from cctpu.ints.df import autoaux, build_2c2e_eager, build_3c2e_eager
    mol = make_mol()
    aux = autoaux(mol.basis_set)
    M = np.asarray(build_2c2e_eager(aux, mol.coords))
    X = np.asarray(build_3c2e_eager(mol.basis_set, aux, mol.coords))
    np.savez(REF, M=M, X=X)
    log(f"CPU reference saved: naux={aux.nao} nao={mol.nao} "
        f"|M|max={np.abs(M).max():.3e}")


def stage_axon():
    from cctpu.ints.df import autoaux, build_2c2e_device, build_3c2e_device
    mol = make_mol()
    aux = autoaux(mol.basis_set)
    ref = np.load(REF)
    log(f"backend {jax.devices()}")
    M = np.asarray(build_2c2e_device(aux, mol.coords))
    dM = np.abs(M - ref["M"]).max()
    log(f"M device-vs-cpu: max|d|={dM:.3e} (scale {np.abs(ref['M']).max():.2e})")
    X = np.asarray(build_3c2e_device(mol.basis_set, aux, mol.coords))
    dX = np.abs(X - ref["X"]).max()
    log(f"X device-vs-cpu: max|d|={dX:.3e} (scale {np.abs(ref['X']).max():.2e})")
    ok = dM < 5e-6 and dX < 5e-6
    log(f"RESULT: {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    which = sys.argv[1]
    if which == "cpu":
        stage_cpu()
    else:
        stage_axon()
