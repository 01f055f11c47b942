"""Probe: localize the 2c2e builder corruption to a compiled executable.

probe_bisect.py (2026-08-20) showed, for the water 6-31G* autoaux metric
on the axon TPU:
  - per-class S (f64 HIGHEST, lax.map superbatch, Q tables padded to the
    DEFAULT 32768-row floor) is EXACT vs the CPU f64 reference (1e-14);
  - build_2c2e_device / _hostassemble (IDENTICAL kernel code, Q tables
    padded to floor=2048) are both wrong by 5.04e-2 and agree with each
    other exactly — so the scatter/assembly is innocent.
The only degrees of freedom left are the padded table SHAPES (which
select a different compiled executable) and the i<=j subsetting of the
quartet list (values only, can't affect compilation).

Hypotheses:
  H1 stale artifact — the floor-2048 executables in the PERSISTENT axon
     compile cache (~/.cache/cctpu_jax_*_axon, shared across boots since
     round 2) were corrupted when first compiled and reload forever;
     a fresh compile of the same HLO is exact.
  H2 deterministic shape-dependent miscompile — floor-2048 shapes
     miscompile today too; fresh compile reproduces the error.

Stage A (existing cache, fast): per 2c2e class, builder-exact shapes.
Stage B: same classes, CCTPU_JAX_CACHE pointed at a fresh temp dir
         (pass 'fresh' as argv[1] BEFORE cctpu import resolves the env).

Usage:
  python scripts/probe_floor.py                  # stage A
  python scripts/probe_floor.py fresh [lP,lQ]    # stage B (opt. one class)

Stage A result (2026-08-20): 14/15 classes EXACT (1e-13); class
lP=2 lQ=4 wrong by 5.04e-2 == the full-builder error. ONE corrupt
compiled executable.
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

FRESH = len(sys.argv) > 1 and sys.argv[1] == "fresh"
ONLY = None
if len(sys.argv) > 2:
    ONLY = tuple(int(x) for x in sys.argv[2].split(","))
if FRESH:
    os.environ["CCTPU_JAX_CACHE"] = "/tmp/cctpu_fresh_cache"
os.environ["CCTPU_SPLIT_DOTS"] = "0"

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def log(m):
    print(f"# {time.time() - t0:7.1f}s {m}", flush=True)


def main():
    from cctpu.core.molecule import Molecule
    from cctpu.ints.df import (autoaux, _class_batch_fn, _pow2_rows,
                               _DUMMY_E, _DUMMY_C, _superbatches)
    from cctpu.ints.two_electron import _class_chunk
    from cctpu.core.basis import nsph

    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")
    aux = autoaux(mol.basis_set)
    ref = np.load("/tmp/probe_fix_ref.npz")["M"]
    coords = jnp.asarray(mol.coords)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    log(f"backend {jax.devices()} naux={aux.nao} fresh_cache={FRESH} "
        f"cache={jax.config.jax_compilation_cache_dir}")

    ls_sorted = sorted(aux.groups)
    worst = 0.0
    for ii, lP in enumerate(ls_sorted):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        sP = nsph(lP)
        Pe = jnp.asarray(_pow2_rows(gP.exps, floor=2048))
        Pc = jnp.asarray(_pow2_rows(gP.coefs, floor=2048))
        Pxyz = coords[jnp.asarray(_pow2_rows(gP.atom_idx, floor=2048))]
        for lQ in ls_sorted[ii:]:
            if ONLY is not None and (lP, lQ) != ONLY:
                continue
            gQ = aux.groups[lQ]
            nQ = len(gQ.shell_idx)
            sQ = nsph(lQ)
            # builder-exact: floor=2048 on the Q side too
            Qe = jnp.asarray(_pow2_rows(gQ.exps, floor=2048))
            Qc = jnp.asarray(_pow2_rows(gQ.coefs, floor=2048))
            Qxyz = coords[jnp.asarray(_pow2_rows(gQ.atom_idx, floor=2048))]
            q1, q2 = np.mgrid[0:nP, 0:nQ]
            q1, q2 = q1.ravel(), q2.ravel()
            if lP == lQ:
                keep = q1 <= q2
                q1, q2 = q1[keep], q2[keep]
            ls = (lP, 0, lQ, 0)
            chunk = _class_chunk(ls, gP.exps.shape[1], 1, gQ.exps.shape[1], 1)
            kern = _class_batch_fn(ls, None, "float64", True, False)
            refblk = np.zeros((len(q1), sP, sQ))
            for t, (i, j) in enumerate(zip(q1, q2)):
                p0, q0 = gP.ao_start[i], gQ.ao_start[j]
                refblk[t] = ref[p0:p0 + sP, q0:q0 + sQ]
            got = []
            for i1, i2, padm in _superbatches(
                    q1.astype(np.int32), q2.astype(np.int32), chunk):
                b = kern(Pe, Pc, Pxyz, de, dc, Qe, Qc, Qxyz,
                         de, dc, Qxyz, jnp.asarray(i1), jnp.asarray(i2))
                got.append(np.asarray(b)[~padm])
            got = np.concatenate(got)[:len(q1)]
            d = np.abs(got - refblk).max()
            worst = max(worst, d)
            log(f"class lP={lP} lQ={lQ} nq={len(q1)} chunk={chunk}: "
                f"max|d|={d:.2e} scale={np.abs(refblk).max():.1e}")
    log(f"WORST per-class: {worst:.3e} -> "
        f"{'H2 (miscompile today)' if worst > 1e-6 else 'classes clean'}"
        if FRESH else
        f"WORST per-class: {worst:.3e}")

    if ONLY is None:
        from cctpu.ints.df import build_2c2e_device
        M_dev = np.asarray(build_2c2e_device(aux, mol.coords))
        log(f"build_2c2e_device    max|d|={np.abs(M_dev - ref).max():.3e}")


if __name__ == "__main__":
    main()
