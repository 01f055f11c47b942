"""Bisect the device 2c2e corruption (round-4, after probe_fix showed
M device-vs-cpu = 5.0e-2 while isolated f64 dots measure exact).

For the water 6-31G* autoaux metric, per (lP, lQ) class:
  V  _quartet_vmapped kernel (vmap+jit, f64 HIGHEST)     — r1 trusted path
  S  _class_batch_fn f64 (lax.map superbatch)            — production path
  X  _class_batch_fn split (bf16 3-slice compensated)    — candidate fix
each compared against the CPU f64 reference (/tmp/probe_fix_ref.npz from
probe_fix.py stage cpu). Then full builders:
  build_2c2e_device (device scatter) vs build_2c2e_hostassemble (host
  assembly, same kernels) — isolates scatter-vs-kernel.

Usage: python scripts/probe_bisect.py
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

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
    from cctpu.ints.two_electron import _quartet_vmapped, _class_chunk
    from cctpu.core.basis import nsph

    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")
    aux = autoaux(mol.basis_set)
    ref = np.load("/tmp/probe_fix_ref.npz")["M"]
    coords = jnp.asarray(mol.coords)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    log(f"backend {jax.devices()} naux={aux.nao}")

    for lP in sorted(aux.groups):
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        sP = nsph(lP)
        Pe = jnp.asarray(_pow2_rows(gP.exps, floor=2048))
        Pc = jnp.asarray(_pow2_rows(gP.coefs, floor=2048))
        Pxyz = coords[jnp.asarray(_pow2_rows(gP.atom_idx, floor=2048))]
        for lQ in sorted(aux.groups):
            if lQ < lP:
                continue
            gQ = aux.groups[lQ]
            nQ = len(gQ.shell_idx)
            sQ = nsph(lQ)
            Qe = jnp.asarray(_pow2_rows(gQ.exps))
            Qc = jnp.asarray(_pow2_rows(gQ.coefs))
            Qxyz = coords[jnp.asarray(_pow2_rows(gQ.atom_idx))]
            ls = (lP, 0, lQ, 0)
            q1, q2 = np.mgrid[0:nP, 0:nQ]
            q1, q2 = q1.ravel().astype(np.int32), q2.ravel().astype(np.int32)
            chunk = _class_chunk(ls, gP.exps.shape[1], 1, gQ.exps.shape[1], 1)

            # reference block rows for this class
            refblk = np.zeros((len(q1), sP, sQ))
            for t, (i, j) in enumerate(zip(q1, q2)):
                p0, q0 = gP.ao_start[i], gQ.ao_start[j]
                refblk[t] = ref[p0:p0 + sP, q0:q0 + sQ]

            outs = {}
            # V: vmapped kernel
            vk = _quartet_vmapped(ls, None)
            blks = []
            npad = (-len(q1)) % chunk
            q1p = np.concatenate([q1, np.zeros(npad, np.int32)])
            q2p = np.concatenate([q2, np.zeros(npad, np.int32)])
            Pe_h = np.asarray(_pow2_rows(gP.exps, floor=2048))
            Pc_h = np.asarray(_pow2_rows(gP.coefs, floor=2048))
            Qe_h = np.asarray(_pow2_rows(gQ.exps))
            Qc_h = np.asarray(_pow2_rows(gQ.coefs))
            for s in range(0, len(q1p), chunk):
                s1, s2 = q1p[s:s+chunk], q2p[s:s+chunk]
                b = vk(jnp.asarray(Pe_h[s1]), jnp.asarray(Pc_h[s1]),
                       Pxyz[jnp.asarray(s1)],
                       de[None].repeat(len(s1), 0),
                       dc[None].repeat(len(s1), 0), Pxyz[jnp.asarray(s1)],
                       jnp.asarray(Qe_h[s2]), jnp.asarray(Qc_h[s2]),
                       Qxyz[jnp.asarray(s2)],
                       de[None].repeat(len(s2), 0),
                       dc[None].repeat(len(s2), 0), Qxyz[jnp.asarray(s2)])
                blks.append(np.asarray(b)[:, :, 0, :, 0])
            outs["V"] = np.concatenate(blks)[:len(q1)]

            # S / X: superbatch kernels
            for tag, split in (("S", False), ("X", True)):
                kern = _class_batch_fn(ls, None, "float64", True, split)
                got = []
                for i1, i2, padm in _superbatches(q1, q2, chunk):
                    b = kern(Pe, Pc, Pxyz, de, dc, Qe, Qc, Qxyz,
                             de, dc, Qxyz, jnp.asarray(i1), jnp.asarray(i2))
                    got.append(np.asarray(b)[~padm])
                outs[tag] = np.concatenate(got)[:len(q1)]

            msg = " ".join(
                f"{tag}={np.abs(outs[tag] - refblk).max():.2e}"
                for tag in ("V", "S", "X"))
            log(f"class lP={lP} lQ={lQ} nq={len(q1)} chunk={chunk}: {msg} "
                f"scale={np.abs(refblk).max():.1e}")

    # full builders
    from cctpu.ints.df import build_2c2e_device, build_2c2e_hostassemble
    M_dev = np.asarray(build_2c2e_device(aux, mol.coords))
    log(f"build_2c2e_device    max|d|={np.abs(M_dev - ref).max():.3e}")
    M_host = np.asarray(build_2c2e_hostassemble(aux, mol.coords))
    log(f"build_2c2e_hostasm   max|d|={np.abs(M_host - ref).max():.3e}")
    log(f"device-vs-hostasm    max|d|={np.abs(M_dev - M_host).max():.3e}")


if __name__ == "__main__":
    main()
