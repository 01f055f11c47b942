"""Micro-probes for the axon TPU device-assembly corruption.

isolate_device_build.py showed build_2c2e_device differs from the eager
host-assembled metric by ~5e-2 (scale 5.6) on water — one of the device
primitives used by the round-2 assembly path miscompiles on this
experimental platform. Probe each in isolation:

  P1  f64 advanced-index .at[].set scatter vs numpy
  P2  _class_batch_fn (lax.map super-batch) vs _quartet_vmapped (round-1
      proven) on identical quartets
  P3  donated-scatter CHAIN (the exact accumulate pattern of the builder)
  P4  f64 matmul (the whitening) vs host numpy

Usage: python scripts/micro_probe.py
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


def p1_scatter():
    # collision-free layout: P rows distinct per quartet (so every
    # (P,a,b) target is written exactly once) and a/b value ranges
    # disjoint (so ab and ba-mirror writes never overlap)
    rng = np.random.default_rng(0)
    out0 = np.zeros((257, 129, 130))
    n, sP, sa, sb = 85, 3, 5, 1
    blocks = rng.standard_normal((n, sP, sa, sb))
    pi = (3 * np.arange(n)[:, None] + np.arange(sP)).astype(np.int32)
    ai = rng.integers(0, 60, (n, 1)).astype(np.int32) + np.arange(sa,
                                                                  dtype=np.int32)
    bi = rng.integers(64, 124, (n, sb)).astype(np.int32)

    def fn(out, blocks, pi, ai, bi):
        out = out.at[pi[:, :, None, None], ai[:, None, :, None],
                     bi[:, None, None, :]].set(blocks)
        return out.at[pi[:, :, None, None], bi[:, None, :, None],
                      ai[:, None, None, :]].set(blocks.swapaxes(2, 3))

    dev = np.asarray(jax.jit(fn)(jnp.asarray(out0), jnp.asarray(blocks),
                                 jnp.asarray(pi), jnp.asarray(ai),
                                 jnp.asarray(bi)))
    # numpy reference (same last-write-wins order for distinct indices;
    # use distinct indices to avoid duplicate ambiguity)
    ref = out0.copy()
    ref[pi[:, :, None, None], ai[:, None, :, None],
        bi[:, None, None, :]] = blocks
    ref[pi[:, :, None, None], bi[:, None, :, None],
        ai[:, None, None, :]] = blocks.swapaxes(2, 3)
    log(f"P1 scatter f64: max|d|={np.abs(dev - ref).max():.3e}")


def p2_superbatch():
    from cctpu.core.molecule import Molecule
    from cctpu.ints.df import autoaux, _class_batch_fn, _pow2_rows, \
        _DUMMY_E, _DUMMY_C
    from cctpu.ints.two_electron import _quartet_vmapped, _class_chunk
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")
    aux = autoaux(mol.basis_set)
    coords = jnp.asarray(mol.coords)
    de = jnp.asarray(_DUMMY_E)
    dc = jnp.asarray(_DUMMY_C)
    ls_sorted = sorted(aux.groups)
    worst = 0.0
    for lP in ls_sorted[:2]:
        gP = aux.groups[lP]
        nP = len(gP.shell_idx)
        Pe = jnp.asarray(_pow2_rows(gP.exps, floor=2048))
        Pc = jnp.asarray(_pow2_rows(gP.coefs, floor=2048))
        Pxyz = coords[jnp.asarray(_pow2_rows(gP.atom_idx, floor=2048))]
        lQ = lP
        ls = (lP, 0, lQ, 0)
        kern = _class_batch_fn(ls, None, "float64", True)
        chunk = _class_chunk(ls, gP.exps.shape[1], 1, gP.exps.shape[1], 1)
        n = nP * nP
        q1, q2 = np.mgrid[0:nP, 0:nP]
        q1, q2 = q1.ravel(), q2.ravel()
        npad = (-n) % chunk
        q1p = np.concatenate([q1, np.zeros(npad, np.int64)]).astype(np.int32)
        q2p = np.concatenate([q2, np.zeros(npad, np.int64)]).astype(np.int32)
        sb = len(q1p) // chunk
        blocks = kern(Pe, Pc, Pxyz, de, dc, Pe, Pc, Pxyz, de, dc, Pxyz,
                      jnp.asarray(q1p.reshape(sb, chunk)),
                      jnp.asarray(q2p.reshape(sb, chunk)))
        blocks = np.asarray(blocks)[:n]          # [n, sP, sQ]

        vkern = _quartet_vmapped(ls, None)
        ref = []
        for s in range(0, len(q1p), chunk):
            s1, s2 = q1p[s:s + chunk], q2p[s:s + chunk]
            blk = vkern(
                jnp.asarray(np.asarray(_pow2_rows(gP.exps, 2048))[s1]),
                jnp.asarray(np.asarray(_pow2_rows(gP.coefs, 2048))[s1]),
                Pxyz[jnp.asarray(s1)],
                de[None, :].repeat(len(s1), 0),
                dc[None, :].repeat(len(s1), 0), Pxyz[jnp.asarray(s1)],
                jnp.asarray(np.asarray(_pow2_rows(gP.exps, 2048))[s2]),
                jnp.asarray(np.asarray(_pow2_rows(gP.coefs, 2048))[s2]),
                Pxyz[jnp.asarray(s2)],
                de[None, :].repeat(len(s2), 0),
                dc[None, :].repeat(len(s2), 0), Pxyz[jnp.asarray(s2)])
            ref.append(np.asarray(blk)[:, :, 0, :, 0])
        ref = np.concatenate(ref)[:n]
        d = np.abs(blocks - ref).max()
        worst = max(worst, d)
        log(f"P2 class lP={lP}: max|d|={d:.3e} scale={np.abs(ref).max():.2e}")
    log(f"P2 superbatch-vs-vmapped worst: {worst:.3e}")


def p3_donated_chain():
    rng = np.random.default_rng(1)
    out = jnp.zeros((300, 300))

    def fn(out, vals, pi, qi):
        out = out.at[pi[:, :, None], qi[:, None, :]].set(vals)
        return out.at[qi[:, :, None], pi[:, None, :]].set(
            vals.swapaxes(1, 2))

    scat = jax.jit(fn, donate_argnums=0)
    ref = np.zeros((300, 300))
    for k in range(30):
        vals = rng.standard_normal((40, 3, 3))
        # pi in [0,150), qi in [150,300): direct writes hit the upper-
        # right block, mirrors the lower-left — never each other
        pi = (3 * rng.permutation(50)[:40, None] + np.arange(3)
              ).astype(np.int32)
        qi = (150 + 3 * rng.permutation(50)[:40, None] + np.arange(3)
              ).astype(np.int32)
        out = scat(out, jnp.asarray(vals), jnp.asarray(pi),
                   jnp.asarray(qi))
        ref[pi[:, :, None], qi[:, None, :]] = vals
        ref[qi[:, :, None], pi[:, None, :]] = vals.swapaxes(1, 2)
    log(f"P3 donated chain: max|d|={np.abs(np.asarray(out) - ref).max():.3e}")


def p4_matmul():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((400, 400))
    B = rng.standard_normal((400, 500))
    with jax.default_matmul_precision("highest"):
        dev = np.asarray(jax.jit(lambda a, b: a @ b)(
            jnp.asarray(A), jnp.asarray(B)))
    ref = A @ B
    log(f"P4 f64 matmul: max|d|={np.abs(dev - ref).max():.3e} "
        f"(scale {np.abs(ref).max():.2e})")




def p4b_matmul_default():
    """f64 matmul WITHOUT the 'highest' context: on TPU the precision
    flag applies to the f64 dot too — 'highest' coerces a 6-pass bf16
    algorithm (f32-grade), the default goes through proper f64
    emulation. P4 vs P4b separates the two."""
    rng = np.random.default_rng(2)
    A = rng.standard_normal((400, 400))
    B = rng.standard_normal((400, 500))
    dev = np.asarray(jax.jit(lambda a, b: a @ b)(
        jnp.asarray(A), jnp.asarray(B)))
    ref = A @ B
    log(f"P4b f64 matmul (default prec): max|d|="
        f"{np.abs(dev - ref).max():.3e} (scale {np.abs(ref).max():.2e})")


def p5_2c2e_assembly():
    """build_2c2e_device vs build_2c2e_hostassemble: identical superbatch
    kernels, only the assembly differs -> any diff is the device-side
    scatter/accumulation at realistic shapes."""
    from cctpu.core.molecule import Molecule
    from cctpu.ints.df import (autoaux, build_2c2e_device,
                               build_2c2e_hostassemble, build_2c2e_eager)
    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")
    aux = autoaux(mol.basis_set)
    M_dev = np.asarray(build_2c2e_device(aux, mol.coords))
    log("P5 M_dev done")
    M_host = np.asarray(build_2c2e_hostassemble(aux, mol.coords))
    d = np.abs(M_dev - M_host)
    log(f"P5 device-vs-hostassemble: max|d|={d.max():.3e}")
    if d.max() > 1e-9:
        bad = np.argwhere(d > 0.5 * d.max())[:8]
        # which aux l-groups do the bad rows belong to
        row_l = np.zeros(aux.nao, int)
        for l, g in aux.groups.items():
            for s in g.ao_start:
                row_l[s:s + 2 * l + 1] = l
        log(f"P5 worst rows (l): {[(int(r), int(row_l[r]), int(c), int(row_l[c])) for r, c in bad]}")
    M_eag = np.asarray(build_2c2e_eager(aux, mol.coords))
    d2 = np.abs(M_host - M_eag)
    log(f"P5 hostassemble-vs-eager (kernel path): max|d|={d2.max():.3e}")


if __name__ == "__main__":
    log(f"backend {jax.devices()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        p1_scatter()
        p4_matmul()
        p3_donated_chain()
        p2_superbatch()
    if which in ("all", "p5"):
        p4b_matmul_default()
        p5_2c2e_assembly()
