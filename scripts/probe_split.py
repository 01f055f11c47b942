"""Probe: bf16 3-slice error-compensated einsum on the axon TPU.

Round-3 postmortem (NOTES_r03.md): f64 einsums inside lax.map'ed
superbatches come out bf16-grade even with Precision.HIGHEST pinned —
the root cause of the 0.052 Ha phenol error. Candidate fix: slice each
f64 operand into 3 bf16 components (24 mantissa bits), run the 6
cross-term dots natively on the MXU (bf16 inputs, f32 accumulation —
no precision flag involved, nothing to demote), and recombine in f64.

This probe measures, on representative quartet-kernel shapes:
  A. f64 einsum @ HIGHEST, plain jit           (r1 "trusted" path)
  B. f64 einsum @ HIGHEST, inside lax.map      (r3 broken path)
  C. split einsum, plain jit
  D. split einsum, inside lax.map
against a host numpy f64 reference, plus compile wall time for each.

Usage: python scripts/probe_split.py
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

import cctpu  # noqa: F401  (x64 + HIGHEST default + compile cache)
import jax
import jax.numpy as jnp

from cctpu.ops.splitdot import split_einsum

t0 = time.time()


def log(m):
    print(f"# {time.time() - t0:7.1f}s {m}", flush=True)


def run_case(name, fn, args, ref):
    tc = time.time()
    out = np.asarray(fn(*args))
    tcomp = time.time() - tc
    t1 = time.time()
    out = np.asarray(fn(*args))
    trun = time.time() - t1
    d = np.abs(out - ref).max()
    rel = d / max(np.abs(ref).max(), 1e-300)
    log(f"{name:34s} max|d|={d:.3e} rel={rel:.3e} "
        f"compile+run={tcomp:6.2f}s run={trun:6.3f}s")
    return rel


def main():
    log(f"backend {jax.devices()}")
    rng = np.random.default_rng(0)
    # quartet-kernel-like shapes: Rbig [Kab, Kcd, T1, T2] x Ek [Kcd, ncd, T2]
    Kab, Kcd, T1, T2, ncd = 32, 32, 27, 27, 9
    nmap = 16
    A = rng.standard_normal((nmap, Kab, Kcd, T1, T2))
    A *= 10.0 ** rng.integers(-6, 3, A.shape)    # wide dynamic range
    B = rng.standard_normal((nmap, Kcd, ncd, T2))
    B *= 10.0 ** rng.integers(-6, 3, B.shape)
    ref = np.einsum("nkqxy,nqcy->nkxc", A, B)

    PH = jax.lax.Precision.HIGHEST
    sub = "kqxy,qcy->kxc"

    f64_plain = jax.jit(jax.vmap(
        lambda a, b: jnp.einsum(sub, a, b, precision=PH)))
    f64_map = jax.jit(lambda a, b: jax.lax.map(
        lambda ab: jnp.einsum(sub, ab[0], ab[1], precision=PH), (a, b)))
    sp_plain = jax.jit(jax.vmap(lambda a, b: split_einsum(sub, a, b)))
    sp_map = jax.jit(lambda a, b: jax.lax.map(
        lambda ab: split_einsum(sub, ab[0], ab[1]), (a, b)))

    Aj, Bj = jnp.asarray(A), jnp.asarray(B)
    run_case("A f64 HIGHEST vmap+jit", f64_plain, (Aj, Bj), ref)
    run_case("B f64 HIGHEST lax.map", f64_map, (Aj, Bj), ref)
    run_case("C split vmap+jit", sp_plain, (Aj, Bj), ref)
    run_case("D split lax.map", sp_map, (Aj, Bj), ref)

    # the small cart2sph-like transform too (contraction length <= 15)
    Ta = rng.standard_normal((5, 6))
    C = rng.standard_normal((nmap, 6, 6, 6, 6))
    ref2 = np.einsum("pa,nabcd->npbcd", Ta, C)
    sub2 = "pa,abcd->pbcd"
    f2_map = jax.jit(lambda t, c: jax.lax.map(
        lambda cc: jnp.einsum(sub2, t, cc, precision=PH), c))
    s2_map = jax.jit(lambda t, c: jax.lax.map(
        lambda cc: split_einsum(sub2, t, cc), c))
    run_case("E f64 HIGHEST sph lax.map", f2_map, (jnp.asarray(Ta),
                                                   jnp.asarray(C)), ref2)
    run_case("F split sph lax.map", s2_map, (jnp.asarray(Ta),
                                             jnp.asarray(C)), ref2)


if __name__ == "__main__":
    main()
