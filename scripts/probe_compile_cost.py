"""Isolate the per-kernel warm-path costs on the axon backend.

Questions (round-5 warm-build economics):
  1. host trace+lower time per class kernel
  2. .compile() time when the executable IS in the persistent cache
     (is a "cache hit" a real hit, or a server-side recompile?)
  3. pure execution time of a dispatched superbatch
  4. .compile() time for a genuinely fresh shape (cold reference)

Uses synthetic tables at production-like shapes, one mid-l 3c2e class.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cctpu.ints.df import _class_batch_fn, _class_chunk


def bench_class(ls, prims, nq_rows, tag):
    kern = _class_batch_fn(ls, None, "float64", False)
    chunk = _class_chunk(ls, prims[0], 1, prims[1], prims[2])
    de = jnp.zeros((1,))
    dc = jnp.ones((1,))
    rng = np.random.default_rng(0)
    naux_rows = 2048
    Pe = jnp.asarray(rng.uniform(0.5, 2.0, (naux_rows, prims[0])))
    Pc = jnp.asarray(rng.uniform(0.5, 1.0, (naux_rows, prims[0])))
    Pxyz = jnp.asarray(rng.normal(0, 1, (naux_rows, 3)))
    Ae = jnp.asarray(rng.uniform(0.5, 2.0, (nq_rows, prims[1])))
    Ac = jnp.asarray(rng.uniform(0.5, 1.0, (nq_rows, prims[1])))
    Axyz = jnp.asarray(rng.normal(0, 1, (nq_rows, 3)))
    Be = jnp.asarray(rng.uniform(0.5, 2.0, (nq_rows, prims[2])))
    Bc = jnp.asarray(rng.uniform(0.5, 1.0, (nq_rows, prims[2])))
    Bxyz = jnp.asarray(rng.normal(0, 1, (nq_rows, 3)))
    sb = 8192 // chunk if chunk <= 8192 else 1
    i1 = jnp.zeros((sb, chunk), jnp.int64)
    i2 = jnp.zeros((sb, chunk), jnp.int64)
    args = (Pe, Pc, Pxyz, de, dc, Ae, Ac, Axyz, Be, Bc, Bxyz, i1, i2)

    t0 = time.time()
    lowered = kern.lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile1 = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    out.block_until_ready()
    t_exec1 = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    out.block_until_ready()
    t_exec2 = time.time() - t0
    # jit-call path on top of the AOT compile (what dispatch actually does)
    t0 = time.time()
    out = kern(*args)
    out.block_until_ready()
    t_call = time.time() - t0
    print(f"{tag} ls={ls} chunk={chunk}: lower={t_lower:.1f}s "
          f"compile={t_compile1:.1f}s exec1={t_exec1:.2f}s "
          f"exec2={t_exec2:.2f}s jit_call_after_aot={t_call:.1f}s",
          flush=True)


def main():
    t_all = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    # run TWICE: first may be cold (fresh synthetic shapes), second is the
    # true warm number within the same persistent cache across processes
    bench_class((2, 0, 2, 2), (1, 1, 1), 32768, "A")
    bench_class((2, 0, 1, 1), (1, 3, 3), 32768, "B")
    bench_class((0, 0, 0, 0), (1, 6, 6), 32768, "C")
    print(f"total {time.time() - t_all:.1f}s", flush=True)


if __name__ == "__main__":
    main()
