"""Probe: do concurrent remote XLA compiles overlap on the axon tunnel?

The cold-build wall is ~50-70 serialized remote compiles at 10-110 s each
(NOTES_r03.md). If PALLAS_AXON_REMOTE_COMPILE requests can run
concurrently (server-side parallelism, or at least pipelining of the
RPC + local lowering), an AOT pre-compile pass with a thread pool cuts
the wall by ~the concurrency factor.

Method: AOT-lower the SAME structural kernel at different omega values
(distinct HLO, identical compile cost) for the (1,0|1,0) 2c2e class at
builder-exact shapes. Two serial compiles vs two concurrent, then four
concurrent. Prints per-phase wall seconds.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()


def log(m):
    print(f"# {time.time() - t0:7.1f}s {m}", flush=True)


def main():
    from cctpu.ints.df import _class_batch_fn, _superbatches
    from cctpu.ints.two_electron import _class_chunk

    ls = (1, 0, 1, 0)
    npP = 1
    chunk = _class_chunk(ls, npP, 1, npP, 1)
    N = 8192
    sb = N // chunk
    f = 2048
    F = jax.ShapeDtypeStruct
    f64 = jnp.float64
    i32 = jnp.int32
    args = (F((f, npP), f64), F((f, npP), f64), F((f, 3), f64),
            F((1,), f64), F((1,), f64),
            F((f, npP), f64), F((f, npP), f64), F((f, 3), f64),
            F((1,), f64), F((1,), f64), F((f, 3), f64),
            F((sb, chunk), i32), F((sb, chunk), i32))
    log(f"class {ls} chunk={chunk} sb={sb}; devices={jax.devices()}")

    def compile_one(omega):
        kern = _class_batch_fn(ls, omega, "float64", True, False)
        t = time.time()
        lowered = kern.lower(*args)
        t_lower = time.time() - t
        t = time.time()
        lowered.compile()
        return t_lower, time.time() - t

    # warm the plumbing (first compile pays one-time backend setup)
    lt, ct = compile_one(0.21)
    log(f"warmup: lower {lt:.1f}s compile {ct:.1f}s")

    t = time.time()
    for om in (0.31, 0.41):
        lt, ct = compile_one(om)
        log(f"serial omega={om}: lower {lt:.1f}s compile {ct:.1f}s")
    serial2 = time.time() - t
    log(f"2 serial: {serial2:.1f}s")

    t = time.time()
    with ThreadPoolExecutor(2) as ex:
        for lt, ct in ex.map(compile_one, (0.51, 0.61)):
            log(f"conc2: lower {lt:.1f}s compile {ct:.1f}s")
    conc2 = time.time() - t
    log(f"2 concurrent: {conc2:.1f}s  speedup {serial2 / conc2:.2f}x")

    t = time.time()
    with ThreadPoolExecutor(4) as ex:
        for lt, ct in ex.map(compile_one, (0.71, 0.81, 0.91, 0.93)):
            log(f"conc4: lower {lt:.1f}s compile {ct:.1f}s")
    conc4 = time.time() - t
    log(f"4 concurrent: {conc4:.1f}s  per-kernel {conc4 / 4:.1f}s "
        f"(serial per-kernel {serial2 / 2:.1f}s)")


if __name__ == "__main__":
    main()
