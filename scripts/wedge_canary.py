"""Tunnel-health canary: one tiny FRESH remote compile + one cached exec.

The axon tunnel's COMPILE channel can wedge when a client dies inside a
compile RPC (NOTES_r04 residual #4): cached-executable EXECUTION keeps
working while every fresh compile blocks indefinitely. This canary lets a
harness distinguish the two failure modes cheaply:

  exit 0 -> tunnel healthy (fresh compile + exec both completed)
  exit 3 -> device/exec failure (even a cached matmul failed)
  killed by caller timeout -> COMPILE channel wedged (exec may be fine;
            stderr says which phase was reached)

The fresh compile uses a shape derived from the current hour so each
canary run within the same hour hits the persistent cache (cheap), while
a genuinely new hour forces one real compile (~10-20 s) — a live probe of
the compile path roughly once per wedge-relevant time window.
"""
import sys
import time


def main():
    t0 = time.time()

    def log(msg):
        print(f"# canary {time.time() - t0:5.1f}s {msg}", file=sys.stderr,
              flush=True)

    import jax
    import jax.numpy as jnp

    log("backend up")
    # phase 1: execution path with a well-known cached shape
    x = jnp.ones((256, 256), jnp.float32)
    (x @ x).block_until_ready()
    log("exec ok (cached matmul)")

    # phase 2: compile path with an hour-unique shape
    n = 128 + (int(time.time()) // 3600) % 89
    y = jnp.ones((n, n + 1), jnp.float32)

    def f(a):
        return jnp.tanh(a @ a.T).sum()

    jax.jit(f)(y).block_until_ready()
    log(f"compile ok (shape {n}x{n + 1})")
    print("healthy", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # device/exec failure, NOT a wedge
        print(f"# canary error: {exc}", file=sys.stderr, flush=True)
        sys.exit(3)
