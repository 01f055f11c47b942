"""Pulay DIIS (CDIIS) with fixed-size, jit-friendly buffers.

Replaces PySCF's lib.diis used by every SCF driver in the reference stack
(SURVEY.md §2.1/§3.1 hot loop). The history lives in static-shape ring
buffers; empty slots are masked out of the B-matrix solve, so the update is
a single traced computation (no dynamic shapes), as XLA wants.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class DIISState(NamedTuple):
    focks: jnp.ndarray   # [m, ...] flattened Fock history
    errs: jnp.ndarray    # [m, ...] flattened error-vector history
    count: jnp.ndarray   # scalar int — how many slots filled (saturates at m)
    head: jnp.ndarray    # scalar int — next write position


def diis_init(space: int, size: int, dtype=None) -> DIISState:
    import jax.numpy as _jnp
    dtype = dtype or _jnp.float64
    return DIISState(
        focks=jnp.zeros((space, size), dtype),
        errs=jnp.zeros((space, size), dtype),
        count=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def diis_update(state: DIISState, fock: jnp.ndarray,
                err: jnp.ndarray) -> Tuple[DIISState, jnp.ndarray]:
    """Push (fock, err), return (new_state, extrapolated fock)."""
    m = state.focks.shape[0]
    shape = fock.shape
    f = fock.reshape(-1)
    e = err.reshape(-1)
    focks = state.focks.at[state.head].set(f)
    errs = state.errs.at[state.head].set(e)
    count = jnp.minimum(state.count + 1, m)
    head = (state.head + 1) % m

    dt = errs.dtype          # follow the SCF precision — a stray f64 here
    # would drag the whole step into emulated-f64 on TPU (round-1 bench
    # pathology: f32 step 15x slower than f64)
    B = errs @ errs.T                                     # [m, m]
    active = (jnp.arange(m) < count)
    # Masked augmented system:
    #   [B  -1][c]   [0]
    #   [-1  0][l] = [-1]
    big = jnp.zeros((m + 1, m + 1), dt)
    mask2 = active[:, None] & active[None, :]
    big = big.at[:m, :m].set(jnp.where(mask2, B, 0.0).astype(dt))
    # Identity rows for inactive slots keep the system nonsingular.
    big = big.at[:m, :m].add(jnp.diag(jnp.where(active, 0.0, 1.0)).astype(dt))
    big = big.at[:m, m].set(jnp.where(active, -1.0, 0.0).astype(dt))
    big = big.at[m, :m].set(jnp.where(active, -1.0, 0.0).astype(dt))
    rhs = jnp.zeros(m + 1, dt).at[m].set(-1.0)

    # Symmetric pseudo-inverse solve (eigh is cheap and TPU-native; lstsq's
    # SVD is the slowest decomposition on the backend and not needed).
    w, V = jnp.linalg.eigh(big)
    tol = jnp.asarray(1e-7 if dt == jnp.float32 else 1e-14, dt)
    wmax = jnp.max(jnp.abs(w))
    keep = jnp.abs(w) > tol * jnp.maximum(wmax, 1.0)
    winv = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    sol = V @ (winv * (V.T @ rhs))
    c = jnp.where(active, sol[:m], 0.0).astype(dt)
    f_new = c @ focks
    return DIISState(focks, errs, count, head), f_new.reshape(shape)
