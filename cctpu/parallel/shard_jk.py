"""Single-molecule scale-out: shard the DF tensor and XC grid over the
device mesh (SURVEY.md §2.4 "TP analog" — the reference has no multi-device
path at all; its largest-molecule strategy is a cheaper tier).

Two axes of intra-molecule parallelism:

 - ``shard_jk_over_aux(jk, mesh)``: place B [naux, nao, nao] with a
   NamedSharding over the 'aux' mesh axis. The J/K einsums then compile to
   per-device partial contractions + an XLA all-reduce over ICI (GSPMD
   inserts the psum) — the DF Fock build for ONE big molecule spreads over
   the chips with no change to any call site.
 - ``exc_sharded(...)``: shard_map the Becke-grid quadrature over grid
   blocks; each device integrates its shard of points and the scalar is
   psum'd.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def place_aux(B, sharding, ndev: int):
    """Pad B's aux axis to divisibility and place it with ``sharding``
    (zero rows are no-ops in every B-contraction)."""
    npad = (-B.shape[0]) % ndev
    if npad:
        B = jnp.concatenate(
            [B, jnp.zeros((npad,) + B.shape[1:], B.dtype)], axis=0)
    return jax.device_put(B, sharding)


def shard_jk_over_aux(jk, mesh: Mesh, axis: str = "task"):
    """Reshard a DFJK/CholeskyJK builder's factor tensors over the mesh
    axis (padding naux to divisibility; zero rows are no-ops in every
    B-contraction). Covers the whole mixed-precision surface — the f32
    hot tensor ``_B32``, any already-formed f64 ``_B64``/``B``, and the
    erf-attenuated LR variants — all resharded ON DEVICE (device_put of
    live arrays; no host round-trip). Subsequent __call__/_k_of einsums
    compile to per-device partial contractions + an XLA all-reduce; the
    single-chip Pallas kernels are bypassed while sharded (``_use_pallas``
    checks ``_aux_mesh``), since a pallas_call cannot be partitioned by
    GSPMD and would force an all-gather of B."""
    ndev = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis, None, None))
    place = partial(place_aux, sharding=sharding, ndev=ndev)

    # tensors formed lazily AFTER this call (LR variants via _ensure_lr,
    # the lazy f64 B) consult these to self-place on the mesh
    jk._aux_sharding = sharding
    jk._aux_ndev = ndev
    if getattr(jk, "_B32", None) is not None:       # DFJK mixed-precision
        jk._B32 = place(jk._B32)
        if jk._B64 is not None:
            jk._B64 = place(jk._B64)
        # else: the lazy f64 B self-places on first access
        # (DFJK._place_aux reads _aux_sharding/_aux_ndev)
    else:                                           # CholeskyJK: plain B
        jk.B = place(jk.B)
    for om, b in list(getattr(jk, "_B_lr", {}).items()):
        jk._B_lr[om] = place(b)
    for attr in ("_B_cast", "_B_lr_cast"):
        if hasattr(jk, attr):
            delattr(jk, attr)
    jk._aux_mesh = mesh
    return jk


def exc_sharded(exc_chunk_fn, pts_chunks, w_chunks, mesh: Mesh,
                axis: str = "task"):
    """Integrate sum_chunks exc_chunk_fn(pts, w) with the chunk axis
    sharded over the mesh: each device scans its local chunks, partial
    sums are psum'd over the axis."""
    from jax.experimental.shard_map import shard_map

    ndev = mesh.shape[axis]
    nchunk = pts_chunks.shape[0]
    npad = (-nchunk) % ndev
    if npad:
        pts_chunks = jnp.concatenate(
            [pts_chunks, jnp.full((npad,) + pts_chunks.shape[1:], 1e6)], 0)
        w_chunks = jnp.concatenate(
            [w_chunks, jnp.zeros((npad,) + w_chunks.shape[1:])], 0)

    def local(pts_l, w_l):
        def body(acc, chunk):
            p, w = chunk
            return acc + exc_chunk_fn(p, w), None
        total, _ = jax.lax.scan(body, 0.0, (pts_l, w_l))
        return jax.lax.psum(total, axis)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis, None, None), P(axis, None)),
                   out_specs=P())
    return fn(pts_chunks, w_chunks)
