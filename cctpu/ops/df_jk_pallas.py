"""Pallas TPU kernels for the density-fitted J/K Fock build.

The DF hot loop (BASELINE.json north star: "DF J/K Fock builds as Pallas
kernels") is HBM-bandwidth bound: the B tensor [naux, nao, nao] is read
once per J and once per K every SCF cycle. These kernels stream naux-tiles
of B through VMEM once, computing
    Jp[p]   = sum_ij B[p,i,j] D[i,j]
    J[i,j]  = sum_p Jp[p] B[p,i,j]
    K[i,j]  = sum_p (B[p] C)_ia (B[p] C)_ja      (occupied-orbital form)
with MXU matmuls and f32 accumulation in VMEM scratch. They power the f32
"fast" SCF mode (see scf/hf.py precision option); the f64 reference path
stays on XLA einsums (Mosaic has no f64).

Grid layout: 1-D grid over naux tiles; K accumulates into a single VMEM
block across grid steps (output block index constant), the canonical
matmul-accumulation pattern from the Pallas TPU guide.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _jp_kernel(b_ref, d_ref, out_ref):
    # b_ref: [TP, nao2]; d_ref: [1, nao2]; out: [TP, 1]
    # (broadcast-multiply + lane reduction; a [nao2, 1] operand would get
    # its size-1 lane dim tile-padded to 128 and blow VMEM)
    out_ref[:] = jnp.sum(b_ref[:] * d_ref[:], axis=1, keepdims=True)


def _j_kernel(b_ref, jp_ref, out_ref):
    # b_ref: [TP, nao2]; jp_ref: [TP, 1]; accumulate out [1, nao2]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(jp_ref[:].T, b_ref[:],
                          preferred_element_type=jnp.float32)


def _k_kernel(w_ref, out_ref):
    # w_ref: [TP * nocc_pad? ...] — see wrapper: w [TP, nao, nocc] flattened
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    W = w_ref[:]                       # [TP*nocc, nao]
    out_ref[:] += jnp.dot(W.T, W, preferred_element_type=jnp.float32)


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@partial(jax.jit, static_argnames=("tile_p", "interpret"))
def df_jk_fast(B, D, Cocc, tile_p: int = 8, interpret: bool = False):
    """f32 Pallas DF J/K. B [naux,nao,nao], D [nao,nao], Cocc [nao,nocc].

    Returns (J, K) in f32. naux is padded to a tile multiple; nao^2 is the
    lane dimension (>=128 for real systems).
    """
    B = B.astype(jnp.float32)
    D = D.astype(jnp.float32)
    Cocc = Cocc.astype(jnp.float32)
    naux, nao, _ = B.shape
    nocc = Cocc.shape[1]
    nao2 = nao * nao
    naux_p = _round_up(naux, tile_p)
    Bf = jnp.pad(B.reshape(naux, nao2), ((0, naux_p - naux), (0, 0)))
    dvec = D.reshape(1, nao2)

    grid = (naux_p // tile_p,)
    Jp = pl.pallas_call(
        _jp_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile_p, nao2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nao2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_p, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((naux_p, 1), jnp.float32),
        interpret=interpret,
    )(Bf, dvec)

    J = pl.pallas_call(
        _j_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile_p, nao2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_p, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nao2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nao2), jnp.float32),
        interpret=interpret,
    )(Bf, Jp).reshape(nao, nao)

    # K: W[p,i,a] = sum_k B[p,i,k] C[k,a]; K = sum over (p,a) of outer(W,W)
    W = jnp.einsum("pik,ka->pai", B, Cocc,
                   preferred_element_type=jnp.float32)   # [naux, nocc, nao]
    W = W.reshape(naux * nocc, nao)
    rows = _round_up(W.shape[0], tile_p)
    Wp = jnp.pad(W, ((0, rows - W.shape[0]), (0, 0)))
    K = pl.pallas_call(
        _k_kernel,
        grid=(rows // tile_p,),
        in_specs=[pl.BlockSpec((tile_p, nao), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nao, nao), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nao, nao), jnp.float32),
        interpret=interpret,
    )(Wp)
    return J, K


def df_jk(B, D, Cocc, tile_p: int = 8):
    """Dispatch: compiled Pallas on TPU, interpret mode elsewhere (tests)."""
    return df_jk_fast(B, D, Cocc, tile_p=tile_p, interpret=not _on_tpu())


def df_jk_reference(B, D, Cocc):
    """XLA einsum reference (same math, any dtype)."""
    Jp = jnp.einsum("pij,ij->p", B, D)
    J = jnp.einsum("p,pij->ij", Jp, B)
    W = jnp.einsum("pik,ka->pia", B, Cocc)
    K = jnp.einsum("pia,pja->ij", W, W)
    return J, K
