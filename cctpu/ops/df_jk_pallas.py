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
stays on XLA einsums (Mosaic has no f64). Wired into ints/df.py DFJK as the
TPU production path since round 2 (VERDICT.md round-1 item #1).

Grid layout: 1-D grid over naux tiles; J/K accumulate into a single VMEM
block across grid steps (output block index constant), the canonical
matmul-accumulation pattern from the Pallas TPU guide. Tile sizes adapt to
keep each VMEM block under ~4 MB.
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


def _tile_rows(ncols: int, budget_bytes: int = 4 * 1024 * 1024,
               lo: int = 8, hi: int = 256) -> int:
    """Rows per VMEM block so a [rows, ncols] f32 tile stays under budget.
    Multiple of 8: Mosaic requires the sublane dim of a non-full block to
    be 8-divisible (hit at phenol size, nao^2 = 12100 -> 86 rows)."""
    rows = budget_bytes // max(ncols * 4, 1)
    rows = (rows // 8) * 8
    return int(max(lo, min(hi, rows)))


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
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _k_kernel(w_ref, out_ref):
    # w_ref: [TR, nao] rows of W = (B C) flattened over (p, occ);
    # accumulate K += W_tile^T W_tile into the fixed [nao, nao] block
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    W = w_ref[:]
    # HIGHEST: true-f32 MXU passes — default single-pass bf16 gives only
    # ~1e-3 relative accuracy, breaking the f32 SCF phase's 3e-5 DIIS floor
    out_ref[:] += jnp.dot(W.T, W, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@partial(jax.jit, static_argnames=("interpret",))
def df_j_fast(B, D, interpret: bool = False):
    """f32 Pallas DF Coulomb: J = B^T (B . D). B [naux,nao,nao], D [nao,nao].

    Traced under enable_x64(False): with global x64 the BlockSpec index-map
    literals lower as i64 and Mosaic fails to legalize ("func.return
    (i32, i64)") on the v5e AOT compiler."""
    B = B.astype(jnp.float32)
    D = D.astype(jnp.float32)
    naux, nao, _ = B.shape
    nao2 = nao * nao
    tile_p = _tile_rows(nao2)
    naux_p = _round_up(naux, tile_p)
    Bf = jnp.pad(B.reshape(naux, nao2), ((0, naux_p - naux), (0, 0)))
    dvec = D.reshape(1, nao2)

    grid = (naux_p // tile_p,)
    with jax.enable_x64(False):
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
    return J


@partial(jax.jit, static_argnames=("interpret",))
def df_k_fast(B, Cocc, interpret: bool = False):
    """f32 Pallas DF exchange, occupied-orbital form:
    W[p,a,:] = C^T B[p]; K = sum_{p,a} W W^T. Cocc [nao, nocc] carries the
    occupation scaling (columns * sqrt(n_i)), so K(D) with D = C C^T."""
    B = B.astype(jnp.float32)
    Cocc = Cocc.astype(jnp.float32)
    naux, nao, _ = B.shape
    nocc = Cocc.shape[1]
    # W = (B C)^T per aux: MXU matmul outside the kernel (XLA), streaming
    # accumulation of W^T W inside.
    W = jnp.einsum("pik,ka->pai", B, Cocc,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # [naux, nocc, nao]
    W = W.reshape(naux * nocc, nao)
    tile_r = _tile_rows(nao)
    rows = _round_up(W.shape[0], tile_r)
    Wp = jnp.pad(W, ((0, rows - W.shape[0]), (0, 0)))
    with jax.enable_x64(False):
        K = pl.pallas_call(
            _k_kernel,
            grid=(rows // tile_r,),
            in_specs=[pl.BlockSpec((tile_r, nao), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nao, nao), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nao, nao), jnp.float32),
            interpret=interpret,
        )(Wp)
    return K


def _fused_jk_kernel(nocc_p, tp, b_ref, d_ref, c_ref, j_ref, k_ref, w_ref):
    """ONE streaming pass over B per SCF cycle: per naux-tile
        jp[p]  = sum_ij B[p] * D          (VPU reduce; Jp[p] only needs B[p])
        J     += sum_p jp[p] * B[p]       (VPU)
        W[p]   = C^T B[p]                 (MXU, in-kernel -- no XLA W tensor)
        K     += W_stack^T W_stack        (MXU)
    vs the split kernels' 3 reads of B + an HBM round-trip of W
    [naux, nocc, nao] (round-1 VERDICT item #2)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        j_ref[:] = jnp.zeros_like(j_ref)
        k_ref[:] = jnp.zeros_like(k_ref)

    B3 = b_ref[:]                                    # [TP, nao, nao]
    D2 = d_ref[:]                                    # [1, nao, nao]
    jp = jnp.sum(B3 * D2, axis=(1, 2))               # [TP]
    j_ref[:] += jnp.sum(jp[:, None, None] * B3, axis=0)

    # w[a, i] = sum_k C[k, a] B[p, i, k]  (W[p,i,a] of the einsum path,
    # transposed -- exact for ANY B, not just the symmetric physical one)
    dn_w = (((0,), (1,)), ((), ()))
    for p in range(tp):                              # static unroll
        w = jax.lax.dot_general(
            c_ref[:], B3[p], dn_w,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # [nocc_p, nao]
        w_ref[p * nocc_p:(p + 1) * nocc_p, :] = w
    W = w_ref[:]
    # HIGHEST: true-f32 MXU passes (bf16 single-pass breaks the f32 SCF
    # phase's DIIS floor, see _k_kernel)
    k_ref[:] += jax.lax.dot_general(
        W, W, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("interpret",))
def df_jk_fused(B, D, Cocc, interpret: bool = False):
    """f32 Pallas fused DF J+K: J = B^T (B.D), K = sum_p B[p] C C^T B[p]
    with B streamed through VMEM exactly once. Cocc columns carry
    sqrt(occupation) (same contract as df_k_fast)."""
    B = B.astype(jnp.float32)
    D = D.astype(jnp.float32)
    Cocc = Cocc.astype(jnp.float32)
    naux, nao, _ = B.shape
    nocc = Cocc.shape[1]
    nocc_p = _round_up(nocc, 8)       # sublane-aligned W row slices
    Cp = jnp.pad(Cocc, ((0, 0), (0, nocc_p - nocc)))
    # [TP, nao, nao] B tile within ~16 MB of VMEM (plus J/K/D/W blocks)
    tp = max(8, min(64, (16 * 1024 * 1024 // max(nao * nao * 4, 1))
                    // 8 * 8))
    naux_p = _round_up(naux, tp)
    Bp = jnp.pad(B, ((0, naux_p - naux), (0, 0), (0, 0)))
    D3 = D.reshape(1, nao, nao)

    with jax.enable_x64(False):
        J, K = pl.pallas_call(
            partial(_fused_jk_kernel, nocc_p, tp),
            grid=(naux_p // tp,),
            in_specs=[pl.BlockSpec((tp, nao, nao), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, nao, nao), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((nao, nocc_p), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((nao, nao), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((nao, nao), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((nao, nao), jnp.float32),
                       jax.ShapeDtypeStruct((nao, nao), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((tp * nocc_p, nao), jnp.float32)],
            interpret=interpret,
        )(Bp, D3, Cp)
    return J, K


_FUSED_OK = None


def fused_jk_supported() -> bool:
    """One-time compiled probe of the fused kernel on the attached device
    (Mosaic lowering can differ between TPU generations; if it rejects the
    fused layout the SCF hot loop silently falls back to the split
    kernels instead of failing mid-bench)."""
    global _FUSED_OK
    if _FUSED_OK is None:
        try:
            import numpy as _np
            B = jnp.asarray(_np.ones((8, 16, 16), _np.float32))
            C = jnp.asarray(_np.ones((16, 4), _np.float32))
            D = jnp.asarray(_np.eye(16, dtype=_np.float32))
            J, K = df_jk_fused(B, D, C)
            J.block_until_ready()
            _FUSED_OK = bool(jnp.isfinite(J).all() & jnp.isfinite(K).all())
        except Exception:
            _FUSED_OK = False
    return _FUSED_OK


def df_jk_fast(B, D, Cocc, tile_p: int = 8, interpret: bool = False):
    """f32 Pallas DF J and K together (kept for tests/back-compat)."""
    del tile_p
    return (df_j_fast(B, D, interpret=interpret),
            df_k_fast(B, Cocc, interpret=interpret))


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
