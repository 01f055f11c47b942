"""Error-compensated MXU contractions for emulated-f64 TPU backends.

The axon TPU has no native float64 matmul: XLA lowers an f64 dot either
to a slow emulated-f64 expansion (DEFAULT precision — 30-110 s compile
per ERI class kernel, NOTES_r03.md) or to a 6-pass bf16 algorithm
(HIGHEST — f32-grade), and inside ``lax.map`` bodies even the HIGHEST
pin has been observed to demote to a single bf16 pass (round-3 phenol
corruption: df_anchor 4.9e-2 vs healthy 1e-4).

``split_einsum`` sidesteps the backend's f64-dot handling entirely: each
f64 operand is sliced into three bf16 components (8 mantissa bits each,
24 total ≈ f32-grade input representation), the six cross-term
contractions s_i ⊗ t_j (i+j ≤ 2) run natively on the MXU — bf16 inputs
with hardware f32 accumulation, nothing for the compiler to demote —
and the partials are recombined in (emulated, elementwise-accurate)
f64. Accuracy is f32-grade (~1e-7 relative, the device floor identified
in scripts/probe_fix.py); compile cost is that of six ordinary bf16
dots instead of one emulated-f64 contraction.

PRIMAL-ONLY: slicing uses dtype casts whose JAX transpose rules would
route cotangents through a single demoted dot, so these helpers must
not sit on differentiated paths. The eager DF/ERI builders
(ints/df.py superbatches, Schwarz factors, incore assembly) are primal
by construction and are the intended call sites; AD-traced kernels keep
their f64 einsums (vmap context, where the HIGHEST pin holds —
scripts/micro_probe.py P2).

Replaces: gpu4pyscf's native-f64 CUDA ERI contractions
(reference .devcontainer/Dockerfile:155-162 builds them for sm_90/120;
TPU v5 has no f64 unit, hence the compensated scheme).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

# (i, j) slice pairs kept in the expansion: full product is sum_{ij}
# s_i t_j with |s_i| ~ 2^-8i; dropping i+j >= 3 leaves a relative error
# ~2^-24 per product, below the f32 accumulation floor.
_PAIRS = ((0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0))


def _slices3(x):
    """x (f64/f32) -> three bf16 slices with s0+s1+s2 ≈ x (24-bit)."""
    s0 = x.astype(jnp.bfloat16)
    r = x - s0.astype(x.dtype)
    s1 = r.astype(jnp.bfloat16)
    r = r - s1.astype(x.dtype)
    s2 = r.astype(jnp.bfloat16)
    return (s0, s1, s2)


@lru_cache(maxsize=None)
def _parse(subscripts: str):
    """Parse a 2-operand spec into dot_general dims + transposes.

    Returns (a_perm, b_perm, ndots, nbatch, out_perm, a_sub, b_sub, out):
    operands are transposed to [batch..., free..., contract...] /
    [batch..., contract..., free...], fed to one dot_general, and the
    result [batch..., afree..., bfree...] is transposed to the output
    order. jnp.einsum is avoided because it casts small-dtype operands
    up to preferred_element_type BEFORE the dot — which on this backend
    turns the native bf16 MXU dot into a DEFAULT-precision f32 dot
    (bf16-grade, measured in scripts/probe_split.py).
    """
    lhs, out = subscripts.replace(" ", "").split("->")
    a, b = lhs.split(",")
    for term in (a, b, out):
        if len(set(term)) != len(term):
            raise ValueError(f"repeated index in {subscripts!r}")
    batch = [c for c in a if c in b and c in out]
    contract = [c for c in a if c in b and c not in out]
    afree = [c for c in a if c not in b]
    bfree = [c for c in b if c not in a]
    if not (set(afree) <= set(out) and set(bfree) <= set(out)):
        raise ValueError(f"summed-out free index in {subscripts!r}")
    a_perm = tuple(a.index(c) for c in batch + afree + contract)
    b_perm = tuple(b.index(c) for c in batch + contract + bfree)
    res = batch + afree + bfree
    out_perm = tuple(res.index(c) for c in out)
    return a_perm, b_perm, len(contract), len(batch), out_perm


def _dot(subscripts: str, a, b, precision=None):
    """einsum(subscripts, a, b) as one explicit lax.dot_general."""
    a_perm, b_perm, ndots, nbatch, out_perm = _parse(subscripts)
    at = jnp.transpose(a, a_perm)
    bt = jnp.transpose(b, b_perm)
    nafree = at.ndim - nbatch - ndots
    dn = ((tuple(range(at.ndim - ndots, at.ndim)),
           tuple(range(nbatch, nbatch + ndots))),
          (tuple(range(nbatch)), tuple(range(nbatch))))
    res = jax.lax.dot_general(at, bt, dn, precision=precision,
                              preferred_element_type=jnp.float32)
    del nafree
    return jnp.transpose(res, out_perm)


def split_einsum(subscripts: str, a, b):
    """einsum(subscripts, a, b) with bf16 3-slice error compensation.

    f32-grade result regardless of backend matmul-precision handling;
    inputs are cast slice-wise to bf16 so the MXU runs its native mode
    (bf16 multiply, hardware f32 accumulate). Primal-only (see module
    docstring).
    """
    if a.dtype not in (jnp.float64, jnp.float32):
        return _dot(subscripts, a, b).astype(a.dtype)
    sa = _slices3(a)
    sb = _slices3(b)
    out = None
    for i, j in _PAIRS:
        t = _dot(subscripts, sa[i], sb[j]).astype(a.dtype)
        out = t if out is None else out + t
    return out


def split_chain(subscript_ops, x):
    """Apply a chain of single-operand transforms via split_einsum.

    subscript_ops: sequence of (subscripts, operand) applied left-fold:
    x = split_einsum(subscripts, operand, x).
    """
    for sub, op in subscript_ops:
        x = split_einsum(sub, jnp.asarray(op), x)
    return x
