"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from cctpu.ops.df_jk_pallas import df_jk, df_jk_fused, df_jk_reference


def test_df_jk_pallas_matches_einsum():
    rng = np.random.default_rng(0)
    naux, nao, nocc = 96, 32, 8
    B = rng.standard_normal((naux, nao, nao))
    B = 0.5 * (B + B.transpose(0, 2, 1))
    C = rng.standard_normal((nao, nocc))
    D = 2 * C @ C.T
    B, D, C = map(jnp.asarray, (B, D, C))
    Jr, Kr = df_jk_reference(B, D, C)
    J, K = df_jk(B, D, C)
    assert float(jnp.abs(J - Jr).max() / jnp.abs(Jr).max()) < 1e-5
    assert float(jnp.abs(K - Kr).max() / jnp.abs(Kr).max()) < 1e-5


def test_df_jk_pallas_nondivisible_naux():
    rng = np.random.default_rng(1)
    naux, nao, nocc = 37, 16, 3          # deliberately unaligned
    B = jnp.asarray(rng.standard_normal((naux, nao, nao)))
    C = jnp.asarray(rng.standard_normal((nao, nocc)))
    D = 2 * C @ C.T
    Jr, Kr = df_jk_reference(B, D, C)
    J, K = df_jk(B, D, C)
    assert float(jnp.abs(J - Jr).max() / jnp.abs(Jr).max()) < 1e-5
    assert float(jnp.abs(K - Kr).max() / jnp.abs(Kr).max()) < 1e-5


def test_df_jk_fused_matches_einsum():
    # the fused single-pass kernel (one VMEM stream of B for J AND K)
    rng = np.random.default_rng(2)
    naux, nao, nocc = 83, 24, 5          # unaligned on purpose
    B = jnp.asarray(rng.standard_normal((naux, nao, nao)))
    C = jnp.asarray(rng.standard_normal((nao, nocc)))
    D = 2 * C @ C.T
    Jr, Kr = df_jk_reference(B, D, C)
    J, K = df_jk_fused(B, D, C, interpret=True)
    assert float(jnp.abs(J - Jr).max() / jnp.abs(Jr).max()) < 1e-5
    assert float(jnp.abs(K - Kr).max() / jnp.abs(Kr).max()) < 1e-5
