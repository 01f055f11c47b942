"""McMurchie–Davidson (MD) Hermite-expansion machinery.

Replaces libcint's C integral drivers (SURVEY.md §2.2) with a pure-JAX,
statically-shaped formulation: all recursions run over *static* angular
momentum bounds (python loops unrolled at trace time), so everything jits and
vmaps cleanly over primitive/shell batches on TPU.

 - E-table: Hermite expansion coefficients E_t^{ij} per cartesian direction.
 - R-tensor: Hermite Coulomb integrals R_{tuv} from the Boys ladder.

References: Helgaker, Jørgensen, Olsen, "Molecular Electronic-Structure
Theory", ch. 9 (standard public formulation — no reference-repo code
involved; the reference delegates these to libcint).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from cctpu.ints.boys import boys


def e_table_1d(li: int, lj: int, a, b, ab) -> list:
    """Hermite expansion coefficients E_t^{ij} for one cartesian direction.

    a, b: primitive exponents (any broadcastable shape); ab = A_x - B_x.
    Returns nested python list E[i][j][t] of arrays, i<=li, j<=lj, t<=i+j.
    Includes the Gaussian prefactor exp(-mu*ab^2) in E_0^{00}.
    """
    p = a + b
    inv2p = 0.5 / p
    mu = a * b / p
    # P - A = -b/p * (A-B);  P - B = a/p * (A-B)
    pa = -(b / p) * ab
    pb = (a / p) * ab

    E = [[[None] * (li + lj + 1) for _ in range(lj + 1)]
         for _ in range(li + 1)]
    E[0][0][0] = jnp.exp(-mu * ab * ab)

    def get(i, j, t):
        if t < 0 or t > i + j or i < 0 or j < 0:
            return 0.0
        return E[i][j][t]

    for i in range(li + 1):
        for j in range(lj + 1):
            if i == 0 and j == 0:
                continue
            for t in range(i + j + 1):
                if j == 0:
                    E[i][j][t] = (inv2p * get(i - 1, j, t - 1)
                                  + pa * get(i - 1, j, t)
                                  + (t + 1) * get(i - 1, j, t + 1))
                else:
                    E[i][j][t] = (inv2p * get(i, j - 1, t - 1)
                                  + pb * get(i, j - 1, t)
                                  + (t + 1) * get(i, j - 1, t + 1))
    return E


def r_tensor(lmax: int, p, PC) -> dict:
    """Hermite Coulomb integrals R_{tuv}(p, PC) for t+u+v <= lmax.

    p: exponent (shape S); PC: [.., 3] displacement P - C.
    Returns dict {(t,u,v): array of shape S}.
    """
    T = p * jnp.sum(PC * PC, axis=-1)
    F = boys(T, lmax)                      # [lmax+1, ...]
    # R^n_{000} = (-2p)^n F_n
    Rn = {}
    neg2p = -2.0 * p
    pw = jnp.ones_like(p)
    for n in range(lmax + 1):
        Rn[(n, 0, 0, 0)] = pw * F[n]
        pw = pw * neg2p

    x, y, z = PC[..., 0], PC[..., 1], PC[..., 2]

    def get(n, t, u, v):
        if t < 0 or u < 0 or v < 0:
            return 0.0
        return Rn[(n, t, u, v)]

    # Build increasing total order; standard recursions:
    # R^n_{t+1,u,v} = t R^{n+1}_{t-1,u,v} + X_PC R^{n+1}_{t,u,v}
    for total in range(1, lmax + 1):
        for t in range(total + 1):
            for u in range(total - t + 1):
                v = total - t - u
                for n in range(lmax - total + 1):
                    if t > 0:
                        Rn[(n, t, u, v)] = ((t - 1) * get(n + 1, t - 2, u, v)
                                            + x * get(n + 1, t - 1, u, v))
                    elif u > 0:
                        Rn[(n, t, u, v)] = ((u - 1) * get(n + 1, t, u - 2, v)
                                            + y * get(n + 1, t, u - 1, v))
                    else:
                        Rn[(n, t, u, v)] = ((v - 1) * get(n + 1, t, u, v - 2)
                                            + z * get(n + 1, t, u, v - 1))
    return {(t, u, v): Rn[(0, t, u, v)]
            for t in range(lmax + 1)
            for u in range(lmax + 1 - t)
            for v in range(lmax + 1 - t - u)}
