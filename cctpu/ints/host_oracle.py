"""Pure-numpy host oracle for Coulomb-integral spot checks.

Round-4 finding (scripts/probe_floor.py): the persistent axon compile
cache served ONE corrupt executable for the (d|g) 2c2e class — every
other class bit-exact — which silently shifted production SCF energies
by 0.05 Ha for two rounds. A compiled-artifact failure can only be
caught by an independent implementation, so the DF builders
(ints/df.py) validate a few quartets per angular-momentum class against
this oracle at build time and rebuild the class through a differently
shaped executable on mismatch.

This is deliberately NOT jax: plain float64 numpy McMurchie–Davidson,
identical math to ints/md.py (Helgaker/Jørgensen/Olsen ch. 9) but a
fully independent code path — no XLA, no device, no compile cache.
Throughput is irrelevant (a handful of shell blocks per build); being
un-foolable is the point. Replaces the trust gpu4pyscf gets for free
from CUDA's native f64 (reference templates/calculate_energy.py:151-178
never validates device integrals because it never needs to).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import numpy as np

from cctpu.core.basis import cart2sph, cart_components


@lru_cache(maxsize=None)
def _df_fact(m: int) -> float:
    """(2m-1)!!"""
    out = 1.0
    for k in range(3, 2 * m, 2):
        out *= k
    return out


def _boys_np(T: float, mmax: int) -> np.ndarray:
    """F_m(T) for m = 0..mmax, scalar T, via scipy's incomplete gamma."""
    from scipy.special import gammainc
    out = np.empty(mmax + 1)
    if T < 1e-13:
        for m in range(mmax + 1):
            out[m] = 1.0 / (2 * m + 1)
        return out
    for m in range(mmax + 1):
        a = m + 0.5
        out[m] = math.gamma(a) * gammainc(a, T) / (2.0 * T ** a)
    return out


def _e1d_np(li: int, lj: int, a: float, b: float, ab: float):
    """E_t^{ij} Hermite expansion, one direction, scalar exponents."""
    p = a + b
    inv2p = 0.5 / p
    mu = a * b / p
    pa = -(b / p) * ab
    pb = (a / p) * ab
    E = [[[0.0] * (li + lj + 2) for _ in range(lj + 1)] for _ in range(li + 1)]
    E[0][0][0] = math.exp(-mu * ab * ab)

    def get(i, j, t):
        if t < 0 or i < 0 or j < 0 or t > i + j:
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


def _r_np(ltot: int, p: float, PQ: np.ndarray) -> dict:
    """Hermite-Coulomb R_{tuv}(p, PQ), scalar case."""
    T = p * float(PQ @ PQ)
    F = _boys_np(T, ltot)
    Rn = {}
    pw = 1.0
    for n in range(ltot + 1):
        Rn[(n, 0, 0, 0)] = pw * F[n]
        pw *= -2.0 * p
    x, y, z = PQ

    def get(n, t, u, v):
        if t < 0 or u < 0 or v < 0:
            return 0.0
        return Rn.get((n, t, u, v), 0.0)

    for total in range(1, ltot + 1):
        for t in range(total + 1):
            for u in range(total - t + 1):
                v = total - t - u
                for n in range(ltot - total + 1):
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
            for t in range(ltot + 1)
            for u in range(ltot + 1 - t)
            for v in range(ltot + 1 - t - u)}


def _pair_hermite_np(la, lb, ea, ca, eb, cb, A, B):
    """[(p, P[3], E3[nab, ntuv]) per primitive pair] for a shell pair.

    ntuv indexes (t,u,v) with t,u,v in [0, la+lb]^3 flattened (dense box,
    zeros where t+u+v > la+lb) — matching _gather_idx's dense layout.
    """
    lab = la + lb
    box = lab + 1
    comps_a = cart_components(la)
    comps_b = cart_components(lb)
    out = []
    for ia, a in enumerate(ea):
        for ib, b in enumerate(eb):
            w = ca[ia] * cb[ib]
            if w == 0.0:
                continue
            Ex = _e1d_np(la, lb, a, b, A[0] - B[0])
            Ey = _e1d_np(la, lb, a, b, A[1] - B[1])
            Ez = _e1d_np(la, lb, a, b, A[2] - B[2])
            p = a + b
            P = (a * np.asarray(A) + b * np.asarray(B)) / p
            E3 = np.zeros((len(comps_a) * len(comps_b), box ** 3))
            for ca_i, (ix, iy, iz) in enumerate(comps_a):
                for cb_i, (jx, jy, jz) in enumerate(comps_b):
                    row = ca_i * len(comps_b) + cb_i
                    for t in range(ix + jx + 1):
                        ex = Ex[ix][jx][t]
                        if ex == 0.0:
                            continue
                        for u in range(iy + jy + 1):
                            ey = Ey[iy][jy][u]
                            if ey == 0.0:
                                continue
                            for v in range(iz + jz + 1):
                                ez = Ez[iz][jz][v]
                                E3[row, (t * box + u) * box + v] = \
                                    w * ex * ey * ez
            out.append((p, P, E3))
    return out


def _box_tuv(box):
    return [(t, u, v) for t in range(box) for u in range(box)
            for v in range(box)]


def eri_bra_ket_np(la, lb, ea, ca, eb, cb, A, B,
                   lc, ld, ec, cc, ed, cd, C, D,
                   omega: Optional[float] = None) -> np.ndarray:
    """Contracted spherical ERI block [nsA,nsB,nsC,nsD], numpy f64.

    Same contraction-normalized inputs as eri_quartet_kernel
    (ints/two_electron.py); a 3c2e/2c2e block is obtained by passing the
    dummy s "shell" (exps [0.0], coefs [1.0], center = partner's center).
    """
    lab, lcd = la + lb, lc + ld
    ltot = lab + lcd
    bra = _pair_hermite_np(la, lb, ea, ca, eb, cb, A, B)
    ket = _pair_hermite_np(lc, ld, ec, cc, ed, cd, C, D)
    tuv1 = _box_tuv(lab + 1)
    tuv2 = _box_tuv(lcd + 1)
    nab = len(cart_components(la)) * len(cart_components(lb))
    ncd = len(cart_components(lc)) * len(cart_components(ld))
    out = np.zeros((nab, ncd))
    for p, P, Eb in bra:
        for q, Q, Ek in ket:
            alpha = p * q / (p + q)
            pref = 2.0 * math.pi ** 2.5 / (p * q * math.sqrt(p + q))
            PQ = P - Q
            if omega is not None:
                # erf-attenuation: F_n(T) -> sqrt(s) s^n F_n(sT); running
                # the R recursion at exponent s*alpha supplies the s^n
                # through its (-2p)^n ladder, leaving the lone sqrt(s)
                s = omega * omega / (alpha + omega * omega)
                R = _r_np(ltot, s * alpha, PQ)
                pref *= math.sqrt(s)
            else:
                R = _r_np(ltot, alpha, PQ)
            Rm = np.zeros((len(tuv1), len(tuv2)))
            for i1, (t1, u1, v1) in enumerate(tuv1):
                for i2, (t2, u2, v2) in enumerate(tuv2):
                    key = (t1 + t2, u1 + u2, v1 + v2)
                    if key in R:
                        Rm[i1, i2] = R[key] * (-1.0) ** (t2 + u2 + v2)
            out += pref * (Eb @ Rm @ Ek.T)
    Ta, Tb = cart2sph(la), cart2sph(lb)
    Tc, Td = cart2sph(lc), cart2sph(ld)
    o = out.reshape(len(cart_components(la)), len(cart_components(lb)),
                    len(cart_components(lc)), len(cart_components(ld)))
    o = np.einsum("pa,qb,rc,sd,abcd->pqrs", Ta, Tb, Tc, Td, o)
    return o


_DUM_E = np.array([0.0])
_DUM_C = np.array([1.0])


def eri_2c2e_np(lP, eP, cP, RP, lQ, eQ, cQ, RQ,
                omega: Optional[float] = None) -> np.ndarray:
    """(P|Q) spherical block [sP, sQ]."""
    blk = eri_bra_ket_np(lP, 0, eP, cP, _DUM_E, _DUM_C, RP, RP,
                         lQ, 0, eQ, cQ, _DUM_E, _DUM_C, RQ, RQ, omega=omega)
    return blk[:, 0, :, 0]


def eri_3c2e_np(lP, eP, cP, RP, la, ea, ca, RA, lb, eb, cb, RB,
                omega: Optional[float] = None) -> np.ndarray:
    """(P|ab) spherical block [sP, sa, sb]."""
    blk = eri_bra_ket_np(lP, 0, eP, cP, _DUM_E, _DUM_C, RP, RP,
                         la, lb, ea, ca, eb, cb, RA, RB, omega=omega)
    return blk[:, 0]
