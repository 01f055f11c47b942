"""Boys function F_m(T), the scalar core of all Coulomb-type integrals.

F_m(T) = int_0^1 t^{2m} exp(-T t^2) dt.

Jit-friendly, branchless evaluation over three regimes blended with
``jnp.where`` (all paths evaluated; each is made NaN-safe):

 - small T:  Taylor series  F_m(T) = sum_k (-T)^k / (k! (2m+2k+1))
 - mid T:    tabulated Taylor expansion around grid nodes T_i = i*h:
             F_m(T) = sum_k F_{m+k}(T_i) (-(T-T_i))^k / k!   (8 terms,
             h = 0.05 -> |T-T_i| <= 0.025, error < 1e-16). The table is
             built once on host with scipy's incomplete gamma. This
             replaces jax.scipy.special.gammainc, whose XLA igamma
             lowering (internal while-loop series) dominated the whole
             integral engine on TPU: the 3c2e build at C16H34 measured
             ~36 us per s-quartet, ~1000x off speed-of-light, all in
             emulated-f64 igamma.
 - large T:  asymptotic      F_m(T) = (2m-1)!! / 2^{m+1} * sqrt(pi / T^{2m+1})

then a single *downward* recursion (stable for all T)
 F_{m-1}(T) = (2 T F_m(T) + exp(-T)) / (2m - 1)
fills every lower order. Returns all orders 0..mmax at once because the
McMurchie-Davidson R-tensor needs the full ladder.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp


_TAB_H = 0.05          # node spacing; Taylor radius h/2
_TAB_K = 7             # Taylor order (terms k = 0..7)


@lru_cache(maxsize=None)
def _boys_table(mtop: int, h: float = _TAB_H, tmax: float = 130.0):
    """Host-built table F_m(T_i) for m = 0..mtop, T_i = 0, h, 2h, ... tmax.

    Built with scipy's regularized incomplete gamma (exact to ~1e-15);
    returns a numpy array [mtop+1, ntab]."""
    import numpy as np
    from scipy.special import gammainc as _ginc

    T = np.arange(0.0, tmax + 2 * h, h)
    out = np.empty((mtop + 1, len(T)))
    Tm = np.where(T > 0, T, 1.0)
    for m in range(mtop + 1):
        a = m + 0.5
        out[m] = math.gamma(a) * _ginc(a, Tm) / (2.0 * Tm ** a)
        out[m, T == 0.0] = 1.0 / (2 * m + 1)
    return out


_T_SMALL = 1e-1
# The asymptotic (complete-gamma) form drops the int_1^inf tail, whose
# relative size is ~ T^{m+1/2} e^{-T} / Gamma(m+1/2); at T=130 this is
# < 1e-30 even for m=20, while jax's gammainc is good to ~1e-14 across
# (0, 130] (verified against scipy in tests) — so 130 is a safe crossover.
_T_LARGE = 130.0


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


@partial(jax.jit, static_argnums=1)
def boys(T: jnp.ndarray, mmax: int) -> jnp.ndarray:
    """F_m(T) for m = 0..mmax. T: any shape; returns shape (mmax+1,) + T.shape."""
    T = jnp.asarray(T, dtype=jnp.float64)
    m = mmax
    a = m + 0.5

    in_small = T < _T_SMALL
    in_large = T > _T_LARGE
    # Double-where: every branch sees a safe argument so that AD of the
    # *unselected* branch cannot produce NaN/Inf (classic where-grad leak).
    T_ser = jnp.where(in_small, T, 0.0)
    T_gam = jnp.where(in_small | in_large, 1.0, T)
    T_asy = jnp.where(in_large, T, 2.0 * _T_LARGE)

    # Series branch (exact near 0). 12 terms: error < T^12/12! ~ 1e-20 at T=0.1.
    acc = jnp.zeros_like(T)
    term = jnp.ones_like(T)
    for k in range(12):
        acc = acc + term / (2 * m + 2 * k + 1)
        term = term * (-T_ser) / (k + 1)
    f_series = acc

    # Mid branch: tabulated Taylor expansion, F_m(T) = sum_k
    # F_{m+k}(T_i) (-(T-T_i))^k / k!, Horner form from the top order.
    tab = jnp.asarray(_boys_table(m + _TAB_K))
    idx = jnp.clip(jnp.round(T_gam / _TAB_H).astype(jnp.int32), 0,
                   tab.shape[1] - 1)
    dT = T_gam - idx.astype(T_gam.dtype) * _TAB_H
    f_gamma = tab[m + _TAB_K][idx]
    for k in range(_TAB_K - 1, -1, -1):
        f_gamma = tab[m + k][idx] - f_gamma * dT / (k + 1)

    # Asymptotic branch, in LOG space: the naive T**(2m+1) overflows the
    # emulated-f64 exponent range (f32-bounded, ~1e38) already at
    # T~2.6e2 for m=8 — and nuclear-attraction T reaches ~5e4 for tight
    # 1s exponents. Forward inf was silently "fine" (1/inf -> 0), but
    # the BACKWARD multiplies the unselected branch's inf derivative by
    # a zero cotangent -> NaN: every jax.grad through a V/ERI integral
    # NaN'd on device while CPU f64 (exponent ~1e308) never noticed
    # (round-5 gradient probe). exp(-(m+1/2) log T) underflows to 0
    # harmlessly and has finite derivatives everywhere.
    f_asym = (_double_factorial(2 * m - 1) / (2.0 ** (m + 1))
              * math.sqrt(math.pi)
              * jnp.exp(-(m + 0.5) * jnp.log(T_asy)))

    f_m = jnp.where(in_small, f_series,
                    jnp.where(in_large, f_asym, f_gamma))

    out = [f_m]
    expT = jnp.exp(-T)
    for mm in range(m, 0, -1):
        f_m = (2.0 * T * f_m + expT) / (2 * mm - 1)
        out.append(f_m)
    return jnp.stack(out[::-1], axis=0)
