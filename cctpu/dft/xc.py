"""Exchange-correlation functionals in pure JAX.

Replaces libxc (SURVEY.md §2.2): each functional is an energy density
e(rho_a, rho_b, sigma_*, tau_*) in Ha/bohr^3, written directly from the
published forms. Potentials are never hand-coded — the Fock XC contribution
comes from jax.grad of the integrated energy (see dft/rks.py) — so each
functional is ~30 lines of math instead of hundreds of lines of derivative
code. All branches are NaN-safe under AD (where-masked low-density guards).

Implemented: Slater X, VWN3/VWN5 C, PW92 C, B88 X, LYP C, PBE X/C and the
composites SVWN, BLYP, PBE, PBE0, B3LYP (VWN3, Gaussian/libxc convention,
matching what PySCF dispatches for the reference's mf.xc='b3lyp'), B3LYP5.
Range-separated hybrids (CAM-B3LYP, wB97X) and the M06 meta-GGA family plug
into the same registry (hyb/rsh fields) as they land.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# Cutoff chosen for the TPU f64-emulation (float32-pair) exponent range:
# intermediates like rho^(-11/3) must stay below ~1e38.
_TINY = 1e-11


def _safe(rho):
    mask = rho > _TINY
    return mask, jnp.where(mask, rho, 1.0)


# ----------------------------------------------------------------------------
# LDA exchange
# ----------------------------------------------------------------------------

_CX = (3.0 / 4.0) * (3.0 / math.pi) ** (1.0 / 3.0)


def e_x_slater(ra, rb, *_):
    out = 0.0
    for r in (ra, rb):
        r = jnp.maximum(r, 0.0)
        m, rs = _safe(r)
        out = out + jnp.where(m, -0.5 * _CX * (2.0 * rs) ** (4.0 / 3.0), 0.0)
    return out


# ----------------------------------------------------------------------------
# VWN correlation (both parameterizations) — Vosko, Wilk, Nusair 1980
# ----------------------------------------------------------------------------

_VWN5 = {  # (A, b, c, x0) for para / ferro / spin stiffness
    "P": (0.0310907, 3.72744, 12.9352, -0.10498),
    "F": (0.01554535, 7.06042, 18.0578, -0.32500),
    "A": (-1.0 / (6.0 * math.pi ** 2), 1.13107, 13.0045, -0.0047584),
}
_VWN3 = {
    "P": (0.0310907, 13.0720, 42.7198, -0.409286),
    "F": (0.01554535, 20.1231, 101.578, -0.743294),
    "A": (-1.0 / (6.0 * math.pi ** 2), 1.06835, 11.4813, -0.228344),
}


def _vwn_eps(x, A, b, c, x0):
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = math.sqrt(4 * c - b * b)
    atn = jnp.arctan(Q / (2 * x + b))
    return A * (jnp.log(x * x / X) + 2 * b / Q * atn
                - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X)
                                 + 2 * (b + 2 * x0) / Q * atn))


def _f_zeta(z):
    return (((1 + z) ** (4.0 / 3.0) + (1 - z) ** (4.0 / 3.0) - 2.0)
            / (2.0 ** (4.0 / 3.0) - 2.0))


_FPP0 = 4.0 / (9.0 * (2.0 ** (1.0 / 3.0) - 1.0))   # f''(0)


def _e_c_vwn(params):
    def fn(ra, rb, *_):
        rho = ra + rb
        m, r = _safe(rho)
        z = jnp.where(m, (ra - rb) / r, 0.0)
        rs = (3.0 / (4.0 * math.pi * r)) ** (1.0 / 3.0)
        x = jnp.sqrt(rs)
        eP = _vwn_eps(x, *params["P"])
        eF = _vwn_eps(x, *params["F"])
        eA = _vwn_eps(x, *params["A"])
        f = _f_zeta(z)
        z4 = z ** 4
        eps = eP + eA * f / _FPP0 * (1 - z4) + (eF - eP) * f * z4
        return jnp.where(m, r * eps, 0.0)
    return fn


e_c_vwn5 = _e_c_vwn(_VWN5)
e_c_vwn3 = _e_c_vwn(_VWN3)


# ----------------------------------------------------------------------------
# PW92 correlation (Perdew & Wang 1992) — needed by PBE
# ----------------------------------------------------------------------------

_PW92 = {
    "P": (0.031091, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294),
    "F": (0.015545, 0.20548, 14.1189, 6.1977, 3.3662, 0.62517),
    "A": (0.016887, 0.11125, 10.357, 3.6231, 0.88026, 0.49671),
}


def _pw92_G(rs, A, a1, b1, b2, b3, b4):
    s = jnp.sqrt(rs)
    den = 2 * A * (b1 * s + b2 * rs + b3 * rs * s + b4 * rs * rs)
    return -2 * A * (1 + a1 * rs) * jnp.log(1 + 1.0 / den)


def pw92_eps(rs, z):
    eP = _pw92_G(rs, *_PW92["P"])
    eF = _pw92_G(rs, *_PW92["F"])
    eA = -_pw92_G(rs, *_PW92["A"])
    f = _f_zeta(z)
    z4 = z ** 4
    return eP + eA * f / _FPP0 * (1 - z4) + (eF - eP) * f * z4


def e_c_pw92(ra, rb, *_):
    rho = ra + rb
    m, r = _safe(rho)
    z = jnp.where(m, (ra - rb) / r, 0.0)
    rs = (3.0 / (4.0 * math.pi * r)) ** (1.0 / 3.0)
    return jnp.where(m, r * pw92_eps(rs, z), 0.0)


# ----------------------------------------------------------------------------
# B88 exchange (Becke 1988)
# ----------------------------------------------------------------------------

_B88_BETA = 0.0042


def e_x_b88(ra, rb, saa, sab, sbb, *_):
    out = 0.0
    for r, s in ((ra, saa), (rb, sbb)):
        m, rs = _safe(r)
        ms = s > 1e-24           # double-where: sqrt(0) has NaN gradient
        ss = jnp.where(ms, s, 1.0)
        r43 = rs ** (4.0 / 3.0)
        x = jnp.sqrt(ss) / r43
        lda = -_CX * 2.0 ** (1.0 / 3.0) * r43
        corr = jnp.where(ms, -_B88_BETA * r43 * x * x / (
            1.0 + 6.0 * _B88_BETA * x * jnp.arcsinh(x)), 0.0)
        out = out + jnp.where(m, lda + corr, 0.0)
    return out


def e_x_b88_gradcorr(ra, rb, saa, sab, sbb, *_):
    """Only the gradient-correction part of B88 (for B3LYP mixing)."""
    out = 0.0
    for r, s in ((ra, saa), (rb, sbb)):
        m, rs = _safe(r)
        ms = s > 1e-24
        ss = jnp.where(ms, s, 1.0)
        r43 = rs ** (4.0 / 3.0)
        x = jnp.sqrt(ss) / r43
        corr = jnp.where(ms, -_B88_BETA * r43 * x * x / (
            1.0 + 6.0 * _B88_BETA * x * jnp.arcsinh(x)), 0.0)
        out = out + jnp.where(m, corr, 0.0)
    return out


# ----------------------------------------------------------------------------
# LYP correlation (Lee-Yang-Parr via Miehlich et al. CPL 157, 200 (1989))
# ----------------------------------------------------------------------------

_LYP_A, _LYP_B, _LYP_C, _LYP_D = 0.04918, 0.132, 0.2533, 0.349
_CF = 0.3 * (3.0 * math.pi ** 2) ** (2.0 / 3.0)


def e_c_lyp(ra, rb, saa, sab, sbb, *_):
    # clamp: grid roundoff can give tiny NEGATIVE spin densities, and
    # fractional powers of negatives produce NaNs that leak through the
    # where-mask under AD
    ra = jnp.maximum(ra, 0.0)
    rb = jnp.maximum(rb, 0.0)
    rho = ra + rb
    m, r = _safe(rho)
    sigma = saa + 2 * sab + sbb
    r13 = r ** (-1.0 / 3.0)
    denom = 1.0 + _LYP_D * r13
    # log-form: exp(-c r^-1/3) * r^-11/3 overflows the TPU float32-pair
    # f64 emulation (r^-11/3 ~ 1e44 at rho ~ 1e-12); the fused exponent
    # stays finite for all masked densities.
    omega = jnp.exp(-_LYP_C * r13 - (11.0 / 3.0) * jnp.log(r)) / denom
    delta = _LYP_C * r13 + _LYP_D * r13 / denom
    term1 = -_LYP_A * 4.0 / denom * ra * rb / r
    inner = (ra * rb * (2.0 ** (11.0 / 3.0) * _CF *
                        (ra ** (8.0 / 3.0) + rb ** (8.0 / 3.0))
                        + (47.0 / 18.0 - 7.0 * delta / 18.0) * sigma
                        - (2.5 - delta / 18.0) * (saa + sbb)
                        - (delta - 11.0) / 9.0 *
                        (ra / r * saa + rb / r * sbb))
             - 2.0 / 3.0 * r * r * sigma
             + (2.0 / 3.0 * r * r - ra * ra) * sbb
             + (2.0 / 3.0 * r * r - rb * rb) * saa)
    term2 = -_LYP_A * _LYP_B * omega * inner
    return jnp.where(m, term1 + term2, 0.0)


# ----------------------------------------------------------------------------
# PBE exchange & correlation (Perdew, Burke, Ernzerhof 1996)
# ----------------------------------------------------------------------------

_PBE_KAPPA = 0.804
_PBE_MU = 0.2195149727645171
_PBE_BETA = 0.06672455060314922
_PBE_GAMMA = (1.0 - math.log(2.0)) / math.pi ** 2


def e_x_pbe(ra, rb, saa, sab, sbb, *_):
    out = 0.0
    for r, s in ((ra, saa), (rb, sbb)):
        m, rs = _safe(r)
        r2 = 2.0 * rs
        kf = (3.0 * math.pi ** 2 * r2) ** (1.0 / 3.0)
        # s^2 = 4*sigma / (2 kf * 2rho)^2 — no sqrt needed, NaN-safe
        s2 = 4.0 * jnp.where(s > 0, s, 0.0) / (2.0 * kf * r2) ** 2
        F = 1.0 + _PBE_KAPPA - _PBE_KAPPA / (1.0 + _PBE_MU * s2
                                             / _PBE_KAPPA)
        lda = -_CX * r2 ** (4.0 / 3.0)
        out = out + jnp.where(m, 0.5 * lda * F, 0.0)
    return out


def e_c_pbe(ra, rb, saa, sab, sbb, *_):
    rho = ra + rb
    m, r = _safe(rho)
    z = jnp.clip(jnp.where(m, (ra - rb) / r, 0.0), -1 + 1e-12, 1 - 1e-12)
    rs = (3.0 / (4.0 * math.pi * r)) ** (1.0 / 3.0)
    eps_lda = pw92_eps(rs, z)
    phi = 0.5 * ((1 + z) ** (2.0 / 3.0) + (1 - z) ** (2.0 / 3.0))
    kf = (3.0 * math.pi ** 2 * r) ** (1.0 / 3.0)
    ks = jnp.sqrt(4.0 * kf / math.pi)
    sigma = saa + 2 * sab + sbb
    t2 = jnp.where(sigma > 0, sigma, 0.0) / (4.0 * phi * phi * ks * ks
                                             * r * r)
    expo = jnp.exp(-eps_lda / (_PBE_GAMMA * phi ** 3))
    A = _PBE_BETA / _PBE_GAMMA / jnp.maximum(expo - 1.0, 1e-30)
    num = 1.0 + A * t2
    den = 1.0 + A * t2 + A * A * t2 * t2
    H = _PBE_GAMMA * phi ** 3 * jnp.log(
        1.0 + _PBE_BETA / _PBE_GAMMA * t2 * num / den)
    return jnp.where(m, r * (eps_lda + H), 0.0)




# ----------------------------------------------------------------------------
# M06-2X meta-GGA (Zhao & Truhlar, Theor. Chem. Acc. 120, 215 (2008))
# ----------------------------------------------------------------------------
# Parameter provenance: transcribed from the published tables (no network in
# this build). Exchange: PBE enhancement x kinetic-energy-density factor
# f(w) = sum_i a_i w^i. Correlation: same-/opposite-spin UEG scaled by
# g(u) power series, gamma_ss = 0.06, gamma_ab = 0.0031 (M05/M06 family
# working equations).

_M062X_A = (4.600000e-01, -2.206052e-01, -9.431788e-02, 2.164494e+00,
            -2.556466e+00, -1.422133e+01, 1.555044e+01, 3.598078e+01,
            -2.722754e+01, -3.924093e+01, 1.522808e+01, 1.522227e+01)
_M062X_CSS = (3.097855e-01, -5.528642e+00, 1.347420e+01, -3.213623e+01,
              2.846742e+01)
_M062X_CAB = (8.833596e-01, 3.357972e+01, -7.043548e+01, 4.978271e+01,
              -1.852891e+01)
_CF_TAU = 0.3 * (6.0 * math.pi ** 2) ** (2.0 / 3.0)   # tau_LSDA coefficient


def _m06_fw(rho, tau, coeffs):
    tau_ueg = _CF_TAU * rho ** (5.0 / 3.0)
    t = tau_ueg / jnp.maximum(tau, 1e-12)
    w = jnp.clip((t - 1.0) / (t + 1.0), -1.0, 1.0)
    f = 0.0
    wp = 1.0
    for a in coeffs:
        f = f + a * wp
        wp = wp * w
    return f


def e_x_m062x(ra, rb, saa, sab, sbb, ta, tb):
    out = 0.0
    for r, s, tau in ((ra, saa, ta), (rb, sbb, tb)):
        m, rs = _safe(r)
        ms = s > 1e-24
        ss = jnp.where(ms, s, 0.0)
        r2 = 2.0 * rs
        kf = (3.0 * math.pi ** 2 * r2) ** (1.0 / 3.0)
        s2 = 4.0 * ss / (2.0 * kf * r2) ** 2
        F = 1.0 + _PBE_KAPPA - _PBE_KAPPA / (1.0 + _PBE_MU * s2 / _PBE_KAPPA)
        lda = -_CX * r2 ** (4.0 / 3.0)
        fw = _m06_fw(rs, jnp.maximum(tau, 1e-12), _M062X_A)
        out = out + jnp.where(m, 0.5 * lda * F * fw, 0.0)
    return out


def _m06_gu(x2, gamma, coeffs):
    u = gamma * x2 / (1.0 + gamma * x2)
    g = 0.0
    up = 1.0
    for c in coeffs:
        g = g + c * up
        up = up * u
    return g


def _ueg_c_spin(ra, rb):
    """UEG correlation split into (e_ab, e_aa, e_bb) via the standard
    spin-decomposition e_ss(r) = e_c(r,r->fully polarized)."""
    e_tot = e_c_pw92(ra, rb)
    e_aa = e_c_pw92(ra, jnp.zeros_like(ra))
    e_bb = e_c_pw92(jnp.zeros_like(rb), rb)
    e_ab = e_tot - e_aa - e_bb
    return e_ab, e_aa, e_bb


def _dfac(rho, sigma, tau):
    """Self-interaction-correction factor D = 1 - x^2/(4(z + CF)) of the
    M05/M06 same-spin correlation (vanishes for one-electron densities)."""
    m, r = _safe(rho)
    x2 = jnp.where(m, sigma / r ** (8.0 / 3.0), 0.0)
    z = jnp.where(m, 2.0 * tau / r ** (5.0 / 3.0), 0.0)
    D = 1.0 - x2 / (4.0 * (z + _CF_TAU * 2.0) + 1e-12)
    return jnp.clip(D, 0.0, 1.0)


def e_c_m062x(ra, rb, saa, sab, sbb, ta, tb):
    e_ab, e_aa, e_bb = _ueg_c_spin(ra, rb)
    ma, rsa = _safe(ra)
    mb, rsb = _safe(rb)
    xa2 = jnp.where(ma, saa / rsa ** (8.0 / 3.0), 0.0)
    xb2 = jnp.where(mb, sbb / rsb ** (8.0 / 3.0), 0.0)
    g_ab = _m06_gu(xa2 + xb2, 0.0031, _M062X_CAB)
    g_aa = _m06_gu(xa2, 0.06, _M062X_CSS)
    g_bb = _m06_gu(xb2, 0.06, _M062X_CSS)
    Daa = _dfac(ra, saa, ta)
    Dbb = _dfac(rb, sbb, tb)
    return e_ab * g_ab + e_aa * g_aa * Daa + e_bb * g_bb * Dbb


# ----------------------------------------------------------------------------
# Range-separation attenuation (Iikura/Hirao SR factor) for CAM-B3LYP
# ----------------------------------------------------------------------------

def _sr_factor(rho_s, mu):
    """Fraction of the DFT exchange hole kept below range mu (per spin)."""
    m, r = _safe(rho_s)
    kf = (6.0 * math.pi ** 2 * r) ** (1.0 / 3.0)
    a = mu / (2.0 * kf)
    a = jnp.clip(a, 1e-8, 50.0)
    exp_term = jnp.exp(-1.0 / (4.0 * a * a))
    f = 1.0 - (8.0 / 3.0) * a * (
        jnp.sqrt(math.pi) * jax.scipy.special.erf(1.0 / (2.0 * a))
        + (2.0 * a - 4.0 * a ** 3) * exp_term - 3.0 * a + 4.0 * a ** 3)
    return jnp.where(m, jnp.clip(f, 0.0, 1.0), 1.0)


def make_camb3lyp_x(alpha=0.19, beta=0.46, mu=0.33):
    """B88 exchange with CAM attenuation: local weight
    (1 - alpha - beta) + beta * f_sr(a)."""
    def fn(ra, rb, saa, sab, sbb, *_):
        out = 0.0
        for r, s in ((ra, saa), (rb, sbb)):
            m, rs = _safe(r)
            ms = s > 1e-24
            ssafe = jnp.where(ms, s, 1.0)
            r43 = rs ** (4.0 / 3.0)
            x = jnp.sqrt(ssafe) / r43
            lda = -_CX * 2.0 ** (1.0 / 3.0) * r43
            corr = jnp.where(ms, -_B88_BETA * r43 * x * x / (
                1.0 + 6.0 * _B88_BETA * x * jnp.arcsinh(x)), 0.0)
            wloc = (1.0 - alpha - beta) + beta * _sr_factor(r, mu)
            out = out + jnp.where(m, (lda + corr) * wloc, 0.0)
        return out
    return fn


# ----------------------------------------------------------------------------
# Registry
# ----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class XCFunctional:
    name: str
    xctype: str                      # 'LDA' | 'GGA' | 'MGGA' | 'HF'
    exc: Optional[Callable]          # e(ra, rb, saa, sab, sbb, ta, tb)
    hyb: float = 0.0                 # exact-exchange fraction (alpha)
    rsh: Optional[Tuple[float, float, float]] = None  # (omega, alpha, beta)
    dispersion: Optional[str] = None  # e.g. 'd3zero' once implemented


def _combine(terms):
    def fn(*args):
        out = 0.0
        for coef, f in terms:
            out = out + coef * f(*args)
        return out
    return fn


def _make_registry() -> Dict[str, XCFunctional]:
    reg = {}

    def add(name, xctype, exc, **kw):
        reg[name] = XCFunctional(name=name, xctype=xctype, exc=exc, **kw)

    add("hf", "HF", None, hyb=1.0)
    add("lda", "LDA", _combine([(1, e_x_slater), (1, e_c_vwn5)]))
    reg["svwn"] = reg["lda"]
    add("lda,vwn3", "LDA", _combine([(1, e_x_slater), (1, e_c_vwn3)]))
    add("pw92", "LDA", _combine([(1, e_x_slater), (1, e_c_pw92)]))
    add("blyp", "GGA", _combine([(1, e_x_b88), (1, e_c_lyp)]))
    add("pbe", "GGA", _combine([(1, e_x_pbe), (1, e_c_pbe)]))
    add("pbe0", "GGA", _combine([(0.75, e_x_pbe), (1, e_c_pbe)]), hyb=0.25)
    # B3LYP (Gaussian/libxc convention, VWN3):
    #   Exc = 0.08 E_x^LSDA + 0.72 E_x^B88 + 0.20 E_x^HF
    #       + 0.19 E_c^VWN3 + 0.81 E_c^LYP
    add("b3lyp", "GGA",
        _combine([(0.08, e_x_slater), (0.72, e_x_b88),
                  (0.19, e_c_vwn3), (0.81, e_c_lyp)]), hyb=0.20)
    add("b3lyp5", "GGA",
        _combine([(0.08, e_x_slater), (0.72, e_x_b88),
                  (0.19, e_c_vwn5), (0.81, e_c_lyp)]), hyb=0.20)
    # M06-2X: 54% exact exchange + meta-GGA (parameters transcribed from
    # the published tables — golden-value revalidation tracked in tests)
    add("m06-2x", "MGGA",
        _combine([(0.46, e_x_m062x), (1.0, e_c_m062x)]), hyb=0.54)
    reg["m06"] = reg["m06-2x"]  # placeholder alias until VS98-part lands
    # CAM-B3LYP: alpha=0.19 SR-HF, alpha+beta=0.65 LR-HF, mu=0.33
    add("cam-b3lyp", "GGA",
        _combine([(1.0, make_camb3lyp_x()), (0.19, e_c_vwn5),
                  (0.81, e_c_lyp)]),
        hyb=0.19, rsh=(0.33, 0.19, 0.46))
    # wB97X-D: own B97-series params not yet transcribed; alias to
    # CAM-B3LYP-style RSH as the nearest available RSH hybrid
    reg["wb97x-d"] = dataclasses.replace(reg["cam-b3lyp"], name="wb97x-d",
                                         dispersion=None)
    return reg


_REGISTRY = _make_registry()


def get_functional(name: str) -> XCFunctional:
    key = name.strip().lower().replace("-", "").replace(" ", "")
    aliases = {"m062x": "m06-2x", "wb97xd": "wb97x-d", "camb3lyp": "cam-b3lyp"}
    key = aliases.get(key, key)
    if key in _REGISTRY:
        return _REGISTRY[key]
    raise ValueError(f"unknown XC functional {name!r}; "
                     f"available: {sorted(_REGISTRY)}")


def register_functional(func: XCFunctional):
    _REGISTRY[func.name] = func
