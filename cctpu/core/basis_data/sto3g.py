"""STO-3G for H–Ne: the canonical distributed tables (embedded literally).

These are the standard STO-3G values (Hehre, Stewart, Pople, JCP 51, 2657
(1969)) as distributed by every major code / the Basis Set Exchange. The
contraction coefficients are the universal 3-Gaussian Slater fits, identical
for all elements; exponents are the universal fits scaled by the published
molecular zeta values. Golden test: He RHF/STO-3G = -2.8077839575 Ha.
"""

_C1S = ("0.15432897", "0.53532814", "0.44463454")
_C2S = ("-0.09996723", "0.39951283", "0.70011547")
_C2P = ("0.15591627", "0.60768372", "0.39195739")

# element: (1s exps, 2sp exps or None)
_EXPS = {
    "H": (("3.42525091", "0.62391373", "0.16885540"), None),
    "He": (("6.36242139", "1.15892300", "0.31364979"), None),
    "Li": (("16.1195750", "2.93620070", "0.79465050"),
           ("0.63628970", "0.14786010", "0.04808870")),
    "Be": (("30.1678710", "5.49511530", "1.48719270"),
           ("1.31483310", "0.30553890", "0.09937070")),
    "B": (("48.7911130", "8.88736220", "2.40526700"),
          ("2.23695610", "0.51982050", "0.16906180")),
    "C": (("71.6168370", "13.0450960", "3.53051220"),
          ("2.94124940", "0.68348310", "0.22228990")),
    "N": (("99.1061690", "18.0523120", "4.88566020"),
          ("3.78045590", "0.87849660", "0.28571440")),
    "O": (("130.7093200", "23.8088610", "6.44360830"),
          ("5.03315130", "1.16959610", "0.38038900")),
    "F": (("166.6791300", "30.3608120", "8.21682070"),
          ("6.46480320", "1.50228120", "0.48858850")),
    "Ne": (("207.0156100", "37.7081510", "10.2052970"),
           ("8.24631510", "1.91626620", "0.62322930")),
}


def _block(sym):
    s_exps, sp_exps = _EXPS[sym]
    lines = [f"{sym}    S"]
    for e, c in zip(s_exps, _C1S):
        lines.append(f"      {e}   {c}")
    if sp_exps is not None:
        lines.append(f"{sym}    SP")
        for e, cs, cp in zip(sp_exps, _C2S, _C2P):
            lines.append(f"      {e}   {cs}   {cp}")
    return "\n".join(lines)


STO3G_NWCHEM = "BASIS\n" + "\n".join(_block(s) for s in _EXPS) + "\nEND\n"
