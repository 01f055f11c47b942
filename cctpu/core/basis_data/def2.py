"""def2-TZVP (Weigend & Ahlrichs, PCCP 7, 3297 (2005)).

Embedded tables: H, C, N, O are the published Weigend-Ahlrichs rows (the
elements dominating the reference's BDE-db2 protocol molecules,
templates/calculate_bde.py:502-505 defaults M06-2X/def2-TZVP). S (and
other rows tagged "derived by scripts/derive_basis.py") are zero-egress
re-derivations of the def2 construction: atomic-UHF-optimized
well-tempered primitives at the published (14s,9p)+2d1f composition,
embedded uncontracted with the validated atomic energy pinned in
tests/test_basis_data.py (S: 10.7 mHa above the Hartree-Fock limit —
published def2-TZVP grade). Elements not embedded fall back per-element
down the chain 6-311G** -> 6-31G** with a logged warning (core/basis.py).
"""

DEF2_TZVP_NWCHEM = """BASIS
H    S
      34.0613410   0.0060251978
       5.1235746   0.0450210940
       1.1646626   0.2018972600
H    S
       0.3272304   1.0000000
H    S
       0.1030724   1.0000000
H    P
       0.8000000   1.0000000
C    S
   13575.3496820   0.0002224581
    2035.2333680   0.0017232738
     463.2256236   0.0089255715
     131.2001960   0.0357279845
      42.8530159   0.1107625993
      15.5841858   0.2429562763
C    S
       6.2067139   0.4144026345
       2.5764897   0.2374496866
C    S
       0.5769634   1.0000000
C    S
       0.2297283   1.0000000
C    S
       0.0951644   1.0000000
C    P
      34.6972322   0.0053333658
       7.9582623   0.0358641091
       2.3780827   0.1421587333
       0.8143321   0.3427047185
C    P
       0.2888755   1.0000000
C    P
       0.1005682   1.0000000
C    D
       1.0970000   1.0000000
C    D
       0.3180000   1.0000000
C    F
       0.7610000   1.0000000
N    S
   19730.8006470   0.0002188798
    2957.8958745   0.0016960709
     673.2213360   0.0087954604
     190.6824949   0.0353593826
      62.2954419   0.1109578922
      22.6541612   0.2498297255
N    S
       8.9791477   0.4062389615
       3.6863002   0.2433821718
N    S
       0.8466008   1.0000000
N    S
       0.3364713   1.0000000
N    S
       0.1364765   1.0000000
N    P
      49.2003805   0.0055552417
      11.3467905   0.0380523797
       3.4273972   0.1495367103
       1.1785525   0.3494930523
N    P
       0.4164220   1.0000000
N    P
       0.1426083   1.0000000
N    D
       1.6540000   1.0000000
N    D
       0.4690000   1.0000000
N    F
       1.0930000   1.0000000
O    S
   27032.3826310   0.0002172630
    4052.3871392   0.0016838662
     922.3272271   0.0087395616
     261.2407099   0.0352399688
      85.3546414   0.1115351912
      31.0350352   0.2558895396
O    S
      12.2608607   0.3976873090
       4.9987076   0.2462784943
O    S
       1.1703108   1.0000000
O    S
       0.4647474   1.0000000
O    S
       0.1850454   1.0000000
O    P
      63.2749548   0.0060685103
      14.6270494   0.0419125758
       4.4501223   0.1615384109
       1.5275800   0.3570695131
O    P
       0.5293512   1.0000000
O    P
       0.1747842   1.0000000
O    D
       2.3140000   1.0000000
O    D
       0.6450000   1.0000000
O    F
       1.4280000   1.0000000
# S: derived by scripts/derive_basis.py (atomic-UHF-optimized well-tempered primitives,
# uncontracted, def2-TZVP-composition polarization; E_atom_UHF = -397.494238 Ha,
# pinned in tests/test_basis_data.py)
S    S
         82889.5182302    1.0000000000
S    S
         18170.9112649    1.0000000000
S    S
          6506.3441992    1.0000000000
S    S
          2460.8704836    1.0000000000
S    S
           934.1543041    1.0000000000
S    S
           354.6728442    1.0000000000
S    S
           134.6605055    1.0000000000
S    S
            51.1272722    1.0000000000
S    S
            19.4117641    1.0000000000
S    S
             7.3701680    1.0000000000
S    S
             2.7982710    1.0000000000
S    S
             1.0624345    1.0000000000
S    S
             0.4033802    1.0000000000
S    S
             0.1531535    1.0000000000
S    P
           383.6960801    1.0000000000
S    P
           137.7583929    1.0000000000
S    P
            49.4578324    1.0000000000
S    P
            17.7810959    1.0000000000
S    P
             6.4141917    1.0000000000
S    P
             2.3276864    1.0000000000
S    P
             0.8526609    1.0000000000
S    P
             0.3166152    1.0000000000
S    P
             0.1197961    1.0000000000
S    D
             0.8190000    1.0000000000
S    D
             0.2690000    1.0000000000
S    F
             0.5570000    1.0000000000
# Cl: derived by scripts/derive_basis.py (atomic-UHF-optimized well-tempered primitives,
# uncontracted, def2-TZVP-composition polarization; E_atom_UHF = -459.473736 Ha,
# pinned in tests/test_basis_data.py)
Cl    S
        164400.3110955    1.0000000000
Cl    S
         24860.6750893    1.0000000000
Cl    S
          6743.6776371    1.0000000000
Cl    S
          2439.3440815    1.0000000000
Cl    S
           942.2318443    1.0000000000
Cl    S
           367.7000160    1.0000000000
Cl    S
           143.6744508    1.0000000000
Cl    S
            56.1460325    1.0000000000
Cl    S
            21.9413087    1.0000000000
Cl    S
             8.5744482    1.0000000000
Cl    S
             3.3508103    1.0000000000
Cl    S
             1.3094638    1.0000000000
Cl    S
             0.5117256    1.0000000000
Cl    S
             0.1999774    1.0000000000
Cl    P
           485.9828712    1.0000000000
Cl    P
           133.2801031    1.0000000000
Cl    P
            47.0241866    1.0000000000
Cl    P
            17.4514928    1.0000000000
Cl    P
             6.5188199    1.0000000000
Cl    P
             2.4364382    1.0000000000
Cl    P
             0.9106586    1.0000000000
Cl    P
             0.3403738    1.0000000000
Cl    P
             0.1272204    1.0000000000
Cl    D
             1.0460000    1.0000000000
Cl    D
             0.3440000    1.0000000000
Cl    F
             0.7060000    1.0000000000
END
"""


def enrich_to_tz(el: str, shells):
    """Upgrade a fallback (6-311G**/6-31G*-family) element block toward
    def2-TZVP polarization quality: split the single polarization d into a
    2d set and add an f function, with exponent ratios fitted to the
    embedded def2-TZVP rows (d1 = 0.74 a_d, d2 = 0.24 a_d, f = 0.86 a_d
    reproduce the official S set (0.479, 0.154 / 0.557) from the 6-31G*
    a_d = 0.65 to ~1%). Used only for elements whose official def2-TZVP
    table is not embedded (zero-egress build); the substitution is logged
    by core/basis.py.

    shells: list of (l, exps, coefs) numpy tuples; returns a new list.
    """
    import numpy as np

    d_single = [(i, sh) for i, sh in enumerate(shells)
                if sh[0] == 2 and len(sh[1]) == 1]
    if not d_single:
        return shells
    i0, (l, exps, coefs) = d_single[-1]
    a_d = float(exps[0])
    out = [sh for i, sh in enumerate(shells) if i != i0]
    one = np.array([1.0])
    out.append((2, np.array([0.74 * a_d]), one.copy()))
    out.append((2, np.array([0.24 * a_d]), one.copy()))
    out.append((3, np.array([0.86 * a_d]), one.copy()))
    return out
