"""def2-TZVP (Weigend & Ahlrichs, PCCP 7, 3297 (2005)).

The def2-TZVP tables are not yet embedded (no network in the build
environment; the digits must be transcribed from the published supplementary
tables in a later round). The BDE workflow (reference
templates/calculate_bde.py defaults M06-2X/def2-TZVP) transparently falls
back to 6-311G** with a logged warning until this lands.
"""


class _MissingBasis(str):
    pass


DEF2_TZVP_NWCHEM = None


def not_available() -> str:
    raise NotImplementedError(
        "def2-TZVP tables are not embedded yet; use 6-311G** (the workflow "
        "layer falls back automatically)")
