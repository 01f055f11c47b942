"""Embed tables from scripts/derive_basis.py into core/basis_data/def2.py.

Reads /tmp/derived_<El>.nwchem (the derive_basis.py output: an NWChem
block plus a trailing `# E_atom_UHF = ...` provenance line), appends the
element rows to DEF2_TZVP_NWCHEM (before its END sentinel) tagged with a
provenance comment, and prints the pinned atomic energy for the test.

Usage: python scripts/embed_derived.py S Cl [Br ...]
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEF2 = os.path.join(REPO, "cctpu", "core", "basis_data", "def2.py")


def main(elements):
    with open(DEF2) as f:
        src = f.read()
    for el in elements:
        # prefer the UNCONTRACTED table (scripts/uncontract post-pass): the
        # segmented-contraction step of derive_basis.py can lose energy
        # catastrophically (S: 16.8 Ha), while the optimized primitives
        # themselves are HF-limit-grade (S: 10.7 mHa above the limit,
        # re-validated by an atomic UHF on the uncontracted table)
        path = f"/tmp/derived_{el}_unc.nwchem"
        if not os.path.exists(path):
            path = f"/tmp/derived_{el}.nwchem"
        with open(path) as f:
            text = f.read()
        m = re.search(r"# E_atom_UHF = (-?\d+\.\d+)", text)
        e_atom = m.group(1) if m else "?"
        body = text.split("BASIS\n", 1)[1].rsplit("END", 1)[0].rstrip()
        if re.search(rf"^{el}    [SPDFG]$", src, re.M):
            print(f"{el}: already embedded, skipping")
            continue
        block = (f"# {el}: derived by scripts/derive_basis.py "
                 f"(atomic-UHF-optimized well-tempered primitives,\n"
                 f"# uncontracted, def2-TZVP-composition polarization; "
                 f"E_atom_UHF = {e_atom} Ha,\n"
                 f"# pinned in tests/test_basis_data.py)\n{body}\n")
        src = src.replace('END\n"""', block + 'END\n"""')
        print(f"{el}: embedded ({len(body.splitlines())} rows), "
              f"E_atom_UHF = {e_atom}")
    with open(DEF2, "w") as f:
        f.write(src)


if __name__ == "__main__":
    main(sys.argv[1:] or ["S", "Cl"])
