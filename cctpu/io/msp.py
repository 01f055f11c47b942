"""MSP (NIST-style mass-spectrum library) and MOL/SDF (V2000) parsers.

Reference pipeline: templates/ms-pred-gcn-eims-cupy.py reads paired
.MSP spectra ('Num Peaks:' sentinel, :227-290) and MOL structure files via
RDKit. Here both parsers are native.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from cctpu.io.smiles import Atom, Bond, MolGraph


def parse_msp(path: str) -> List[Dict]:
    """Parse an MSP library file into records with name/meta/peaks."""
    records = []
    cur = {"meta": {}, "peaks": []}
    npeaks_left = 0
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line:
                if cur["peaks"] or cur["meta"]:
                    records.append(cur)
                    cur = {"meta": {}, "peaks": []}
                npeaks_left = 0
                continue
            if npeaks_left > 0:
                for tok in line.replace(";", " ").split():
                    cur.setdefault("_buf", []).append(tok)
                buf = cur.get("_buf", [])
                while len(buf) >= 2:
                    mz = float(buf.pop(0))
                    inten = float(buf.pop(0))
                    cur["peaks"].append((mz, inten))
                    npeaks_left -= 1
                continue
            if ":" in line:
                key, _, val = line.partition(":")
                key = key.strip().lower()
                val = val.strip()
                if key == "num peaks":
                    npeaks_left = int(val)
                else:
                    cur["meta"][key] = val
    if cur["peaks"] or cur["meta"]:
        records.append(cur)
    for r in records:
        r.pop("_buf", None)
    return records


def peaks_to_vector(peaks, max_mz: int = 500) -> np.ndarray:
    """Bin peaks into a max-normalized intensity vector (reference
    CuPySpectrumProcessor semantics: bin -> max-merge -> max-normalize)."""
    v = np.zeros(max_mz, dtype=np.float32)
    for mz, inten in peaks:
        b = int(round(mz))
        if 0 <= b < max_mz:
            v[b] = max(v[b], inten)
    m = v.max()
    if m > 0:
        v /= m
    return v


def parse_molfile(path_or_text: str, is_text: bool = False) -> MolGraph:
    """Minimal MOL/SDF V2000 connection-table parser."""
    text = path_or_text if is_text else open(path_or_text).read()
    lines = text.splitlines()
    counts = lines[3].split()
    natoms, nbonds = int(counts[0]), int(counts[1])
    atoms = []
    for i in range(natoms):
        t = lines[4 + i].split()
        atoms.append(Atom(symbol=t[3].capitalize(), idx=i))
    bonds = []
    for i in range(nbonds):
        t = lines[4 + natoms + i]
        a = int(t[0:3]) - 1
        b = int(t[3:6]) - 1
        order = int(t[6:9])
        arom = order == 4
        bonds.append(Bond(a, b, order=1 if arom else order, aromatic=arom))
    # charges from M  CHG lines
    for ln in lines[4 + natoms + nbonds:]:
        if ln.startswith("M  CHG"):
            t = ln.split()
            n = int(t[2])
            for k in range(n):
                atoms[int(t[3 + 2 * k]) - 1].charge = int(t[4 + 2 * k])
        if ln.startswith("M  END"):
            break
    g = MolGraph(atoms, bonds)
    from cctpu.io.smiles import _assign_implicit_h
    for a in g.atoms:
        a.aromatic = any(b.aromatic for b in g.bonds
                         if a.idx in (b.i, b.j))
    _assign_implicit_h(g)
    return g
