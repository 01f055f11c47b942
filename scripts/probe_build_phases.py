"""Phase-logged warm DF build at phenol/6-31G* (round-5 warm-path audit).

Prints per-class tables/dispatch/validate timings via CCTPU_PHASE_LOG=1
so the 968 s warm build (probe_sad_nan.py, r5) decomposes into: host
table construction, kernel trace+lower+cache-load+exec, and numpy-oracle
validation.
"""
import os
import sys
import time

os.environ["CCTPU_PHASE_LOG"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(m):
    print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)


from bench import PHENOL
from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS

mol = Molecule.from_atoms(PHENOL, basis="6-31g*")
mf = RKS(mol, xc="b3lyp", density_fit=True, precision="mixed")
mf.grid_level = 2
t = time.time()
mf._setup_xc()
log(f"grids {time.time() - t:.1f}s")
t = time.time()
mf.get_jk_builder()
log(f"B build {time.time() - t:.1f}s naux={mf._jk._B32.shape[0]}")
