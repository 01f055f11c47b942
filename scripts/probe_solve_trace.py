"""Trace the phenol DF-B3LYP solve per-cycle (round-5 convergence audit).

The r5 bench rehearsal converged=False at E 4.6e-5 Ha ABOVE the host
oracle after 45 f32 + 45 f64 cycles, with conv_tol_grad=1e-6; the r4
probe (default conv_tol_grad ~3e-4 + sustained exit) hit 1.4e-8 in 21
cycles. This prints every cycle's E/dE/|g| for both phases, then warm-
restarts to see whether the f64 iteration can descend at all.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(m):
    print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)


from bench import PHENOL, ORACLES
from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS

ref = ORACLES["phenol_631gs"]
mol = Molecule.from_atoms(PHENOL, basis="6-31g*")
mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=45,
         conv_tol=1e-7, conv_tol_grad=1e-6, precision="mixed",
         verbose=2)
mf.grid_level = 2
t = time.time()
mf._setup_xc()
log(f"grids {time.time() - t:.0f}s")
t = time.time()
mf.get_jk_builder()
log(f"B built {time.time() - t:.0f}s")
t = time.time()
e = mf.kernel()
log(f"kernel {time.time() - t:.0f}s: E={e:.9f} conv={mf.converged} "
    f"cycles={mf.n_cycles} dE_vs_oracle={e - ref:+.3e}")

# warm continuation: can the f64 phase descend further at all?
mf.opts.max_cycle = 30
t = time.time()
e2 = mf.kernel(dm0=mf.dm)
log(f"continuation {time.time() - t:.0f}s: E={e2:.9f} conv={mf.converged} "
    f"cycles={mf.n_cycles} dE_vs_oracle={e2 - ref:+.3e}")
