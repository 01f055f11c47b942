"""Warm-path timing of the eager DF gradient at phenol (round 5).

Loads the cached B factor (/tmp/phenol_B.npz via probe_fixedpoint.py),
solves the SCF (validated steps), then times gradient(mf) twice — the
first call pays per-class g3/g2 warm loads, the second is steady state.
The bench's north-star stage needs `left() > 240`; this measures whether
that budget is honest.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()


def log(m):
    print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)


import jax.numpy as jnp

from bench import PHENOL, ORACLES
from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS

mol = Molecule.from_atoms(PHENOL, basis="6-31g*")
mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=45,
         conv_tol=1e-7, precision="mixed")
mf.grid_level = 2
mf._setup_xc()

from cctpu.ints.df import DFJK, autoaux
d = np.load("/tmp/phenol_B.npz")
jk = DFJK.__new__(DFJK)
jk.aux = autoaux(mol.basis_set)
jk._Linv = d["Linv"]
jk._Bh = d["Bh"]
jk.f64_exact = True
jk._B32 = jnp.asarray(jk._Bh.astype(np.float32))
jk._B64 = None
jk._mol = mol
jk._coords = jnp.asarray(mol.coords)
jk._B_lr = {}
mf._jk = jk
log(f"B loaded naux={jk._Bh.shape[0]}")

e = mf.kernel()
log(f"E={e:.9f} conv={mf.converged} cycles={mf.n_cycles} "
    f"vs_oracle={e - ORACLES['phenol_631gs']:+.2e}")

mf._jk._B64 = None          # free f64 B before the gradient (bench does)

from cctpu.grad.scf_grad import gradient
t = time.time()
g = np.asarray(gradient(mf))
log(f"gradient first (incl loads/compiles): {time.time() - t:.1f}s")
t = time.time()
g2 = np.asarray(gradient(mf))
log(f"gradient steady-state: {time.time() - t:.1f}s")
log(f"repeat_max_dev={np.abs(g - g2).max():.2e} "
    f"trans_inv={np.abs(g.sum(0)).max():.2e} "
    f"max|g|={np.abs(g).max():.6f}")
from cctpu.grad.df_grad import w_anchor
log(f"w_anchor rel = {w_anchor(mf):.3e}")
