"""Isolate which gradient term NaNs on device (round 5).

probe_grad_warm.py: gradient values all-NaN at phenol while w_anchor is
healthy (4.5e-6) and the same path passes vs finite differences on CPU —
a device-only NaN (emulated-f64 pow/underflow class). Evaluates each
term of scf_gradient_eager separately on the SAD density.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()


def log(m):
    print(f"[{time.time() - t0:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp

from bench import PHENOL
from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS

mol = Molecule.from_atoms(PHENOL, basis="6-31g*")
mf = RKS(mol, xc="b3lyp", density_fit=True, precision="mixed")
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

dm = mf.init_guess_dm()
mf.dm = dm
# fake converged-state fields for the W term
from cctpu.scf.hf import _orthogonalizer, _fock_eig
ints = mf.build_ints()
H = ints["T"] + ints["V"]
X = _orthogonalizer(ints["S"])
mo_e, mo_c = _fock_eig(H, X)
mf.mo_energy, mf.mo_coeff = mo_e, mo_c
mf.mo_occ = mf._occ(mo_e)

coords = jnp.asarray(mol.coords)
basis = mol.basis_set
charges = jnp.asarray(mol.charges)

from cctpu.grad.scf_grad import _energy_weighted_dm
from cctpu.ints.one_electron import build_int1e

W = _energy_weighted_dm(mf)
Dtot = dm


def one_e(R):
    i1 = build_int1e(basis, R, charges)
    return (jnp.einsum("ij,ij->", Dtot, i1["T"] + i1["V"])
            - jnp.einsum("ij,ij->", W, i1["S"]))


g1 = np.asarray(jax.grad(one_e)(coords))
log(f"1e grad finite={np.isfinite(g1).all()} max={np.abs(g1).max():.4f}")

from cctpu.grad.df_grad import df_e2_gradient_eager
g2 = df_e2_gradient_eager(mf)
log(f"df 2e grad finite={np.isfinite(g2).all()} max={np.abs(g2).max():.4f}")

gx = np.asarray(jax.grad(lambda R: mf.exc_of_coords(R, dm))(coords))
log(f"xc grad finite={np.isfinite(gx).all()} max={np.abs(gx).max():.4f}")

gn = np.asarray(jax.grad(lambda R: mol.energy_nuc(R))(coords))
log(f"nuc grad finite={np.isfinite(gn).all()} max={np.abs(gn).max():.4f}")

func = mf.func
if getattr(func, "dispersion", None):
    from cctpu.dft.dispersion import dispersion_energy
    gd = np.asarray(jax.grad(
        lambda R: dispersion_energy(func, mol, R))(coords))
    log(f"disp grad finite={np.isfinite(gd).all()} "
        f"max={np.abs(gd).max():.4f}")
log("done")
