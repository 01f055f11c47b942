"""Isolate the phenol fixed-point shift (round 5).

Observed: the jitted f32 step stalls at |g|~8.6e-3 (expected ~3e-6) and
the jitted f64 step oscillates around E = -307.457937 — 4.6e-5 Ha BELOW
the host-f64 oracle (-307.457891), i.e. non-variational. The eager f64
Fock path is proven good to ~3e-7 (SAD anchor). Hypothesis: a corrupt
compiled STEP executable (the round-4 disease, but in the SCF step
rather than an integral class).

Experiments (B factor cached to /tmp/phenol_B.npz so reruns skip the
~520 s build):
  1. kernel() -> dm_step, E_step
  2. E_eager(dm_step) via the anchored eager path — step-energy bias?
  3. five host-side SCF iterations from dm_step: eager F on device,
     HOST eigh, eager E — does the energy descend to the oracle?
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

from bench import PHENOL, ORACLES
from cctpu.core.molecule import Molecule
from cctpu.dft.rks import RKS

REF = ORACLES["phenol_631gs"]
BNPZ = "/tmp/phenol_B.npz"

mol = Molecule.from_atoms(PHENOL, basis="6-31g*")
mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=45,
         conv_tol=1e-7, conv_tol_grad=1e-6, precision="mixed", verbose=2)
mf.grid_level = 2
mf._setup_xc()
log("grids ready")

if os.path.exists(BNPZ):
    from cctpu.ints.df import DFJK, autoaux
    d = np.load(BNPZ)
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
    log(f"B loaded from cache naux={jk._Bh.shape[0]}")
else:
    mf.get_jk_builder()
    np.savez(BNPZ, Bh=mf._jk._Bh, Linv=mf._jk._Linv)
    log(f"B built + cached naux={mf._jk._B32.shape[0]}")

e_nuc = float(mol.energy_nuc())
ints = mf.build_ints()
H = ints["T"] + ints["V"]
mf._prepare_xc_f64()


def e_eager(dm):
    dm64 = jnp.asarray(dm, jnp.float64)
    cocc = mf._factor_cocc(dm64)
    veff, e2 = mf.get_veff(dm64, cocc=cocc)
    e1 = float(jnp.einsum("ij,ij->", dm64, H))
    return e1 + float(e2) + e_nuc, veff


t = time.time()
e_step = mf.kernel()
log(f"kernel {time.time() - t:.0f}s: E_step={e_step:.9f} "
    f"conv={mf.converged} cycles={mf.n_cycles} "
    f"vs_oracle={e_step - REF:+.3e}")

dm = mf.dm
e_eag, veff = e_eager(dm)
log(f"E_eager(dm_step) = {e_eag:.9f} vs_oracle={e_eag - REF:+.3e} "
    f"step_bias={e_step - e_eag:+.3e}")

# host-side SCF iterations with eager Fock
S = np.asarray(ints["S"], dtype=np.float64)
w_s, U_s = np.linalg.eigh(S)
X = U_s @ np.diag(1.0 / np.sqrt(w_s)) @ U_s.T
nocc = mol.nelectron // 2
for it in range(5):
    F = np.asarray(H, dtype=np.float64) + np.asarray(veff, dtype=np.float64)
    Fp = X @ F @ X
    w, C = np.linalg.eigh(Fp)
    C = X @ C
    dm = 2.0 * C[:, :nocc] @ C[:, :nocc].T
    e_new, veff = e_eager(dm)
    log(f"host-iter {it}: E = {e_new:.9f} vs_oracle={e_new - REF:+.3e}")
log("done")
