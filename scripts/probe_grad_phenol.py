"""Standalone phenol DF-B3LYP gradient on the axon TPU (warm cache).

Diagnoses the r4 bench RESOURCE_EXHAUSTED: a fresh process rebuilds the
phenol SCF (kernels all cached), then runs the eager DF gradient with
CCTPU_GRAD_LOG=1 phase/memory logging, the w_anchor, and a steady-state
timing. If this passes while the long-lived bench process OOM'd, the
bench failure was accumulated residency (f64 B + f32 step buffers), not
the gradient's own working set.
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["CCTPU_GRAD_LOG"] = "1"

import numpy as np

t0 = time.time()


def log(m):
    print(f"# {time.time() - t0:7.1f}s {m}", flush=True)


PHENOL = ("C 0.0000 1.3970 0.0000; C 1.2098 0.6985 0.0000; "
          "C 1.2098 -0.6985 0.0000; C 0.0000 -1.3970 0.0000; "
          "C -1.2098 -0.6985 0.0000; C -1.2098 0.6985 0.0000; "
          "O 0.0000 2.7650 0.0000; H 0.9300 3.1000 0.0000; "
          "H 2.1500 1.2400 0.0000; H 2.1500 -1.2400 0.0000; "
          "H 0.0000 -2.4800 0.0000; H -2.1500 -1.2400 0.0000; "
          "H -2.1500 1.2400 0.0000")


def main():
    from cctpu.core.molecule import Molecule
    from cctpu.dft.rks import RKS
    from cctpu.grad.df_grad import w_anchor
    from cctpu.grad.scf_grad import gradient

    mol = Molecule.from_atoms(PHENOL, basis="6-31g*")
    mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=45,
             conv_tol=1e-7, precision="mixed")
    mf.grid_level = 2
    log("building + solving SCF (warm kernels)")
    e = mf.kernel()
    log(f"E = {e:.8f} conv={mf.converged} cycles={getattr(mf,'n_cycles',0)}")
    log(f"w_anchor rel = {w_anchor(mf):.3e}")
    t = time.time()
    g = np.asarray(gradient(mf))
    log(f"gradient first call {time.time() - t:.1f}s "
        f"max|g|={np.abs(g).max():.6f} trans_inv={np.abs(g.sum(0)).max():.2e}")
    t = time.time()
    g2 = np.asarray(gradient(mf))
    log(f"gradient steady state {time.time() - t:.1f}s "
        f"repeat_dev={np.abs(g - g2).max():.2e}")


if __name__ == "__main__":
    main()
