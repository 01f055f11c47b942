"""Regenerate /tmp/probe_fix_ref.npz from the numpy host oracle.

The probe reference (water 6-31G* autoaux metric M and 3c2e tensor X in
true f64) originally came from the JAX CPU eager builders
(scripts/probe_fix.py cpu) — but /tmp is wiped per boot and the CPU
compile cache is boot-scoped, so regenerating through JAX costs minutes
of cold compile on this 1-CPU host. ints/host_oracle.py computes the
same numbers with zero compiles (pure numpy, validated against
ints/md.py in tests/test_host_oracle.py).
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

t0 = time.time()


def log(m):
    print(f"# {time.time() - t0:7.1f}s {m}", flush=True)


def main():
    from cctpu.core.basis import nsph
    from cctpu.core.molecule import Molecule
    from cctpu.ints.df import autoaux
    from cctpu.ints.host_oracle import eri_2c2e_np, eri_3c2e_np

    mol = Molecule.from_atoms(
        "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g*")
    aux = autoaux(mol.basis_set)
    coords = np.asarray(mol.coords)
    naux, nao = aux.nao, mol.nao
    log(f"water 6-31g*: nao={nao} naux={naux}")

    M = np.zeros((naux, naux))
    ls_sorted = sorted(aux.groups)
    for lP in ls_sorted:
        gP = aux.groups[lP]
        for lQ in ls_sorted:
            gQ = aux.groups[lQ]
            for i in range(len(gP.shell_idx)):
                for j in range(len(gQ.shell_idx)):
                    blk = eri_2c2e_np(
                        lP, gP.exps[i], gP.coefs[i], coords[gP.atom_idx[i]],
                        lQ, gQ.exps[j], gQ.coefs[j], coords[gQ.atom_idx[j]])
                    p0, q0 = gP.ao_start[i], gQ.ao_start[j]
                    M[p0:p0 + nsph(lP), q0:q0 + nsph(lQ)] = blk
    log(f"M done |M|max={np.abs(M).max():.3e}")

    bs = mol.basis_set
    X = np.zeros((naux, nao, nao))
    shells = bs.shells
    for lP in ls_sorted:
        gP = aux.groups[lP]
        for i in range(len(gP.shell_idx)):
            p0 = gP.ao_start[i]
            for sa in shells:
                for sb in shells:
                    blk = eri_3c2e_np(
                        lP, gP.exps[i], gP.coefs[i], coords[gP.atom_idx[i]],
                        sa.l, np.asarray(sa.exps), np.asarray(sa.coefs),
                        coords[sa.atom],
                        sb.l, np.asarray(sb.exps), np.asarray(sb.coefs),
                        coords[sb.atom])
                    X[p0:p0 + nsph(lP),
                      sa.ao_start:sa.ao_start + nsph(sa.l),
                      sb.ao_start:sb.ao_start + nsph(sb.l)] = blk
        log(f"X lP={lP} done")
    np.savez("/tmp/probe_fix_ref.npz", M=M, X=X)
    log(f"saved /tmp/probe_fix_ref.npz |X|max={np.abs(X).max():.3e}")


if __name__ == "__main__":
    main()
