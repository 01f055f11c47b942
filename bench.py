"""Benchmark harness — prints ONE JSON line for the driver.

Metric: wall seconds per SCF cycle, B3LYP/6-31G* with density-fitted J/K on
a mid-size organic molecule (the reference's north-star shape is SCF+grad
s/iter at B3LYP/6-31G*; this scales down until the larger configs land).
``vs_baseline`` is seconds-per-iter relative to the BASELINE.json target
stack (gpu4pyscf on A100); the reference publishes no numbers
(BASELINE.md), so until a measured A100 figure exists we report the raw
value and vs_baseline = 0.0 (unknown).
"""

import json
import sys
import time


def main():
    t_setup = time.time()
    import numpy as np
    from cctpu.core.molecule import Molecule
    from cctpu.dft.rks import RKS

    # phenol: 13 atoms, 6-31G* — representative organic hybrid-DFT job
    atoms = """
    C 0.0000 1.3970 0.0000; C 1.2098 0.6985 0.0000; C 1.2098 -0.6985 0.0000;
    C 0.0000 -1.3970 0.0000; C -1.2098 -0.6985 0.0000; C -1.2098 0.6985 0.0000;
    O 0.0000 2.7650 0.0000; H 0.9300 3.1000 0.0000;
    H 2.1500 1.2400 0.0000; H 2.1500 -1.2400 0.0000; H 0.0000 -2.4800 0.0000;
    H -2.1500 -1.2400 0.0000; H -2.1500 1.2400 0.0000
    """.replace("\n", " ")
    mol = Molecule.from_atoms(atoms, basis="6-31g*")
    mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=30)
    mf.grid_level = 2
    mf._setup_xc()

    # warm-up run compiles everything; timed run measures steady-state cycles
    e = mf.kernel()
    ncyc_timer = 6
    ints = mf.build_ints()
    import jax
    import jax.numpy as jnp
    from cctpu.scf.hf import _orthogonalizer
    from cctpu.scf.diis import diis_init
    S = ints["S"]
    H = ints["T"] + ints["V"]
    X = _orthogonalizer(S)
    step = jax.jit(mf._make_step(H, S, X))
    diis = diis_init(mf.opts.diis_space, mf._diis_size(mf.dm))
    dm = mf.dm
    # compile
    out = step(diis, dm, jnp.asarray(True))
    out[1].block_until_ready()
    t0 = time.time()
    for _ in range(ncyc_timer):
        out = step(out[0], out[1], jnp.asarray(True))
    out[1].block_until_ready()
    per_iter = (time.time() - t0) / ncyc_timer

    print(json.dumps({
        "metric": "b3lyp_631gs_df_scf_s_per_cycle_phenol",
        "value": round(per_iter, 4),
        "unit": "s/cycle",
        "vs_baseline": 0.0,
        "extra": {
            "e_tot": float(e),
            "converged": bool(mf.converged),
            "nao": int(mol.nao),
            "setup_s": round(time.time() - t_setup, 1),
        },
    }))


if __name__ == "__main__":
    main()
