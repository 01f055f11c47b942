"""Benchmark harness — prints ONE JSON line for the driver.

Metric: wall seconds per SCF cycle, B3LYP with density-fitted J/K (the
BASELINE.json north-star shape, scaled to what compiles within the round's
time budget on the axon-tunneled v5e). Staged: water/6-31G always
completes; phenol/6-31G* upgrades the metric when the compile budget
allows. ``vs_baseline`` stays 0.0 (the reference publishes no numbers —
BASELINE.md; a measured gpu4pyscf/A100 figure does not exist here).
"""

import json
import sys
import time

BUDGET_S = 2100.0   # leave headroom under the driver's timeout


def run_config(name, atoms, basis, grid_level, max_cycle=25):
    import jax
    import jax.numpy as jnp
    from cctpu.core.molecule import Molecule
    from cctpu.dft.rks import RKS
    from cctpu.scf.diis import diis_init
    from cctpu.scf.hf import _orthogonalizer

    mol = Molecule.from_atoms(atoms, basis=basis)
    # conv_tol 1e-8: the v5e f64 emulation (float32 pairs) has a ~1e-9
    # noise floor on dE; 1e-10 never triggers
    # mixed precision: f32 MXU-native iterations + f64 polish — the
    # production fast path (validated to 1e-13 vs pure f64 in tests)
    mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=max_cycle,
             conv_tol=1e-8, precision="mixed")
    mf.grid_level = grid_level
    mf._setup_xc()
    e = mf.kernel()

    ints = mf.build_ints()
    S = ints["S"]
    H = ints["T"] + ints["V"]
    X = _orthogonalizer(S)
    f32 = jnp.float32
    step32 = jax.jit(mf._make_step(H.astype(f32), S.astype(f32),
                                   _orthogonalizer(S.astype(f32))))
    diis = diis_init(mf.opts.diis_space, mf._diis_size(mf.dm), dtype=f32)
    dm32 = mf.dm.astype(f32)
    out = step32(diis, dm32, jnp.asarray(True))
    out[1].block_until_ready()
    n_timed = 8
    t0 = time.time()
    for _ in range(n_timed):
        out = step32(out[0], out[1], jnp.asarray(True))
    out[1].block_until_ready()
    per_iter = (time.time() - t0) / n_timed

    step64 = jax.jit(mf._make_step(H, S, X))
    d64 = diis_init(mf.opts.diis_space, mf._diis_size(mf.dm))
    o64 = step64(d64, mf.dm, jnp.asarray(True))
    o64[1].block_until_ready()
    t0 = time.time()
    for _ in range(4):
        o64 = step64(o64[0], o64[1], jnp.asarray(True))
    o64[1].block_until_ready()
    per_iter64 = (time.time() - t0) / 4
    return {
        "metric": f"b3lyp_df_scf_s_per_cycle_f32_{name}",
        "value": round(per_iter, 4),
        "unit": "s/cycle",
        "vs_baseline": 0.0,
        "extra": {"e_tot": float(e), "converged": bool(mf.converged),
                  "nao": int(mol.nao), "basis": basis,
                  "f64_s_per_cycle": round(per_iter64, 4)},
    }


def main():
    t_start = time.time()
    water = ("O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692")
    phenol = ("C 0.0000 1.3970 0.0000; C 1.2098 0.6985 0.0000; "
              "C 1.2098 -0.6985 0.0000; C 0.0000 -1.3970 0.0000; "
              "C -1.2098 -0.6985 0.0000; C -1.2098 0.6985 0.0000; "
              "O 0.0000 2.7650 0.0000; H 0.9300 3.1000 0.0000; "
              "H 2.1500 1.2400 0.0000; H 2.1500 -1.2400 0.0000; "
              "H 0.0000 -2.4800 0.0000; H -2.1500 -1.2400 0.0000; "
              "H -2.1500 1.2400 0.0000")

    result = None
    try:
        result = run_config("water_631g", water, "6-31g", grid_level=2)
        result["extra"]["stage_s"] = round(time.time() - t_start, 1)
    except Exception as exc:           # always emit a line
        result = {"metric": "bench_failed", "value": -1.0, "unit": "s",
                  "vs_baseline": 0.0, "extra": {"error": str(exc)[:200]}}

    if result["metric"].startswith("b3lyp") and \
            time.time() - t_start < BUDGET_S * 0.45:
        try:
            r2 = run_config("phenol_631gs", phenol, "6-31g*", grid_level=2)
            r2["extra"]["stage_s"] = round(time.time() - t_start, 1)
            r2["extra"]["water_s_per_cycle"] = result["value"]
            result = r2
        except Exception:
            pass                        # keep the water result

    print(json.dumps(result))


if __name__ == "__main__":
    main()
