"""Benchmark harness — prints ONE JSON line for the driver.

Metric: wall seconds per SCF cycle, B3LYP with density-fitted J/K (the
BASELINE.json north-star shape: B3LYP/6-31G*, target 50 heavy atoms).
Staged within the driver's time budget: water/6-31G always completes;
phenol/6-31G* (13 atoms) and n-alkane chains (C16H34 -> C24H50 -> C40H82,
approaching the 50-heavy-atom target) upgrade the metric as budget allows.
The f32 cycle runs the Pallas DF-J/K kernels on TPU (ops/df_jk_pallas.py);
f64 (XLA einsum) timed alongside for comparison. ``vs_baseline`` stays 0.0
(the reference publishes no numbers — BASELINE.md).
"""

import json
import os
import signal
import time

# leave headroom under the driver's kill window (~1800 s observed in round
# 1: rc=124 at BUDGET_S=2100 lost the whole round's number); overridable
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1450"))
T_START = time.time()


def left():
    return BUDGET_S - (time.time() - T_START)


def alkane(n_carbon: int) -> str:
    """Zig-zag all-anti n-alkane C_nH_{2n+2} (standard bond geometry)."""
    import numpy as np
    cc, ch = 1.526, 1.090
    ang = np.deg2rad(111.0)
    dx = cc * np.sin(ang / 2)
    dz = cc * np.cos(ang / 2)
    atoms = []
    carbons = []
    for i in range(n_carbon):
        x = i * dx
        z = (i % 2) * dz
        carbons.append((x, 0.0, z))
        atoms.append(f"C {x:.4f} 0.0 {z:.4f}")
    for i, (x, y, z) in enumerate(carbons):
        up = 1.0 if i % 2 == 0 else -1.0
        atoms.append(f"H {x:.4f} {ch * 0.816:.4f} {z + up * ch * 0.577:.4f}")
        atoms.append(f"H {x:.4f} {-ch * 0.816:.4f} {z + up * ch * 0.577:.4f}")
        if i == 0 or i == n_carbon - 1:
            sgn = -1.0 if i == 0 else 1.0
            atoms.append(f"H {x + sgn * ch:.4f} 0.0 {z:.4f}")
    return "; ".join(atoms)


def _log(msg):
    import sys
    print(f"# bench {time.time() - T_START:7.1f}s  {msg}", file=sys.stderr,
          flush=True)


def _hbm() -> float:
    """Device HBM capacity in bytes (v5e ~16e9, v5p ~95e9)."""
    import jax
    try:
        return float(jax.devices()[0].memory_stats()["bytes_limit"])
    except Exception:
        return 16e9


# Host-f64 oracle for the solved phenol stage (CPU, conv_tol 1e-10,
# grid_level 2, DF-B3LYP/6-31G*): the device-achieved |dE| against it is
# the demonstrable accuracy of the mixed-precision path (round-1 VERDICT
# item #3 -- report the number instead of silently widening conv_tol).
ORACLES = {"phenol_631gs": -307.457890943700}


def run_config(name, atoms, basis, grid_level, max_cycle=45, n_timed=8,
               solve=True):
    import jax
    import jax.numpy as jnp
    from cctpu.core.molecule import Molecule
    from cctpu.dft.rks import RKS
    from cctpu.scf.diis import diis_init
    from cctpu.scf.hf import _orthogonalizer

    mol = Molecule.from_atoms(atoms, basis=basis)
    _log(f"{name}: nao={mol.nao} building DF + grids")
    from cctpu.ints.df import autoaux
    naux_est = autoaux(mol.basis_set).nao
    need = 4.0 * naux_est * mol.nao * mol.nao          # f32 B bytes
    if need > 0.6 * _hbm():
        raise RuntimeError(
            f"skipped: f32 B ({need / 1e9:.1f} GB, naux={naux_est}) "
            f"exceeds device HBM ({_hbm() / 1e9:.0f} GB) — stage needs v5p")
    # conv_tol 1e-7: the v5e f64 emulation (float32 pairs) has a ~1e-9
    # RELATIVE noise floor on dE (~3e-7 Ha at |E|~300), so 1e-8 absolute
    # is unreachable at phenol scale; mixed precision = f32 MXU-native
    # iterations (Pallas DF-J/K) + f64 polish (1e-13 vs pure f64 on CPU)
    t_build0 = time.time()
    mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=max_cycle,
             conv_tol=1e-7, precision="mixed")
    mf.grid_level = grid_level
    mf._setup_xc()
    _log(f"{name}: grids ready (+{time.time() - t_build0:.0f}s)")
    t_b = time.time()
    mf.get_jk_builder()
    _log(f"{name}: naux={mf._jk.aux.nao} B built (+{time.time() - t_b:.0f}s); "
         f"{'SCF solve' if solve else 'timing-only (SAD start)'}")
    if solve:
        e = mf.kernel()
    else:
        # large stages: the metric is s/cycle of the f32 step; smaller
        # stages anchor correctness, so start from the SAD guess here
        e = float("nan")
        mf.dm = mf.init_guess_dm()
        mf.converged = False
    t_solve = time.time() - t_build0
    _log(f"{name}: E={e:.6f} conv={mf.converged} "
         f"build{'+solve' if solve else ''}={t_solve:.0f}s; "
         f"timing f32 step")

    ints = mf.build_ints()
    S = ints["S"]
    H = ints["T"] + ints["V"]
    f32 = jnp.float32
    mf._jk.prepare_dtype(f32)
    mf._prepare_xc_f32()
    step32 = mf._jit_step(H.astype(f32), S.astype(f32),
                          _orthogonalizer(S.astype(f32)))
    c32 = mf._step_consts(f32)
    diis = diis_init(mf.opts.diis_space, mf._diis_size(mf.dm), dtype=f32)
    dm32 = mf.dm.astype(f32)
    cocc32 = jax.tree.map(lambda c: c.astype(f32), mf._factor_cocc(mf.dm))
    with jax.default_matmul_precision("highest"):
        out = step32(c32, diis, dm32, cocc32, jnp.asarray(True))
        out[1].block_until_ready()
        t0 = time.time()
        for _ in range(n_timed):
            out = step32(c32, out[0], out[1], out[2], jnp.asarray(True))
        out[1].block_until_ready()
        per_iter = (time.time() - t0) / n_timed

    per_iter64 = None
    # skip the f64 comparison when forming the f64 B would blow HBM
    # (astype doubles the resident bytes; the f32 metric is the product)
    b_bytes = 8 * mf._jk.aux.nao * mol.nao * mol.nao
    if left() > 4 * per_iter * n_timed + 120 and b_bytes < 0.45 * _hbm():
        X = _orthogonalizer(S)
        step64 = mf._jit_step(H, S, X)
        c64 = mf._step_consts(jnp.float64)
        d64 = diis_init(mf.opts.diis_space, mf._diis_size(mf.dm))
        o64 = step64(c64, d64, mf.dm, mf._factor_cocc(mf.dm),
                     jnp.asarray(True))
        o64[1].block_until_ready()
        t0 = time.time()
        for _ in range(4):
            o64 = step64(c64, o64[0], o64[1], o64[2], jnp.asarray(True))
        o64[1].block_until_ready()
        per_iter64 = round((time.time() - t0) / 4, 4)
    return {
        "metric": f"b3lyp_df_scf_s_per_cycle_f32_{name}",
        "value": round(per_iter, 4),
        "unit": "s/cycle",
        "vs_baseline": 0.0,
        "extra": {"e_tot": (float(e) if solve else None),
                  "converged": bool(mf.converged),
                  "nao": int(mol.nao), "naux": int(mf._jk.aux.nao),
                  "basis": basis, "f64_s_per_cycle": per_iter64,
                  "build_and_solve_s": round(t_solve, 1),
                  "abs_dE_vs_host_f64_Ha": (
                      round(abs(float(e) - ORACLES[name]), 10)
                      if solve and name in ORACLES else None)},
    }


def main():
    # Stage order is compile-cache-aware: on a cold host every distinct
    # integral/step kernel is a serialized remote compile (~15-20 s each,
    # ~1200 s for a full 6-31G* class family — measured). Phenol runs
    # FIRST and compiles the whole H/C/O 6-31G* family; the alkane stages
    # reuse those kernels (same (l, nprim-padded) classes), paying only
    # their own (nao, naux)-shaped SCF-step compiles + execution.
    stages = [
        # (name, atoms, basis, budget-fraction gate, full SCF solve?)
        ("phenol_631gs",
         "C 0.0000 1.3970 0.0000; C 1.2098 0.6985 0.0000; "
         "C 1.2098 -0.6985 0.0000; C 0.0000 -1.3970 0.0000; "
         "C -1.2098 -0.6985 0.0000; C -1.2098 0.6985 0.0000; "
         "O 0.0000 2.7650 0.0000; H 0.9300 3.1000 0.0000; "
         "H 2.1500 1.2400 0.0000; H 2.1500 -1.2400 0.0000; "
         "H 0.0000 -2.4800 0.0000; H -2.1500 -1.2400 0.0000; "
         "H -2.1500 1.2400 0.0000",
         "6-31g*", 0.0, True),
        # larger stages are timing-only (SAD start): the metric is
        # s/cycle, correctness is anchored by the solved stage above
        ("c16h34_631gs", alkane(16), "6-31g*", 0.75, False),
        ("c24h50_631gs", alkane(24), "6-31g*", 0.84, False),
        # nao=580/naux~2500: f64 B (6.7 GB) + f32 cast still fit v5e HBM;
        # C40 (13 GB f64 B) does not
        ("c32h66_631gs", alkane(32), "6-31g*", 0.92, False),
        # the BASELINE.json north-star size (40 heavy atoms ~ the 50-atom
        # target class) — its f32 B needs more HBM than v5e's 16 GB, so
        # this stage self-gates on device capacity (runs on v5p)
        ("c40h82_631gs", alkane(40), "6-31g*", 0.96, False),
    ]
    result = None

    def _alarm(signum, frame):
        raise TimeoutError("bench budget exhausted mid-stage")

    signal.signal(signal.SIGALRM, _alarm)
    for name, atoms, basis, frac_gate, solve in stages:
        if result is not None and (time.time() - T_START) > BUDGET_S * \
                frac_gate:
            break
        try:
            # abort a stage that would blow past the budget, so the JSON
            # line for the best completed stage still prints
            signal.alarm(max(int(left()), 1))
            r = run_config(name, atoms, basis, grid_level=2, solve=solve)
            signal.alarm(0)
            r["extra"]["stage_s"] = round(time.time() - T_START, 1)
            if result is not None:
                r["extra"]["prev"] = {
                    result["metric"]: result["value"],
                    "f64": result["extra"]["f64_s_per_cycle"]}
            result = r
            # emit-and-keep-going: the driver parses the LAST JSON line on
            # stdout, so a kill mid-next-stage still leaves this stage's
            # number on record (round-1 postmortem: one rc=124 at the very
            # end erased all evidence)
            print(json.dumps(result), flush=True)
        except BaseException as exc:
            signal.alarm(0)
            if result is None:
                result = {"metric": "bench_failed", "value": -1.0,
                          "unit": "s", "vs_baseline": 0.0,
                          "extra": {"error": str(exc)[:200]}}
            else:
                result["extra"]["next_stage_error"] = str(exc)[:120]
            break

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
