"""Compute host-f64 SAD-density energy oracles for the bench stages.

Runs on CPU (true hardware f64). For each requested stage it builds the
DF-B3LYP/6-31G* machinery exactly as bench.run_config does and evaluates
the total energy of the UNRELAXED SAD guess density — one Fock+XC build,
no SCF — then merges the value into scripts/sad_oracles.json, which
bench.py loads as ORACLES_SAD to anchor timing-only device stages
(round-2 postmortem: an unanchored stage timed a Fock build with a
corrupted whitening factor; VERDICT r2 next-round item #3).

Usage:  python scripts/make_oracles.py [stage ...]
        (default: phenol_631gs c16h34_631gs)
"""

import json
import os
import sys
import time

# sitecustomize imports jax with JAX_PLATFORMS=axon baked in; the env var
# is read at jax import, so force the platform via config (same pattern
# as tests/conftest.py) and scope the compile cache per-boot like it does
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from cctpu import _host_fingerprint  # noqa: E402

_boot = ""
try:
    with open("/proc/sys/kernel/random/boot_id") as _f:
        _boot = "_" + _f.read().strip()[:8]
except OSError:
    pass
_cpu_cache = os.path.expanduser(
    "~/.cache/cctpu_jax_cpu_" + _host_fingerprint() + _boot)
os.makedirs(_cpu_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cpu_cache)

import bench  # noqa: E402
from cctpu.core.molecule import Molecule  # noqa: E402
from cctpu.dft.rks import RKS  # noqa: E402


def main(argv):
    names = argv or ["phenol_631gs", "c16h34_631gs"]
    stages = {s[0]: s for s in bench.STAGES}
    path = os.path.join(_ROOT, "scripts", "sad_oracles.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    if "--conv" in names:
        # CONVERGED host-f64 oracle (bench ORACLES "<stage>__e_conv"):
        # regenerate after ANY integrals/aux/basis change — the r2-era
        # hardcoded phenol value silently went stale when the r4 metric
        # fix moved the kept-aux count 1673 -> 1770 (~5e-5 Ha surface
        # shift), which masqueraded as a device convergence failure for
        # the whole of round 5's first bench rehearsal.
        names.remove("--conv")
        for name in [n for n in names if n in stages]:
            _, atoms, basis, _, _ = stages[name]
            mol = Molecule.from_atoms(atoms, basis=basis)
            mf = RKS(mol, xc="b3lyp", density_fit=True, max_cycle=80,
                     conv_tol=1e-10, precision="f64")
            mf.grid_level = 2
            e = float(mf.kernel())
            assert mf.converged, name
            out[f"{name}__e_conv"] = e
            print(f"# {name}__e_conv = {e:.12f} "
                  f"naux={int(mf._jk._B32.shape[0])}", flush=True)
            with open(path, "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
    if "--cd" in names:
        # host-f64 reference for the device 1e-8 contract probe
        names.remove("--cd")
        from cctpu.core.molecule import Molecule as _M
        from cctpu.scf.hf import RHF as _RHF
        mf = _RHF(_M.from_atoms(bench.WATER, basis="6-31g"),
                  density_fit="cd", conv_tol=1e-12, max_cycle=60)
        out["water_cd_631g_e"] = float(mf.kernel())
        print(f"# water_cd_631g_e = {out['water_cd_631g_e']:.12f} "
              f"converged={mf.converged}", flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    for name in names:
        _, atoms, basis, _, _ = stages[name]
        t0 = time.time()
        mol = Molecule.from_atoms(atoms, basis=basis)
        mf = RKS(mol, xc="b3lyp", density_fit=True, precision="f64")
        mf.grid_level = 2
        mf._setup_xc()
        mf.get_jk_builder()
        print(f"# {name}: nao={mol.nao} "
              f"naux={int(mf._jk._B32.shape[0])} "
              f"built in {time.time() - t0:.0f}s", flush=True)
        e, _parts = bench.sad_energy(mf, float(mol.energy_nuc()))
        out[name] = e
        print(f"# {name}: E_SAD = {e:.9f} ({time.time() - t0:.0f}s)",
              flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
