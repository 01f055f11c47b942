"""cctpu — TPU-native quantum-chemistry and chemistry-ML framework.

A brand-new framework built from scratch in JAX (jit / pjit / shard_map +
Pallas TPU kernels) providing the full capability surface of the reference
workflow stack turnDeep/Computational-Chemistry-AI (see /root/repo/SURVEY.md):
Gaussian integrals, HF/DFT SCF with DIIS and density fitting, Becke-grid XC,
analytic gradients via AD-through-SCF, geometry optimization, Hessians /
frequencies / IR / thermochemistry, TDDFT, GIAO NMR, PCM solvation, MP2,
CASSCF/CASCI, and a GCN EI-MS spectrum predictor — plus the twelve
SMILES-driven workflow CLIs.

Quantum chemistry needs float64 accumulation (|dE| <= 1e-8 Ha targets), so we
enable x64 at import. ML paths explicitly request f32/bf16 where appropriate.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Matmul precision must default to "highest" package-wide. Measured on the
# axon TPU (scripts/micro_probe.py P4/P4b): a float64 jnp.dot at DEFAULT
# precision returns bf16-grade results (2.6e-3 relative error — the MXU
# single-pass path), while "highest" gives f32-grade (1.7e-7). True f64
# matmul does not exist on this device, so any contraction that silently
# hits the MXU at default precision corrupts chemistry (round-3 postmortem:
# the DF metric assembled through lax.map'ed kernels was wrong by 1e-2
# relative, -> 0.07 Ha SCF error). Hot f32 paths that can afford lower
# precision must request it explicitly.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the integral kernels are compiled per
# (angular-momentum class, padded primitive width, chunk size) — all static
# across molecules/geometries — so warm runs skip XLA compilation entirely.
# The dir is keyed by a host-CPU fingerprint: XLA:CPU AOT entries embed the
# compile machine's feature set, and loading entries written on a different
# host can SIGILL (observed with image-baked caches).


def _host_fingerprint() -> str:
    import hashlib
    import platform as _platform
    tag = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += hashlib.sha1(line.encode()).hexdigest()[:8]
                    break
    except OSError:
        pass
    # platform set matters too: an axon session's CPU-client compiles embed
    # different XLA codegen flags (prefer-no-scatter/gather) than a pure
    # cpu session's, and cross-loading those AOT entries SIGILLs
    platforms = _os.environ.get("JAX_PLATFORMS", "default")
    tag += "_" + platforms.replace(",", "-")
    if "axon" not in platforms and "tpu" not in platforms:
        # XLA:CPU AOT entries embed LLVM's host feature detection, which
        # /proc/cpuinfo cannot reproduce: two VM boots can land on
        # different physical hosts with identical virtualized cpuinfo and
        # SIGSEGV loading each other's entries (observed killing a test
        # run). Scope CPU caches to one boot; TPU-target entries carry no
        # host codegen and stay shareable across boots.
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                tag += "_" + f.read().strip()[:8]
        except OSError:
            pass
    return tag


_cache_dir = _os.path.expanduser(
    _os.environ.get("CCTPU_JAX_CACHE",
                    "~/.cache/cctpu_jax_" + _host_fingerprint()))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass


def _seed_cache():
    """Populate a cold TPU compile cache from the repo-committed seed.

    This deployment boots a fresh VM per round, so ~/.cache never survives
    a round boundary — measured: a cold boot pays ~10-20 s of *serialized
    remote* compile latency per kernel via the axon tunnel, >20 min for the
    bench's 6-31G* integral-class family alone (the round-1 bench died to
    exactly this). TPU-target entries carry no host codegen and the axon
    platform_version is a stable build string, so they ARE shareable across
    boots — when scripts/cache_seed.tar.gz exists (generated from a warm
    run by scripts/make_cache_seed.py; at ~1.2 GB for the full 6-31G*
    family it is too large to keep in git, so a fresh deployment instead
    runs a detached warming pass first — see NOTES_r03.md) it is unpacked
    once per boot here. (XLA:CPU entries are NOT seedable — see
    _host_fingerprint.)
    """
    # gate on the RESOLVED platform, not the cache-dir name: with
    # CCTPU_JAX_CACHE set, or JAX_PLATFORMS unset on a real TPU VM, the
    # dir name carries no platform tag
    platforms = _os.environ.get("JAX_PLATFORMS", "")
    if platforms and not ({"axon", "tpu"} & set(platforms.split(","))):
        return                       # CPU-target caches must stay per-boot
    seed = _os.path.join(_os.path.dirname(__file__), "..", "scripts",
                         "cache_seed.tar.gz")
    stamp = _os.path.join(_cache_dir, ".seeded")
    if _os.path.exists(stamp):
        return
    if not _os.path.exists(seed):
        import sys
        print(f"# cctpu: TPU compile cache {_cache_dir} boots cold "
              f"(no seed at {seed})", file=sys.stderr, flush=True)
        return
    import subprocess
    try:
        subprocess.run(["tar", "-xzf", seed, "-C", _cache_dir],
                       check=True, timeout=300,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(stamp, "w") as f:
            f.write("ok\n")
    except Exception:  # pragma: no cover - seed is best-effort
        pass


try:
    _seed_cache()
except Exception:  # pragma: no cover
    pass

__version__ = "0.1.0"

from cctpu.core.molecule import Molecule  # noqa: E402,F401


def __getattr__(name):
    """Lazy top-level API (kept lazy so `import cctpu` stays light)."""
    api = {
        "RHF": ("cctpu.scf.hf", "RHF"),
        "UHF": ("cctpu.scf.hf", "UHF"),
        "ROHF": ("cctpu.scf.hf", "ROHF"),
        "RKS": ("cctpu.dft.rks", "RKS"),
        "UKS": ("cctpu.dft.rks", "UKS"),
        "MP2": ("cctpu.mp.mp2", "MP2"),
        "TDDFT": ("cctpu.response.tddft", "TDDFT"),
        "TDA": ("cctpu.response.tddft", "TDA"),
        "NMR": ("cctpu.response.nmr", "NMR"),
        "PCM": ("cctpu.solvent.pcm", "PCM"),
        "CASCI": ("cctpu.mcscf.casscf", "CASCI"),
        "CASSCF": ("cctpu.mcscf.casscf", "CASSCF"),
        "avas": ("cctpu.mcscf.casscf", "avas"),
        "optimize": ("cctpu.geomopt.optimizer", "optimize"),
        "gradient": ("cctpu.grad.scf_grad", "gradient"),
        "smiles_to_molecule": ("cctpu.io.embed3d", "smiles_to_molecule"),
    }
    if name in api:
        import importlib
        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
