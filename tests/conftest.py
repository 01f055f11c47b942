"""Test configuration: run everything on a virtual 8-device CPU mesh.

The deployment image registers an experimental 'axon' TPU backend through
sitecustomize (which overrides JAX_PLATFORMS), so we force the CPU platform
via jax.config — the supported way to test pjit/shard_map logic without a
TPU pod (SURVEY.md §4).
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

# Shrink the TPU-sized dispatch padding for the CPU lane: the production
# floors (8192-quartet superbatches, 32768-row gather tables) exist to
# give the remote TPU compiler ONE shape bucket per class, but on CPU
# they made every DF/ERI test execute ~100x wasted quartets — the
# "1 test per 10 CPU-minutes" fast-lane failure (VERDICT r3 weak #6).
# Shapes only; identical math (pinned by the same value assertions).
# single-threaded AOT precompile: 4 concurrent XLA:CPU compiles of
# 7-prim contracted classes LLVM-OOM then SEGV the process (r5
# contract_derived postmortem); concurrency only pays on the
# remote axon compiler anyway
os.environ.setdefault("CCTPU_COMPILE_THREADS", "1")
os.environ.setdefault("CCTPU_NBATCH", "2048")
os.environ.setdefault("CCTPU_NBATCH_SMALL", "256")
os.environ.setdefault("CCTPU_CHUNK_CAP", "256")
os.environ.setdefault("CCTPU_AUX_FLOOR", "128")
os.environ.setdefault("CCTPU_PAIR_FLOOR", "512")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# CPU-only compile cache, keyed by host fingerprint + boot id (AOT entries
# written on a different machine — axon remote or another physical host
# behind the same virtualized cpuinfo — can SIGILL/SIGSEGV on load)
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
