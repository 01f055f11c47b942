"""Dev helper: `import devcpu` first to force the CPU backend (8 virtual
devices) — the axon sitecustomize otherwise pins jax_platforms to the TPU."""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
# CPU-sized dispatch padding (see tests/conftest.py): executing the TPU
# shape floors on one CPU core wastes ~100x compute on small systems
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
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# CPU-only compile cache: entries written via the axon remote-compile
# helper carry target-feature flags this host lacks and SIGSEGV on load
import os as _os
from cctpu import _host_fingerprint  # noqa: E402

_boot = ""
try:
    with open("/proc/sys/kernel/random/boot_id") as _f:
        _boot = "_" + _f.read().strip()[:8]
except OSError:
    pass
_cpu_cache = _os.path.expanduser(
    "~/.cache/cctpu_jax_cpu_" + _host_fingerprint() + _boot)
_os.makedirs(_cpu_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cpu_cache)
