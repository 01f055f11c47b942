"""Package the warm axon/TPU compile cache as scripts/cache_seed.tar.gz.

The remote TPU compiler takes ~10-110 s per ERI class kernel (measured:
(0,0|00) 10.7 s, (4,0|2,2) 105.7 s — compile-bound, run ~0 s), so a cold
cache costs the bench 30-90 min it does not have. cctpu._seed_cache
unpacks this archive into the platform cache dir on first boot; entries
are keyed by (HLO, compile options, platform), so they are valid on any
host that runs the same jax/axon build (the deployment image).

Run AFTER a full bench pass so every stage's kernels are present:
    python scripts/make_cache_seed.py [cache_dir]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    if len(sys.argv) > 1:
        cache = sys.argv[1]
    else:
        # _host_fingerprint already appends the JAX_PLATFORMS suffix —
        # force the axon platform BEFORE importing so the fingerprint
        # matches how cctpu/__init__.py builds _cache_dir for TPU runs
        os.environ.setdefault("JAX_PLATFORMS", "axon")
        sys.path.insert(0, REPO)
        from cctpu import _host_fingerprint
        cache = os.path.expanduser(
            "~/.cache/cctpu_jax_" + _host_fingerprint())
    entries = [f for f in os.listdir(cache) if f.endswith("-cache")]
    if not entries:
        raise SystemExit(f"no cache entries in {cache}")
    out = os.path.join(REPO, "scripts", "cache_seed.tar.gz")
    subprocess.run(["tar", "-czf", out, "-C", cache] + sorted(entries),
                   check=True)
    sz = os.path.getsize(out) / 1e6
    print(f"packed {len(entries)} entries from {cache} -> {out} "
          f"({sz:.1f} MB)")


if __name__ == "__main__":
    main()
