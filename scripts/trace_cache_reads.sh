#!/bin/bash
# Cache-read tracing for pruned seed building (round 5).
#
# Usage:
#   scripts/trace_cache_reads.sh mark     # set all entry atimes to 2000
#   scripts/trace_cache_reads.sh collect  # list entries read since mark
#
# relatime semantics: a read updates atime when atime < mtime, so marking
# atimes far in the past makes the first subsequent read visible.
CACHE=${CCTPU_JAX_CACHE:-$HOME/.cache/cctpu_jax_x86_647d2f5345_axon}
case "$1" in
  mark)
    find "$CACHE" -maxdepth 1 -type f -name '*-cache' \
      -exec touch -a -t 200001010000 {} +
    echo "marked $(find "$CACHE" -maxdepth 1 -name '*-cache' | wc -l) entries in $CACHE"
    ;;
  collect)
    find "$CACHE" -maxdepth 1 -type f -name '*-cache' -newerat 2001-01-01 \
      | sort
    ;;
  *)
    echo "usage: $0 mark|collect" >&2; exit 2 ;;
esac
