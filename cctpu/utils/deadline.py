"""Cooperative deadline for long eager build loops.

SIGALRM cannot interrupt a thread blocked inside a foreign call — on the
axon-tunneled TPU a single remote ERI-class compile blocks for 30-110 s,
and a cold build is dozens of them back-to-back, so a bench stage that
relies on the alarm alone dies to the driver's hard kill (rc=124, rounds
1-2) instead of aborting cleanly. Builders call :func:`check` between
class dispatches; harnesses opt in by exporting ``CCTPU_DEADLINE_TS``
(unix epoch seconds). No env var -> zero overhead no-op.
"""

import os
import time


def check(phase: str = ""):
    """Raise TimeoutError if the CCTPU_DEADLINE_TS deadline has passed."""
    ts = os.environ.get("CCTPU_DEADLINE_TS")
    if ts:
        try:
            limit = float(ts)
        except ValueError:
            return
        if time.time() > limit:
            raise TimeoutError(
                f"CCTPU_DEADLINE_TS deadline exceeded ({phase})")
