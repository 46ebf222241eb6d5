"""Single source of the round number + repo root for the per-round
artifact generators (PLANS / SCAN_AUDIT / README stamps).

ADVICE r10: dump_plans.py hardcoded ``/root/repo``, kept its own manual
``ROUND`` constant, and silently degraded the commit stamp to
``unknown`` on subprocess failure — undermining the staleness contract
its own header establishes.  This module fixes all three once:

- ``REPO_ROOT`` derives from ``__file__`` (works from any cwd);
- ``ROUND`` comes from ``$SPARK_GRAFT_ROUND`` with ONE in-repo default
  (bump here, nowhere else);
- ``head_commit()`` raises loudly when ``git rev-parse`` fails instead
  of stamping a header that can't be checked.
"""

from __future__ import annotations

import os
import subprocess

ROUND = int(os.environ.get("SPARK_GRAFT_ROUND", "11"))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def head_commit() -> str:
    """The current HEAD commit of the repo that CONTAINS this file.
    Raises on any git failure — a plan/audit artifact stamped
    ``unknown`` is worse than no artifact (the staleness contract
    becomes unverifiable)."""
    res = subprocess.run(
        ["git", "-C", REPO_ROOT, "rev-parse", "HEAD"],
        capture_output=True,
        text=True,
    )
    sha = res.stdout.strip()
    if res.returncode != 0 or not sha:
        raise RuntimeError(
            f"git rev-parse HEAD failed in {REPO_ROOT}: "
            f"{res.stderr.strip() or 'empty output'}"
        )
    return sha
