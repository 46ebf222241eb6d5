"""README regeneration contract (VERDICT r10 #6): restamp the round- and
registry-derived tokens in README.md from the LIVE registry + the shared
round constant, so the first document a reader opens can't lag the
registry the way r10's README lagged r9 (stale "175/175", PLANS_r9,
ORACLE_LOCAL_r9 citations).

Rewrites, in place:

- ``PLANS_r{N}.md`` / ``SCAN_AUDIT_r{N}.md`` / ``ORACLE_LOCAL_r{N}.json``
  / ``BENCH_LOCAL_r{N}.json`` filenames → the current round;
- ``X/X green`` full-registry counts and ``X queries as of round N`` →
  the live ``len(all_queries())``.

Run as part of the SAME end-of-round pass as dump_plans/scan_audit:
``PYTHONPATH=/root/repo python tools/stamp_readme.py``.  Prints each
line it changed; exits 1 if README contains a round-stamped artifact
name the rules above don't cover (so a new artifact family can't
silently start lagging).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roundinfo import REPO_ROOT, ROUND  # noqa: E402

from sales_forecast_mlops_at_scale_spark.plans import all_queries  # noqa: E402

KNOWN = ("PLANS", "SCAN_AUDIT", "ORACLE_LOCAL", "BENCH_LOCAL", "CHANGES")


def main() -> int:
    path = os.path.join(REPO_ROOT, "README.md")
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    n = len(all_queries())

    # the "N/N green" sentence is a MEASURED claim — validate it against
    # the round's committed oracle artifact instead of restamping it
    # from the registry size (code-review r11: a tool meant to prevent
    # stale claims must not manufacture unverified ones).  Run
    # check_oracle BEFORE this stamp.
    art = os.path.join(REPO_ROOT, f"ORACLE_LOCAL_r{ROUND}.json")
    try:
        with open(art, encoding="utf-8") as fh:
            rec = json.load(fh)
    except FileNotFoundError:
        print(
            f"MISSING {art}: run check_oracle (ORACLE_JSON_OUT={art}) "
            "before stamping the README's green claim"
        )
        return 1
    statuses = {v.get("status") for v in rec["queries"].values()}
    if rec.get("failures") or statuses - {"ok"}:
        print(f"{art} is not all-green ({statuses}) — fix before stamping")
        return 1
    if len(rec["queries"]) != n:
        print(
            f"{art} covers {len(rec['queries'])} queries but the live "
            f"registry has {n} — rerun check_oracle first"
        )
        return 1

    new = text
    for fam in KNOWN:
        new = re.sub(rf"{fam}_r\d+", f"{fam}_r{ROUND}", new)
    new = re.sub(
        r"\d+/\d+ green at all three scale factors",
        f"{n}/{n} green at all three scale factors",
        new,
    )
    new = re.sub(
        r"\d+ queries as of(\s+)round \d+",
        rf"{n} queries as of\1round {ROUND}",
        new,
    )

    stray = [
        m
        for m in re.findall(r"\b[A-Z_]+_r\d+\.\w+", new)
        if not m.startswith(tuple(f"{f}_r{ROUND}" for f in KNOWN))
    ]
    if stray:
        print(f"UNCOVERED round-stamped names in README: {sorted(set(stray))}")
        return 1

    if new != text:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(new)
        old_lines = text.splitlines()
        for i, line in enumerate(new.splitlines()):
            if i >= len(old_lines) or line != old_lines[i]:
                print(f"restamped L{i + 1}: {line.strip()[:100]}")
        print(f"README stamped for round {ROUND} ({n} registry queries)")
    else:
        print(f"README already current (round {ROUND}, {n} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
