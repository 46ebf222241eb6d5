"""Mechanized round-over-round bench comparison with AFFINE machine
calibration (VERDICT r10 #3).

Two bench records taken on differently-loaded machines cannot be
compared raw, and — measured this round across three machines — cannot
be compared purely multiplicatively either: canaries spread 1.9× while
total walls spread only 1.16×, because the sf0.1 suite is
overhead-dominated, so ``t / canary`` OVER-corrects and makes the
slowest machine look fastest.  Records therefore carry TWO fixed
probes (bench.py):

- ``canary_wall``    — compute rate (20M-row hash/shuffle/reduce);
- ``overhead_floor`` — per-job fixed cost (1-row range().count()).

and this tool compares per-query walls under the affine model::

    t_norm = max(t - overhead_floor, eps) / canary_wall

i.e. subtract the machine's fixed per-query floor once (a query is at
least one job; multi-job queries pay it several times, so this is a
LOWER bound on the correction — documented, not hidden), then divide by
compute rate.  Old records that predate ``overhead_floor`` fall back to
``overhead = 0`` (pure multiplicative) with a warning.

Output: one line per query regressing past ``--threshold`` (default
1.5×) with both raw and normalized ratios, plus a summary block
(medians, totals, calibration numbers, start/end canary drift).  Noise
guards: queries faster than ``--min-sec`` (default 0.05 s normalized
denominater floor) in BOTH records are skipped — sub-floor walls are
scheduling noise, not signal.

Usage: ``python tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]``
Exit code: 0 always (reporting tool, not a gate) — the round's CHANGES
file quotes its output.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys

EPS = 1e-3


def _load(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        rec = json.load(fh)
    if "queries" not in rec:
        raise SystemExit(f"{path}: no 'queries' dict — not a bench record")
    return rec


def _calib(rec: dict, path: str) -> tuple[float, float]:
    canary = rec.get("canary_wall")
    if not canary:
        print(
            f"WARN {path}: no canary_wall — raw walls only", file=sys.stderr
        )
        canary = 1.0
    overhead = rec.get("overhead_floor")
    if overhead is None:
        print(
            f"WARN {path}: no overhead_floor (pre-r11 record) — "
            "falling back to multiplicative-only normalization",
            file=sys.stderr,
        )
        overhead = 0.0
    return float(canary), float(overhead)


def norm(t: float, canary: float, overhead: float) -> float:
    return max(t - overhead, EPS) / canary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.05,
        help="skip queries whose raw wall is below this in both records",
    )
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    oc, oo = _calib(old, args.old)
    nc, no_ = _calib(new, args.new)
    # the affine correction is only meaningful when BOTH records carry
    # the probe: subtracting one side's floor and not the other's biases
    # every ratio in the overhead-dominated regime (a 0.3 s wall with a
    # 0.2 s floor on the new side alone reads as a phantom 3x
    # improvement) — degrade to pure multiplicative together
    # (code-review r11)
    if (old.get("overhead_floor") is None) != (
        new.get("overhead_floor") is None
    ):
        print(
            "WARN one record lacks overhead_floor — zeroing BOTH floors "
            "(pure multiplicative comparison)",
            file=sys.stderr,
        )
        oo = no_ = 0.0

    common = sorted(set(old["queries"]) & set(new["queries"]))
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))

    ratios: dict[str, tuple[float, float, float, float]] = {}
    for q in common:
        to, tn = float(old["queries"][q]), float(new["queries"][q])
        if to < args.min_sec and tn < args.min_sec:
            continue
        r_raw = tn / to if to > 0 else float("inf")
        r_norm = norm(tn, nc, no_) / norm(to, oc, oo)
        ratios[q] = (to, tn, r_raw, r_norm)

    regressed = {
        q: v for q, v in ratios.items() if v[3] > args.threshold
    }
    improved = {
        q: v for q, v in ratios.items() if v[3] < 1.0 / args.threshold
    }

    print(f"# bench_diff: {args.old} -> {args.new}")
    print(
        f"calibration old: canary={oc} overhead={oo}"
        + (
            f" (end canary={old.get('canary_wall_end')})"
            if old.get("canary_wall_end")
            else ""
        )
    )
    print(
        f"calibration new: canary={nc} overhead={no_}"
        + (
            f" (end canary={new.get('canary_wall_end')})"
            if new.get("canary_wall_end")
            else ""
        )
    )
    norm_ratios = [v[3] for v in ratios.values()]
    if norm_ratios:
        qs = statistics.quantiles(norm_ratios, n=10) if len(norm_ratios) >= 10 else []
        med = statistics.median(norm_ratios)
        line = f"{len(ratios)} comparable queries: median norm ratio {med:.3f}"
        if qs:
            line += f" (p10 {qs[0]:.2f} / p90 {qs[-1]:.2f})"
        print(line)
    print(
        f"totals: raw {old.get('value')} -> {new.get('value')} s; "
        f"common-query raw {sum(v[0] for v in ratios.values()):.1f} -> "
        f"{sum(v[1] for v in ratios.values()):.1f} s"
    )
    if only_old:
        print(f"dropped queries: {', '.join(only_old)}")
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    if regressed:
        print(f"\n## REGRESSED > {args.threshold}x (normalized)")
        for q, (to, tn, rr, rn) in sorted(
            regressed.items(), key=lambda kv: -kv[1][3]
        ):
            print(f"  {q}: {to}s -> {tn}s  raw x{rr:.2f}  norm x{rn:.2f}")
    else:
        print(f"\nno query regressed > {args.threshold}x normalized")
    if improved:
        print(f"\n## improved > {args.threshold}x (normalized)")
        for q, (to, tn, rr, rn) in sorted(
            improved.items(), key=lambda kv: kv[1][3]
        ):
            print(f"  {q}: {to}s -> {tn}s  raw x{rr:.2f}  norm x{rn:.2f}")


if __name__ == "__main__":
    main()
