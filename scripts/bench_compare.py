"""Compare two bench.py outputs with calibration-normalized deltas.

Rounds 4-6 each burned analysis time re-litigating ±20% per-query
cross-round swings that A/B tests kept proving were machine drift.
bench.py now emits a pinned ``calibration`` measurement; this tool
divides each query's cross-round ratio by the calibration ratio and
flags only what remains.

Usage:
    python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.25]

Accepts either a raw bench JSON line or the driver's BENCH_r{N}.json
wrapper (bench line inside its "tail" field). Files without a
``calibration`` field (pre-round-7) fall back to raw ratios, flagged as
UNNORMALIZED. Post-round-9 benches also carry ``calibration_samples``
(three best-of-N blocks interleaved through the run); when the median
disagrees with its closest other sample by more than ~10%, a WARNING
marks every normalized ratio as suspect — the r8 lesson, where one
anomalously-fast calibration sample flagged 10 phantom regressions.
(Robust spread, not max-min: the start block consistently reads high
from residual JIT warm-up and the median already discards it.)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys


def touched_queries(git_range: str, names: set[str]) -> set[str]:
    """Which gates' implementations changed in ``git_range``? A gate
    counts as touched when (a) its name appears in the diff text (its
    own body changed), or (b) a changed module's dotted import path
    appears in the gate function's source (the gate calls into a
    changed operator module). Heuristic by design — transitive module
    deps are missed — so it only decides which of TWO thresholds
    applies, never whether a query is compared at all."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    diff = subprocess.run(
        ["git", "diff", git_range, "--", "etl_router_spark"],
        cwd=root, capture_output=True, text=True, check=True).stdout
    changed_files = subprocess.run(
        ["git", "diff", "--name-only", git_range, "--", "etl_router_spark"],
        cwd=root, capture_output=True, text=True, check=True
    ).stdout.split()
    dotted = [
        f[:-3].replace("/", ".") for f in changed_files if f.endswith(".py")]
    touched = {n for n in names if n in diff}
    if dotted:
        sys.path.insert(0, root)
        import inspect

        from etl_router_spark import queries_llm, queries_streaming  # noqa
        from etl_router_spark.queries import QUERIES

        for n in names - touched:
            try:
                src = inspect.getsource(QUERIES[n])
            except (KeyError, OSError, TypeError):
                continue
            if any(d in src for d in dotted):
                touched.add(n)
    return touched


def load_bench(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    if "queries" in data:
        return data
    # driver wrapper: the parsed bench dict rides in "parsed"; fall
    # back to scanning "tail" (stripping any log prefix interleaved on
    # the bench line) for wrappers that predate the field
    parsed = data.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    for line in reversed(data.get("tail", "").splitlines()):
        m = re.search(r"\{.*\"queries\".*\}", line)
        if m:
            try:
                cand = json.loads(m.group(0))
            except json.JSONDecodeError:
                continue
            if "queries" in cand:
                return cand
    raise ValueError(f"{path}: no bench JSON line found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25,
                    help="flag normalized ratios beyond this (and below "
                         "its reciprocal)")
    ap.add_argument("--untouched-threshold", type=float, default=1.4,
                    help="laxer flag threshold for queries whose code "
                         "did NOT change in --git-range (residual "
                         "calibration noise false-flags untouched "
                         "queries ~2x/round at 1.25; a real regression "
                         "in untouched code is plan-stability drift, "
                         "which shows up well past 1.4)")
    ap.add_argument("--git-range", default=None,
                    help="e.g. 'r9tag..HEAD': queries not touched in "
                         "this range use --untouched-threshold")
    args = ap.parse_args()

    old, new = load_bench(args.old), load_bench(args.new)
    cal_old, cal_new = old.get("calibration"), new.get("calibration")
    normalized = bool(cal_old and cal_new)
    missing_cal = [label for label, cal in
                   ((args.old, cal_old), (args.new, cal_new)) if not cal]
    drift = (cal_new / cal_old) if normalized else 1.0
    tag = (f"calibration {cal_old:.3f}s -> {cal_new:.3f}s "
           f"(machine drift x{drift:.2f})" if normalized
           else f"UNNORMALIZED — no calibration field in: {missing_cal} "
                "(pre-round-7 bench output); raw ratios below include "
                "machine drift")
    common = set(old["queries"]) & set(new["queries"])
    touched = common
    if args.git_range:
        touched = touched_queries(args.git_range, common)
        print(f"# {len(touched)}/{len(common)} queries touched in "
              f"{args.git_range}; untouched flag at "
              f"x{args.untouched_threshold}")
    print(f"# {tag}; flag threshold x{args.threshold}")
    # calibration-sample spread check (post-r8 benches): the r8 round
    # burned a verdict cycle on 10 phantom regressions caused by ONE
    # anomalously-fast calibration sample — when the interleaved
    # samples disagree by more than ~10% of their median, say so
    # loudly, because every normalized ratio below inherits that noise
    noisy_cal = False
    for label, bench in ((args.old, old), (args.new, new)):
        samples = bench.get("calibration_samples") or []
        if len(samples) >= 2:
            med = sorted(samples)[len(samples) // 2]
            # ROBUST spread: the start block consistently reads high
            # (residual JIT warm-up) and the median already discards
            # one outlier — so judge trustworthiness by how well the
            # median agrees with its CLOSEST other sample, not by the
            # outlier-inflated max-min range (which warned on runs
            # whose normalization was in fact fine)
            spread = (min(abs(s - med) for s in samples if s != med) / med
                      if med and any(s != med for s in samples) else 0.0)
            if spread > 0.10:
                noisy_cal = True
                print(f"# WARNING {label}: calibration samples {samples} "
                      f"spread {spread:.0%} of median — normalized "
                      "ratios near the threshold are not trustworthy; "
                      "re-run the bench or re-measure flagged queries "
                      "before calling anything a regression")
        elif not samples:
            print(f"# note {label}: single calibration sample "
                  "(pre-round-9 bench) — one anomalous sample can flag "
                  "phantom regressions (see round 8)")

    flagged = 0
    for name in sorted(common):
        a, b = old["queries"][name], new["queries"][name]
        if not a:
            continue
        thr = args.threshold if name in touched else args.untouched_threshold
        norm = (b / a) / drift
        mark = ""
        if norm >= thr:
            mark, flagged = "REGRESSED", flagged + 1
        elif norm <= 1 / thr:
            mark = "improved"
        if mark:
            tchd = "" if name in touched else " [untouched]"
            print(f"{name:32s} {a:7.3f}s -> {b:7.3f}s  "
                  f"norm x{norm:.2f}  {mark}{tchd}")
    only_old = set(old["queries"]) - set(new["queries"])
    only_new = set(new["queries"]) - set(old["queries"])
    if only_old:
        print(f"# dropped queries: {sorted(only_old)}")
    if only_new:
        print(f"# new queries: {sorted(only_new)}")
    if (only_old or only_new) and common:
        # the headline total mixes apples and oranges when the query
        # set changed (r10's "+7.2 s" was really "-1.4 s normalized on
        # the common set") — say what moved on comparable ground
        co = sum(old["queries"][n] for n in common)
        cn = sum(new["queries"][n] for n in common)
        print(f"# common-set total ({len(common)} queries) {co:.3f}s -> "
              f"{cn:.3f}s, norm x{(cn / co) / drift:.2f} — the total "
              f"below also counts {len(only_new)} added / "
              f"{len(only_old)} dropped")
    print(f"# total {old['value']:.3f}s -> {new['value']:.3f}s; "
          f"{flagged} regression(s) beyond drift"
          + (" — CAVEAT: calibration spread warning above applies"
             if flagged and noisy_cal else ""))
    if flagged:
        return 1
    # exit 2 (not silent success) when normalization was impossible —
    # a "0 regressions" verdict from raw ratios is not trustworthy
    return 2 if missing_cal else 0


if __name__ == "__main__":
    raise SystemExit(main())
