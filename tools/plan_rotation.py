#!/usr/bin/env python
"""Compute the next driver-window cohort from the CORRECTNESS history.

The registry's rotation contract (comment above ``_EMIT_FIRST`` in
``plans/registry.py``) promises every query a fresh driver CORRECTNESS
row at least once per 5 rounds. This tool derives the next window
mechanically so the contract survives hand-editing: queries that have
NEVER had a driver row lead (registration order preserved), then
everything else strictly oldest-newest-row-first.

    python tools/plan_rotation.py [--window 50]

Prints the recommended ``_EMIT_FIRST`` entries for the next round plus
a staleness histogram. Paste the names into the registry and move the
remainder to ``_EMIT_LAST`` in the printed order.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--window", type=int, default=50)
    parser.add_argument(
        "--lead",
        nargs="*",
        default=[],
        metavar="NAME",
        help=(
            "exception-(a) jumps from the rotation ledger (registry "
            "comment above _EMIT_FIRST): queries whose builder or a "
            "shared helper under it was refactored since their last "
            "driver row. They lead the window ahead of the pure "
            "staleness order, in the given order, displacing the "
            "youngest tail entries — e.g. the r13 ledger owes "
            "rel_sql_exists rel_sql_scalar_subquery rel_sql_not_in "
            "rel_grouping_sets after the late-r12 concurrency fix."
        ),
    )
    args = parser.parse_args(argv)

    sys.path.insert(0, ".")
    from spark_etl_pipeline_spark.plans import registry

    registry.load_all()
    names = list(registry.queries())

    newest: dict[str, int] = {}
    newest_any: dict[str, int] = {}  # newest row regardless of pass/fail
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        try:
            rows = json.load(open(path))
        except ValueError:
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            newest_any[name] = max(newest_any.get(name, 0), rnd)
            if row.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)

    never = [n for n in names if n not in newest]
    # oldest driver row first; registration order as the tiebreak
    checked = sorted(
        (n for n in names if n in newest),
        key=lambda n: (newest[n], names.index(n)),
    )
    unknown = [n for n in args.lead if n not in names]
    if unknown:
        print(f"--lead names not registered: {unknown}", file=sys.stderr)
        return 2
    lead = [n for n in args.lead]
    order = lead + [n for n in never + checked if n not in lead]
    window = order[: args.window]

    # A query whose latest driver row FAILED still front-loads like a
    # never-checked one (it has no green row), but the histogram must
    # not misstate history by lumping it under "never".
    hist: dict[str, int] = {}
    for n in names:
        if n in newest:
            key = f"r{newest[n]}"
        elif n in newest_any:
            key = f"failed-r{newest_any[n]}"
        else:
            key = "never"
        hist[key] = hist.get(key, 0) + 1
    print(f"# staleness histogram: {dict(sorted(hist.items()))}", file=sys.stderr)
    print(
        f"# next window ({len(window)} of {len(names)} registered; "
        f"{len(never)} never-checked remain)",
        file=sys.stderr,
    )
    for n in window:
        if n in newest:
            tag = f"r{newest[n]}"
        elif n in newest_any:
            tag = f"failed-r{newest_any[n]}"
        else:
            tag = "never"
        print(f'    "{n}",  # {tag}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
