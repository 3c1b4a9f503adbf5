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
    args = parser.parse_args(argv)

    sys.path.insert(0, ".")
    from spark_etl_pipeline_spark.plans import registry

    registry.load_all()
    names = list(registry.queries())

    newest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        try:
            rows = json.load(open(path))
        except ValueError:
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)

    never = [n for n in names if n not in newest]
    # oldest driver row first; registration order as the tiebreak
    checked = sorted(
        (n for n in names if n in newest),
        key=lambda n: (newest[n], names.index(n)),
    )
    order = never + checked
    window = order[: args.window]

    hist: dict[str, int] = {}
    for n in names:
        key = f"r{newest[n]}" if n in newest else "never"
        hist[key] = hist.get(key, 0) + 1
    print(f"# staleness histogram: {dict(sorted(hist.items()))}", file=sys.stderr)
    print(
        f"# next window ({len(window)} of {len(names)} registered; "
        f"{len(never)} never-checked remain)",
        file=sys.stderr,
    )
    for n in window:
        tag = "never" if n not in newest else f"r{newest[n]}"
        print(f'    "{n}",  # {tag}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
