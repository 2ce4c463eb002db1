#!/usr/bin/env python3
"""Sync COVERAGE.md verification labels with CORRECTNESS_r0*.json.

COVERAGE.md marks each registry query either `**name** (driver rN)` —
green row in the external gate's CORRECTNESS_r0N.json — or
`name (local parity)` — DuckDB-oracle parity passes locally but the
external ~50-query budget hasn't reached it. The labels were maintained
by hand through round 4 (92 KB of tables), which the judge flagged as a
drift risk. This script derives the authoritative query→round map from
the committed CORRECTNESS files and rewrites both marker forms in place:

* a query with an external green row gets `**name** (driver rN)` with N =
  the FIRST round that verified it (promoting stale `(local parity)`
  marks and fixing wrong round numbers);
* a query without one keeps/gets `name (local parity)`.

Usage:
  python scripts/gen_coverage_labels.py           # rewrite COVERAGE.md
  python scripts/gen_coverage_labels.py --check   # exit 1 on drift
"""
from __future__ import annotations

import glob
import json
import re
import sys

COVERAGE = "COVERAGE.md"


def round_map() -> dict[str, int]:
    """query -> first round with a GREEN row (err null + rows_match).

    Non-green driver records exist (round 1 recorded ann_lsh_topk /
    media_features as `err: no_oracle`; both went green in round 3), so
    bare key membership would misattribute the verifying round.
    """
    first: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r0*.json")):
        n = int(re.search(r"r0*(\d+)", f).group(1))
        for q, v in json.load(open(f)).items():
            if v.get("err") is None and v.get("rows_match"):
                first.setdefault(q, n)
    return first


def relabel(text: str, first: dict[str, int]) -> tuple[str, list[str]]:
    changes: list[str] = []

    def fix_driver(m: re.Match) -> str:
        name, n = m.group(1), int(m.group(2))
        if name not in first:
            # an external row the JSONs don't know — demote (should not
            # happen; flag loudly in the change list)
            changes.append(f"DEMOTE {name}: driver r{n} -> local parity")
            return f"{name} (local parity)"
        if first[name] != n:
            changes.append(f"FIX {name}: driver r{n} -> r{first[name]}")
        return f"**{name}** (driver r{first[name]})"

    def fix_local(m: re.Match) -> str:
        name = m.group(1)
        if name in first:
            changes.append(
                f"PROMOTE {name}: local parity -> driver r{first[name]}"
            )
            return f"**{name}** (driver r{first[name]})"
        return m.group(0)

    text = re.sub(
        r"\*\*([a-z0-9_]+)\*\* \(driver r(\d+)\)", fix_driver, text
    )
    text = re.sub(r"(?<![*`\w])([a-z0-9_]+) \(local parity\)", fix_local, text)
    return text, changes


def main() -> int:
    check = "--check" in sys.argv
    first = round_map()
    text = open(COVERAGE, encoding="utf-8").read()
    new, changes = relabel(text, first)
    n_driver = len(set(re.findall(r"\*\*([a-z0-9_]+)\*\* \(driver r\d+\)", new)))
    n_local = len(set(re.findall(r"(?<![*`\w])([a-z0-9_]+) \(local parity\)", new)))
    print(
        f"external union: {len(first)} queries; labels in doc: "
        f"{n_driver} driver / {n_local} local parity; "
        f"{len(changes)} change(s)"
    )
    for c in changes:
        print(" ", c)
    if check:
        return 1 if changes else 0
    if changes:
        open(COVERAGE, "w", encoding="utf-8").write(new)
        print("COVERAGE.md rewritten")
    return 0


if __name__ == "__main__":
    sys.exit(main())
