#!/usr/bin/env python3
"""Splice per-query minima across N full Bench runs into one close
artifact.

Co-tenant CPU bursts on this box inflate single queries by up to 9x
(BASELINE.md, rounds 14-17); the only defensible close number is the
per-query MIN over several full runs in different windows. Reads the
full-precision per-run artifacts Bench writes via SPARK_GRAFT_BENCH_OUT
and emits the same one-line JSON shape (queries/queries_op spliced,
queries_last from the final run, failed = union).

Usage: splice_bench.py run1.json run2.json ... > BENCH.json
"""
import json
import sys


def main() -> int:
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            runs.append(json.loads(f.read().strip()))
    if not runs:
        print("usage: splice_bench.py run1.json run2.json ...", file=sys.stderr)
        return 2
    names = sorted({q for r in runs for q in r.get("queries", {})})
    queries, queries_op = {}, {}
    for q in names:
        vals = [r["queries"][q] for r in runs if q in r.get("queries", {})]
        ops = [r.get("queries_op", {}).get(q, r["queries"][q])
               for r in runs if q in r.get("queries", {})]
        queries[q] = min(vals)
        queries_op[q] = min(ops)
    failed = sorted({q for r in runs for q in r.get("failed", [])})
    out = {
        "metric": "total",
        "value": round(sum(queries.values()), 4),
        "value_op": round(sum(queries_op.values()), 4),
        "unit": "sec",
        "queries": {q: round(v, 4) for q, v in queries.items()},
        "queries_op": {q: round(v, 4) for q, v in queries_op.items()},
        "queries_last": {q: round(v, 4) for q, v in
                         runs[-1].get("queries_last", runs[-1]["queries"]).items()},
        "spliced_runs": len(runs),
        "run_totals": [round(sum(r["queries"].values()), 1) for r in runs],
        "repeats": runs[0].get("repeats", 1),
        "failed": failed,
        "sf": runs[0].get("sf", ""),
    }
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
