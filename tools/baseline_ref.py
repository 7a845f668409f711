#!/usr/bin/env python3
"""Measure the reference implementation (/root/reference/main.py) on
sf0.1 exports, per BASELINE.md: define one pipeline per SURVEY §2.5
headline query, run it, read duration_ms from the run record.
Dev tool only. Usage: python3 tools/baseline_ref.py [sfdir] [workdir]
"""
import json, os, sys, tempfile

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WORK = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="refbase")
os.makedirs(WORK, exist_ok=True)
os.environ["PIPELINE_DB"] = f"{WORK}/catalog.db"
sys.path.insert(0, "/root/reference")

import duckdb
import main as ref  # the reference engine

# ---- export parquet -> csv (reference sources read csv) ----
con = duckdb.connect()
for t in ["lineitem", "orders", "customer", "events"]:
    out = f"{WORK}/{t}.csv"
    if not os.path.exists(out):
        con.execute(f"COPY (SELECT * FROM '{SF}/{t}.parquet') TO '{out}' (HEADER, DELIMITER ',')")
        print(f"exported {t}")

ref.init_db()
svc = ref.PipelineService()

def run(name, sources, transforms, sink_path):
    pid = svc.create_pipeline(name, "").id
    for sname, path in sources:
        svc.add_source(pid, sname, "csv", {"path": path})
    for i, (tname, ttype, cfg) in enumerate(transforms):
        svc.add_transform(pid, tname, ttype, cfg, order_index=i)
    svc.add_sink(pid, "out", "csv", {"path": sink_path})
    res = svc.run_pipeline(pid)
    dur = res.get("duration_ms")
    print(f"{name}: status={res.get('status')} duration_ms={dur} "
          f"rows_read={res.get('rows_read')} rows_written={res.get('rows_written')}")
    return dur

results = {}
results["q_filter"] = run(
    "q_filter", [("lineitem", f"{WORK}/lineitem.csv")],
    # float literal: the reference coerces the row value to the literal's
    # type (main.py:188), so 24.0 gives a numeric compare over CSV strings
    [("f", "filter", {"field": "l_quantity", "op": "gt", "value": 24.0})],
    f"{WORK}/out_filter.csv")
results["q_agg"] = run(
    "q_agg", [("lineitem", f"{WORK}/lineitem.csv")],
    [("a", "aggregate", {"group_by": ["l_returnflag"], "field": "l_extendedprice", "function": "sum"})],
    f"{WORK}/out_agg.csv")
results["q_join"] = run(
    "q_join", [("orders", f"{WORK}/orders.csv"), ("customer", f"{WORK}/customer.csv")],
    [("f", "filter", {"field": "o_orderkey", "op": "notnull"}),
     ("j", "join", {"right": "customer", "left_key": "o_custkey", "right_key": "c_custkey"})],
    f"{WORK}/out_join.csv")
results["q_sort"] = run(
    "q_sort", [("orders", f"{WORK}/orders.csv")],
    [("s", "sort", {"field": "o_totalprice", "descending": True})],
    f"{WORK}/out_sort.csv")
results["q_dedup"] = run(
    "q_dedup", [("events", f"{WORK}/events.csv")],
    [("d", "deduplicate", {"keys": ["user_id", "event_type"]})],
    f"{WORK}/out_dedup.csv")

print(json.dumps(results))
