#!/usr/bin/env python3
"""Per-query engine-vs-oracle wall times -> ORACLE_BENCH.json.

For every oracle-expressible query, pairs the Spark wall time with the
wall time of its DuckDB oracle SQL over the same parquet tables — the
machine record behind SCALE.md's "Measured vs the DuckDB oracle"
section (regenerated from this artifact by tools/refresh_docs.py).

Spark times: the warm min-of-two timings from BENCH_FULL.json when that
artifact exists for the same sf dir (count-materialized, the bench's
measurement policy); otherwise the cold single-shot write-inclusive
times from <outDir>/spark_times.json (written by graft.Verify).

DuckDB times: one process, per-query watchdog interrupt (default 120 s;
a timed-out oracle records duck_s = null, timeout = true and is
EXCLUDED from the completed-queries totals, the same rule the round-5
measurement used for dedup_jaccard's all-pairs DNF).

Usage:
    python3 tools/oracle_bench.py <outDir> <sfDir> [timeout_s]
"""
import glob
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    spark_times, spark_source = {}, None
    bench_path = "BENCH_FULL.json"
    if os.path.exists(bench_path):
        bench = json.load(open(bench_path))
        if bench.get("sf") == sf_dir and bench.get("queries"):
            spark_times = dict(bench["queries"])
            spark_source = "BENCH_FULL.json (warm min-of-two, count-materialized)"
    if not spark_times:
        st_path = os.path.join(out_dir, "spark_times.json")
        if os.path.exists(st_path):
            spark_times = json.load(open(st_path))
            spark_source = "spark_times.json (cold single-shot, write-inclusive)"

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    results = {}
    for name, sql in sorted(oracle.items()):
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        t0 = time.time()
        timed_out, err = False, None
        try:
            con.sql(sql).fetchall()
        except Exception as e:  # interrupt or genuine oracle error
            msg = str(e)
            timed_out = ("INTERRUPT" in msg.upper()
                         or time.time() - t0 >= timeout * 0.95)
            if not timed_out:
                err = msg[:160]
        finally:
            timer.cancel()
        dt = time.time() - t0
        row = {"spark_s": spark_times.get(name),
               "duck_s": None if (timed_out or err) else round(dt, 4)}
        if timed_out:
            row["timeout"] = True
        if err:
            row["error"] = err
        results[name] = row
        status = ("TIMEOUT" if timed_out else
                  f"ERROR {err}" if err else f"{dt:.2f}s")
        print(f"[{name}] duck={status} spark={spark_times.get(name)}",
              flush=True)

    both = {k: v for k, v in results.items()
            if v.get("spark_s") is not None and v.get("duck_s") is not None}
    spark_total = sum(v["spark_s"] for v in both.values())
    duck_total = sum(v["duck_s"] for v in both.values())
    art = {
        "sf": sf_dir,
        "timeout_s": timeout,
        "spark_source": spark_source,
        "n_queries": len(results),
        "n_both": len(both),
        "n_timeout": sum(1 for v in results.values() if v.get("timeout")),
        "spark_total_s": round(spark_total, 3),
        "duck_total_s": round(duck_total, 3),
        "ratio": round(spark_total / duck_total, 4) if duck_total else None,
        "queries": results,
    }
    json.dump(art, open("ORACLE_BENCH.json", "w"), indent=1)
    print(f"\nORACLE_BENCH.json: {len(both)} completed on both engines, "
          f"Spark {spark_total:.1f}s vs DuckDB {duck_total:.1f}s = "
          f"{spark_total / duck_total:.2f}x" if duck_total else "no totals")


if __name__ == "__main__":
    main()
