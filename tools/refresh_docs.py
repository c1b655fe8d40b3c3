#!/usr/bin/env python3
"""Regenerate every machine-derived doc section from the artifacts.

Run automatically at the end of every bench (graft.Bench shells out to
this script after writing BENCH_FULL.json) so the README/SCALE counts
can never drift from the committed artifacts by a manual step again
(they did, by one commit, for three consecutive rounds).

Steps (each best-effort and independently skippable):
 1. SCALE.md 10x sweep table          <- BENCH_FULL.json (render_scale.py)
 2. README gate/test counts           <- CORRECTNESS_r*.json + target/sbt_test.log
 3. SCALE.md oracle-comparison section <- ORACLE_BENCH.json (inline below)

Usage: python3 tools/refresh_docs.py
"""
import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
os.chdir(ROOT)


def step(name, fn):
    try:
        fn()
        print(f"[refresh_docs] {name}: ok")
    except Exception as e:
        print(f"[refresh_docs] {name}: skipped ({e})")


def sweep_table():
    if not os.path.exists("BENCH_FULL.json"):
        raise RuntimeError("no BENCH_FULL.json")
    # a smoke bench (sf0.001 / SCALE=1) also writes BENCH_FULL.json; its
    # empty-or-tiny sweep must not gut SCALE.md's table
    bench = json.load(open("BENCH_FULL.json"))
    n = len(bench.get("scale", {}).get("queries", {}))
    if n < 20:
        raise RuntimeError(f"sweep has only {n} rows — not a full bench run")
    # nor may a CONTAMINATED run (started under host load — the bench
    # stamps this itself) overwrite the committed idle table with noisy
    # ratios: the artifact keeps the evidence, the doc keeps the clean run
    if bench.get("loadavg", {}).get("contaminated"):
        raise RuntimeError("bench self-flagged contaminated — keeping the "
                           "committed idle sweep table")
    subprocess.run([sys.executable, os.path.join(HERE, "render_scale.py")],
                   check=True, capture_output=True, text=True)


def readme_counts():
    args = [sys.executable, os.path.join(HERE, "render_readme_counts.py")]
    log = os.path.join("target", "sbt_test.log")
    if os.path.exists(log):
        args.append(log)
    subprocess.run(args, check=True, capture_output=True, text=True)


def oracle_section():
    if not os.path.exists("ORACLE_BENCH.json"):
        raise RuntimeError("no ORACLE_BENCH.json")
    ob = json.load(open("ORACLE_BENCH.json"))
    # same contamination policy as sweep_table (ADVICE r11): an oracle
    # comparison built from contaminated timings must not feed the
    # rendered 2x-bar claim
    if ob.get("contaminated"):
        raise RuntimeError("ORACLE_BENCH.json self-flagged contaminated — "
                           "keeping the committed idle oracle section")
    if ob.get("n_unexpected_timeout"):
        raise RuntimeError(
            f"{ob['n_unexpected_timeout']} UNEXPECTED oracle timeout(s) — "
            "regression signal; not rendering until adjudicated")
    arts = sorted(glob.glob("CORRECTNESS_r*.json"))
    rnd = int(re.search(r"r(\d+)", arts[-1]).group(1)) if arts else 0
    qs = ob["queries"]
    both = {k: v for k, v in qs.items()
            if v.get("spark_s") is not None and v.get("duck_s") is not None}
    timeouts = sorted(k for k, v in qs.items() if v.get("timeout"))
    wins = sorted(both.items(), key=lambda kv: kv[1]["spark_s"] - kv[1]["duck_s"])
    win_txt = ", ".join(
        f"`{k}` ({v['duck_s']:.1f} s vs {v['spark_s']:.2f} s)"
        for k, v in wins[:4] if v["duck_s"] - v["spark_s"] > 1.0)
    over2 = [k for k, v in both.items()
             if v["duck_s"] > 0 and v["spark_s"] / v["duck_s"] > 2.0]
    over2_big = [k for k in over2 if both[k]["spark_s"] >= 1.0]
    sf = os.path.basename(ob["sf"].rstrip("/"))
    body = (
        f"## Measured vs the DuckDB oracle ({sf}, 32 threads, "
        f"round {rnd} — machine-derived)\n\n"
        f"Rendered from `ORACLE_BENCH.json` (tools/oracle_bench.py: every\n"
        f"oracle run in one DuckDB process with a {ob['timeout_s']:.0f} s "
        f"per-query\ninterrupt; Spark side = "
        f"{ob.get('spark_source', 'BENCH_FULL.json')};\nDuckDB side = "
        f"{ob.get('duck_policy', 'cold single-shot fetchall')}.\n"
        f"Residual bias: Spark timings are count()-materialized, which can\n"
        f"prune output-only expressions the fetchall oracle must compute —\n"
        f"a pro-Spark bias on expression-heavy rows, disclosed here because\n"
        f"it cannot be removed without changing the bench's own policy).\n"
        f"Completed-queries basis: over the **{ob['n_both']} queries both "
        f"engines\nfinish, Spark {ob['spark_total_s']:.1f} s vs DuckDB "
        f"{ob['duck_total_s']:.1f} s = {ob['ratio']:.2f}×** — "
        f"{'inside' if ob['ratio'] <= 2.0 else 'OUTSIDE'} the 2× bar.\n"
        + (f"Excluded as EXPECTED oracle DNFs ({ob['timeout_s']:.0f} s "
           f"timeout; each carries its reason in the artifact): "
           + ", ".join(f"`{t}`" for t in timeouts) + ".\n"
           if timeouts else "")
        + (f"Biggest engine wins: {win_txt}.\n" if win_txt else "")
        + (f"Queries individually above 2× with Spark ≥ 1 s: "
           + (", ".join(f"`{k}`" for k in sorted(over2_big)) or "none")
           + " —\nthe iterative model-fit/serve gates (k-means/PQ/LogReg/"
           "centroid chains),\nwhere the gate trains its own model as tens "
           "of chained Spark jobs, each\npaying the scheduling floor, on a "
           "corpus small enough that DuckDB's\nsingle-process chain runs in "
           "seconds; the floor amortizes with volume\nwhile the oracle "
           "formulations' cost grows super-linearly (the three DNF\ntiers "
           "are the same effect at full size). The other "
           f"{len(over2) - len(over2_big)} above-2× queries\nare sub-second "
           "on both engines, dominated by the same fixed ~0.2–0.9 s\n"
           "job-scheduling floor.\n")
    )
    s = open("SCALE.md").read()
    pat = re.compile(
        r"## Measured vs the DuckDB oracle[^\n]*\n.*?(?=\n## )", re.S)
    if not pat.search(s):
        raise RuntimeError("oracle section header not found in SCALE.md")
    s = pat.sub(body.rstrip("\n") + "\n", s, count=1)
    open("SCALE.md", "w").write(s)


step("SCALE.md sweep table", sweep_table)
step("README counts", readme_counts)
step("SCALE.md oracle section", oracle_section)
