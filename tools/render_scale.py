#!/usr/bin/env python3
"""Regenerate SCALE.md's 10x sweep table from BENCH_FULL.json.

Replaces the markdown table between the '| Query | base s |' header and
the first non-table line after it, and rewrites the '"All N swept
queries"' lead-in sentence count + worst-query line. Run after any
bench: python3 tools/render_scale.py
"""
import glob
import json
import re

bench = json.load(open("BENCH_FULL.json"))
sq = bench["scale"]["queries"]

# round number = newest correctness artifact (the same source
# render_readme_counts.py uses)
arts = sorted(glob.glob("CORRECTNESS_r*.json"))
rnd = int(re.search(r"r(\d+)", arts[-1]).group(1)) if arts else 0

LABELS = {
    "warehouse_day": "`warehouse_day` (full `Apps.runWarehouseDay`, day 1 from empty dwh)",
    "warehouse_day2": "`warehouse_day2` (day 2 on day-1 state: carry-forward dominant, 5% revisions)",
    "dedup_embedding": "`dedup_embedding` (gate config: bits PINNED at 8 for the oracle — fixed 256 buckets go quadratic at 10×; see the autobits row for the production shape)",
    "dedup_embedding_autobits": "`dedup_embedding_autobits` (production config: `Ann.autoBits` scales buckets with n)",
}

def human(n):
    if n is None:
        return "—"
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if n < 1024 or unit == "TiB":
            return f"{n:.0f} B" if unit == "B" else f"{n:.1f} {unit}"
        n /= 1024


def shuf(b):
    return None if not b else b.get("shuffle_read", 0) + b.get("shuffle_write", 0)


rows = []
worst = (None, 0.0)
any_bytes = any(v.get("bytes_scaled") for v in sq.values())
for name, v in sq.items():
    base, scaled, ratio = v["base"], v["scaled"], v["ratio"]
    label = LABELS.get(name, f"`{name}`")
    line = f"| {label} | {base:.2f} | {scaled:.2f} | {ratio:.2f} |"
    if any_bytes:
        bb, sb = v.get("bytes_base"), v.get("bytes_scaled")
        line += f" {human(shuf(bb))} → {human(shuf(sb))} |"
        spill = (sb or {}).get("spill", 0)
        line += f" {human(spill) if spill else '0'} |"
    rows.append(line)
    # ignore the composite warehouse builds for the 'worst' callout: their
    # ratio narrative is handled separately in the trailing paragraph
    if not name.startswith("warehouse") and ratio > worst[1]:
        worst = (name, ratio)

hdr = ("| Query | base s | ×10 s | ratio | shuffle r+w base→×10 | spill ×10 |"
       "\n|---|---|---|---|---|---|\n") if any_bytes else \
      "| Query | base s | ×10 s | ratio |\n|---|---|---|---|\n"
table = hdr + "\n".join(rows)

s = open("SCALE.md").read()
pat = re.compile(
    r"\| Query \| base s \| ×10 s \| ratio[^\n]*\n(?:\|[^\n]*\n)+")
assert pat.search(s), "sweep table header not found in SCALE.md"
s = pat.sub(table + "\n", s, count=1)

# warehouse per-stage breakdown (r11 verdict #3): rendered between the
# markers when the artifact carries stage timings
wh = bench["scale"].get("warehouse_stages")
if wh and "<!-- warehouse-stages:begin -->" in s:
    stages = list(wh["base"]["day1"].keys())
    st_rows = "\n".join(
        f"| `{st}` | {wh['base']['day1'].get(st, 0):.2f} | "
        f"{wh['base']['day2'].get(st, 0):.2f} | "
        f"{wh['scaled']['day1'].get(st, 0):.2f} | "
        f"{wh['scaled']['day2'].get(st, 0):.2f} |" for st in stages)
    block = ("<!-- warehouse-stages:begin -->\n"
             "| stage | base day1 s | base day2 s | ×10 day1 s | ×10 day2 s |\n"
             "|---|---|---|---|---|\n" + st_rows +
             "\n<!-- warehouse-stages:end -->")
    s = re.sub(r"<!-- warehouse-stages:begin -->.*?<!-- warehouse-stages:end -->",
               block, s, flags=re.S)

# update the count + worst-query sentence that follows the table
s = re.sub(r"All \d+ swept queries \(round-\d+ builder run\)",
           f"All {len(sq)} swept queries (round-{rnd} builder run)", s)
# ...and the sweep section header's round stamp
s = re.sub(r"## Measured 10× scale sweep \(round \d+ — machine-derived\)",
           f"## Measured 10× scale sweep (round {rnd} — machine-derived)", s)
wq, wr = worst
s = re.sub(r"worst is `[^`]+` at [\d.]+×",
           f"worst is `{wq}` at {wr:.1f}×", s)

open("SCALE.md", "w").write(s)
print(f"rendered {len(sq)} sweep rows; worst non-warehouse: {wq} {wr:.2f}x")
