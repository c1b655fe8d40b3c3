#!/usr/bin/env python3
"""Regenerate README.md's inline counts from the artifacts.

Gates: counted from the newest CORRECTNESS_r{N}.json (the machine
record the README already declares authoritative). Tests: parsed from
an `sbt test` log when one is passed (`Total number of tests run: N`);
without a log the test sentence is left untouched.

Usage: python3 tools/render_readme_counts.py [sbt_test_log]
"""
import json
import re
import sys
from pathlib import Path

root = Path(__file__).resolve().parent.parent
arts = sorted(root.glob("CORRECTNESS_r*.json"))
if not arts:
    sys.exit("no CORRECTNESS_r*.json artifact found")
latest = arts[-1]
rnd = int(re.search(r"r(\d+)", latest.name).group(1))
gates = len(json.load(open(latest)))

readme = root / "README.md"
text = readme.read_text()
text, n1 = re.subn(
    r"\(\d+ gates as of round \d+",
    f"({gates} gates as of round {rnd}", text)

n2 = 0
if len(sys.argv) > 1:
    log = Path(sys.argv[1]).read_text()
    m = re.findall(r"Total number of tests run: (\d+)", log)
    if not m:
        sys.exit(f"no ScalaTest summary line in {sys.argv[1]}")
    tests = sum(int(x) for x in m)
    text, n2 = re.subn(
        r"\(\d+ tests as of\n  round \d+",
        f"({tests} tests as of\n  round {rnd}", text)
    if n2 == 0:  # single-line variant
        text, n2 = re.subn(
            r"\(\d+ tests as of round \d+",
            f"({tests} tests as of round {rnd}", text)

readme.write_text(text)
print(f"README counts: gates={gates} (from {latest.name}), "
      f"test sentence updated: {bool(n2)} (gate sentence: {bool(n1)})")
