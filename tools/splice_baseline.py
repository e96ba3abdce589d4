#!/usr/bin/env python3
"""Splice a freshly recorded per-SF table (bench_baseline.py output)
into the matching section of BASELINE.md, replacing that section's
table + dagger note but keeping the surrounding prose. Also prints the
Spark-vs-DuckDB aggregate for the section using a BENCH_*.json file.

Usage: python3 tools/splice_baseline.py <new_table.md> <section_header_prefix> <bench_json>
e.g.   python3 tools/splice_baseline.py /tmp/baseline_sf1.md "## sf1" BENCH_sf1_r12.json
"""
import json
import re
import sys

new_md, section, bench_json = sys.argv[1], sys.argv[2], sys.argv[3]

old = open("BASELINE.md").read().splitlines(keepends=True)
new = open(new_md).read().splitlines(keepends=True)

i_sec = next(i for i, l in enumerate(old) if l.startswith(section))
# table starts at the first "| query |" line after the section header
i_tab = next(i for i in range(i_sec, len(old)) if old[i].startswith("| query |"))
# section content ends at the next "## " header (or EOF)
i_end = next((i for i in range(i_tab, len(old)) if old[i].startswith("## ")), len(old))

j_tab = next(j for j, l in enumerate(new) if l.startswith("| query |"))

out = old[:i_tab] + new[j_tab:] + ["\n\n"] + old[i_end:]
open("BASELINE.md", "w").writelines(out)

# aggregate report
rows = {}
for line in open(new_md):
    m = re.match(r"\| (\w+)( †)? \| ([\d.]+) \|", line)
    if m and not line.startswith("| **"):
        rows[m.group(1)] = float(m.group(3))
d = json.load(open(bench_json))["queries"]
common = [k for k in rows if k in d and d[k] >= 0]
nod = [k for k in common]
s = sum(d[k] for k in common)
du = sum(rows[k] for k in common)
print(f"{section}: {len(common)} comparable, Spark {s:.1f}s vs DuckDB {du:.1f}s = {s/du:.2f}x")
# excluding dagger rows
dag = set()
for line in open(new_md):
    m = re.match(r"\| (\w+) † \|", line)
    if m:
        dag.add(m.group(1))
nd = [k for k in common if k not in dag]
s2 = sum(d[k] for k in nd)
du2 = sum(rows[k] for k in nd)
print(f"  excl {len(dag)} dagger rows: {len(nd)} rows, Spark {s2:.1f}s vs DuckDB {du2:.1f}s = {s2/du2:.2f}x")
