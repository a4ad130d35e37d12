"""Attribute the generic `fusion.N` bucket of a denoise-loop trace.

The aggregated trace view lumps every fusion whose name carries no
semantic prefix into one "fusion" bucket (~39 ms/step in round 3,
the #2 consumer). This tool lists each distinct fusion.N instance with
its share, its HLO root instruction, and the ops inside its fused
computation so the bucket can be attributed line by line
(VERDICT r3 next-step #1).

Usage:
  python tools/trace_generic_fusions.py /tmp/denoise_r4 --hlo /tmp/denoise_r4.hlo --calls 6
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from trace_detail import load_events  # noqa: E402


def parse_hlo(path):
    """name -> (root line, fused computation op histogram)."""
    roots = {}
    comp_of = {}
    comp_ops = collections.defaultdict(collections.Counter)
    cur_comp = None
    with open(path) as f:
        for line in f:
            m = re.match(r"%?(\S+) \(", line)
            if m and line.rstrip().endswith("{"):
                cur_comp = m.group(1)
            m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
            if m:
                name, rhs = m.group(1), m.group(2)
                if name.startswith("fusion"):
                    roots[name] = rhs[:400]
                    cm = re.search(r"calls=%?([\w.\-]+)", rhs)
                    if cm:
                        comp_of[name] = cm.group(1)
                elif cur_comp is not None:
                    opm = re.search(r"}\s*(\w[\w-]*)\(", rhs)
                    if opm:
                        comp_ops[cur_comp][opm.group(1)] += 1
    return roots, comp_of, comp_ops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--hlo", required=True)
    p.add_argument("--calls", type=int, default=6)
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    events = load_events(args.logdir)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    tpu_pids = {pp for pp, n in pid_names.items()
                if "TPU" in n or "xla" in n.lower()}
    ops = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if re.match(r"^(bitcast_)?fusion\.\d+$", name) or name == "fusion":
            ops[name] += e.get("dur", 0) / 1e3

    roots, comp_of, comp_ops = parse_hlo(args.hlo)
    total = sum(ops.values())
    print(f"generic-fusion total {total/args.calls:.2f} ms/call "
          f"({len(ops)} distinct instances)")
    for name, ms in ops.most_common(args.top):
        per = ms / args.calls
        root = roots.get(name, "?")
        comp = comp_of.get(name)
        hist = ""
        if comp and comp in comp_ops:
            hist = " | " + " ".join(f"{o}x{c}" for o, c in
                                    comp_ops[comp].most_common(8))
        print(f"{per:7.3f} ms  {name:18s} {root[:220]}{hist}")


if __name__ == "__main__":
    main()
