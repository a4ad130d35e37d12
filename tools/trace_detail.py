"""Detailed per-op breakdown of a jax.profiler perfetto trace + HLO
correlation.

Parses the newest trace under the given logdir keeping FULL op names
(fusion.123, convolution.45, ...), divides by the number of profiled
calls, and — when given an HLO text dump — annotates each hot op with its
root instruction line so shapes are visible.

Usage:
  python tools/trace_detail.py [logdir] [--hlo hlo.txt] [--calls 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(logdir):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    return trace.get("traceEvents", [])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir", nargs="?", default="/tmp/unet_profile")
    p.add_argument("--hlo", default=None)
    p.add_argument("--calls", type=int, default=3)
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
    module_ms = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3
        if name.startswith("jit_"):
            module_ms += dur
            continue
        ops[name] += dur

    hlo_lines = {}
    if args.hlo:
        with open(args.hlo) as f:
            for line in f:
                m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (.*)", line)
                if m:
                    hlo_lines[m.group(1)] = m.group(2)[:160]

    total = sum(ops.values())
    print(f"module total {module_ms/args.calls:.1f} ms/call; "
          f"op total {total/args.calls:.1f} ms/call over {args.calls} calls")
    for name, ms in ops.most_common(args.top):
        per = ms / args.calls
        pct = 100 * ms / total
        info = hlo_lines.get(name, "")
        print(f"{per:8.2f} ms {pct:5.1f}%  {name:40s} {info}")


if __name__ == "__main__":
    main()
