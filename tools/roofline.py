"""Per-op roofline waste table: trace time vs compute/BW floor per HLO op.

Joins a jax.profiler perfetto trace (full op names, e.g. fusion.2158)
with the compiled HLO text (from `compiled.as_text()`), computes each
op's FLOPs (dots + convs inside its fused computation) and a byte
estimate (operand + result sizes), and ranks ops by

    waste_ms = measured_ms - max(flops / PEAK_FLOPS, bytes / PEAK_BW)

i.e. time not explained by either roofline. This is the honest "where
is the remaining headroom" accounting for the v5e perf push.

Usage:
  python tools/roofline.py --hlo /tmp/hlo_none.txt \
      --logdir /tmp/unet_profile --calls 3 [--top 40] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

PEAK_TFLOPS = 197e12  # v5e bf16
PEAK_BW = 819e9       # v5e HBM bytes/s

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2,
               "f64": 8, "s64": 8, "u64": 8, "c64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(text):
    """Sum byte sizes of every shape literal in `text` (one op line)."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_shape(tok):
    m = SHAPE_RE.search(tok)
    if not m:
        return None, []
    dt, dims = m.groups()
    return dt, [int(d) for d in dims.split(",") if d]


def dot_flops(line):
    """FLOPs for a dot/convolution HLO line (2 * out_elems * K)."""
    # output shape is on the LHS of " = "
    lhs, _, rhs = line.partition(" = ")
    _, out_dims = parse_shape(rhs.split("(")[0])
    if not out_dims:
        return 0
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    if "convolution(" in rhs:
        # contraction size = prod(kernel spatial dims) * in_ch, read from
        # the io operand via dim_labels
        m = re.search(r"dim_labels=(\S+?),", rhs) or \
            re.search(r"dim_labels=(\S+)", rhs)
        ops = re.findall(r"%[\w.\-]+", rhs.split("convolution(")[1]
                         .split(")")[0])
        # we can't resolve operand shapes from the call line alone;
        # caller passes an operand-shape map instead
        return -out_elems  # sentinel: caller fixes up with K
    if "dot(" in rhs:
        m = re.search(r"contracting_dims=\{([\d,]*)\}", rhs)
        return -out_elems  # sentinel, caller fixes with K
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hlo", required=True)
    p.add_argument("--logdir", default="/tmp/unet_profile")
    p.add_argument("--calls", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--csv", default=None)
    args = p.parse_args()

    # ---- parse HLO ----------------------------------------------------
    # op name -> line; computation name -> [lines]
    with open(args.hlo) as f:
        hlo = f.read()
    op_line = {}
    comp_lines = collections.defaultdict(list)
    cur_comp = None
    for line in hlo.splitlines():
        mdef = re.match(r"%?([\w.\-]+) (?:\([^)]*\) -> .*{$|.*{$)", line)
        if line and not line[0].isspace():
            m = re.match(r"(?:ROOT )?%([\w.\-]+)", line)
            cur_comp = m.group(1) if m else None
            continue
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%([\w.\-]+) = (.*)", ls)
        if not m:
            continue
        name, body = m.groups()
        op_line[name] = body
        if cur_comp:
            comp_lines[cur_comp].append((name, body))

    # operand shape lookup: op name -> (dtype, dims) of its result
    op_shape = {}
    for name, body in op_line.items():
        dt, dims = parse_shape(body.split("(")[0])
        op_shape[name] = (dt, dims)

    def contraction_flops(body):
        """2 * out_elems * K for a dot/conv line, resolving operands."""
        out_dt, out_dims = parse_shape(body.split("(")[0])
        if not out_dims:
            return 0
        out_elems = 1
        for d in out_dims:
            out_elems *= d
        argstr = body.split("(", 1)[1]
        ops = re.findall(r"%([\w.\-]+)", argstr)
        if "convolution(" in body or body.startswith("convolution"):
            mdl = re.search(r"dim_labels=([\w\d]+)_([\w\d]+)->([\w\d]+)",
                            body)
            if not mdl or len(ops) < 2:
                return 0
            rhs_labels = mdl.group(2)  # e.g. 01io / io
            _, kdims = op_shape.get(ops[1], (None, []))
            if not kdims or len(kdims) != len(rhs_labels):
                return 0
            k = 1
            for lab, d in zip(rhs_labels, kdims):
                if lab != "o":  # spatial + input-feature dims contract
                    k *= d
            return 2 * out_elems * k
        if "dot(" in body or body.startswith("dot"):
            m = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", body)
            if not m or not ops:
                return 0
            _, ldims = op_shape.get(ops[0], (None, []))
            k = 1
            for i in (int(x) for x in m.group(1).split(",") if x):
                if i < len(ldims):
                    k *= ldims[i]
            return 2 * out_elems * k
        return 0

    def op_flops(name):
        body = op_line.get(name)
        if body is None:
            return 0
        total = contraction_flops(body)
        m = re.search(r"calls=%([\w.\-]+)", body)
        if m:
            for _, b in comp_lines.get(m.group(1), []):
                total += contraction_flops(b)
        return total

    def op_bytes(name):
        """Operand results + own result (rough HBM traffic bound)."""
        body = op_line.get(name)
        if body is None:
            return 0
        total = shape_bytes(body.split("(")[0])  # result
        argstr = body.split("(", 1)[1] if "(" in body else ""
        for opn in re.findall(r"%([\w.\-]+)", argstr):
            dt, dims = op_shape.get(opn, (None, []))
            if dt in DTYPE_BYTES:
                n = 1
                for d in dims:
                    n *= d
                total += n * DTYPE_BYTES[dt]
        return total

    # ---- parse trace --------------------------------------------------
    paths = sorted(glob.glob(os.path.join(
        args.logdir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {args.logdir}"
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    tpu_pids = {pp for pp, n in pid_names.items()
                if "TPU" in n or "xla" in n.lower()}
    durs = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        durs[name] += e.get("dur", 0) / 1e3  # ms

    # ---- join + rank --------------------------------------------------
    rows = []
    for name, ms in durs.items():
        per = ms / args.calls
        fl = op_flops(name)
        by = op_bytes(name)
        floor_ms = max(fl / PEAK_TFLOPS, by / PEAK_BW) * 1e3
        rows.append((per - floor_ms, per, floor_ms, fl / 1e9, by / 1e6,
                     name))
    rows.sort(reverse=True)
    tot_ms = sum(r[1] for r in rows)
    tot_waste = sum(r[0] for r in rows if r[0] > 0)
    print(f"total {tot_ms:.1f} ms/call, waste above roofline "
          f"{tot_waste:.1f} ms/call")
    print(f"{'waste':>8} {'ms':>8} {'floor':>7} {'GFLOP':>8} "
          f"{'MB':>8}  op")
    for waste, per, floor, gf, mb, name in rows[:args.top]:
        body = op_line.get(name, "")
        meta = ""
        m = re.search(r'op_name="([^"]*)"', body)
        if m:
            meta = m.group(1)[-70:]
        print(f"{waste:8.2f} {per:8.2f} {floor:7.2f} {gf:8.1f} "
              f"{mb:8.1f}  {name[:44]:44s} {meta}")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("waste_ms,ms,floor_ms,gflop,mb,name\n")
            for waste, per, floor, gf, mb, name in rows:
                f.write(f"{waste:.3f},{per:.3f},{floor:.3f},"
                        f"{gf:.2f},{mb:.2f},{name}\n")


if __name__ == "__main__":
    main()
