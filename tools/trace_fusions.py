"""Join the profiler's top op instances with compiled-HLO fusion roots,
to see what the generic 'fusion' bucket actually computes."""
import collections
import glob
import gzip
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo/tools")
from profile_unet import build_forward, sync  # noqa: E402

fwd, inputs = build_forward()
print("lowering/compiling...", file=sys.stderr, flush=True)
compiled = fwd.lower(*inputs).compile()
hlo = compiled.as_text()
print(f"HLO text: {len(hlo)/1e6:.1f} MB", file=sys.stderr, flush=True)

# map fusion name -> its definition line (shape + root hints)
defs = {}
for m in re.finditer(r"^\s*%?([\w.\-]+fusion[\w.\-]*) = ([^\n]{0,160})",
                     hlo, re.M):
    defs[m.group(1)] = m.group(2)
# also grab the fused computation bodies' root instructions
roots = {}
for m in re.finditer(r"^%(fused_[\w.\-]+) \([^\n]*\n((?:.+\n)+?)\}", hlo,
                     re.M):
    body = m.group(2)
    ops = collections.Counter(
        re.findall(r"= [\w\[\]{},/ ]+? (\w+)\(", body))
    roots[m.group(1)] = ops.most_common(6)

sync(fwd(*inputs))
logdir = "/tmp/fusion_trace"
with jax.profiler.trace(logdir):
    sync(fwd(*inputs))

paths = sorted(glob.glob(os.path.join(
    logdir, "plugins/profile/*/*.trace.json.gz")))
with gzip.open(paths[-1], "rt") as f:
    tr = json.load(f)

durs = collections.Counter()
for ev in tr.get("traceEvents", []):
    name = ev.get("name", "")
    if ev.get("ph") == "X" and ev.get("dur") and "fusion" in name:
        durs[name] += ev["dur"]

for name, us in durs.most_common(25):
    d = defs.get(name, "")
    shape = d.split(" ")[0] if d else "?"
    called = re.search(r"calls=%?([\w.\-]+)", d or "")
    rinfo = roots.get(called.group(1), "") if called else ""
    print(f"{us/1e3:9.2f} ms  {name:40s} {shape:28s} {rinfo}")
