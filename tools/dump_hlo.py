"""Compile the CFG-batched UNet forward and dump optimized HLO text.

Usage: python tools/dump_hlo.py [--out /tmp/hlo_cur.txt]
Reuses tools/profile_unet.build_forward so the graph matches the profile.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.profile_unet import build_forward  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/hlo_cur.txt")
    args = p.parse_args()

    t0 = time.time()
    fwd, inputs = build_forward()
    print(f"[{time.time()-t0:.1f}s] built; compiling...", flush=True)
    compiled = fwd.lower(*inputs).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"[{time.time()-t0:.1f}s] wrote {len(txt)/1e6:.1f} MB to {args.out}")
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print({k: ca[k] for k in ("flops", "bytes accessed")
           if k in ca})


if __name__ == "__main__":
    main()
