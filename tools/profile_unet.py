"""Profile the CFG-batched UNet forward (the DDIM hot op) on TPU.

Usage:  python tools/profile_unet.py [--trace] [--steps N]

Prints wall-clock per forward, achieved TFLOP/s and MFU, and (with
--trace) an op-category breakdown parsed from the jax.profiler trace.
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

V5E_PEAK_TFLOPS = 197.0  # bf16


def build_forward():
    from tooncrafter_tpu.models.diffusion import ModelConfig, ToonCrafter
    from tooncrafter_tpu.utils.synth import synth_params

    cfg = ModelConfig(compute_dtype=jnp.bfloat16)
    model = ToonCrafter(cfg)
    shapes = model.param_shapes()
    unet_shapes = {"unet": shapes["unet"]}
    params = synth_params(unet_shapes)

    b = 2  # CFG-batched (cond + uncond)
    t = cfg.video_length
    x = jnp.zeros((b, t, cfg.latent_h, cfg.latent_w, 8), jnp.bfloat16)
    ts = jnp.full((b,), 500.0)
    ctx = jnp.zeros((b, 77 + t * 16, 1024), jnp.bfloat16)
    fs = jnp.full((b,), 10.0)

    @jax.jit
    def fwd(params, x, ts, ctx, fs):
        return model.unet.apply({"params": params["unet"]}, x, ts, ctx, fs)

    return fwd, (params, x, ts, ctx, fs)


def sync(y):
    return float(jnp.mean(y.astype(jnp.float32)))


def parse_trace(logdir):
    """Aggregate TPU-track op durations from the newest perfetto trace."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace found under", logdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find pids whose name looks like a TPU device track
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device:" in n.lower() or "xla" in n.lower()}
    cat = collections.Counter()
    ops = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        # skip steps/traceme wrappers heuristically: keep XLA op events
        args = e.get("args") or {}
        if not args and "%" not in name and "fusion" not in name \
                and "convolution" not in name and "copy" not in name:
            continue
        total += dur
        ops[name.split(".")[0]] += dur
        lname = name.lower()
        if "convolution" in lname or "conv" in lname:
            cat["convolution"] += dur
        elif "attention" in lname or "flash" in lname:
            cat["attention-kernel"] += dur
        elif "reduce" in lname:
            cat["reduce"] += dur
        elif "fusion" in lname or "multiply" in lname or "add" in lname:
            cat["elementwise-fusion"] += dur
        elif "copy" in lname or "transpose" in lname or "reshape" in lname:
            cat["copy/transpose"] += dur
        elif "dot" in lname or "matmul" in lname:
            cat["matmul"] += dur
        else:
            cat["other"] += dur
    print(f"\n== trace breakdown ({paths[-1]}) ==")
    print(f"total device op time: {total:.1f} ms")
    for k, v in cat.most_common():
        print(f"  {k:20s} {v:8.1f} ms  {100*v/max(total,1e-9):5.1f}%")
    print("\ntop 25 ops:")
    for k, v in ops.most_common(25):
        print(f"  {v:8.2f} ms  {k[:100]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", action="store_true")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--logdir", default="/tmp/unet_profile")
    p.add_argument("--hlo-out", default=None,
                   help="also dump optimized HLO text (reuses the compile)")
    args = p.parse_args()

    t0 = time.time()
    fwd, inputs = build_forward()
    print(f"[{time.time()-t0:.1f}s] built; compiling...", flush=True)
    compiled = fwd.lower(*inputs).compile()
    if args.hlo_out:
        with open(args.hlo_out, "w") as f:
            f.write(compiled.as_text())
        print(f"[{time.time()-t0:.1f}s] HLO -> {args.hlo_out}", flush=True)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        tflop = float(ca.get("flops", 0.0)) / 1e12
    except Exception:
        tflop = 20.47  # XLA cost_analysis, audit r02 (.audit_r02.jsonl)
    sync(compiled(*inputs))
    print(f"[{time.time()-t0:.1f}s] compiled ({tflop:.2f} TFLOP); timing...",
          flush=True)

    times = []
    for _ in range(args.steps):
        s = time.perf_counter()
        sync(compiled(*inputs))
        times.append(time.perf_counter() - s)
    times.sort()
    med = times[len(times) // 2]
    print(f"median forward: {med*1e3:.1f} ms  "
          f"=> {tflop/med:.1f} TFLOP/s  "
          f"MFU {100*tflop/med/V5E_PEAK_TFLOPS:.1f}%")

    if args.trace:
        jax.profiler.start_trace(args.logdir)
        for _ in range(3):
            sync(fwd(*inputs))
        jax.profiler.stop_trace()
        parse_trace(args.logdir)


if __name__ == "__main__":
    main()
