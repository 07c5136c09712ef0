"""Device-trace waterfall for the flagship train step (real TPU).

Runs the bench.py configuration (whisper-base EEG, bs64, bf16, LoRA r32 +
stem, fold_lora, remat per --remat), captures a jax.profiler trace through
the axon tunnel, and prints:
  * union-of-leaf-intervals device busy/idle over the traced span
    (container events — while/jit_/closed_call/body/cond — excluded, so
    nesting is not double-counted; see CLAUDE.md profiler notes);
  * top-N op groups by summed dur (fusion.12 -> 'fusion', Pallas
    custom-calls show 0 dur — their time rides the wrapper events);
  * top-N individual op names with per-step ms.

Usage: python perf/trace_step.py [--steps 8] [--remat false] [--top 40]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.models.init import init_params
from neuspeech1_tpu.models.lora import init_lora
from neuspeech1_tpu.train import optimizer as opt
from neuspeech1_tpu.train import trainstep as ts

enable_compilation_cache()

CONTAINERS = re.compile(
    r"^(while|jit_|closed_call|body|cond|checkpoint|core_closed_call)")


def parse_trace(tracedir, steps):
    paths = glob.glob(
        os.path.join(tracedir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {tracedir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tpu_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU:0" in str(e.get("args", {}).get("name", ""))
    }
    leafs = [
        e for e in ev
        if e.get("ph") == "X" and e.get("pid") in tpu_pids
        and e.get("dur") is not None
        and not CONTAINERS.match(e.get("name", ""))
    ]
    conts = [
        e for e in ev
        if e.get("ph") == "X" and e.get("pid") in tpu_pids
        and e.get("dur") is not None and CONTAINERS.match(e.get("name", ""))
    ]
    # union of leaf intervals
    iv = sorted((e["ts"], e["ts"] + e["dur"]) for e in leafs)
    busy, span_lo, span_hi, cur_lo, cur_hi = 0.0, None, None, None, None
    for lo, hi in iv:
        if span_lo is None:
            span_lo = lo
        span_hi = max(span_hi or hi, hi)
        if cur_lo is None:
            cur_lo, cur_hi = lo, hi
        elif lo <= cur_hi:
            cur_hi = max(cur_hi, hi)
        else:
            busy += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
    if cur_lo is not None:
        busy += cur_hi - cur_lo
    span = (span_hi - span_lo) if span_lo is not None else 0.0

    by_name = collections.Counter()
    for e in leafs:
        by_name[e["name"]] += e["dur"]
    by_group = collections.Counter()
    for name, d in by_name.items():
        by_group[re.sub(r"[.\d]+$", "", name)] += d
    return busy, span, by_name, by_group, conts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--remat", default="false")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--tracedir", default="/tmp/trace_step")
    ap.add_argument("--dump-hlo", default="",
                    help="write compiled HLO text here (fusion->source map)")
    args = ap.parse_args()
    remat = args.remat.lower() in ("1", "true", "yes")

    config = WhisperConfig(remat=remat)
    stem = StemConfig("base", in_channels=208)
    params = init_params(jax.random.key(0), config, stem)
    lora = init_lora(jax.random.key(1), config, rank=32, alpha=64)
    tx = opt.make_optimizer(peak_lr=1e-3, warmup_steps=500,
                            total_steps=100_000)
    state, frozen = ts.init_train_state(
        jax.random.key(2), params, lora, tx, opt.default_trainable_pred())
    step = ts.make_train_step(config, stem, tx, fold_lora=True)
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((64, 208, 6000)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, 50000, (64, 64)).astype(np.int32)),
        "decoder_input_ids": jnp.asarray(
            rng.integers(0, 50000, (64, 64)).astype(np.int32)),
    }
    if args.dump_hlo:
        # lower the ALREADY-jitted fn directly (wrapping in another jit can
        # push the remote-compile request over its HTTP limit — CLAUDE.md)
        txt = step.lower(state, frozen, batch).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"wrote HLO ({len(txt)} bytes) to {args.dump_hlo}")

    for _ in range(3):  # warmup/compile
        state, m = step(state, frozen, batch)
    float(jax.device_get(m["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, frozen, batch)
    float(jax.device_get(m["loss"]))
    wall = (time.perf_counter() - t0) / args.steps

    jax.profiler.start_trace(args.tracedir)
    for _ in range(args.steps):
        state, m = step(state, frozen, batch)
    float(jax.device_get(m["loss"]))
    jax.profiler.stop_trace()

    busy, span, by_name, by_group, conts = parse_trace(
        args.tracedir, args.steps)
    per = 1e3 / args.steps  # us-total -> ms/step divisor handled below
    print(f"wall {wall*1e3:.1f} ms/step; traced span {span/1e3:.1f} ms "
          f"({span/1e3/args.steps:.1f}/step), busy {busy/1e3:.1f} ms "
          f"({100*busy/max(span,1):.1f}%)")
    print(f"\n-- top groups (ms/step over {args.steps} steps) --")
    for name, d in by_group.most_common(args.top):
        print(f"{d/1e3/args.steps:8.3f}  {name}")
    print(f"\n-- top ops (ms/step) --")
    for name, d in by_name.most_common(args.top):
        print(f"{d/1e3/args.steps:8.3f}  {name}")
    print(f"\n-- container events (context only, ms/step) --")
    cc = collections.Counter()
    for e in conts:
        cc[re.sub(r"[.\d]+$", "", e["name"])] += e["dur"]
    for name, d in cc.most_common(12):
        print(f"{d/1e3/args.steps:8.3f}  {name}")


if __name__ == "__main__":
    main()
