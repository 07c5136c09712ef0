"""Decode launch-gap attribution (real TPU).

The round-3 finding: at whisper-base bs64 greedy decode, in-loop device
work is ~1.8 ms/token but the step takes ~3.6 — the rest is inter-op gaps
inside the while body (tiny-M ops, sequencer overhead). This probe traces
a fixed-trip greedy decode and attributes each gap to the op that FOLLOWS
it (the op whose launch stalled), summed per op group — the ranking says
which ops to fuse/eliminate first.

Usage: python perf/decode_gap_trace.py [--new 16] [--bs 64] [--int8]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re

import numpy as np

import jax
import jax.numpy as jnp

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.config import StemConfig, WhisperConfig
from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode

enable_compilation_cache()

CONTAINERS = re.compile(
    r"^(while|jit_|closed_call|body|cond|checkpoint|core_closed_call|\d+$)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", type=int, default=16)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--beam", type=int, default=0,
                    help="trace beam search (reference eval config "
                         "rp5.0/ngram2) instead of greedy")
    ap.add_argument("--tracedir", default="/tmp/decode_gap_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--tail-frac", type=float, default=0.0,
                    help="analyze only the trailing fraction of the span "
                         "(steady-state loop; excludes encoder/prefill/"
                         "cache-quantization setup)")
    args = ap.parse_args()

    config = WhisperConfig(remat=False)
    stem = StemConfig("base", in_channels=208)
    from neuspeech1_tpu.models.init import init_params

    params = init_params(jax.random.key(0), config, stem)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((args.bs, 208, 6000)).astype(np.float32))
    prompt = np.asarray(
        [[config.sot_id, config.first_language_id, config.transcribe_id,
          config.notimestamps_id]] * args.bs, np.int32)
    gen = GenerationConfig.for_model(
        config, max_length=prompt.shape[1] + args.new,
        int8_kv_cache=args.int8,
        num_beams=args.beam or 1,
        repetition_penalty=5.0 if args.beam else 1.0,
        no_repeat_ngram_size=2 if args.beam else 0)

    os.environ["NEUSPEECH_DECODE_FIXED_TRIPS"] = "1"
    if args.beam:
        from neuspeech1_tpu.decode.generate import beam_search as _decode
    else:
        _decode = greedy_decode
    def run():
        out = _decode(params, feats, prompt, config, stem, gen)
        np.asarray(out[0] if isinstance(out, tuple) else out)

    run()  # compile + settle
    jax.profiler.start_trace(args.tracedir)
    run()
    jax.profiler.stop_trace()

    paths = glob.glob(
        os.path.join(args.tracedir, "plugins/profile/*/*.trace.json.gz"))
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    tpu_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:TPU:0" in str(e.get("args", {}).get("name", ""))
    }
    X = sorted(
        (e for e in ev
         if e.get("ph") == "X" and e.get("pid") in tpu_pids
         and e.get("dur") is not None
         and not CONTAINERS.match(e.get("name", ""))),
        key=lambda e: e["ts"])
    n = args.new
    if args.tail_frac:
        lo = X[0]["ts"]
        hi = max(e["ts"] + e["dur"] for e in X)
        cut = hi - (hi - lo) * args.tail_frac
        X = [e for e in X if e["ts"] >= cut]
        n = args.new * args.tail_frac  # tokens decoded in the window
    gap_by_op = collections.Counter()
    dur_by_op = collections.Counter()
    cur_end = None
    total_gap = 0.0
    for e in X:
        g = re.sub(r"\.\d+$", "", e["name"])
        dur_by_op[g] += e["dur"] / 1e3 / n
        if cur_end is not None and e["ts"] > cur_end:
            gap = (e["ts"] - cur_end) / 1e3 / n
            gap_by_op[g] += gap
            total_gap += gap
        cur_end = e["ts"] + e["dur"] if cur_end is None else max(
            cur_end, e["ts"] + e["dur"])
    span = (X[-1]["ts"] + X[-1]["dur"] - X[0]["ts"]) / 1e3 / n
    busy = span - total_gap
    print(f"span {span:.3f} ms/token, busy {busy:.3f}, gaps {total_gap:.3f}")
    print(f"{'op group':40s} {'gap-before':>10s} {'own-dur':>10s}")
    for gname, gap in gap_by_op.most_common(args.top):
        print(f"{gname:40s} {gap:10.4f} {dur_by_op[gname]:10.4f}")


if __name__ == "__main__":
    main()
