"""Flagship-checkpoint spec-decode serving drive (real TPU).

Decode-dominated wall measurement on a TRAINED checkpoint: one
device-resident batch from its own corpus, serve_bench-style perturb
chaining (no host re-uploads), greedy vs spec_greedy_decode with corpus
trigram draft tables built from the train manifest. Token equality is
asserted per gamma — spec is exact by construction, so any mismatch is a
bug, not noise.

Usage:
  python perf/spec_serve_drive.py <full_model_dir> <train_jsonl> [bs]

Round-4 flagship numbers (WER-0.09-class ft_full checkpoint, bs64,
40 new tokens): greedy int8 463.2 utt/s; spec tables gamma=2 529.2,
gamma=4 538.3 (+16%), gamma=8 481.6 — see BASELINE.md round 4.
"""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

from neuspeech1_tpu import enable_compilation_cache
from neuspeech1_tpu.cli import common
from neuspeech1_tpu.data.collate import Collator
from neuspeech1_tpu.data.dataset import EEGDataset
from neuspeech1_tpu.data.loader import DataLoader
from neuspeech1_tpu.data.manifest import read_jsonlines
from neuspeech1_tpu.decode.generate import GenerationConfig, greedy_decode
from neuspeech1_tpu.decode.spec import build_draft_table, spec_greedy_decode
from neuspeech1_tpu.utils.tokenizer import ByteTokenizer

enable_compilation_cache()

model_dir = sys.argv[1]
train_jsonl = sys.argv[2]
BS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
MAX_NEW = 40

params, config, stem = common.load_full_model(model_dir)
params = common.commit_params(params)
tok = ByteTokenizer(config)
ds = EEGDataset(train_jsonl, tok, mode="test", modal_ch=stem.in_channels)
coll = Collator(pad_id=tok.pad_id, decoder_start_id=config.sot_id)
loader = DataLoader(ds, coll, BS, shuffle=False, device_put=True,
                    drop_last=True)
feats = next(iter(loader))["input_features"]
prompt = np.asarray([tok.prefix_tokens("English", "transcribe")] * BS,
                    np.int32)
gen = GenerationConfig.for_model(
    config, tokenizer=tok, max_length=prompt.shape[1] + MAX_NEW,
    int8_kv_cache=True)
texts = [r["sentence"] for r in read_jsonlines(train_jsonl)]
table = {k: jnp.asarray(v)
         for k, v in build_draft_table(texts, tok, config.vocab_size).items()}


def timed(tag, fn):
    # the warmup decode runs on the UNPERTURBED feats: this is the output
    # used for the greedy-vs-spec token-equality check, so both configs are
    # guaranteed to be decoding the same input (the timed iterations below
    # each perturb from their own previous output, so their final sequences
    # are not comparable across configs)
    out = fn(feats)
    first = np.asarray(out[0] if isinstance(out, tuple) else out)
    iters = int(out[1]) if isinstance(out, tuple) else None
    times = []
    f = feats
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(f)
        seqs = np.asarray(out[0] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
        f = feats * (1.0 + float(seqs[0, -1] + 1) * 1e-9)
    dt = sorted(times)[len(times) // 2]
    rec = {"config": tag, "batch": BS, "new_tokens": MAX_NEW,
           "ms_per_batch": round(dt * 1e3, 1),
           "utterances_per_sec": round(BS / dt, 1)}
    if iters is not None:
        rec["loop_iters"] = iters
    print(json.dumps(rec), flush=True)
    return first


gold = timed("greedy_int8kv",
             lambda f: greedy_decode(params, f, prompt, config, stem, gen))
for g in (2, 4, 8):
    s = timed(f"spec_tbl_g{g}",
              lambda f, g=g: spec_greedy_decode(
                  params, f, prompt, config, stem, gen, gamma=g,
                  draft_table=table))
    assert (s == gold).all(), f"spec gamma={g} diverged from greedy"
    print(json.dumps({"config": f"match_g{g}", "tokens_match": True}),
          flush=True)
