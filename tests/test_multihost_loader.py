"""Multi-host data sharding of the DataLoader (`data/loader.py:87-89`):
each process sees the [process_index::process_count] slice of every global
batch, batch order is identical across hosts, and the union reconstructs
each global batch exactly once."""

import numpy as np
import pytest

from neuspeech1_tpu.config import tiny_config
from neuspeech1_tpu.data.collate import Collator
from neuspeech1_tpu.data.loader import DataLoader
from neuspeech1_tpu.data.synthetic import make_synthetic_corpus
from neuspeech1_tpu.data.dataset import EEGDataset
from neuspeech1_tpu.utils.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def corpus_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh") / "corpus")
    make_synthetic_corpus(root, n_clips=16, n_channels=4, seed=2,
                          min_dur=0.5, max_dur=0.6)
    tok = ByteTokenizer(tiny_config())
    ds = EEGDataset(f"{root}/train.jsonl", tok, mode="eval", modal_ch=4,
                    max_duration=0.64)
    return ds, tok


def _loader(ds, tok, pi, pc, bs=8):
    col = Collator(pad_id=tok.pad_id, decoder_start_id=tok.config.sot_id,
                   max_label_len=32)
    return DataLoader(ds, col, batch_size=bs, shuffle=True, seed=7,
                      drop_last=True, process_index=pi, process_count=pc,
                      num_threads=1, prefetch=1)


def test_two_host_shards_partition_each_global_batch(corpus_ds):
    ds, tok = corpus_ds
    global_batches = [b["_indices"] for b in _loader(ds, tok, 0, 1)]
    h0 = [b["_indices"] for b in _loader(ds, tok, 0, 2)]
    h1 = [b["_indices"] for b in _loader(ds, tok, 1, 2)]
    assert len(h0) == len(h1) == len(global_batches)
    for g, a, b in zip(global_batches, h0, h1):
        # per-host shards are strided slices of the SAME global batch
        np.testing.assert_array_equal(a, g[0::2])
        np.testing.assert_array_equal(b, g[1::2])
        # disjoint union == global batch
        assert sorted(np.concatenate([a, b]).tolist()) == sorted(g.tolist())
        assert a.shape[0] == b.shape[0] == g.shape[0] // 2


def test_four_host_shapes_and_order_stability(corpus_ds):
    ds, tok = corpus_ds
    shards = [[b["_indices"] for b in _loader(ds, tok, pi, 4)]
              for pi in range(4)]
    n_batches = len(shards[0])
    assert all(len(s) == n_batches for s in shards)
    for bi in range(n_batches):
        union = np.concatenate([shards[pi][bi] for pi in range(4)])
        assert len(set(union.tolist())) == len(union)  # no duplicates
        assert all(shards[pi][bi].shape[0] == 2 for pi in range(4))


def test_uneven_batch_size_rejected(corpus_ds):
    ds, tok = corpus_ds
    with pytest.raises(ValueError):
        _loader(ds, tok, 0, 3, bs=8)  # 8 % 3 != 0
