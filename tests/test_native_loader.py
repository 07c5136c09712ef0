"""Native C++ clip loader: build, parity with the Python path, error paths."""

import os

import numpy as np
import pytest

from neuspeech1_tpu.data.native_loader import NativeClipLoader, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


@pytest.fixture(scope="module")
def loader():
    l = NativeClipLoader(num_threads=2)
    yield l
    l.close()


def test_load_f4_and_f8(tmp_path, loader, rng):
    a = rng.standard_normal((4, 50)).astype(np.float32)
    b = rng.standard_normal((6, 80)).astype(np.float64)
    pa, pb = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(pa, a)
    np.save(pb, b)
    out = loader.load_batch([pa, pb], modal_ch=6, n_samples=60)
    assert out.shape == (2, 6, 60)
    # a: 4 channels padded to 6, 50 samples padded to 60
    np.testing.assert_allclose(out[0, :4, :50], a, rtol=1e-6)
    np.testing.assert_array_equal(out[0, 4:], 0.0)
    np.testing.assert_array_equal(out[0, :4, 50:], 0.0)
    # b: f8 converted, 80 samples clipped to 60
    np.testing.assert_allclose(out[1, :, :60], b[:, :60].astype(np.float32),
                               rtol=1e-6)


def test_channel_slice(tmp_path, loader, rng):
    x = rng.standard_normal((10, 30)).astype(np.float32)
    p = str(tmp_path / "x.npy")
    np.save(p, x)
    out = loader.load_batch([p], modal_ch=4, n_samples=30,
                            channel_slice=(2, 6))
    np.testing.assert_allclose(out[0], x[2:6], rtol=1e-6)


def test_missing_file_error(tmp_path, loader):
    with pytest.raises(IOError, match="nonexistent"):
        loader.load_batch([str(tmp_path / "nonexistent.npy")], 4, 10)


def test_parity_with_python_dataset(tmp_path, tiny_corpus, tiny_tok):
    """DataLoader(native_signals=True) must produce identical batches to the
    pure-Python path in eval mode."""
    from neuspeech1_tpu.data.collate import Collator
    from neuspeech1_tpu.data.dataset import EEGDataset
    from neuspeech1_tpu.data.loader import DataLoader

    root, _ = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="eval", modal_ch=8)
    col = Collator(pad_id=tiny_tok.pad_id,
                   decoder_start_id=tiny_tok.config.sot_id)
    py = DataLoader(ds, col, batch_size=4, shuffle=False, prefetch=0)
    nat = DataLoader(ds, col, batch_size=4, shuffle=False, prefetch=0,
                     native_signals=True)
    b1 = next(iter(py))
    b2 = next(iter(nat))
    np.testing.assert_allclose(b1["input_features"], b2["input_features"],
                               rtol=1e-6)
    np.testing.assert_array_equal(b1["labels"], b2["labels"])
    np.testing.assert_array_equal(b1["decoder_input_ids"],
                                  b2["decoder_input_ids"])


def test_native_refused_with_augmentation(tiny_corpus, tiny_tok):
    from neuspeech1_tpu.data.collate import Collator
    from neuspeech1_tpu.data.dataset import EEGDataset
    from neuspeech1_tpu.data.loader import DataLoader

    root, _ = tiny_corpus
    ds = EEGDataset(f"{root}/train.jsonl", tiny_tok, mode="train", modal_ch=8,
                    augment_config={"shift": {"prob": 1.0}})
    col = Collator(pad_id=tiny_tok.pad_id,
                   decoder_start_id=tiny_tok.config.sot_id)
    with pytest.raises(ValueError, match="native"):
        DataLoader(ds, col, batch_size=2, native_signals=True)
