"""Offline preprocessing tests with synthetic BIDS-style fixtures."""

import os

import numpy as np
import pytest

from neuspeech1_tpu.data import preprocess as pp
from neuspeech1_tpu.data.manifest import read_jsonlines


def _write_gwilliams_events(path, n_sent=3, words_per=4):
    rows = ["onset\tduration\ttrial_type"]
    t = 1.0
    for s in range(n_sent):
        for w in range(words_per):
            tt = {
                "kind": "word", "word": f"w{s}{w}", "sequence_id": s,
                "story": "story_a", "story_uid": 1, "sound_id": 7,
                "speech_rate": 1.0, "voice": "x", "sound": "AUDIO/a.wav",
                "start": t,
            }
            rows.append(f"{t}\t0.3\t{tt!r}")
            t += 0.4
        t += 1.0
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def test_detect_outliers():
    ok = np.random.default_rng(0).standard_normal((4, 100))
    assert pp.detect_outliers(ok) is None
    assert pp.detect_outliers(np.zeros((4, 100))) is not None
    bad = ok.copy()
    bad[0, 0] = np.nan
    assert "NaN" in pp.detect_outliers(bad)
    assert pp.detect_outliers(np.empty((4, 0))) is not None


def test_preprocess_clip_matches_reference_formula(rng):
    """Gwilliams variant: RobustScaler fit on first 100 time samples
    (reference `gwilliams2023_process.py:88-106`)."""
    from sklearn.preprocessing import RobustScaler

    x = rng.standard_normal((6, 500)) * 3
    ours, ratio = pp.preprocess_clip(x, threshold=10)
    ref = x.T
    scaler = RobustScaler().fit(ref[:100])
    ref = scaler.transform(ref).T
    ref_ratio = (np.abs(ref) > 10).sum() / ref.size
    ref = np.clip(ref, -10, 10) / 10
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    assert ratio == pytest.approx(ref_ratio)


def test_preprocess_clip_ratio_guard():
    x = np.ones((2, 200))
    x[:, 100:] = 1e6  # wild tail vs calm head -> huge clip ratio
    with pytest.raises(AssertionError, match="clip ratio"):
        pp.preprocess_clip(x, threshold=10)


def test_gwilliams_sentence_assembly(tmp_path):
    tsv = str(tmp_path / "sub-01_task-0_events.tsv")
    _write_gwilliams_events(tsv, n_sent=3, words_per=4)
    sents = pp.get_sequences(tsv)
    assert len(sents) == 3
    assert sents[0]["text"] == "w00 w01 w02 w03"
    assert sents[1]["start"] > sents[0]["end"]
    assert sents[0]["duration"] == pytest.approx(0.4 * 3 + 0.3)


def test_gwilliams_end_to_end(tmp_path, rng):
    tsv = str(tmp_path / "sub-07_task-0_events.tsv")
    _write_gwilliams_events(tsv, n_sent=2, words_per=3)
    raw = rng.standard_normal((8, 200 * 12)).astype(np.float64)

    lines = pp.process_gwilliams_events(
        tsv, str(tmp_path / "out"), raw_loader=lambda: raw
    )
    assert len(lines) == 2
    row = lines[0]
    assert row["language"] == "English"
    assert row["subj"] == 7
    clip = np.load(row["eeg"]["path"])
    assert clip.shape[0] == 8
    assert np.abs(clip).max() <= 1.0
    assert row["sentences"][0]["words"][0]["start"] == pytest.approx(0.0)
    # manifest written alongside
    info = read_jsonlines(str(tmp_path / "out" / "info.jsonl"))
    assert len(info) == 2


def test_schoffelen_tsv_parsing(tmp_path):
    tsv = str(tmp_path / "sub-A2021_task-auditory_events.tsv")
    rows = [
        "sample\ttype\tvalue",
        "0\tTrigger\tZINNEN",
        "100\tSound\tEQ_Ramp_Int2_Int1LPF012.wav",
        "900\tNothing\tEnd of file blah",
        "1000\tTrigger\tWOORDEN",
        "1100\tSound\tEQ_Ramp_Int2_Int1LPF034.wav",
        "1900\tNothing\tEnd of file blah",
    ]
    open(tsv, "w").write("\n".join(rows) + "\n")
    stimuli = {"12": "de kat zat op de mat", "34": "woord lijst hier"}
    sents = pp.read_tsv_auditory(tsv, stimuli, "/nonexistent")
    assert len(sents) == 2
    assert sents[0]["type"] == "ZINNEN"
    assert sents[0]["text"] == "de kat zat op de mat"
    assert sents[0]["onset"] == 100 and sents[0]["offset"] == 900
    assert sents[1]["type"] == "WOORDEN"


def test_schoffelen_end_to_end(tmp_path, rng):
    tsv = str(tmp_path / "sub-A2021_task-auditory_events.tsv")
    rows = [
        "sample\ttype\tvalue",
        "0\tTrigger\tZINNEN",
        "1200\tSound\tEQ_Ramp_Int2_Int1LPF012.wav",
        "3600\tNothing\tEnd of file x",
    ]
    open(tsv, "w").write("\n".join(rows) + "\n")
    stimuli = {"12": "de kat zat"}
    orig_sr = 1200.0
    raw = rng.standard_normal((5, 200 * 10)).astype(np.float64)
    lines = pp.process_schoffelen_events(
        tsv, str(tmp_path / "out"), raw_loader=lambda: (raw, orig_sr),
        stimuli=stimuli, audio_dir="/nonexistent",
    )
    assert len(lines) == 1
    assert lines[0]["language"] == "Dutch"
    assert lines[0]["sent_type"] == "ZINNEN"
    assert lines[0]["subj"] == "2021"
    assert lines[0]["duration"] == pytest.approx((3600 - 1200) / 1200, abs=0.01)


def test_raw_npy_dsp_chain(tmp_path, rng):
    """The scipy raw path: notch + bandpass + resample."""
    t = np.arange(4000) / 400.0
    sig = (np.sin(2 * np.pi * 5 * t) + np.sin(2 * np.pi * 50 * t))[None, :]
    path = str(tmp_path / "raw.npy")
    np.save(path, sig)
    out = pp.load_raw_npy(path, orig_sr=400, l_freq=1, h_freq=30,
                          notch_hz=50, target_sr=200)
    assert out.shape == (1, 2000)
    spec = np.abs(np.fft.rfft(out[0]))
    freqs = np.fft.rfftfreq(out.shape[1], 1 / 200)
    assert spec[np.argmin(abs(freqs - 50))] < 0.05 * spec[np.argmin(abs(freqs - 5))]
