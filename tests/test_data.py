"""Data layer tests: synthetic LJSpeech corpus -> loaders -> batches; VQLatent."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from speech_masters_thesis_tpu.data.ljspeech import LJSpeech, TRUNC_MOD
from speech_masters_thesis_tpu.data.vqlatent import BOS, OFFSET, PAD, VQLatent
from speech_masters_thesis_tpu.data.batching import DataLoader
from speech_masters_thesis_tpu.utils.audio_io import load_wav, save_wav
from speech_masters_thesis_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    out = root / "LJSpeech-1.1"
    cmudict = root / "cmudict.dict"
    subprocess.run(
        [sys.executable, "-m", "scripts.make_synth_dataset", "--out", str(out),
         "--cmudict", str(cmudict), "--n", "14", "--min_sec", "0.5", "--max_sec", "1.2"],
        cwd=REPO, check=True,
    )
    return str(out), str(cmudict)


def make_config(synth_corpus, segment_length=-1):
    out, cmudict = synth_corpus
    return Config({
        "dataset": {
            "_import_": "datasets.ljspeech.LJSpeech",
            "dataset_path": out, "cmudict_path": cmudict,
            "sample_rate": 22050, "n_fft": 1024, "hop_length": 256,
            "win_length": 1024, "n_mels": 80, "intersperse_blanks": True,
            "segment_length": segment_length,
            "use_token": True, "use_spect": True, "use_audio": True,
        },
        "train": {"batch_size": 2, "seed": 0},
    })


def test_wav_roundtrip(tmp_path):
    audio = np.sin(np.linspace(0, 100, 22050)).astype(np.float32) * 0.7
    path = str(tmp_path / "x.wav")
    save_wav(path, audio, 22050)
    loaded = load_wav(path, 22050)
    assert loaded.shape == audio.shape
    np.testing.assert_allclose(loaded, audio, atol=1e-3)


def test_ljspeech_split_and_item(synth_corpus):
    config = make_config(synth_corpus)
    train = LJSpeech(config, "train")
    val = LJSpeech(config, "val")
    assert len(val) == 10  # first 10 clips are val (reference ljspeech.py:40-45)
    assert len(train) == 4
    item = train[0]
    assert item["audio"].shape[-1] % TRUNC_MOD == 0
    assert item["spect"].shape[1] == 80
    assert item["spect"].shape[0] == item["audio"].shape[-1] // 256
    # interspersed blanks: odd length, even positions are the blank id
    token = item["token"]
    assert len(token) % 2 == 1
    blank = token[0]
    assert (token[0::2] == blank).all()


def test_ljspeech_segment_cropping(synth_corpus):
    config = make_config(synth_corpus, segment_length=4096)
    train = LJSpeech(config, "train")
    item = train[0]
    assert item["audio"].shape[-1] <= 4096


def test_dataloader_end_to_end(synth_corpus):
    config = make_config(synth_corpus)
    loader = DataLoader(LJSpeech(config, "val"), batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3  # ceil(10/4), last batch wrap-padded to 4
    for batch in batches:
        assert batch["audio"].shape[0] == 4
        assert batch["audio"].shape[1] % 4096 == 0
        assert batch["spect"].shape[2] == 80
        assert (batch["audio_len"] <= batch["audio"].shape[1]).all()


def test_vqlatent_dataset(tmp_path):
    # fabricate a VQ-latent corpus in the generate_vq_dataset output format
    factor, vocab = 64, 16
    os.makedirs(tmp_path / "train")
    rng = np.random.RandomState(0)
    for i in range(4):
        n_codes = rng.randint(20, 40)
        pkl = {"x": rng.uniform(-1, 1, n_codes * factor).astype(np.float32),
               "q": rng.randint(0, vocab, n_codes).tolist()}
        with open(tmp_path / "train" / f"{i}.pkl", "wb") as f:
            pickle.dump(pkl, f)
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump({"compression_factor": factor, "vocab_size": vocab}, f)

    config = Config({
        "model": {"vocab_size": vocab},
        "dataset": {
            "_import_": "datasets.vqlatent.VQLatent",
            "dataset_path": str(tmp_path), "sample_rate": 22050, "n_fft": 1024,
            "hop_length": 256, "win_length": 1024, "n_mels": 80,
            "intersperse_blanks": True, "segment_length": 16,
            "remove_consecutive": False,
            "use_token": True, "use_spect": False, "use_audio": True,
        },
    })
    ds = VQLatent(config, "train")
    item = ds[0]
    token = item["token"]
    assert token[0] == BOS
    assert token.shape[-1] == 16 + 2  # segment + BOS + pad slot
    assert (token[1:] >= OFFSET).sum() == 16  # valid codes are offset
    assert item["audio"].shape[-1] == 16 * factor
    # token/audio alignment preserved under cropping
    assert int(token.max()) < vocab + OFFSET


def test_vqlatent_remove_consecutive(tmp_path):
    factor, vocab = 4, 8
    os.makedirs(tmp_path / "train")
    pkl = {"x": np.zeros(10 * factor, np.float32), "q": [3, 3, 5, 5, 5, 2, 3, 3, 1, 1]}
    with open(tmp_path / "train" / "0.pkl", "wb") as f:
        pickle.dump(pkl, f)
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump({"compression_factor": factor, "vocab_size": vocab}, f)
    config = Config({
        "model": {"vocab_size": vocab},
        "dataset": {"_import_": "datasets.vqlatent.VQLatent", "dataset_path": str(tmp_path),
                    "sample_rate": 22050, "n_fft": 1024, "hop_length": 256,
                    "win_length": 1024, "n_mels": 80, "intersperse_blanks": False,
                    "segment_length": -1, "remove_consecutive": True,
                    "use_token": True, "use_spect": False, "use_audio": True},
    })
    ds = VQLatent(config, "train")
    token = ds[0]["token"]
    np.testing.assert_array_equal(token, np.asarray([BOS, 3, 5, 2, 3, 1]) + np.asarray([0] + [OFFSET] * 5))


def test_native_wav_reader_matches_scipy(tmp_path):
    """C decoder (native/wavio.c) vs scipy on a PCM WAV, plus the write path."""
    from speech_masters_thesis_tpu import native
    from scipy.io import wavfile

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")

    audio = (np.sin(np.linspace(0, 80, 30000)) * 0.6).astype(np.float32)
    path = str(tmp_path / "n.wav")
    pcm = (audio * 32767.0).astype(np.int16)
    wavfile.write(path, 22050, pcm)

    decoded = native.read_wav(path)
    assert decoded is not None
    native_audio, sr = decoded
    assert sr == 22050
    ref = pcm.astype(np.float32) / 32768.0
    np.testing.assert_allclose(native_audio, ref, atol=1e-6)

    # native write -> native read roundtrip
    out = str(tmp_path / "w.wav")
    assert native.write_wav(out, audio, 22050)
    again = native.read_wav(out)
    assert again is not None
    np.testing.assert_allclose(again[0], audio, atol=1e-3)
