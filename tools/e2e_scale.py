"""End-to-end input-pipeline measurement at corpus scale (VERDICT r2 item 6).

Round-2 e2e numbers came from 96-256-clip toy corpora; this drives the REAL
train.py CLI over a ~2,000-clip synthetic corpus (make_synth_dataset) for
each model family and reports steady-state epoch rate, the loader-blocked
fraction (from train/loop.py's honest epoch log), and peak RSS.

Usage:
    python -m scripts.make_synth_dataset --out data/synth2k \
        --cmudict data/cmudict.dict --n 2000 --min_sec 2.0 --max_sec 8.0
    python -m tools.e2e_scale [--corpus data/synth2k] [--epochs 2]

Prints one JSON line per run; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import resource
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATASET_TMPL = """
dataset:
    _import_: datasets.ljspeech.LJSpeech
    dataset_path: {corpus}
    cmudict_path: {cmudict}
    sample_rate: 22050
    n_fft: 1024
    hop_length: 256
    win_length: 1024
    n_mels: 80
    intersperse_blanks: true
    segment_length: {segment}
    use_token: true
    use_spect: true
    use_audio: true
    on_device_spect: {on_device_spect}
"""

RUNS = [
    # (name, model config, batch, segment_length samples, on_device_spect)
    ("vqvae_tpu", "configs/models/vqvae_tpu.yaml", 16, 66048, False),
    ("glow_tts_tpu", "configs/models/glow_tts_tpu.yaml", 8, 66048, True),
    ("vqtts_tpu", "configs/models/vqtts_tpu.yaml", 4, 44032, False),
]

EPOCH_RE = re.compile(
    r"epoch (\d+): (\d+) steps in ([0-9.]+)s \(([0-9.]+) steps/s end-to-end; "
    r"([0-9.]+)s = (\d+)% blocked on input pipeline\)")


def run_one(name, model_cfg, batch, segment, on_device, corpus, cmudict, epochs):
    with tempfile.TemporaryDirectory() as tmp:
        ds_yaml = os.path.join(tmp, "ds.yaml")
        with open(ds_yaml, "w") as f:
            f.write(DATASET_TMPL.format(corpus=corpus, cmudict=cmudict,
                                        segment=segment,
                                        on_device_spect=str(on_device).lower()))
        log_dir = os.path.join(tmp, "logs")
        cmd = [sys.executable, "train.py",
               "--model", model_cfg, "--dataset", ds_yaml,
               "--log_dir", log_dir, "--batch_size", str(batch), "--bf16",
               "--num_workers", "4", "--prng_impl", "rbg",
               "--total_epochs", str(epochs),
               "--log_every_n_steps", "50", "--ckpt_every_n_steps", str(10 ** 9),
               "--eval_every_n_epochs", str(10 ** 9)]
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              timeout=3000)
        rss_kb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
        epochs_seen = EPOCH_RE.findall(proc.stdout + proc.stderr)
        record = {
            "metric": f"e2e_scale_{name}",
            "corpus_clips": len(os.listdir(os.path.join(corpus, "wavs"))),
            "batch": batch,
            "returncode": proc.returncode,
            "peak_rss_gb": round(rss_kb / 1e6, 2),
            "epochs": [
                {"epoch": int(e), "steps": int(n), "secs": float(s),
                 "steps_per_s": float(r), "input_blocked_pct": int(p)}
                for (e, n, s, r, _bs, p) in epochs_seen
            ],
        }
        if proc.returncode != 0:
            record["stderr_tail"] = proc.stderr[-1500:]
        # steady state = last epoch (first is compile-bound)
        if record["epochs"]:
            record["steady_steps_per_s"] = record["epochs"][-1]["steps_per_s"]
        return record


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=os.path.join(REPO, "data", "synth2k"))
    ap.add_argument("--cmudict", default=os.path.join(REPO, "data", "cmudict.dict"))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--only", default=None, help="run a single config by name")
    args = ap.parse_args()

    for name, cfg, batch, seg, ods in RUNS:
        if args.only and name != args.only:
            continue
        rec = run_one(name, cfg, batch, seg, ods, args.corpus, args.cmudict,
                      args.epochs)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
