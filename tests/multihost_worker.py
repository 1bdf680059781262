"""Worker process for the 2-process multi-host SPMD test (not a pytest file).

Each process owns ONE cpu device; together they form a 2-device global mesh
over the distributed runtime — the CPU stand-in for multi-host DCN training
(replaces reference train.py:389-458 NCCL process groups). Run by
tests/test_multihost.py:

    python tests/multihost_worker.py <port> <process_id> <num_processes>

Prints "RESULT loss=<float> step=<int>" on success.
"""

import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np

    from speech_masters_thesis_tpu.models.ema import default_mu
    from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh, place_replicated, shard_batch
    from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
    from speech_masters_thesis_tpu.train.loop import make_train_step
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState
    from speech_masters_thesis_tpu.utils.config import Config

    config = Config({
        "model": {
            "_import_": "models.vqvae.vqvae.VQVAE",
            "levels": 1, "downs_t": [2], "strides_t": [2], "emb_width": 8,
            "l_bins": 16, "mu": 0.99, "multipliers": [1], "width": 4, "depth": 1,
            "m_conv": 1.0, "revival_threshold": 1.0, "use_bottleneck": True,
            "dilation_growth_rate": 1, "dilation_cycle": None,
            "kernel_size_growth_rate": 1, "kernel_size_cycle": None,
            "reverse_decoder_dilation": False, "zero_out": True,
            "block_type": "gated_hifi",
            "loss": {"commit": 0.05, "multispectral": 1.0, "l1": 0.0, "l2": 1.0,
                     "linf": 0.0, "linf_topk": 16, "n_ffts": [64],
                     "hop_lengths": [16], "win_lengths": [64], "window": "hann",
                     "log": False},
        },
        "dataset": {"_import_": "datasets.ljspeech.LJSpeech", "sample_rate": 22050,
                    "n_fft": 64, "hop_length": 16, "win_length": 64, "n_mels": 8,
                    "use_token": False, "use_spect": False, "use_audio": True},
        "optimizer": {"name": "adam", "lr": 1e-4, "betas": [0.9, 0.98],
                      "weight_decay": 0, "eps": 1e-9},
        "scheduler": None,
        "train": {"batch_size": 4, "seed": 0, "ema": True},
    })

    mesh = make_data_mesh(jax.devices())  # GLOBAL mesh: nproc devices
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, None)
    state = place_replicated(mesh, TrainState.create(variables, tx, use_ema=True))
    step = make_train_step(model, tx, default_mu(4, nproc), use_ema=True, mesh=mesh)

    # Every process builds the SAME full global batch (seeded loaders do this
    # in training); shard_batch slices each process's addressable rows.
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "audio": rng.uniform(-0.5, 0.5, (4, 128)).astype(np.float32),
        "audio_len": np.full((4,), 128, np.int32),
        "speaker": None,
    })

    key = jax.random.PRNGKey(0)
    for _ in range(2):
        state, scalars = step(state, batch, key)
    loss = float(jax.device_get(scalars["loss"]))
    assert np.isfinite(loss), loss
    print(f"RESULT loss={loss:.6f} step={int(jax.device_get(state.step))}", flush=True)


if __name__ == "__main__":
    main()
