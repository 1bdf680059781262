"""The dryrun's n-vs-1-device equality oracle must actually catch a
sharding bug (VERDICT r3 next #5): corrupt one shard's slice of the global
batch and assert the oracle trips. The happy path is exercised by the
driver's dryrun_multichip run itself (MULTICHIP_r*.json)."""

import numpy as np
import pytest

import __graft_entry__ as graft


def test_equality_oracle_catches_miswired_shard():
    import jax

    from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh

    devices = jax.devices()
    assert len(devices) == 8  # virtual CPU mesh from conftest
    mesh = make_data_mesh(devices)
    mesh1 = make_data_mesh(devices[:1])

    config = graft._tiny_vqvae_config(full_size=False)
    config.train.batch_size = 8
    rng = np.random.RandomState(0)
    # t=1024 matches dryrun_multichip's audio length (both codec downsample
    # factors divide it) — half the conv work of the original t=2048 and the
    # same program shapes the dryrun warms in the persistent cache.
    t = 1024
    batch = {
        "audio": rng.uniform(-0.5, 0.5, (8, t)).astype(np.float32),
        "audio_len": np.full((8,), t, np.int32),
        "speaker": None,
    }

    def miswire(b):
        # what a wrong shard-index / off-by-one sharding bug looks like:
        # one device sees a different example than the logical batch holds
        bad = dict(b)
        audio = b["audio"].copy()
        audio[3] = audio[4]
        bad["audio"] = audio
        return bad

    with pytest.raises(AssertionError, match="mismatch"):
        graft._equality_oracle(config, mesh, mesh1, batch, 8, "vqvae",
                               perturb=miswire)

    # and the clean batch passes
    scal, variables = graft._equality_oracle(config, mesh, mesh1, batch, 8,
                                             "vqvae")
    assert np.isfinite(scal["loss"])
    assert "params" in variables  # init tree returned for the multistep reuse
    make_data_mesh(devices)
