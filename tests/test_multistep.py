"""steps_per_dispatch: K scanned train steps per host dispatch must be
step-for-step identical to K sequential dispatches (same PRNG streams via
the state.step fold, same optimizer/EMA/codebook transitions), with the
epoch loop handling remainders and cadences correctly."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train_integration import TINY_TRAIN, make_batch

from speech_masters_thesis_tpu.models.ema import default_mu
from speech_masters_thesis_tpu.parallel.mesh import make_data_mesh, shard_batch
from speech_masters_thesis_tpu.train.harness import get_model, init_model_variables
from speech_masters_thesis_tpu.train.loop import (
    _concat_batches,
    make_train_multistep,
    make_train_step,
    train_epoch,
)
from speech_masters_thesis_tpu.train.optim import build_optimizer
from speech_masters_thesis_tpu.train.state import TrainState
from speech_masters_thesis_tpu.utils.config import Config


@pytest.fixture(scope="module")
def setup():
    config = Config(TINY_TRAIN)
    mesh = make_data_mesh()
    model = get_model(config)
    variables = init_model_variables(model, config, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(config, config.train.grad_clip_norm)

    def fresh_state():
        copied = jax.tree.map(jnp.array, variables)
        return TrainState.create(copied, tx, use_ema=True)

    train_step = make_train_step(model, tx, default_mu(8, 8), use_ema=True, mesh=mesh)
    multistep = make_train_multistep(model, tx, default_mu(8, 8), use_ema=True,
                                     steps_per_dispatch=2, mesh=mesh)
    return config, mesh, model, tx, fresh_state, train_step, multistep


def test_multistep_equals_sequential(setup):
    config, mesh, model, tx, fresh_state, train_step, multistep = setup
    batches = [make_batch(seed=i) for i in range(4)]
    rng = jax.random.PRNGKey(7)

    seq_state = fresh_state()
    seq_losses = []
    for b in batches:
        seq_state, scalars = train_step(seq_state, shard_batch(mesh, b), rng)
        seq_losses.append(float(scalars["loss"]))

    multi_state = fresh_state()
    multi_losses = []
    for lo in (0, 2):
        stacked = shard_batch(mesh, _concat_batches(batches[lo:lo + 2]))
        multi_state, scalars = multistep(multi_state, stacked, rng)
        multi_losses.extend(np.asarray(scalars["loss"]).tolist())
        assert np.asarray(scalars["finite"]).shape == (2,)

    # same PRNG fold (state.step carries through the scan) => same steps
    np.testing.assert_allclose(multi_losses, seq_losses, rtol=2e-6)
    assert int(multi_state.step) == int(seq_state.step) == 4
    # The scanned and standalone programs fuse differently, so reductions
    # reassociate: last-ulp per-step differences, amplified through Adam's
    # normalized update (and occasionally a VQ argmin near-tie) on the
    # near-zero zero_out-initialized params — observed max ~1e-6 absolute
    # on isolated elements after 4 steps. A structural divergence (wrong
    # PRNG stream, skipped codebook transition) shifts MOST elements by
    # O(update) ~ 1e-4 and breaks the per-step loss equality above (losses
    # at steps 2-3 depend on the updates from steps 0-1), so the sharp
    # check is the loss trajectory; the tree check guards gross breakage.
    for name, a, b in [("params", seq_state.params, multi_state.params),
                       ("ema", seq_state.ema_params, multi_state.ema_params),
                       ("model_state", seq_state.model_state, multi_state.model_state)]:
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-3, atol=2e-5), a, b)


def test_epoch_loop_remainder_and_cadence(setup):
    config, mesh, model, tx, fresh_state, train_step, multistep = setup
    cfg = copy.deepcopy(TINY_TRAIN)
    cfg["train"]["steps_per_dispatch"] = 2
    cfg["train"]["log_every_n_steps"] = 2
    config2 = Config(cfg)

    # 5 equal-shape batches with k=2: two multistep dispatches + 1 remainder
    loader = [make_batch(seed=i) for i in range(5)]
    state, global_step = train_epoch(
        state=fresh_state(), global_step=0, epoch=0, config=config2, mesh=mesh,
        train_step=train_step, dataloader=loader, rng=jax.random.PRNGKey(7),
        progress=False, train_multistep=multistep)
    assert global_step == 5
    assert int(state.step) == 5


def test_concat_batches_rejects_ragged_shapes():
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        _concat_batches([make_batch(t=2048), make_batch(t=1024)])


def test_concat_batches_passes_elided_features():
    out = _concat_batches([make_batch(seed=0), make_batch(seed=1)])
    assert out["speaker"] is None
    assert out["audio"].shape[0] == 16
