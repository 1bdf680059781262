"""Training entry point.

TPU-native rebuild of reference train.py:47-573. CLI flags, the three-source
config merge, the logdir layout, checkpoint cadence and validation schedule
are preserved; the runtime underneath is SPMD over a JAX device mesh
(single process drives all local chips; multi-host via
--multihost_coordinator) instead of process-per-GPU NCCL DDP.

Usage (same as reference):
    python train.py --model vqvae --dataset ljspeech --log_dir ./logs/vqvae
"""

from __future__ import annotations

import argparse
import logging
import os

from speech_masters_thesis_tpu.utils.logging_config import setup_logging

setup_logging()  # honors ./logger.conf / $SMT_LOGGER_CONF (reference parity)
logger = logging.getLogger("train")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="vqvae",
                        help="Name of model config in configs/models")
    parser.add_argument("--dataset", type=str, default="ljspeech",
                        help="Name of dataset config in configs/datasets")
    parser.add_argument("--log_dir", type=str, default="./logs/vqvae")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="GLOBAL batch size (split across chips)")
    parser.add_argument("--ema", default=False, action="store_true")
    parser.add_argument("--grad_clip_norm", type=float, default=None)
    parser.add_argument("--fp16", default=False, action="store_true",
                        help="Accepted for CLI parity; TPU matmuls already run "
                             "bf16 on the MXU and need no loss scaling")
    parser.add_argument("--bf16", default=False, action="store_true",
                        help="Run model activations in bfloat16")
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--n_devices", "--n_gpus", dest="n_devices", type=int, default=-1)
    parser.add_argument("--total_epochs", type=int, default=1000)
    parser.add_argument("--load_ckpt", type=str, default=None)
    parser.add_argument("--ckpt_every_n_steps", type=int, default=10000)
    parser.add_argument("--log_every_n_steps", type=int, default=10)
    parser.add_argument("--eval_every_n_epochs", type=int, default=5)
    parser.add_argument("--run_sanity_val_epoch", default=False, action="store_true")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="Optional hard step cap (smoke tests)")
    parser.add_argument("--total_steps", type=int, default=None,
                        help="Annealing horizon for scheduler: cosine (T_max)")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="Capture a device trace of the first N train steps")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="Run K train steps per host dispatch (lax.scan "
                             "inside one program) to amortize the fixed "
                             "dispatch cost of small steps; per-step PRNG "
                             "streams and update math match K=1 (equality "
                             "tested). Requires constant batch shapes "
                             "(fixed-segment/fixed-token datasets)")
    parser.add_argument("--prng_impl", type=str, default="threefry",
                        choices=["threefry", "rbg"],
                        help="JAX PRNG implementation. 'rbg' uses the "
                             "TPU-friendly generator: measured 1.9x faster LM "
                             "train step (threefry dropout bits were ~46%% of "
                             "it). Same Bernoulli/Gaussian laws, different "
                             "stream; resume must keep the same impl")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX backend (e.g. 'cpu'); default: auto")
    parser.add_argument("--multihost_coordinator", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=1)
    parser.add_argument("--process_id", type=int, default=0)
    return parser.parse_args()


def build_config(args):
    from speech_masters_thesis_tpu.utils.config import Config, load_config
    repo_root = os.path.dirname(os.path.abspath(__file__))
    # --model/--dataset accept either a config name or a path to a YAML file
    model_path = args.model if args.model.endswith(".yaml") \
        else os.path.join(repo_root, "configs", "models", f"{args.model}.yaml")
    dataset_path = args.dataset if args.dataset.endswith(".yaml") \
        else os.path.join(repo_root, "configs", "datasets", f"{args.dataset}.yaml")
    model_config = load_config(model_path)
    dataset_config = load_config(dataset_path)
    train_config = Config({
        "train": {
            "log_dir": args.log_dir,
            "seed": args.seed,
            "batch_size": args.batch_size,
            "ema": args.ema,
            "grad_clip_norm": args.grad_clip_norm,
            "fp16": args.fp16,
            "bf16": args.bf16,
            "num_workers": args.num_workers,
            "n_devices": args.n_devices,
            "total_epochs": args.total_epochs,
            "load_ckpt": args.load_ckpt,
            "ckpt_every_n_steps": args.ckpt_every_n_steps,
            "log_every_n_steps": args.log_every_n_steps,
            "eval_every_n_epochs": args.eval_every_n_epochs,
            "run_sanity_val_epoch": args.run_sanity_val_epoch,
            "max_steps": args.max_steps,
            "total_steps": args.total_steps,
            "profile_steps": args.profile_steps,
            "steps_per_dispatch": args.steps_per_dispatch,
        }
    })
    return model_config.merge(dataset_config, train_config)


def main():
    args = parse_args()

    import jax

    if args.platform:
        # NOTE: must be the config API; this image's TPU plugin overrides the
        # JAX_PLATFORMS env var (see tests/conftest.py). Must run BEFORE
        # initialize_multihost, whose collective barrier initializes backends.
        jax.config.update("jax_platforms", args.platform)

    from speech_masters_thesis_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(args.multihost_coordinator, args.num_processes, args.process_id)
    if args.prng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", args.prng_impl)
    from tensorboardX import SummaryWriter

    from speech_masters_thesis_tpu.models.base import TASK_OUTPUT
    from speech_masters_thesis_tpu.models.ema import default_mu
    from speech_masters_thesis_tpu.parallel.mesh import (
        enable_compilation_cache,
        make_data_mesh,
        place_replicated,
    )
    from speech_masters_thesis_tpu.train.artifacts import (
        save_audio_and_computed_spect,
        save_spect_and_inverted_audio,
    )
    from speech_masters_thesis_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from speech_masters_thesis_tpu.train.harness import (
        frozen_param_mask,
        get_dataloaders,
        get_model,
        init_model_variables,
        load_pretrained_submodules,
        print_top_level_summary,
    )
    from speech_masters_thesis_tpu.train.loop import (
        make_train_multistep,
        make_train_step,
        make_val_step,
        train_epoch,
        val_epoch,
    )
    from speech_masters_thesis_tpu.train.optim import build_optimizer
    from speech_masters_thesis_tpu.train.state import TrainState
    from speech_masters_thesis_tpu.utils.config import setup_logdir

    config = build_config(args)
    enable_compilation_cache()

    # seed host-side RNGs (dataset crops use `random`; loaders use numpy) —
    # counterpart of reference seed_all_rng (utils/train_utils.py:62-71);
    # device randomness is explicit PRNG keys below
    import random as _random

    import numpy as _np
    _random.seed(config.train.seed)
    _np.random.seed(config.train.seed)

    devices = jax.devices()
    if config.train.n_devices > 0:
        devices = devices[:config.train.n_devices]
    logger.info("Training on %d %s device(s)", len(devices), devices[0].platform)
    if config.train.fp16:
        logger.info("--fp16 requested: TPU runs bf16 MXU matmuls natively; no GradScaler needed.")
    assert config.train.batch_size % len(devices) == 0, \
        f"Global batch {config.train.batch_size} must divide across {len(devices)} devices"

    mesh = make_data_mesh(devices)
    setup_logdir(config)
    writer = SummaryWriter(config.train.log_dir) if jax.process_index() == 0 else None

    model = get_model(config)
    rng = jax.random.PRNGKey(config.train.seed)
    variables = init_model_variables(model, config, rng)
    variables = load_pretrained_submodules(model, variables, config)
    print_top_level_summary(model, variables)

    # DDI (data-dependent init, e.g. GlowTTS ActNorm): one eager batch before jit
    train_loader, val_loader = get_dataloaders(config)
    ddi_ran = False
    if config.model.get("ddi", False) and not config.train.load_ckpt and hasattr(model, "ddi_init"):
        logger.info("Running DDI ...")
        batch = next(iter(train_loader))
        variables = model.ddi_init(variables, batch)
        ddi_ran = True

    tx, schedule = build_optimizer(config, config.train.grad_clip_norm,
                                   frozen_mask=frozen_param_mask(model, variables["params"]))
    state = TrainState.create(variables, tx, use_ema=config.train.ema)
    state = place_replicated(mesh, state)

    global_step, epoch = 0, 0
    if config.train.load_ckpt:
        state, global_step, epoch = restore_checkpoint(config.train.load_ckpt, state)
        logger.info("Restored checkpoint %s at step %d epoch %d",
                    config.train.load_ckpt, global_step, epoch)
    elif ddi_ran:
        # DDI result is checkpointed as ckpt.0 (reference utils/train_utils.py:58).
        # Orbax saves are collective: EVERY process must call save in lockstep
        # (orbax writes once on the primary and barriers internally); a
        # process-0-only call desynchronizes the gloo/DCN collective stream.
        save_checkpoint(config, 0, 0, state)

    ema_mu = default_mu(config.train.batch_size, 1)
    train_step = make_train_step(model, tx, ema_mu, config.train.ema, mesh,
                                 bf16=config.train.bf16)
    train_multistep = None
    if int(config.train.get("steps_per_dispatch", 1) or 1) > 1:
        train_multistep = make_train_multistep(
            model, tx, ema_mu, config.train.ema,
            int(config.train.steps_per_dispatch), mesh, bf16=config.train.bf16)
        logger.info("Dispatching %d train steps per host call (lax.scan)",
                    int(config.train.steps_per_dispatch))
    val_step = make_val_step(model, config.train.ema)
    artifact_fn = (save_audio_and_computed_spect if TASK_OUTPUT[type(model).TASK] == "waveform"
                   else save_spect_and_inverted_audio)
    if jax.process_index() != 0:
        # val compute runs on every process (SPMD lockstep); only process 0
        # writes artifacts/TB (reference gates val on rank 0, train.py:366-375)
        artifact_fn = None

    def ckpt_cb(st, gs, ep):
        # all processes call save in lockstep (orbax collective, see above)
        save_checkpoint(config, gs, ep, st)

    if config.train.run_sanity_val_epoch:
        logger.info("Running sanity val epoch")
        stats = val_epoch(state=state, epoch=epoch, config=config, mesh=mesh,
                          val_step=val_step, dataloader=val_loader, writer=writer,
                          artifact_fn=artifact_fn)
        logger.info("Sanity val epoch done: %s", stats)

    step_rng = jax.random.PRNGKey(config.train.seed + 1)
    try:
        while epoch < config.train.total_epochs:
            state, global_step = train_epoch(
                state=state, global_step=global_step, epoch=epoch, config=config,
                mesh=mesh, train_step=train_step, dataloader=train_loader,
                rng=step_rng, writer=writer, save_ckpt=ckpt_cb,
                train_multistep=train_multistep,
            )
            epoch += 1
            if epoch % config.train.eval_every_n_epochs == 0:
                val_epoch(state=state, epoch=epoch, config=config, mesh=mesh,
                          val_step=val_step, dataloader=val_loader, writer=writer,
                          artifact_fn=artifact_fn)
            if config.train.max_steps and global_step >= config.train.max_steps:
                logger.info("Reached max_steps=%d", config.train.max_steps)
                break
    except KeyboardInterrupt:
        # clean shutdown: still save the final checkpoint below
        # (reference train.py:454-458 catches KeyboardInterrupt per rank)
        logger.info("Interrupted at step %d; saving final checkpoint", global_step)

    save_checkpoint(config, global_step, -1, state)
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
