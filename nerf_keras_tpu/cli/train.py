"""Shared training loop behind all four train_* entry points.

Mirrors the reference's template (train_lego.py:22-284): config load, data
prep, per-epoch train/val metrics, per-eval checkpoint + 3-panel PNG +
history JSON, dual local/GCS output — in one implementation instead of four
near-identical 300-line scripts (SURVEY.md §2.4), with true resume.
"""

from __future__ import annotations

import argparse
import datetime
import math
import signal
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from nerf_keras_tpu.config import NeRFConfig, config_name, load_config
from nerf_keras_tpu.data.pipeline import RayDataset, iterate_batches
from nerf_keras_tpu.engine.trainer import Trainer
from nerf_keras_tpu.utils import io
from nerf_keras_tpu.utils.cache import maybe_enable_compilation_cache
from nerf_keras_tpu.utils.checkpoint import checkpoint_name, save_checkpoint
from nerf_keras_tpu.utils.image_metrics import ssim
from nerf_keras_tpu.utils.metrics import History
from nerf_keras_tpu.utils.viz import save_panel

# GCS layout mirrors the reference (train_lego.py:59-61).
GCS_BUCKET_NAME = "keras-models"
GCS_MODEL_DIR = f"gs://{GCS_BUCKET_NAME}/nerf/models"
GCS_IMAGE_DIR = f"gs://{GCS_BUCKET_NAME}/nerf/images"

# Auto-resolved schedule horizons (LR decay, proposal anneal) cap at this
# many epochs' worth of steps instead of stretching to the full run:
# auto-stretch past ~80 epochs is a measured seed lottery (200-epoch s7
# collapse 22.79 -> 17.96, docs/evidence/long_horizon_quality.json), and
# the pinned ~80-epoch horizon made every tried seed rise monotonically
# through ep200.  --no-pin-schedules opts out; explicit LR_DECAY_STEPS/
# _EPOCHS always win.
VALIDATED_HORIZON_EPOCHS = 80

# An eval this many dB below the run's best val PSNR prints the collapse
# warning (the documented late-decay failure modes lose 2-8 dB).
COLLAPSE_WARN_DB = 2.0


def build_arg_parser(default_config: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # the reference's single flag (train_lego.py:25-27)
    p.add_argument("--config", type=str, default=default_config)
    # extensions (the reference hardcodes all of these)
    p.add_argument("--data-dir", type=str, default=None,
                   help="dataset root override")
    p.add_argument("--scene", type=str, default=None,
                   help="scene name within the dataset root (loaders that "
                        "support multi-scene roots, e.g. nerf_synthetic)")
    p.add_argument("--views", type=int, default=None,
                   help="number of capture views (loaders that generate "
                        "their capture, e.g. the procedural synthetic "
                        "scene; multi-object scenes need more views than "
                        "the 12-view default — docs/TRAINING.md)")
    p.add_argument("--run-dir", type=str, default=None,
                   help="output run directory override")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint to resume from (params+optimizer+step)")
    p.add_argument("--epochs", type=int, default=None,
                   help="override config EPOCHS")
    p.add_argument("--eval-every", type=int, default=None,
                   help="epochs between eval/checkpoint/panel")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu'); overrides the "
                        "environment's default backend before initialization")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace (TensorBoard-loadable "
                        "XLA op/HBM breakdown) of the first --profile-steps "
                        "train steps into DIR, then continue training "
                        "normally; process 0 only on multi-host")
    p.add_argument("--no-pin-schedules", action="store_true",
                   help="let auto-resolved schedule horizons (LR_FINAL "
                        "decay, PROP_ANNEAL_STEPS=-1) stretch to the full "
                        "run instead of capping at the validated ~80-epoch "
                        "step count (capping is the measured long-run "
                        "stability rule, docs/TRAINING.md)")
    p.add_argument("--profile-steps", type=int, default=20,
                   help="train steps inside the --profile trace window "
                        "(default 20 — a full flagship epoch is thousands "
                        "of steps and would produce a multi-GB trace)")
    return p


def resolve_eval_every(
    cli_value: int | None, cfg: NeRFConfig, default: int
) -> int:
    """Eval cadence precedence: CLI flag > explicit EVAL_EVERY in the config
    (including an explicit 1) > the entry point's reference-matching default
    (1 for train_lego/train_fern, 50/10 for the TPU scripts)."""
    if cli_value is not None:
        if cli_value < 1:
            raise SystemExit(
                f"--eval-every must be >= 1, got {cli_value}"
            )
        return cli_value
    if cfg.eval_every is not None:
        return cfg.eval_every
    return default


CHAIN_MIN_EPOCHS = 150  # measured crossover of the hierarchical-chain
# quality recipe: at 80 epochs chain-u6464 trails the coarse baseline at
# one seed class (s7 24.83 vs 25.43, docs/evidence/hier_prop_quality.json)
# and only passes it at EVERY seed once resumed to 160-200 pinned epochs
# (26.44 vs 25.43 at s7).  The chain uses the long horizon; coarse cannot.


def warn_chain_horizon(cfg: NeRFConfig) -> bool:
    """Round-4 VERDICT #5: nothing stopped an operator from running the
    'quality recipe' (PROP_LEVELS>=2) at the 80-epoch standard horizon,
    where it underdelivers on one seed class.  Returns True when the
    warning fired (tests)."""
    if cfg.train_sampler == "proposal" and cfg.prop_levels >= 2 \
            and cfg.epochs < CHAIN_MIN_EPOCHS:
        print(
            f"[nerf-tpu] WARNING: PROP_LEVELS={cfg.prop_levels} (the "
            f"hierarchical-chain quality recipe) is validated for LONG "
            f"runs: at 80 epochs it can trail the coarse baseline on "
            f"some seeds and only wins at every seed by 160-200 pinned "
            f"epochs (docs/evidence/hier_prop_quality.json).  EPOCHS="
            f"{cfg.epochs} < {CHAIN_MIN_EPOCHS}: consider --epochs 200 "
            f"(schedules auto-pin at the validated ~80-epoch horizon)"
        )
        return True
    return False


def resolve_eval_batch(
    test_bs: int, n_val: int, data_div: int, proc_count: int = 1
) -> int:
    """Eval batch size compatible with the mesh: eval batches go through
    ``Trainer.put_global_batch``, which slices rows over ``proc_count``
    processes AND shards them over the mesh's data axis, so the batch
    size must divide by BOTH (lcm — the data axis need not be a multiple
    of the process count on model-parallel meshes).  Rounds DOWN so odd
    val-set sizes (e.g. a 625-ray 25x25 holdout on 2 hosts) degrade to a
    slightly smaller eval batch instead of crashing mid-run at the first
    eval."""
    div = math.lcm(data_div, proc_count)
    if n_val < div:
        raise ValueError(
            f"val split has {n_val} rays but eval batches must divide by "
            f"lcm(data axis {data_div}, processes {proc_count}) = {div}; "
            f"shrink the mesh or enlarge the val split"
        )
    return max(div, (min(test_bs, n_val) // div) * div)


def resolve_run_dirs(cfg: NeRFConfig, name: str, run_dir: str | None):
    """Run/viz directories, local or GCS (reference train_lego.py:63-69)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    if run_dir is not None:
        return run_dir, io.join(run_dir, "images")
    if cfg.with_gcs:
        return (
            io.join(GCS_MODEL_DIR, f"{name}-{stamp}"),
            io.join(GCS_IMAGE_DIR, f"{name}-{stamp}"),
        )
    return (
        io.join("models", f"{name}-{stamp}"),
        io.join("images", "models", f"{name}-{stamp}"),
    )


def run_training(
    prepare_data: Callable[..., tuple[RayDataset, RayDataset, tuple, float]],
    default_config: str,
    default_eval_every: int,
    argv: list[str] | None = None,
) -> Trainer:
    """The full training program; returns the Trainer (for tests)."""
    args = build_arg_parser(default_config).parse_args(argv)
    if args.platform:
        # Must happen before any backend initialization; env alone is not
        # enough when a sitecustomize registers a TPU plugin eagerly.
        jax.config.update("jax_platforms", args.platform)
    maybe_enable_compilation_cache()

    # Multi-host: one call per process, before any other JAX use; no-op on
    # a single host (replaces TPUClusterResolver/TPUStrategy wiring,
    # reference train_tpu_lego.py:72-82).
    from nerf_keras_tpu.parallel.distributed import (
        maybe_initialize,
        process_info,
        shard_dataset_for_process,
    )

    maybe_initialize()
    cfg = load_config(args.config)
    if args.epochs is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, epochs=args.epochs)
    eval_every = resolve_eval_every(args.eval_every, cfg, default_eval_every)
    warn_chain_horizon(cfg)
    name = config_name(args.config)

    print(f"[nerf-tpu] config={name} devices={jax.device_count()} "
          f"mesh=({cfg.mesh_data},{cfg.mesh_model}) dtype={cfg.compute_dtype}")

    # Entry scripts adapt each dataset loader to (h, w, data_dir=None);
    # loaders whose preprocessing depends on the config (e.g. the Blender
    # loader's background compositing tracks WHITE_BKGD) opt in to a
    # ``config`` kwarg.
    import inspect

    prepare_kwargs = {"data_dir": args.data_dir}
    prepare_params = inspect.signature(prepare_data).parameters
    if "config" in prepare_params:
        prepare_kwargs["config"] = cfg
    if args.scene is not None:
        if "scene" not in prepare_params:
            raise SystemExit(
                "--scene is not supported by this entry point's loader"
            )
        prepare_kwargs["scene"] = args.scene
    if args.views is not None:
        if "num_views" not in prepare_params:
            raise SystemExit(
                "--views is not supported by this entry point's loader"
            )
        prepare_kwargs["num_views"] = args.views
    train_ds, val_ds, (near, far), focal = prepare_data(
        cfg.height, cfg.width, **prepare_kwargs
    )
    if cfg.ndc:
        # Forward-facing NDC reparameterization (NeRFConfig.ndc; absent
        # from the reference): rays into the NDC cube, t sampled in [0, 1].
        from nerf_keras_tpu.data.pipeline import dataset_to_ndc

        train_ds, val_ds = dataset_to_ndc(train_ds), dataset_to_ndc(val_ds)
        near, far = 0.0, 1.0
    train_ds = shard_dataset_for_process(train_ds)
    print(f"[nerf-tpu] rays: train={len(train_ds)} val={len(val_ds)} "
          f"near={near:.3f} far={far:.3f} focal={focal:.2f}")

    # Per-host drop-remainder batch accounting, computed ONCE: each host
    # assembles only its 1/P slice of the global batch (put_batch builds
    # the global array across hosts), so the per-host pipeline batch is
    # batch_size // P and steps_per_epoch covers the GLOBAL ray count once
    # per epoch.  Both auto-horizons below and the epoch loop share these
    # numbers — a second formula would drift.
    _, proc_count = process_info()
    if cfg.batch_size % proc_count != 0:
        raise ValueError(
            f"BATCH_SIZE={cfg.batch_size} must be divisible by the process "
            f"count ({proc_count})"
        )
    local_bs = cfg.batch_size // proc_count
    if len(train_ds) < local_bs:
        # Without this, drop-remainder batching yields ZERO batches and
        # the first epoch dies later with an opaque KeyError('loss').
        raise ValueError(
            f"BATCH_SIZE={cfg.batch_size} exceeds the per-host train set "
            f"({len(train_ds)} rays after sharding across {proc_count} "
            f"process(es)) — lower BATCH_SIZE or enlarge the dataset"
        )
    steps_per_epoch = len(train_ds) // local_bs

    if cfg.lr_decay_epochs > 0 or cfg.prop_anneal_epochs > 0 \
            or cfg.freq_anneal_epochs > 0:
        # Epoch-unit horizons (the long-run pinned-schedule recipe,
        # docs/evidence/long_horizon_quality.json) resolve to steps as
        # soon as steps_per_epoch is known; config validation already
        # rejected mixed units.
        import dataclasses as _dc

        repl = {}
        if cfg.lr_decay_epochs > 0:
            repl["lr_decay_steps"] = cfg.lr_decay_epochs * steps_per_epoch
            repl["lr_decay_epochs"] = 0  # resolved; keeps cfg re-validatable
        if cfg.prop_anneal_epochs > 0:
            repl["prop_anneal_steps"] = cfg.prop_anneal_epochs * steps_per_epoch
            repl["prop_anneal_epochs"] = 0
        if cfg.freq_anneal_epochs > 0:
            repl["freq_anneal_steps"] = cfg.freq_anneal_epochs * steps_per_epoch
            repl["freq_anneal_epochs"] = 0
        cfg = _dc.replace(cfg, **repl)
        if "lr_decay_steps" in repl:
            print(f"[nerf-tpu] lr decay horizon pinned: "
                  f"{cfg.lr_decay_steps} steps")
        if "prop_anneal_steps" in repl:
            print(f"[nerf-tpu] proposal anneal pinned: "
                  f"{cfg.prop_anneal_steps} steps")
        if "freq_anneal_steps" in repl:
            print(f"[nerf-tpu] frequency anneal pinned: "
                  f"{cfg.freq_anneal_steps} steps")

    # Auto horizons cap at the validated ~80-epoch step count (the
    # long-run schedule rule, docs/TRAINING.md: auto-stretch past ~80
    # epochs is a measured seed lottery; the pin makes long runs rise
    # monotonically).  Explicit step/epoch horizons always win; the flag
    # opts out.
    horizon_epochs = (
        cfg.epochs if args.no_pin_schedules
        else min(cfg.epochs, VALIDATED_HORIZON_EPOCHS)
    )
    pinned = horizon_epochs < cfg.epochs

    if cfg.lr_final is not None and cfg.lr_decay_steps == 0:
        # Resolve the LR-decay horizon (LR_DECAY_STEPS=0 = auto).  Must
        # happen before the Trainer builds its optimizer.
        import dataclasses as _dc

        cfg = _dc.replace(cfg, lr_decay_steps=horizon_epochs * steps_per_epoch)
        print(f"[nerf-tpu] lr decay: {cfg.learning_rate} -> {cfg.lr_final} "
              f"over {cfg.lr_decay_steps} steps"
              + (f" (pinned to the validated {VALIDATED_HORIZON_EPOCHS}-"
                 f"epoch horizon; --no-pin-schedules to stretch to "
                 f"{cfg.epochs} epochs)" if pinned else ""))

    if cfg.prop_anneal_steps == -1:
        # PROP_ANNEAL_STEPS=-1 = auto: anneal over the run horizon
        # (Mip-NeRF 360's schedule), same accounting + pin as the LR
        # horizon.
        import dataclasses as _dc

        cfg = _dc.replace(
            cfg, prop_anneal_steps=horizon_epochs * steps_per_epoch
        )
        print(f"[nerf-tpu] proposal anneal over {cfg.prop_anneal_steps} steps"
              + (" (pinned; --no-pin-schedules to stretch)" if pinned
                 else ""))

    if cfg.freq_anneal_steps == -1:
        # FREQ_ANNEAL_STEPS=-1 = auto: open the encode octaves over the
        # full run horizon (FreeNeRF anneals over most of the schedule).
        import dataclasses as _dc

        cfg = _dc.replace(cfg, freq_anneal_steps=cfg.epochs * steps_per_epoch)
        print(f"[nerf-tpu] frequency anneal over {cfg.freq_anneal_steps} steps")

    trainer = Trainer(cfg, near, far)
    if args.resume:
        trainer.restore(args.resume)
        print(f"[nerf-tpu] resumed from {args.resume} at step {int(trainer.state.step)}")

    run_dir, viz_dir = resolve_run_dirs(cfg, name, args.run_dir)
    scene = {"near": near, "far": far, "focal": focal, "ndc": cfg.ndc}
    history_name = (
        f"history_l{cfg.num_layers}_d{cfg.hidden_dim}"
        f"_n{cfg.ns_coarse + cfg.ns_fine}_ep{cfg.epochs}.json"
    )
    history = History()
    losses_for_plot: list[float] = []
    if args.resume and io.exists(run_dir):
        # Resuming into the same run dir: continue the metric record —
        # a fresh History would overwrite the file with post-resume
        # epochs only, silently discarding the earlier training curve.
        # The filename embeds EPOCHS (reference naming), so when --epochs
        # changed on resume fall back to the newest history file present.
        from nerf_keras_tpu.utils.checkpoint import _numeric_sort_key

        # Natural sort (ep100 beats ep8) — plain reverse-lex would pick
        # the short record, the same bug latest_checkpoint fixed.
        candidates = [history_name] + sorted(
            (n for n in io.listdir(run_dir)
             if n.startswith("history_") and n.endswith(".json")),
            key=_numeric_sort_key,
            reverse=True,
        )
        for cand in candidates:
            if io.exists(io.join(run_dir, cand)):
                history = History.load(io.join(run_dir, cand))
                losses_for_plot = list(history.losses)
                print(f"[nerf-tpu] continuing history from {cand} "
                      f"({len(history.losses)} epochs recorded)")
                break

    # Best-val retention seed: resuming a run must not treat its first
    # post-resume eval as a fresh record (the pre-resume peak counts).
    best_val = {"psnr": max(history.val["psnrs"])
                if history.val["psnrs"] else None}

    test_bs = cfg.test_batch_size or cfg.batch_size
    eval_bs = resolve_eval_batch(
        test_bs, len(val_ds), trainer.mesh.shape["data"], proc_count
    )
    if len(val_ds) % eval_bs:
        # Parity note: the reference's val pipeline also batches with
        # drop_remainder=True (data_utils.py:166), so excluded rays match
        # its behavior — but say so instead of silently biasing val PSNR.
        print(f"[nerf-tpu] val: {len(val_ds) % eval_bs} of {len(val_ds)} "
              f"rays excluded from metrics (eval batch {eval_bs}, "
              f"drop-remainder — matches the reference pipeline)")
    start_epoch = int(trainer.state.step) // steps_per_epoch
    # Artifacts (checkpoints, panels, history) are written by process 0
    # only: every host computes the same replicated state/metrics, and
    # concurrent writes of the same object race (plus per-host run-dir
    # timestamps would scatter artifacts across prefixes).
    is_main = jax.process_index() == 0

    # Prefer the native prefetching batcher (C++ background thread, 4-deep
    # ring) so host batch assembly overlaps device compute; fall back to
    # the numpy pipeline when no toolchain is available.
    native_batcher = None
    try:
        from nerf_keras_tpu.data.native import NativeRayBatcher

        native_batcher = NativeRayBatcher(
            train_ds, local_bs, seed=cfg.seed, start_epoch=start_epoch
        )
    except Exception as e:
        print(f"[nerf-tpu] native batcher unavailable ({e}); using numpy")

    def epoch_batches(epoch: int):
        if native_batcher is not None:
            return (next(native_batcher) for _ in range(steps_per_epoch))
        return iterate_batches(train_ds, local_bs, shuffle=True,
                               seed=cfg.seed, epoch=epoch)

    # Preemption safety (SURVEY.md §5 failure-detection row — the
    # reference has nothing): TPU jobs are routinely preempted with a
    # SIGTERM grace window; checkpoint at the next epoch boundary and
    # exit 0 so the job resumes with --resume instead of losing the run.
    # Signal-handler rules: only set a flag (no JAX/IO in handler), and
    # only in the main thread of the main interpreter.
    stop_requested = {"sig": None}

    def _request_stop(signum, frame):
        stop_requested["sig"] = signum

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _request_stop)
    except ValueError:  # non-main thread (tests driving run_training)
        prev_sigterm = None

    # The handler must be restored even when the loop raises (non-finite
    # loss, checkpoint IO): run_training is also called in-process by
    # tests/embedding callers, and a leaked handler would outlive us.
    try:
        _run_epochs(
            cfg, trainer, run_dir, viz_dir, scene, history, history_name,
            val_ds, start_epoch, steps_per_epoch, eval_every, eval_bs,
            test_bs, is_main, losses_for_plot, epoch_batches,
            stop_requested, best_val, profile_dir=args.profile,
            profile_steps=args.profile_steps,
        )
    finally:
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
    if best_val["psnr"] is not None:
        # Only claim retention when the best.* file is actually there: a
        # record seeded from a resumed pre-retention history that no
        # post-resume eval beat writes nothing, and resolve_checkpoint
        # then serves latest (round-4 ADVICE).
        if io.exists(io.join(run_dir, "best." + checkpoint_name(cfg))):
            print(f"[nerf-tpu] best val PSNR {best_val['psnr']:.2f} "
                  f"retained in best.{checkpoint_name(cfg)} "
                  f"(inference/serving resolve to it by default)")
        else:
            print(f"[nerf-tpu] best val PSNR {best_val['psnr']:.2f} "
                  f"(from pre-resume history; no best.* checkpoint "
                  f"written this run — serving resolves to latest)")
    print(f"[nerf-tpu] done; run dir: {run_dir}")
    return trainer


def _profiled_first_epoch(cfg, trainer, batches, steps_per_epoch,
                          profile_dir, profile_steps, is_main):
    """First epoch with the head wrapped in a ``jax.profiler`` trace.

    The trace window covers only ``profile_steps`` steps (a whole flagship
    epoch is thousands of steps — a multi-GB trace); the epoch then
    finishes OUTSIDE the window and the two partial epoch means are
    step-weighted back into one epoch metric dict.  Every host must run
    the same two ``train_epoch`` collectives, so only the trace context
    is process-0-gated, not the step structure.  SURVEY.md §5 tracing row
    (the reference has nothing beyond tqdm, models.py:196).
    """
    import contextlib
    import itertools

    from nerf_keras_tpu.utils import profiling

    n_head = max(1, min(profile_steps, steps_per_epoch))
    # Count the steps each partial epoch ACTUALLY consumed instead of
    # trusting steps_per_epoch: a batch source yielding fewer batches
    # (drop_remainder=False, exhausted iterator) would otherwise hand the
    # tail an empty iterator (jnp.stack([]) error) and mis-weight the
    # merged means (round-3 advisory).
    counts = {"head": 0, "tail": 0}

    def counted(it, slot):
        for b in it:
            counts[slot] += 1
            yield b

    gen = iter(batches)
    ctx = profiling.trace(profile_dir) if is_main else contextlib.nullcontext()
    with ctx:
        # train_epoch's closing single-vector fetch synchronizes, so every
        # traced step's device work completes inside the window.
        head = trainer.train_epoch(
            counted(itertools.islice(gen, n_head), "head"),
            log_every=cfg.log_every,
        )
    if is_main:
        print(f"[nerf-tpu] profiler trace of {counts['head']} steps -> "
              f"{profile_dir} (view: tensorboard --logdir {profile_dir})")
    if counts["head"] >= steps_per_epoch:
        return head
    # Peek one batch so an exhausted source returns head unchanged rather
    # than running an empty tail epoch.
    try:
        first_tail = next(gen)
    except StopIteration:
        return head
    tail = trainer.train_epoch(
        counted(itertools.chain([first_tail], gen), "tail"),
        log_every=cfg.log_every,
    )
    total = counts["head"] + counts["tail"]
    return {
        k: (head[k] * counts["head"] + tail[k] * counts["tail"]) / total
        for k in head
    }


def _run_epochs(cfg, trainer, run_dir, viz_dir, scene, history, history_name,
                val_ds, start_epoch, steps_per_epoch, eval_every, eval_bs,
                test_bs, is_main, losses_for_plot, epoch_batches,
                stop_requested, best_val=None, profile_dir=None,
                profile_steps=20):
    """Epoch loop body of :func:`run_training` (split out so the SIGTERM
    handler restoration can wrap it in try/finally)."""
    if profile_dir is not None and start_epoch >= cfg.epochs:
        # --resume of a finished run + --profile: the loop below never
        # executes, so say why the trace dir stays empty instead of
        # silently producing nothing (round-3 advisory).
        print(
            f"[nerf-tpu] WARNING: --profile {profile_dir} captured nothing "
            f"— the restored checkpoint is already at epoch {start_epoch} "
            f">= EPOCHS ({cfg.epochs}); raise --epochs to trace steps"
        )
    fvc_warned = False
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        if profile_dir is not None and epoch == start_epoch:
            metrics = _profiled_first_epoch(
                cfg, trainer, epoch_batches(epoch), steps_per_epoch,
                profile_dir, profile_steps, is_main,
            )
        else:
            metrics = trainer.train_epoch(
                epoch_batches(epoch), log_every=cfg.log_every
            )
        dt = time.perf_counter() - t0
        # global rays this epoch: every step consumes cfg.batch_size rays
        # across all hosts (each host contributed local_bs of them)
        rays_per_sec = steps_per_epoch * cfg.batch_size / dt if dt > 0 else 0.0

        # Failure detection (SURVEY.md §5: the reference's only guard is a
        # try/except around TPU init that then crashes anyway): a
        # non-finite loss aborts with a diagnosable emergency checkpoint
        # instead of silently poisoning every later epoch.
        if not np.isfinite(metrics["loss"]):
            crash_path = io.join(run_dir, "emergency." + checkpoint_name(cfg))
            if is_main:
                io.makedirs(run_dir)
                save_checkpoint(crash_path, trainer.state, cfg, scene=scene)
            raise FloatingPointError(
                f"non-finite train loss {metrics['loss']} at epoch "
                f"{epoch + 1} (step {int(trainer.state.step)}); state saved "
                f"to {crash_path}"
            )
        print(
            f"epoch {epoch + 1}/{cfg.epochs} "
            f"loss={metrics['loss']:.5f} loss_coarse={metrics['loss_coarse']:.5f} "
            f"psnr={metrics['psnr']:.2f} ({rays_per_sec / 1e3:.1f} Krays/s)"
        )
        losses_for_plot.append(metrics["loss"])

        if (epoch + 1) % eval_every == 0 or epoch + 1 == cfg.epochs:
            val_metrics = trainer.evaluate(
                iterate_batches(val_ds, eval_bs, shuffle=False)
            )

            # Render the first 2 val views for the panel, as the reference
            # does each eval (train_lego.py:184-197).
            rgbs, depths = [], []
            for view in range(min(2, val_ds.num_images)):
                o, d = val_ds.image_rays(view)
                out = trainer.render_rays(o, d, chunk=max(test_bs, 4096))
                rgbs.append(
                    out["rgb_fine"].reshape(val_ds.height, val_ds.width, 3)
                )
                depths.append(
                    out["depth_fine"].reshape(val_ds.height, val_ds.width)
                )
            # Frame-level SSIM on the panel views (beyond-reference metric;
            # needs the 11x11 window to fit — skipped on tiny smoke scenes).
            if min(val_ds.height, val_ds.width) >= 11:
                val_metrics["ssim"] = float(np.mean([
                    np.asarray(ssim(jnp.asarray(r),
                                    jnp.asarray(val_ds.image(i))))
                    for i, r in enumerate(rgbs)
                ]))
            ssim_txt = (
                f" ssim={val_metrics['ssim']:.4f}"
                if "ssim" in val_metrics else ""
            )
            print(
                f"  val: loss={val_metrics['loss']:.5f} "
                f"psnr={val_metrics['psnr']:.2f}{ssim_txt}"
            )
            history.append(metrics, val_metrics)

            # Best-val retention + collapse guard (round-3 VERDICT: three
            # documented late-decay modes destroy a run's peak weights
            # when only the latest checkpoint is kept; the reference
            # saves every epoch, train_lego.py:213, and loses nothing).
            # The retained state is whatever eval scored — EMA-aware by
            # construction (evaluate reads Trainer._eval_state).
            if best_val is None:
                best_val = {"psnr": None}
            vp = val_metrics["psnr"]
            is_best = best_val["psnr"] is None or vp > best_val["psnr"]
            if is_best:
                best_val["psnr"] = vp
            elif vp <= best_val["psnr"] - COLLAPSE_WARN_DB:
                print(
                    f"[nerf-tpu] WARNING: val PSNR {vp:.2f} is "
                    f"{best_val['psnr'] - vp:.2f} dB below this run's best "
                    f"({best_val['psnr']:.2f}) — late-decay signature "
                    f"(docs/TRAINING.md long-run schedule rule); the best."
                    f"* checkpoint retains the peak weights"
                )

            # Few-view collapse auto-diagnosis (round-4 VERDICT #8): a
            # DIFFERENT failure from late decay — val never had a peak,
            # it sits low and flat while train memorizes.  Detection +
            # the measured remedies live on History; warn once per run.
            if not fvc_warned and history.few_view_collapse():
                fvc_warned = True
                print(
                    "[nerf-tpu] WARNING: few-view collapse signature — "
                    "val PSNR is flat and low while train PSNR keeps "
                    "rising (the model is memorizing the training views; "
                    "measured class: 12-view multi-object scenes at some "
                    "seeds, docs/evidence/spheres_scene_quality.json).  "
                    "Sampler tuning does NOT fix this.  Measured "
                    "remedies: ADD TRAINING VIEWS (24 views rescued "
                    "every seed), or FREQ_ANNEAL_STEPS=-1 as a last "
                    "resort (rescues this class but costs dBs on healthy "
                    "runs — docs/TRAINING.md knob table)"
                )

            if is_main:
                io.makedirs(run_dir)
                io.makedirs(viz_dir)
                save_panel(
                    io.join(viz_dir, f"{epoch:03d}.png"),
                    rgbs, depths, losses_for_plot, epoch, cfg.epochs,
                )
                save_checkpoint(
                    io.join(run_dir, checkpoint_name(cfg)), trainer.state, cfg,
                    scene=scene,
                )
                if is_best:
                    save_checkpoint(
                        io.join(run_dir, "best." + checkpoint_name(cfg)),
                        trainer.state, cfg, scene=scene,
                    )
                history.save(io.join(run_dir, history_name))
        else:
            history.append(metrics)

        if stop_requested["sig"] is not None:
            ckpt_path = io.join(run_dir, checkpoint_name(cfg))
            if is_main:
                io.makedirs(run_dir)
                save_checkpoint(ckpt_path, trainer.state, cfg, scene=scene)
            print(
                f"[nerf-tpu] signal {stop_requested['sig']} at epoch "
                f"{epoch + 1}: checkpoint saved to {ckpt_path}; resume "
                f"with --resume"
            )
            break
