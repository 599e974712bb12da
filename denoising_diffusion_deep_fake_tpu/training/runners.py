"""Workload runners: wire config -> data -> trainer -> loop -> checkpoints.

Each ``fit_*`` mirrors one reference CLI entry point end to end:
* ``fit_deep_fake`` == ``d3f train new/resume/modify``
  (`/root/reference/d3f/train_deep_fake/start_training.py:8-59`),
* ``fit_denoiser`` == ``d3f denoise`` (`d3f/train_denoiser/train_denoiser.py:7-52`),
* ``fit_balance`` == ``d3f balance`` — plus the output-manifest write the
  reference never implemented (`d3f/balance_training_images/balance_training_images.py:7-57`,
  SURVEY.md §2 #7).

All three share one data path (uint8 loader -> on-device normalize/augment)
and one mesh: batches are sharded over the ``data`` axis; states replicated;
XLA inserts the gradient all-reduces.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import numpy as np

from denoising_diffusion_deep_fake_tpu.checkpoint import (
    CheckpointManager,
    load_rng_key,
    reset_for_modify,
)
from denoising_diffusion_deep_fake_tpu.config import (
    BalanceConfig,
    DeepFakeConfig,
    DenoiserConfig,
    config_to_dict,
)
from denoising_diffusion_deep_fake_tpu.data import ImageLoader
from denoising_diffusion_deep_fake_tpu.data.loader import PairedLoader
from denoising_diffusion_deep_fake_tpu.parallel import (
    create_mesh,
    data_shard,
    is_primary,
    local_batch_size,
    maybe_initialize_from_env,
    shard_state,
)
from denoising_diffusion_deep_fake_tpu.parallel.mesh import device_prefetch
from denoising_diffusion_deep_fake_tpu.training.balance import (
    BalanceTrainer,
    compute_difficulty_index,
)
from denoising_diffusion_deep_fake_tpu.training.deep_fake import DeepFakeTrainer
from denoising_diffusion_deep_fake_tpu.training.denoiser import DenoiserTrainer
from denoising_diffusion_deep_fake_tpu.training.loop import LoopContext


def print_hparams(hparams: dict) -> None:
    print("\nHyper Parameters:")
    for k, v in hparams.items():
        print(f"\t{k}: {v}")
    print()


def _steps_per_epoch(cfg, loader) -> int:
    return (cfg.steps_per_epoch if cfg.steps_per_epoch is not None
            else loader.batches_per_epoch)


def _training_mesh(cfg):
    """Build the ('data', 'spatial') training mesh from config knobs.

    Delegates to ``parallel.mesh.training_mesh`` — the same deterministic
    construction the trainers use for their in-step spatial activation
    constraints, so the runner's operand shardings and the steps' pins
    always name one mesh. ``spatial_parallel > 1`` H-shards activations
    (large-resolution scaling — batch uploads get the matching sharding via
    ``_spatial(cfg)`` below)."""
    from denoising_diffusion_deep_fake_tpu.parallel.mesh import training_mesh

    return training_mesh(cfg.data_parallel,
                         getattr(cfg, "spatial_parallel", 1))


def _spatial(cfg) -> bool:
    return getattr(cfg, "spatial_parallel", 1) > 1


def _upload_format(cfg) -> str:
    return getattr(cfg, "upload_format", "rgb")


def _device_cache(cfg, mesh, *loaders):
    """Build HBM-resident dataset caches when ``data_cache: device``.

    Returns a list of ``DeviceDatasetCache`` (one per loader) or None for the
    host-loader path. The caches pin the decoded uint8 datasets in device
    memory; steps gather batches in-jit (zero per-step image uploads)."""
    if getattr(cfg, "data_cache", "host") != "device":
        return None
    from denoising_diffusion_deep_fake_tpu.data.device_cache import (
        DeviceDatasetCache)

    limit = getattr(cfg, "device_cache_limit_bytes", 8 << 30)
    return [DeviceDatasetCache(ld, limit_bytes=limit, mesh=mesh)
            for ld in loaders]


def _build_steps(cfg, mesh, trainer, *loaders, paired: bool = False):
    """(caches, steps, cached_spe) — one place that decides between the
    host-loader step set and the device-cache step set. ``steps`` is a
    ``_StepSet``: the single-step pair plus (when ``steps_per_call > 1``)
    the K-step superstep program (training/multi_step.py)."""
    import functools as _ft

    k = getattr(cfg, "steps_per_call", 1)
    core = _ft.partial(trainer._train_step, with_images=False)
    caches = _device_cache(cfg, mesh, *loaders)
    if caches:
        from denoising_diffusion_deep_fake_tpu.training.cached import (
            cached_steps_for)
        from denoising_diffusion_deep_fake_tpu.training.multi_step import (
            make_cached_super_step)

        # Multi-loader (paired) epoch length is the shorter identity's —
        # PairedLoader semantics.
        spe = min(c.steps_per_epoch for c in caches)
        sharded = any(c.sharded for c in caches)
        plain, img = cached_steps_for(trainer, spe, paired=paired, mesh=mesh,
                                      sharded=sharded)
        super_step = (make_cached_super_step(
            core, k, trainer.cfg.batch_size, spe, paired=paired, mesh=mesh,
            sharded=sharded) if k > 1 else None)
        # Cached supersteps take the SAME epoch-constant operands as the
        # single step (state.step drives the in-jit gather), so the stream
        # flag is False: one group consumes k stream items but passes one.
        return caches, _StepSet(plain, img, super_step, k, False), spe
    from denoising_diffusion_deep_fake_tpu.training.multi_step import (
        make_super_step)

    super_step = (make_super_step(core, k, n_batch_args=2 if paired else 1)
                  if k > 1 else None)
    return (None, _StepSet(trainer.make_train_step(with_images=False),
                           trainer.make_train_step(with_images=True,
                                                   donate=False),
                           super_step, k, True), None)


class _StepSet:
    """The compiled step programs one workload loop drives."""

    def __init__(self, plain, img, super_step, k: int, super_stream: bool):
        self.plain = plain
        self.img = img
        self.super = super_step
        self.k = k
        self.super_stream = super_stream  # True: a group feeds k distinct
        #                                   batches; False (cached): the
        #                                   epoch-constant args, passed once.


def _drive_epoch(ctx: LoopContext, states, rng, batches, steps: _StepSet,
                 *, step_callback, max_steps, verbose):
    """Run one epoch's batch stream through the step programs.

    Returns ``(states, done)``. With ``steps.super`` set, groups of
    ``steps.k`` consecutive steps run as ONE dispatched program whenever no
    image logging is due and a full group fits before ``max_steps``; image
    steps, epoch tails, and max_steps remainders fall back to the
    single-step programs (a bounded set of compiles — group size never
    varies). ``step_callback`` fires once per dispatched program: per step
    on the single path (unchanged contract), once per group with the
    stacked ``(k,)`` metrics on the superstep path."""
    done = False
    it = iter(batches)
    buffered: list = []  # epoch-tail items that failed to fill a group
    while not done:
        if buffered:
            step_args = buffered.pop(0)
        else:
            try:
                step_args = next(it)
            except StopIteration:
                break
        want_img = ctx.want_images()
        remaining = (None if max_steps is None
                     else max_steps - ctx.global_step)
        if (steps.super is not None and not want_img and not buffered
                and (remaining is None or remaining >= steps.k)):
            group = [step_args]
            while len(group) < steps.k:
                try:
                    group.append(next(it))
                except StopIteration:
                    break
            if len(group) == steps.k:
                if steps.super_stream:
                    flat = [x for pos in zip(*group) for x in pos]
                else:
                    flat = list(group[0])
                states, metrics = steps.super(states, *flat, rng)
                ctx.log_step(metrics, states=states, rng=rng,
                             n_steps=steps.k)
                ctx.global_step += steps.k
                if step_callback is not None:
                    step_callback(ctx.global_step, states, metrics)
                done = _post_step(ctx, states, rng, max_steps, verbose)
                continue
            # Short group (epoch tail): run what we pulled as singles.
            step_args, *rest = group
            buffered.extend(rest)
        if want_img:
            states, metrics, images = steps.img(states, *step_args, rng)
            ctx.log_step(metrics, images, states=states, rng=rng)
        else:
            states, metrics = steps.plain(states, *step_args, rng)
            ctx.log_step(metrics, states=states, rng=rng)
        ctx.global_step += 1
        if step_callback is not None:
            step_callback(ctx.global_step, states, metrics)
        done = _post_step(ctx, states, rng, max_steps, verbose)
    return states, done


def _post_step(ctx: LoopContext, states, rng, max_steps, verbose) -> bool:
    """Per-dispatch bookkeeping shared by all three workload loops."""
    ctx.maybe_checkpoint(states, rng)
    if ctx.preempted():
        if verbose and is_primary():
            print("preemption signal received — saving and exiting")
        return True
    return max_steps is not None and ctx.global_step >= max_steps


def _cached_batches(caches, spe: int, epoch: int):
    """Per-epoch step-arg stream for the cached path: datasets (constant) +
    this epoch's permutation vectors, repeated ``spe`` times."""
    args = (tuple(c.dataset for c in caches)
            + tuple(c.order_for_epoch(epoch) for c in caches))
    return (args for _ in range(spe))


def _with_matmul_precision(fit_fn):
    """Trace/compile the whole fit under the config's resolved matmul
    precision (`config.resolved_matmul_precision`). Must wrap the FULL body:
    jit tracing is deferred to the first step inside the loop, and
    ``jax.default_matmul_precision`` only binds at trace time. In 'auto'
    this forces true-fp32 convs for ``compute_dtype: float32`` (the TPU
    backend's one-pass-bf16 default measurably diverges training —
    BASELINE.md round-3 "TPU precision") and leaves bf16 runs on the fast
    default."""
    @functools.wraps(fit_fn)
    def wrapper(cfg, *args, **kwargs):
        prec = cfg.resolved_matmul_precision()
        if prec is None:
            return fit_fn(cfg, *args, **kwargs)
        with jax.default_matmul_precision(prec):
            return fit_fn(cfg, *args, **kwargs)
    return wrapper


@contextlib.contextmanager
def _abort_on_error(ctx: LoopContext):
    """Tear the loop services down on ANY exception escaping the train loop
    (divergence, a raising step_callback, KeyboardInterrupt): background
    fetch/checkpoint threads must stop before interpreter teardown or the
    process aborts inside a device transfer."""
    try:
        yield
    except BaseException:
        ctx.abort()
        raise


# ------------------------------------------------------------------ deep fake


@_with_matmul_precision
def fit_deep_fake(cfg: DeepFakeConfig, *, resume_from: str | None = None,
                  modify_from: str | None = None, max_steps: int | None = None,
                  verbose: bool = True, step_callback=None):
    """Train the two-identity workload; returns (states, trainer, context)."""
    maybe_initialize_from_env()
    hparams = config_to_dict(cfg)
    if verbose and is_primary():
        print_hparams(hparams)

    local_bs = local_batch_size(cfg.batch_size)
    loader_a = ImageLoader(cfg.data_path_a, local_bs,
                           image_size=cfg.image_size, seed=cfg.seed,
                           class_balanced=cfg.class_balanced_sampling,
                           shard=data_shard())
    loader_b = ImageLoader(cfg.data_path_b, local_bs,
                           image_size=cfg.image_size, seed=cfg.seed + 1,
                           class_balanced=cfg.class_balanced_sampling,
                           shard=data_shard())
    paired = PairedLoader(loader_a, loader_b)

    mesh = _training_mesh(cfg)
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=_steps_per_epoch(cfg, paired),
                              image_size=paired.image_size)

    ctx = LoopContext(cfg, hparams, workload="deep_fake", primary=is_primary())
    rng = jax.random.PRNGKey(cfg.seed)
    start_epoch = 0

    if resume_from or modify_from:
        source = CheckpointManager(resume_from or modify_from)
        # Restore target structure must match what the checkpoint holds: its
        # own mode decides whether EMA shadows exist (strict=False analog).
        ckpt_mode = source.read_meta()["hparams"].get("mode", cfg.mode)
        states, meta = source.restore(
            lambda: trainer.init_states(jax.random.PRNGKey(cfg.seed),
                                        with_ema=ckpt_mode == "swap"))
        if resume_from:
            start_epoch = int(meta["extra"].get("epoch", 0)) + 1
            ctx.global_step = int(meta["extra"].get("global_step", 0))
            restored_rng = load_rng_key(meta["extra"])
            rng = restored_rng if restored_rng is not None else rng
        else:
            states = reset_for_modify(states, trainer.tx.init)
        if cfg.mode == "swap":
            states = trainer.ensure_ema(states)
    else:
        states = trainer.init_states(rng)

    states = shard_state(states, mesh)
    caches, steps, cached_spe = _build_steps(
        cfg, mesh, trainer, loader_a, loader_b, paired=True)

    done = False
    with _abort_on_error(ctx):
        for epoch in range(start_epoch, cfg.max_epochs):
            ctx.epoch = epoch
            if caches:
                batches = _cached_batches(caches, cached_spe, epoch)
            else:
                batches = ((ba, bb) for (ba, _), (bb, _) in device_prefetch(
                    paired.epoch(epoch), mesh, spatial=_spatial(cfg),
                    upload_format=_upload_format(cfg)))
            # Per-step key derivation happens inside the jitted step (from
            # state.step) — no host device-op per iteration; batch uploads
            # happen ahead on the prefetch thread.
            states, done = _drive_epoch(ctx, states, rng, batches, steps,
                                        step_callback=step_callback,
                                        max_steps=max_steps, verbose=verbose)
            ctx.maybe_checkpoint(states, rng, force=True)  # 'last' each epoch
            if done:
                break

        ctx.maybe_checkpoint(states, rng, final=True)
        ctx.close()
    return states, trainer, ctx


# ------------------------------------------------------------------- denoiser


@_with_matmul_precision
def fit_denoiser(cfg: DenoiserConfig, *, max_steps: int | None = None,
                 verbose: bool = True, step_callback=None):
    maybe_initialize_from_env()
    hparams = config_to_dict(cfg)
    if verbose and is_primary():
        print_hparams(hparams)

    loader = ImageLoader(cfg.input_image_list_path,
                         local_batch_size(cfg.batch_size),
                         image_size=cfg.image_size, seed=cfg.seed,
                         class_balanced=cfg.class_balanced_sampling,
                         shard=data_shard())
    mesh = _training_mesh(cfg)
    trainer = DenoiserTrainer(cfg, steps_per_epoch=_steps_per_epoch(cfg, loader),
                              image_size=loader.image_size)

    ctx = LoopContext(cfg, hparams, workload="denoiser", primary=is_primary())
    rng = jax.random.PRNGKey(cfg.seed)
    state = shard_state(trainer.init_state(rng), mesh)
    caches, steps, cached_spe = _build_steps(cfg, mesh, trainer, loader)

    done = False
    with _abort_on_error(ctx):
        for epoch in range(cfg.max_epochs):
            ctx.epoch = epoch
            if caches:
                batches = _cached_batches(caches, cached_spe, epoch)
            else:
                batches = ((batch,) for batch, _ in device_prefetch(
                    loader.epoch(epoch), mesh, spatial=_spatial(cfg),
                    upload_format=_upload_format(cfg)))
            state, done = _drive_epoch(ctx, state, rng, batches, steps,
                                       step_callback=step_callback,
                                       max_steps=max_steps, verbose=verbose)
            ctx.maybe_checkpoint(state, rng, force=True)
            if done:
                break

        ctx.maybe_checkpoint(state, rng, final=True)
        ctx.close()
    return state, trainer, ctx


# -------------------------------------------------------------------- balance


@_with_matmul_precision
def fit_balance(cfg: BalanceConfig, *, max_steps: int | None = None,
                verbose: bool = True, step_callback=None):
    """Train at fixed noise, score difficulties, log histogram, write manifest."""
    maybe_initialize_from_env()
    hparams = config_to_dict(cfg)
    if verbose and is_primary():
        print_hparams(hparams)

    loader = ImageLoader(cfg.data_path, local_batch_size(cfg.batch_size),
                         image_size=cfg.image_size, seed=cfg.seed,
                         shard=data_shard())
    # Validation pass: same dataset, stable order, no remainder dropped so
    # every image gets a difficulty class. Deliberately NOT process-sharded:
    # difficulty classes come from a min-max over the FULL dataset, so every
    # process scores everything (cheap next to training) and stays consistent.
    val_loader = ImageLoader(cfg.data_path, cfg.batch_size,
                             image_size=cfg.image_size, shuffle=False,
                             drop_remainder=False)
    mesh = _training_mesh(cfg)
    trainer = BalanceTrainer(cfg, steps_per_epoch=_steps_per_epoch(cfg, loader),
                             image_size=loader.image_size)

    ctx = LoopContext(cfg, hparams, workload="balance", primary=is_primary())
    rng = jax.random.PRNGKey(cfg.seed)
    state = shard_state(trainer.init_state(rng), mesh)
    caches, steps, cached_spe = _build_steps(cfg, mesh, trainer, loader)

    done = False
    with _abort_on_error(ctx):
        for epoch in range(cfg.max_epochs):
            ctx.epoch = epoch
            if caches:
                batches = _cached_batches(caches, cached_spe, epoch)
            else:
                batches = ((batch,) for batch, _ in device_prefetch(
                    loader.epoch(epoch), mesh, spatial=_spatial(cfg),
                    upload_format=_upload_format(cfg)))
            state, done = _drive_epoch(ctx, state, rng, batches, steps,
                                       step_callback=step_callback,
                                       max_steps=max_steps, verbose=verbose)

            # Validation: per-image difficulty scores -> classes -> histogram.
            # Validation keys live in a disjoint fold-in range from train
            # steps. Data-sharded scoring when single-process; multi-process
            # runs replicate each batch over the global mesh (every process
            # holds the full dataset — see above) so the replicated state
            # stays usable.
            val_rng = jax.random.fold_in(rng, 2_000_000_000 + epoch)
            if caches and caches[0].sharded:
                # Multi-process sharded cache holds only this host's shard;
                # difficulty classes need the FULL dataset min-max, so score
                # through the (unsharded) host val_loader instead.
                indices, losses = trainer.score_dataset(
                    state, val_loader, val_rng, mesh=mesh)
            elif caches:
                # Score straight off the pinned dataset: in-jit slices, only
                # the (B,) loss vectors cross the link. Its manifest order
                # equals val_loader's (same manifest, unsharded).
                indices, losses = trainer.score_dataset_from_cache(
                    state, caches[0], val_rng, mesh=mesh)
            else:
                indices, losses = trainer.score_dataset(
                    state, val_loader, val_rng, mesh=mesh)
            classes = compute_difficulty_index(losses, cfg.number_of_classes)
            if is_primary():
                _log_difficulty_histogram(ctx, classes)
                if cfg.output_image_list_path:
                    write_balanced_manifest(cfg, val_loader, indices, classes)
            ctx.maybe_checkpoint(state, rng, force=True)
            if done:
                break

        ctx.maybe_checkpoint(state, rng, final=True)
        ctx.close()
    return state, trainer, ctx


def _log_difficulty_histogram(ctx: LoopContext, classes: np.ndarray) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figure, axes = plt.subplots(1, 1)
    axes.hist(classes)
    axes.set_xlabel("Difficulty Class")
    axes.set_ylabel("Count")
    ctx.tb.log_figure("difficulty_class_histogram", figure, ctx.global_step)
    plt.close(figure)


def write_balanced_manifest(cfg: BalanceConfig, loader: ImageLoader,
                            indices: np.ndarray, classes: np.ndarray) -> None:
    """Emit ``<path>\t<difficulty_class>`` — the completed --output_list."""
    from denoising_diffusion_deep_fake_tpu.data import write_image_manifest

    order = np.argsort(indices)
    paths = [loader.paths[i] for i in indices[order]]
    write_image_manifest(cfg.output_image_list_path, paths, classes[order])
