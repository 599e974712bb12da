"""``d3f-tpu`` command-line interface.

Mirrors the reference's ``d3f`` click group (`/root/reference/d3f/main.py:6-12`,
`setup.py:7-11`) and its subcommands:

* ``train new/resume/modify`` — two-identity deep-fake trainer
  (`d3f/train_deep_fake/start_training.py:8-59`),
* ``denoise`` — single-model denoiser (`d3f/train_denoiser/train_denoiser.py:7-52`),
* ``balance`` — difficulty balancer (`d3f/balance_training_images/
  balance_training_images.py:7-57`), with ``--output_list`` actually written,

plus the video tools the reference kept as loose scripts (SURVEY.md §2
#14-17), promoted to first-class subcommands: ``video prep`` and
``video swap``.
"""

from __future__ import annotations

import click


@click.group()
def cli():
    """denoising_diffusion_deep_fake_tpu — TPU-native face-swap-via-denoising."""
    _honor_jax_platforms_env()


def _honor_jax_platforms_env() -> None:
    """Some images bake a jax whose ``jax_platforms`` default ignores the
    ``JAX_PLATFORMS`` env var; re-apply it so ``JAX_PLATFORMS=cpu d3f-tpu ...``
    behaves as documented."""
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        jax.config.update("jax_platforms", env)


# ----------------------------------------------------------------- train group


@cli.group()
def train():
    """Two-identity deep-fake training (denoise + swap modes)."""


@train.command()
@click.option("--config_path", required=True, help="Path to the config yaml.")
@click.option("--max_steps", type=int, default=None,
              help="Stop after N optimizer steps (smoke runs).")
def new(config_path, max_steps):
    """Start fresh from a YAML config."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, load_config)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    cfg = load_config(DeepFakeConfig, config_path)
    fit_deep_fake(cfg, max_steps=max_steps)


@train.command()
@click.option("--checkpoint_path", required=True,
              help="Checkpoint directory to resume from.")
@click.option("--max_steps", type=int, default=None)
def resume(checkpoint_path, max_steps):
    """Resume training: weights + optimizer + epoch + RNG from checkpoint."""
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    meta = CheckpointManager(checkpoint_path).read_meta()
    cfg = config_from_dict(DeepFakeConfig, meta["hparams"])
    fit_deep_fake(cfg, resume_from=checkpoint_path, max_steps=max_steps)


@train.command()
@click.option("--config_path", required=True, help="Path to the config yaml.")
@click.option("--checkpoint_path", required=True,
              help="Checkpoint directory to load weights from.")
@click.option("--max_steps", type=int, default=None)
def modify(config_path, checkpoint_path, max_steps):
    """Load weights, overlay new hparams, fresh optimizers — the
    denoise->swap mode flip (reference ``modify``, SURVEY.md §3.5)."""
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, overlay_config, read_yaml_file_into_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    meta = CheckpointManager(checkpoint_path).read_meta()
    overrides = read_yaml_file_into_dict(config_path)
    cfg = overlay_config(DeepFakeConfig, meta["hparams"], overrides)
    fit_deep_fake(cfg, modify_from=checkpoint_path, max_steps=max_steps)


# -------------------------------------------------------------------- denoise


@cli.command()
@click.option("--config", "config_path", required=True,
              help="Path to the config yaml.")
@click.option("--input_list", "input_list", required=True,
              help="images.txt manifest of training images.")
@click.option("--max_steps", type=int, default=None)
def denoise(config_path, input_list, max_steps):
    """Train a single-model denoiser."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, load_config)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    cfg = load_config(DenoiserConfig, config_path,
                      overrides={"input_image_list_path": input_list})
    fit_denoiser(cfg, max_steps=max_steps)


# -------------------------------------------------------------------- balance


@cli.command()
@click.option("--config", "config_path", required=True,
              help="Path to the config yaml.")
@click.option("--input_list", "input_list", required=True,
              help="images.txt manifest to balance.")
@click.option("--output_list", "output_list", required=True,
              help="Where to write the difficulty-classed manifest.")
@click.option("--max_steps", type=int, default=None)
def balance(config_path, input_list, output_list, max_steps):
    """Score image difficulty and write a balanced manifest."""
    from denoising_diffusion_deep_fake_tpu.config import (
        BalanceConfig, load_config)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_balance

    cfg = load_config(BalanceConfig, config_path,
                      overrides={"data_path": input_list,
                                 "output_image_list_path": output_list})
    fit_balance(cfg, max_steps=max_steps)


# ---------------------------------------------------------------- video tools


@cli.group()
def video():
    """Dataset prep and face-swap rendering for videos."""


@video.command()
@click.argument("video_path")
@click.argument("output_dir")
@click.option("--width", type=int, default=448)
@click.option("--height", type=int, default=448)
def prep(video_path, output_dir, width, height):
    """Video -> center-cropped frame dataset + images.txt manifest."""
    from denoising_diffusion_deep_fake_tpu.data.video import (
        video_to_center_cropped_images)

    video_to_center_cropped_images(video_path, output_dir, width, height)


@video.command()
@click.argument("video_path")
@click.argument("checkpoint_path")
@click.argument("model_a_or_b", type=click.Choice(["a", "b"]))
@click.option("--width", type=int, default=448)
@click.option("--height", type=int, default=448)
@click.option("--output", default=None, help="Output mp4 path.")
@click.option("--batch_size", type=int, default=8,
              help="Frames swapped per device batch.")
@click.option("--sampler_steps", type=int, default=0,
              help="0 = single-pass parity (default; the measured quality "
                   "evidence favoring it is synthetic-blob-derived — "
                   "BASELINE.md); N>0 = scanned DDIM refinement.")
@click.option("--transfer", type=click.Choice(["rgb", "i420"]), default="rgb",
              help="Wire format: i420 halves host<->device bytes "
                   "(use on transfer-limited links).")
def swap(video_path, checkpoint_path, model_a_or_b, width, height, output,
         batch_size, sampler_steps, transfer):
    """Render a side-by-side real|fake video through a trained checkpoint."""
    from denoising_diffusion_deep_fake_tpu.data.video import render_fake_video

    render_fake_video(video_path, checkpoint_path, model_a_or_b,
                      width=width, height=height, output_path=output,
                      batch_size=batch_size, sampler_steps=sampler_steps,
                      transfer=transfer)


# ------------------------------------------------------------------ profiling


@cli.command()
@click.option("--config", "config_path", required=True,
              help="Denoiser config yaml (the profiling workload).")
@click.option("--input_list", "input_list", required=True,
              help="images.txt manifest of training images.")
@click.option("--steps", type=int, default=20,
              help="Train steps to capture (first ones include compile).")
@click.option("--trace_dir", default="profile_trace",
              help="Output dir; open with TensorBoard's profile plugin.")
@click.option("--report", is_flag=True,
              help="Also parse the trace and print per-device op-time "
                   "attribution (no TensorBoard needed).")
def profile(config_path, input_list, steps, trace_dir, report):
    """Capture a jax.profiler device trace of N train steps."""
    import json

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, load_config)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser
    from denoising_diffusion_deep_fake_tpu.utils.profiling import (
        analyze_trace_dir, trace)

    cfg = load_config(DenoiserConfig, config_path,
                      overrides={"input_image_list_path": input_list})
    with trace(trace_dir):
        fit_denoiser(cfg, max_steps=steps)
    click.echo(f"trace written to {trace_dir}")
    if report:
        # ms figures are per traced step; the FIRST steps include compile,
        # so treat them as attribution shares, not steady-state step times.
        summary = analyze_trace_dir(trace_dir, nsteps=steps)
        click.echo(json.dumps(summary if summary is not None
                              else {"error": "no .xplane.pb captured"},
                              indent=2))


# ------------------------------------------------------------------ migration


@cli.command("import")
@click.argument("ckpt_path")
@click.argument("output_dir")
def import_ckpt(ckpt_path, output_dir):
    """Convert a reference Lightning .ckpt into a native checkpoint dir.

    The result feeds `train resume/modify`, `video swap`, and `serve`."""
    from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
        import_reference_checkpoint)

    path = import_reference_checkpoint(ckpt_path, output_dir)
    click.echo(f"imported -> {path}")


@cli.command("export")
@click.argument("checkpoint_dir")
@click.argument("output_path")
@click.option("--step", type=int, default=None,
              help="Checkpoint step to export (default: latest).")
def export_ckpt(checkpoint_dir, output_path, step):
    """Convert a native checkpoint dir into a reference Lightning .ckpt.

    The inverse of `import`: hand a model trained here back to a user still
    running the reference (every supported encoder family; weights, EMA
    shadows, BN stats, and hparams carry over)."""
    from denoising_diffusion_deep_fake_tpu.utils.torch_export import (
        export_reference_checkpoint)

    info = export_reference_checkpoint(checkpoint_dir, output_path, step=step)
    click.echo(f"exported {info['keys']} tensors "
               f"(identities {','.join(info['identities'])}, "
               f"step {info['global_step']}) -> {output_path}")


# -------------------------------------------------------------------- serving


@cli.command()
@click.argument("checkpoint_path")
@click.argument("model_a_or_b", type=click.Choice(["a", "b", "both"]))
@click.option("--host", default="0.0.0.0")
@click.option("--port", type=int, default=8000)
@click.option("--width", type=int, default=448)
@click.option("--height", type=int, default=448)
@click.option("--batch_size", type=int, default=8,
              help="Static device batch; concurrent requests share it.")
@click.option("--max_wait_ms", type=float, default=5.0,
              help="Max time a lone request waits for batch company.")
@click.option("--sampler_steps", type=int, default=0,
              help="0 = single-pass parity (default; the measured quality "
                   "evidence favoring it is synthetic-blob-derived — "
                   "BASELINE.md); N>0 = scanned DDIM refinement.")
@click.option("--use_ema", is_flag=True, default=False,
              help="Swap through the EMA shadow instead of the online model.")
@click.option("--transfer", type=click.Choice(["rgb", "i420"]), default="rgb",
              help="Host<->device wire format; i420 halves transfer bytes "
                   "(clients can independently pick X-Format per request).")
@click.option("--devices", type=int, default=1,
              help="Replicate the engine across N local chips; dispatchers "
                   "share one request queue (throughput scales with chips).")
@click.option("--max_queue_frames", type=int, default=None,
              help="Admission watermark: queued frames beyond this shed with "
                   "503 + Retry-After (default 8 batches per replica).")
@click.option("--request_deadline_ms", type=float, default=None,
              help="Per-request deadline: expired requests are dropped "
                   "before dispatch (504), so overload never burns device "
                   "batches on callers that gave up. Clients can override "
                   "per request with X-Deadline-Ms. Default: no deadline.")
@click.option("--check", is_flag=True, default=False,
              help="Deployment validation: restore + compile + one device "
                   "round-trip per engine, print stats JSON, exit. "
                   "Does not listen.")
def serve(checkpoint_path, model_a_or_b, host, port, width, height,
          batch_size, max_wait_ms, sampler_steps, use_ema, transfer, devices,
          max_queue_frames, request_deadline_ms, check):
    """Long-running face-swap inference server (HTTP, micro-batched)."""
    from denoising_diffusion_deep_fake_tpu.serving.server import run_server

    run_server(checkpoint_path, model_a_or_b, host=host, port=port,
               height=height, width=width, batch_size=batch_size,
               use_ema=use_ema, sampler_steps=sampler_steps,
               max_wait_ms=max_wait_ms, transfer=transfer, devices=devices,
               max_queue_frames=max_queue_frames,
               request_deadline_ms=request_deadline_ms, check=check)


if __name__ == "__main__":
    cli()
