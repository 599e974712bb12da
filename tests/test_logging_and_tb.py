"""Logging scheduler cadence + TB logger artifact tests."""

import numpy as np

from denoising_diffusion_deep_fake_tpu.utils import (
    LoggingScheduler,
    TensorBoardLogger,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def test_scheduler_cadence_matches_reference_thresholds():
    clock = FakeClock()
    s = LoggingScheduler(clock)
    # First minute: 10 s interval.
    assert s.interval_for_elapsed(30) == 10
    # Until 15 min: 1 min.
    assert s.interval_for_elapsed(5 * 60) == 60
    # Until 2 h: 10 min.
    assert s.interval_for_elapsed(60 * 60) == 600
    # After: hourly.
    assert s.interval_for_elapsed(3 * 3600) == 3600


def test_scheduler_step_keyed_decision():
    clock = FakeClock()
    s = LoggingScheduler(clock)
    s.update_with_step_number(0)
    assert not s.should_we_log_this_step()  # 0 s elapsed < 10 s
    clock.t += 11
    s.update_with_step_number(1)
    assert s.should_we_log_this_step()
    # Same step again: decision must not flip (reference keys on step change).
    s.update_with_step_number(1)
    assert s.should_we_log_this_step()
    # Next step too soon (1 s since last log < 10 s interval): no log.
    clock.t += 1
    s.update_with_step_number(2)
    assert not s.should_we_log_this_step()


def test_scheduler_safe_before_any_update():
    # Reference's log_this_step was unset before first update (SURVEY
    # appendix #5); ours must default False.
    assert not LoggingScheduler(FakeClock()).should_we_log_this_step()


def test_tb_logger_writes_event_files(tmp_path, rng):
    logger = TensorBoardLogger(tmp_path / "tb")
    logger.log_scalars({"loss": 0.5, "epoch": 1.0}, step=3)
    batch = rng.random((9, 8, 8, 3)).astype(np.float32) * 2 - 1
    import jax.numpy as jnp

    logger.log_batch_as_image_grid("panel", jnp.asarray(batch), step=3)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.hist([1, 2, 2, 3])
    logger.log_figure("hist", fig, step=3)
    plt.close(fig)
    logger.close()

    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


def test_figure_to_rgb_array():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from denoising_diffusion_deep_fake_tpu.utils.tb import figure_to_rgb_array

    fig, ax = plt.subplots()
    ax.plot([0, 1], [1, 0])
    arr = figure_to_rgb_array(fig)
    plt.close(fig)
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8


def test_profile_cli_writes_trace(tmp_path):
    """`d3f-tpu profile` captures a jax.profiler trace end to end."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from click.testing import CliRunner

    from denoising_diffusion_deep_fake_tpu.main import cli
    from helpers import make_image_dataset

    manifest = make_image_dataset(tmp_path, n=4, size=32, seed=0)
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(f"""
batch_size: 2
learning_rate: 0.001
max_epochs: 1
encoder_name: resnet18
compute_dtype: float32
noise_exponential_sampling_lambda: 3.0
log_dir: {tmp_path}/runs
checkpoint_dir: {tmp_path}/ckpt
""")
    trace_dir = tmp_path / "trace"
    result = CliRunner().invoke(cli, [
        "profile", "--config", str(cfg), "--input_list", str(manifest),
        "--steps", "2", "--trace_dir", str(trace_dir), "--report"])
    assert result.exit_code == 0, result.output
    traces = list(trace_dir.rglob("*.xplane.pb"))
    assert traces, f"no trace files under {trace_dir}"
    # --report parses the capture without TensorBoard: the plane listing
    # must appear on stdout (device-plane analysis needs real TPU planes).
    assert '"planes"' in result.output, result.output


def test_tb_logger_accepts_device_built_grid(tmp_path, rng):
    """The uint8 pass-through path (ops.image.panel_grid_u8 output) writes
    the same image summary the float-batch path would."""
    from denoising_diffusion_deep_fake_tpu.ops.image import panel_grid_u8
    import jax.numpy as jnp

    batch = jnp.asarray(rng.random((9, 8, 8, 3)).astype(np.float32) * 2 - 1)
    d = tmp_path / "tb_u8"
    logger = TensorBoardLogger(d)
    logger.log_batch_as_image_grid("panel", panel_grid_u8(batch), step=1)
    logger.flush()
    logger.close()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    acc = EventAccumulator(str(d))
    acc.Reload()
    assert acc.Images("panel")[0].step == 1
