"""TensorBoard logging (scalars, image grids, figures).

The reference logs through Lightning's TB logger: scalars via ``self.log``,
3x3 image grids via ``add_image``, and the balancer's matplotlib histogram as
an image (`/root/reference/d3f/train_deep_fake/lit_module.py:235-249`,
`d3f/balance_training_images/lit_module.py:142-161`,
`d3f/helpers/convert_pyplot_figure_to_image_tensor.py:9-17`). Here the same
artifacts flow through ``tensorboardX`` directly (no Lightning), and image
panels are produced from NHWC device arrays via ``ops.image.grid_to_display``.
"""

from __future__ import annotations

import io
from pathlib import Path

import numpy as np

from denoising_diffusion_deep_fake_tpu.ops.image import grid_to_display


def figure_to_rgb_array(figure) -> np.ndarray:
    """matplotlib figure -> HWC uint8 RGB (JPEG round-trip like the reference
    helper, `convert_pyplot_figure_to_image_tensor.py:9-17`)."""
    from PIL import Image

    buf = io.BytesIO()
    figure.savefig(buf, format="jpeg")
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


class TensorBoardLogger:
    """Thin writer: scalars, NHWC batch grids, matplotlib figures."""

    def __init__(self, log_dir):
        from tensorboardX import SummaryWriter

        Path(log_dir).mkdir(parents=True, exist_ok=True)
        self.writer = SummaryWriter(str(log_dir))

    def log_scalars(self, metrics: dict, step: int) -> None:
        for tag, value in metrics.items():
            self.writer.add_scalar(tag, float(value), step)

    def log_batch_as_image_grid(self, tag: str, batch, step: int,
                                nrow: int = 3) -> None:
        """3x3 grid, x*0.5+0.5 denorm, clamp — the reference's panel format.

        Accepts either a normalized NHWC float batch (gridded here, the
        original path) or a display-ready HWC uint8 grid the step already
        built on device (``ops.image.panel_grid_u8`` — the cheap-transfer
        path; passed through untouched)."""
        arr = np.asarray(batch)
        if arr.ndim == 3 and arr.dtype == np.uint8:
            self.writer.add_image(tag, arr, step, dataformats="HWC")
            return
        grid = np.asarray(grid_to_display(batch, nrow=nrow))
        self.writer.add_image(tag, grid, step, dataformats="HWC")

    def log_figure(self, tag: str, figure, step: int) -> None:
        self.writer.add_image(tag, figure_to_rgb_array(figure), step,
                              dataformats="HWC")

    def flush(self) -> None:
        self.writer.flush()

    def close(self) -> None:
        self.writer.close()
