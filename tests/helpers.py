"""Shared test fixtures: synthetic image datasets with manifests."""

from pathlib import Path

import numpy as np


def make_image_dataset(root: Path, n: int = 12, size: int = 16,
                       seed: int = 0, subdir: str = "",
                       manifest_name: str = "images.txt") -> Path:
    """Write n random JPEGs + an images.txt manifest; returns manifest path."""
    import cv2

    rng = np.random.default_rng(seed)
    img_dir = root / subdir if subdir else root
    img_dir.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n):
        img = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        name = f"{i:06d}.png"  # png: lossless, keeps tests deterministic
        assert cv2.imwrite(str(img_dir / name), img)
        names.append((f"{subdir}/" if subdir else "") + name)
    manifest = root / manifest_name
    manifest.write_text("".join(f"{n}\n" for n in names))
    return manifest
