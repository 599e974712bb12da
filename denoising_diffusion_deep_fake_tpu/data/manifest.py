"""``images.txt`` manifest reading/writing.

Parity target: ``ImageDataset.read_list_of_image_paths``
(`/root/reference/d3f/dataset/image_dataset.py:15-27`): one relative path per
line, resolved against the manifest file's own directory. Writing is the new
half the balancer needs (`--output_list` was accepted but never written in the
reference — SURVEY.md §2 #7).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, Sequence


def read_image_manifest(manifest_path) -> list[Path]:
    """Read image paths from a manifest, resolved relative to its directory."""
    manifest_path = Path(manifest_path)
    base = manifest_path.parent
    paths = []
    with open(manifest_path) as f:
        for line in f:
            line = line.strip()
            if line:
                # Balanced manifests carry "<path>\t<difficulty_class>" lines;
                # keep only the path column.
                paths.append(base / line.split("\t")[0])
    return paths


def write_image_manifest(manifest_path, image_paths: Sequence,
                         difficulty_classes: Iterable[int] | None = None) -> None:
    """Write a manifest of paths relative to the manifest's directory.

    With ``difficulty_classes``, each line is ``<path>\t<class>`` — the
    balancer's completed output format (consumable by
    ``read_image_manifest``, which keeps only the path column).
    """
    manifest_path = Path(manifest_path)
    manifest_path.parent.mkdir(parents=True, exist_ok=True)
    base = manifest_path.parent
    with open(manifest_path, "w") as f:
        if difficulty_classes is None:
            for p in image_paths:
                f.write(f"{os.path.relpath(Path(p), base)}\n")
        else:
            for p, c in zip(image_paths, difficulty_classes):
                f.write(f"{os.path.relpath(Path(p), base)}\t{int(c)}\n")


def split_manifest_line(line: str) -> tuple[str, int | None]:
    """Parse a manifest line into (relative_path, difficulty_class | None)."""
    parts = line.rstrip("\n").split("\t")
    if len(parts) == 2:
        return parts[0], int(parts[1])
    return parts[0], None


def read_image_manifest_with_classes(manifest_path):
    """Read (paths, difficulty_classes) from a manifest.

    ``difficulty_classes`` is None for plain manifests; for balanced
    manifests (the balancer's ``--output_list``) it is a list of ints
    aligned with ``paths``.
    """
    manifest_path = Path(manifest_path)
    base = manifest_path.parent
    paths, classes = [], []
    with open(manifest_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rel, cls = split_manifest_line(line)
            paths.append(base / rel)
            classes.append(cls)
    if any(c is None for c in classes):
        return paths, None
    return paths, classes
