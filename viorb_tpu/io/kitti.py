"""KITTI odometry dataset reader.

Replaces the image-list loaders of the reference's KITTI drivers:
- `Examples/Monocular/mono_kitti.cc` (`LoadImages`: times.txt +
  image_0/%06d.png);
- `Examples/Stereo/stereo_kitti.cc` (image_0 left + image_1 right).

KITTI odometry layout:
    sequences/<NN>/times.txt        one timestamp (s) per line
    sequences/<NN>/image_0/%06d.png  left grayscale
    sequences/<NN>/image_1/%06d.png  right grayscale
"""

from __future__ import annotations

import os
from typing import Iterator

from .euroc import load_image


def read_times(root: str) -> list[float]:
    with open(os.path.join(root, "times.txt")) as f:
        return [float(line) for line in f if line.strip()]


def mono_stream(root: str, cam: str = "image_0") -> Iterator[tuple[str, float]]:
    """mono_kitti.cc LoadImages: (image_path, t)."""
    for i, t in enumerate(read_times(root)):
        yield os.path.join(root, cam, f"{i:06d}.png"), t


def stereo_stream(root: str) -> Iterator[tuple[str, str, float]]:
    """stereo_kitti.cc LoadImages: (left_path, right_path, t)."""
    for i, t in enumerate(read_times(root)):
        yield (
            os.path.join(root, "image_0", f"{i:06d}.png"),
            os.path.join(root, "image_1", f"{i:06d}.png"),
            t,
        )


__all__ = ["read_times", "mono_stream", "stereo_stream", "load_image"]
