"""TUM RGB-D dataset reader (freiburg sequences).

Replaces the image-list loaders of the reference's TUM drivers:
- `Examples/Monocular/mono_tum.cc` (`LoadImages`: rgb.txt -> t, path);
- `Examples/RGB-D/rgbd_tum.cc` (`LoadImages`: associations file ->
  t, rgb path, depth path — produced by the TUM associate.py tool).

TUM layout:
    rgb.txt                 "# comments", then "t rgb/<t>.png"
    depth.txt               "t depth/<t>.png"
    associations.txt        "t_rgb rgb/<>.png t_d depth/<>.png"
    groundtruth.txt         "t x y z qx qy qz qw"

Depth images are 16-bit PNG with factor 5000 (DepthMapFactor in the
reference YAMLs — `Examples/RGB-D/TUM1.yaml`).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from .euroc import load_image

TUM_DEPTH_FACTOR = 5000.0  # DepthMapFactor: depth_png / 5000 = meters


def _read_list(path: str, n_cols: int) -> list[list[str]]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= n_cols:
                rows.append(parts[:n_cols])
    return rows


def mono_stream(root: str) -> Iterator[tuple[str, float]]:
    """mono_tum.cc LoadImages: (image_path, t) from rgb.txt."""
    for t, rel in _read_list(os.path.join(root, "rgb.txt"), 2):
        yield os.path.join(root, rel), float(t)


def associate(root: str, max_dt: float = 0.02) -> list[tuple[float, str, str]]:
    """Pair rgb.txt and depth.txt by nearest timestamp (the TUM
    associate.py algorithm): greedy best pairing within max_dt."""
    rgb = [(float(t), r) for t, r in _read_list(os.path.join(root, "rgb.txt"), 2)]
    dep = [(float(t), r) for t, r in _read_list(os.path.join(root, "depth.txt"), 2)]
    pairs = []
    di = 0
    for t, r in rgb:
        while di + 1 < len(dep) and abs(dep[di + 1][0] - t) <= abs(dep[di][0] - t):
            di += 1
        if dep and abs(dep[di][0] - t) <= max_dt:
            pairs.append((t, r, dep[di][1]))
    return pairs


def rgbd_stream(
    root: str, associations: str | None = None
) -> Iterator[tuple[str, str, float]]:
    """rgbd_tum.cc LoadImages: (rgb_path, depth_path, t). Reads the
    associations file when given, else pairs rgb.txt/depth.txt directly."""
    if associations:
        for t_rgb, rgb, _t_d, dep in _read_list(associations, 4):
            yield os.path.join(root, rgb), os.path.join(root, dep), float(t_rgb)
    else:
        for t, rgb, dep in associate(root):
            yield os.path.join(root, rgb), os.path.join(root, dep), t


def load_depth(path: str, factor: float = TUM_DEPTH_FACTOR) -> np.ndarray:
    """(H, W) float32 depth in meters (0 = invalid)."""
    from PIL import Image

    d = np.asarray(Image.open(path), np.float32)
    return d / factor


__all__ = [
    "mono_stream", "rgbd_stream", "associate", "load_depth", "load_image",
    "TUM_DEPTH_FACTOR",
]
