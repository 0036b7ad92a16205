"""EuRoC MAV dataset reader (ASL folder layout) + ground-truth transform.

Replaces the offline halves of the reference's drivers:
- `Examples/Monocular/mono_euroc.cc` — image list + timestamps;
- `Examples/ROS/ORB_VIO/src/ros_vio_readrosbag.cc` — deterministic paired
  image/IMU stream (here from mav0/cam0 + mav0/imu0 CSVs instead of a bag);
- `Examples/ROS/ORB_VIO/src/EuRoC_GT_Transform.cc` — state_groundtruth CSV
  to TUM-format groundtruth.txt.

Layout expected (standard EuRoC ASL zip):
    mav0/cam0/data.csv            timestamp[ns], filename
    mav0/cam0/data/<stamp>.png
    mav0/imu0/data.csv            t[ns], wx, wy, wz, ax, ay, az
    mav0/state_groundtruth_estimate0/data.csv
"""

from __future__ import annotations

import csv
import os
from typing import Iterator, NamedTuple

import numpy as np

from .sync import MsgSynchronizer, SyncedFrame


def load_image(path: str) -> np.ndarray:
    """Grayscale float32 (H, W) in [0, 255].

    Uses the native C++ decoder (native/src/loader.cpp) when available;
    falls back to PIL. For bulk streaming use `prefetch_images`, which
    decodes ahead on C++ worker threads.
    """
    from .. import native

    im = native.decode_image(path)
    if im is not None:
        return im
    from PIL import Image

    pim = Image.open(path)
    if pim.mode != "L":
        pim = pim.convert("L")
    return np.asarray(pim, np.float32)


def prefetch_images(paths, n_threads: int = 4, capacity: int = 16):
    """Ordered iterator of decoded (H, W) float32 images, decoding ahead
    on native worker threads; falls back to synchronous load_image."""
    from .. import native

    if native.available():
        it = iter(native.ImageLoader(paths, n_threads, capacity))
        for p, im in zip(paths, it):
            yield im if im is not None else load_image(p)
    else:  # pragma: no cover - toolchain-dependent
        for p in paths:
            yield load_image(p)


def read_cam_csv(root: str, cam: str = "cam0"):
    """[(t_seconds, image_path)] from mav0/<cam>/data.csv."""
    base = os.path.join(root, "mav0", cam)
    out = []
    with open(os.path.join(base, "data.csv")) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            t = int(row[0]) * 1e-9
            out.append((t, os.path.join(base, "data", row[1].strip())))
    return out


def read_imu_csv(root: str, imu: str = "imu0") -> np.ndarray:
    """(N, 7) rows [t_seconds, wx, wy, wz, ax, ay, az]."""
    path = os.path.join(root, "mav0", imu, "data.csv")
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append([int(row[0]) * 1e-9] + [float(v) for v in row[1:7]])
    return np.asarray(rows, np.float64)


def groundtruth_to_tum(root: str, out_path: str,
                       gt_dir: str = "state_groundtruth_estimate0"):
    """EuRoC_GT_Transform.cc: data.csv -> TUM 'groundtruth.txt'
    (t x y z qx qy qz qw; EuRoC stores q as w x y z)."""
    path = os.path.join(root, "mav0", gt_dir, "data.csv")
    with open(path) as f, open(out_path, "w") as g:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            t = int(row[0]) * 1e-9
            x, y, z = row[1:4]
            qw, qx, qy, qz = row[4:8]
            g.write(f"{t:.6f} {x} {y} {z} {qx} {qy} {qz} {qw}\n")


class ViSample(NamedTuple):
    image_path: str
    timestamp: float
    imu: np.ndarray  # (n, 7) [gx gy gz ax ay az dt]


def vi_stream(
    root: str,
    image_delay: float = 0.0,  # Camera.delaytoimu
    discard_time: float = 0.0,  # test.DiscardTime
) -> Iterator[ViSample]:
    """Deterministic paired image+IMU stream (ros_vio_readrosbag semantics:
    all messages replayed in time order through the synchronizer)."""
    cams = read_cam_csv(root)
    imu = read_imu_csv(root)
    t0 = min(cams[0][0], imu[0, 0]) + discard_time

    sync = MsgSynchronizer(image_delay=image_delay)
    ci = ii = 0
    while ci < len(cams) or ii < len(imu):
        t_img = cams[ci][0] if ci < len(cams) else np.inf
        t_imu = imu[ii, 0] if ii < len(imu) else np.inf
        if t_imu <= t_img:
            if t_imu >= t0:
                sync.add_imu(t_imu, imu[ii, 1:4], imu[ii, 4:7])
            ii += 1
        else:
            if t_img >= t0:
                sync.add_image(cams[ci][1], t_img)
            ci += 1
        frame: SyncedFrame | None = sync.get_recent()
        if frame is not None:
            yield ViSample(
                image_path=frame.image, timestamp=frame.timestamp,
                imu=frame.imu,
            )


def mono_stream(root: str) -> Iterator[tuple[str, float]]:
    """mono_euroc.cc: (image_path, t) in time order."""
    for t, path in read_cam_csv(root):
        yield path, t


def stereo_stream(
    root: str, max_dt: float = 0.005
) -> Iterator[tuple[str, str, float]]:
    """stereo_euroc.cc: (left_path, right_path, t) — cam0/cam1 frames
    paired by (near-)equal timestamp. EuRoC cameras are hardware-synced so
    stamps normally match exactly; frames without a partner are skipped."""
    left = read_cam_csv(root, "cam0")
    right = read_cam_csv(root, "cam1")
    ri = 0
    for t, lp in left:
        while ri + 1 < len(right) and abs(right[ri + 1][0] - t) <= abs(right[ri][0] - t):
            ri += 1
        if right and abs(right[ri][0] - t) <= max_dt:
            yield lp, right[ri][1], t
