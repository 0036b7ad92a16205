"""Image/IMU message synchronization.

Replaces `MsgSynchronizer`
(`/root/reference/Examples/ROS/ORB_VIO/src/MsgSync/MsgSynchronizer.{h,cc}`):
pair each image with every IMU sample of timestamp < t_image - delay
(MsgSynchronizer.cc:130-160), reset on a > 3 s stream discontinuity
(:87-110), and clear state after 10 consecutive unsynchronized images
(:146-152).
"""

from __future__ import annotations

from collections import deque
from typing import NamedTuple

import numpy as np


class SyncedFrame(NamedTuple):
    image: object  # caller-defined payload (path, array, ...)
    timestamp: float  # image time shifted by -delay (t used for tracking)
    imu: np.ndarray  # (n, 7) [gx gy gz ax ay az dt] rows since last frame


class MsgSynchronizer:
    """Streaming pairing of an image queue and an IMU queue."""

    def __init__(self, image_delay: float = 0.0, max_gap_s: float = 3.0,
                 max_unsynced: int = 10):
        self.image_delay = image_delay
        self.max_gap_s = max_gap_s
        self.max_unsynced = max_unsynced
        self._images: deque = deque()
        self._imu: deque = deque()  # (t, gx, gy, gz, ax, ay, az)
        self._last_imu_t: float | None = None
        self._last_image_t: float | None = None
        self._last_emitted_imu_t: float | None = None
        self._unsynced = 0

    def add_image(self, payload, t: float):
        if self._last_image_t is not None and t - self._last_image_t > self.max_gap_s:
            self.clear()  # stream discontinuity (MsgSynchronizer.cc:87-110)
        self._last_image_t = t
        self._images.append((payload, t))

    def add_imu(self, t: float, gyro, acc):
        if self._last_imu_t is not None and t - self._last_imu_t > self.max_gap_s:
            self.clear()
        self._last_imu_t = t
        self._imu.append((t, *gyro, *acc))

    def clear(self):
        self._images.clear()
        self._imu.clear()
        self._last_emitted_imu_t = None
        self._unsynced = 0

    def get_recent(self) -> SyncedFrame | None:
        """Pop the oldest image whose IMU prefix is complete (i.e. an IMU
        sample newer than the image exists), with all IMU samples up to
        t_img - delay. Returns None if not ready."""
        if not self._images:
            return None
        payload, t_img = self._images[0]
        t_cut = t_img - self.image_delay
        if not self._imu or self._imu[-1][0] < t_cut:
            self._unsynced += 1
            if self._unsynced > self.max_unsynced:
                self.clear()
            return None
        self._unsynced = 0
        self._images.popleft()
        rows = []
        prev_t = self._last_emitted_imu_t
        while self._imu and self._imu[0][0] < t_cut:
            s = self._imu.popleft()
            dt = 0.0 if prev_t is None else s[0] - prev_t
            prev_t = s[0]
            rows.append([*s[1:7], max(dt, 0.0)])
        self._last_emitted_imu_t = t_cut if prev_t is None else prev_t
        imu = np.asarray(rows, np.float32).reshape(-1, 7)
        return SyncedFrame(image=payload, timestamp=t_cut, imu=imu)
