"""Headless visualization: frame overlay, map rendering, viewer loop.

The reference's GUI layer is three Pangolin/OpenCV classes —
`src/FrameDrawer.cc` (current image + keypoints + status bar),
`src/MapDrawer.cc` (OpenGL map points, keyframe frusta, covisibility
graph, current camera) and `src/Viewer.cc` (render thread at camera fps
with menu toggles). A TPU deployment is headless, so the equivalents here
render to numpy images / PNG files with the same content semantics:

- `FrameDrawer.draw(...)`  -> (H, W, 3) uint8: keypoints colored by state
  (map-matched green boxes, unmatched blue dots) + status text analog
  returned separately;
- `MapDrawer.draw(...)`    -> matplotlib figure of landmarks, keyframe
  frusta, covisibility edges and the current camera, projected to a
  chosen plane pair or 3D;
- `Viewer`                 -> a host-side loop writing PNGs every N frames
  (the render-at-fps thread analog, minus the interactive menu).

All inputs are host numpy / MapArrays — nothing here touches the device.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


# ----------------------------------------------------------------------------
# FrameDrawer (src/FrameDrawer.cc): keypoint overlay + status line
# ----------------------------------------------------------------------------


def _draw_square(img: np.ndarray, x: int, y: int, r: int, color):
    h, w = img.shape[:2]
    x0, x1 = max(0, x - r), min(w - 1, x + r)
    y0, y1 = max(0, y - r), min(h - 1, y + r)
    img[y0, x0:x1 + 1] = color
    img[y1, x0:x1 + 1] = color
    img[y0:y1 + 1, x0] = color
    img[y0:y1 + 1, x1] = color


def _draw_dot(img: np.ndarray, x: int, y: int, color):
    h, w = img.shape[:2]
    if 0 <= y < h and 0 <= x < w:
        img[max(0, y - 1): y + 2, max(0, x - 1): x + 2] = color


GREEN = np.array([0, 220, 0], np.uint8)
BLUE = np.array([60, 60, 255], np.uint8)
RED = np.array([255, 40, 40], np.uint8)


class FrameDrawer:
    """Draws the current frame with its keypoints (FrameDrawer::DrawFrame):
    green squares = features matched to map points, blue dots = extracted
    but unmatched features; returns the image and the status text."""

    def __init__(self):
        self.n_tracked = 0

    def draw(
        self,
        image: np.ndarray,  # (H, W) grayscale float or uint8
        xy: np.ndarray,  # (N, 2) keypoint positions
        valid: np.ndarray,  # (N,) extracted-feature mask
        matched: np.ndarray | None = None,  # (N,) matched-to-map mask
        state: str = "OK",
        box: int = 3,
    ) -> tuple[np.ndarray, str]:
        img = np.asarray(image)
        if img.ndim == 2:
            g = np.clip(img, 0, 255).astype(np.uint8)
            rgb = np.stack([g, g, g], -1)
        else:
            rgb = np.ascontiguousarray(img[..., :3]).astype(np.uint8)
        xy = np.asarray(xy)
        valid = np.asarray(valid, bool)
        matched = (
            np.zeros_like(valid) if matched is None else np.asarray(matched, bool)
        )
        for i in np.where(valid)[0]:
            x, y = int(round(xy[i, 0])), int(round(xy[i, 1]))
            if matched[i]:
                _draw_square(rgb, x, y, box, GREEN)
                _draw_dot(rgb, x, y, GREEN)
            else:
                _draw_dot(rgb, x, y, BLUE)
        self.n_tracked = int((valid & matched).sum())
        status = (
            f"{state} | KPs: {int(valid.sum())}, matches: {self.n_tracked}"
        )
        return rgb, status


# ----------------------------------------------------------------------------
# MapDrawer (src/MapDrawer.cc): landmarks + frusta + covisibility + camera
# ----------------------------------------------------------------------------


def camera_centers(Rcw: np.ndarray, tcw: np.ndarray) -> np.ndarray:
    """(K, 3) world camera centers from world->cam poses."""
    return -np.einsum("kji,kj->ki", Rcw, tcw)


def frustum_segments(
    Rcw: np.ndarray, tcw: np.ndarray, size: float = 0.1
) -> np.ndarray:
    """(K, 8, 2, 3) line segments of a wireframe camera frustum per KF
    (MapDrawer::DrawKeyFrames' pyramid: apex + 4 image-plane corners)."""
    w, h, z = size, size * 0.75, size * 0.6
    corners = np.array(
        [[-w, -h, z], [w, -h, z], [w, h, z], [-w, h, z]], np.float64
    )
    K = len(Rcw)
    Rwc = np.transpose(Rcw, (0, 2, 1))
    C = camera_centers(Rcw, tcw)
    pts = C[:, None, :] + np.einsum("kij,cj->kci", Rwc, corners)  # (K, 4, 3)
    segs = np.empty((K, 8, 2, 3))
    for c in range(4):
        segs[:, c, 0] = C
        segs[:, c, 1] = pts[:, c]
        segs[:, 4 + c, 0] = pts[:, c]
        segs[:, 4 + c, 1] = pts[:, (c + 1) % 4]
    return segs


@dataclass
class MapDrawer:
    """Renders the map to a matplotlib figure (MapDrawer::DrawMapPoints/
    DrawKeyFrames/DrawCurrentCamera + the covisibility graph)."""

    keyframe_size: float = 0.1  # Viewer.KeyFrameSize yaml key analog
    point_size: float = 1.5  # Viewer.PointSize
    show_graph: bool = True
    min_covis_weight: int = 15  # covisibility edge threshold (KeyFrame.cc:780)

    def draw(
        self,
        lm_pos: np.ndarray,  # (L, 3)
        lm_valid: np.ndarray,  # (L,)
        Rcw: np.ndarray,  # (K, 3, 3) keyframe poses
        tcw: np.ndarray,  # (K, 3)
        n_kfs: int,
        assoc: np.ndarray | None = None,  # (K, N) landmark ids per KF feature
        current: tuple[np.ndarray, np.ndarray] | None = None,  # (Rcw, tcw)
        elev: float = -60.0,
        azim: float = -90.0,
    ):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(8, 8))
        ax = fig.add_subplot(projection="3d")
        pts = np.asarray(lm_pos)[np.asarray(lm_valid, bool)]
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=self.point_size,
                       c="k", alpha=0.4, linewidths=0)

        Rk, tk = np.asarray(Rcw)[:n_kfs], np.asarray(tcw)[:n_kfs]
        segs = frustum_segments(Rk, tk, self.keyframe_size)
        for k in range(n_kfs):
            for s in segs[k]:
                ax.plot(*s.T, c="b", lw=0.5)

        if self.show_graph and assoc is not None and n_kfs > 1:
            C = camera_centers(Rk, tk)
            a = np.asarray(assoc)[:n_kfs]
            for i in range(n_kfs):
                oi = set(a[i][a[i] >= 0].tolist())
                for jj in range(i + 1, n_kfs):
                    w = len(oi.intersection(a[jj][a[jj] >= 0].tolist()))
                    if w >= self.min_covis_weight:
                        ax.plot(*np.stack([C[i], C[jj]]).T, c="g", lw=0.4,
                                alpha=0.6)

        if current is not None:
            for s in frustum_segments(
                np.asarray(current[0])[None], np.asarray(current[1])[None],
                self.keyframe_size * 1.5,
            )[0]:
                ax.plot(*s.T, c="r", lw=1.2)

        ax.view_init(elev=elev, azim=azim)
        ax.set_box_aspect((1, 1, 1))
        return fig

    def save(self, path: str, *args, **kw):
        fig = self.draw(*args, **kw)
        fig.savefig(path, dpi=110, bbox_inches="tight")
        import matplotlib.pyplot as plt

        plt.close(fig)


# ----------------------------------------------------------------------------
# Viewer (src/Viewer.cc): periodic render loop, headless
# ----------------------------------------------------------------------------


@dataclass
class Viewer:
    """Headless viewer: call `update(...)` once per tracked frame; every
    `every` frames it writes `frame_%06d.png` and `map_%06d.png` into
    `out_dir` (the render-at-fps thread analog of Viewer::Run)."""

    out_dir: str
    every: int = 20
    frame_drawer: FrameDrawer = field(default_factory=FrameDrawer)
    map_drawer: MapDrawer = field(default_factory=MapDrawer)
    enabled: bool = True

    def __post_init__(self):
        self._n = 0
        os.makedirs(self.out_dir, exist_ok=True)

    def update(self, system, image, frame_xy, frame_valid, matched=None):
        """system: a pipeline object exposing `.map` (MapArrays) and
        `.state`; draws + saves when due."""
        self._n += 1
        if not self.enabled or self._n % self.every:
            return None
        from PIL import Image

        rgb, status = self.frame_drawer.draw(
            image, frame_xy, frame_valid, matched, state=str(system.state)
        )
        fp = os.path.join(self.out_dir, f"frame_{self._n:06d}.png")
        Image.fromarray(rgb).save(fp)
        m = system.map
        mp = os.path.join(self.out_dir, f"map_{self._n:06d}.png")
        self.map_drawer.save(
            mp,
            np.asarray(m.lms.pos), np.asarray(m.lms.valid),
            np.asarray(m.kfs.Rcw), np.asarray(m.kfs.tcw), int(m.n_kfs),
            assoc=np.asarray(m.assoc),
        )
        return {"frame_png": fp, "map_png": mp, "status": status}
