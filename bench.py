"""End-to-end per-frame tracking benchmark on one TPU chip.

Measures the steady-state (post-compile) latency of the two per-frame hot
stages, mirroring the reference's per-frame cost model
(`/root/reference/src/Tracking.cc:81,1071,1261` — frame construction
>20 ms + IMU/local-map pose optimization 16-38 ms on an i7, i.e. the
reference runs at ~1x real time at 20 Hz):

  1. ORB extraction on a 752x480 image (pyramid/FAST/rBRIEF), and
  2. a full tracking step against a populated map (frustum gating,
     projection matching over 1000 features, 4x10 LM pose optimization).

Prints ONE JSON line: frames/s per chip; vs_baseline is the speedup over
the reference's 20 frames/s real-time rate.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import __graft_entry__ as g
    from viorb_tpu.ops import orb
    from viorb_tpu.pipeline import tracking

    n_feat = 1000  # the reference's EuRoC setting (ORBextractor.nFeatures)
    m, frame, Rl, tl, assoc_last = g._build_map_and_frame(n_feat=n_feat)

    # synthetic textured image for the extractor
    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (g.H, g.W)).astype(np.float32)
    k = np.ones((5, 5), np.float32) / 25.0
    from scipy.signal import convolve2d  # type: ignore

    try:
        img = convolve2d(img, k, mode="same").astype(np.float32)
    except Exception:
        pass
    img = jnp.asarray(img * 40.0 + 128.0)

    params = orb.OrbParams(n_features=n_feat, height=g.H, width=g.W)
    extract_jit = jax.jit(lambda im: orb.extract(im, params))

    def track_fn(m, frame, Rl, tl, assoc_last):
        out, m2 = tracking.track_local_map(
            m, frame, Rl, tl, assoc_last, g.CAM, float(g.W), float(g.H)
        )
        return out.Rcw, out.tcw, out.n_inliers

    track_jit = jax.jit(track_fn)

    # warmup / compile
    feats = extract_jit(img)
    jax.block_until_ready(feats)
    out = track_jit(m, frame, Rl, tl, assoc_last)
    jax.block_until_ready(out)

    def timed(fn, n=30, reps=5):
        """Median of `reps` timed blocks — the remote-tunnel dispatch has
        multi-x tail noise that a single block would fold into the score."""
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn()
            jax.block_until_ready(r)
            best.append((time.perf_counter() - t0) / n)
        best.sort()
        return best[len(best) // 2], r

    t_extract, feats = timed(lambda: extract_jit(img))
    t_track, out = timed(lambda: track_jit(m, frame, Rl, tl, assoc_last))

    ms = (t_extract + t_track) * 1e3
    fps = 1e3 / ms
    print(
        json.dumps(
            {
                "metric": "mono_tracking_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 2),
                "detail": {
                    "extract_ms": round(t_extract * 1e3, 2),
                    "track_ms": round(t_track * 1e3, 2),
                    "n_inliers": int(out[2]),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
