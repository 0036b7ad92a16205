#!/usr/bin/env python
"""ATE evaluation harness.

Equivalent of the reference's evaluation pipeline
(`dataProcessingForEuRoCSingleSequence.sh:36-86` + the TUM rgbd-benchmark
scripts): compares an estimated TUM-format trajectory against ground truth
in BOTH alignment variants — auto-scale (Sim3) and estimated-scale (SE3,
scale fixed at 1, trusting the VIO metric scale).

Usage:
    python examples/evaluate_ate.py est.txt groundtruth.txt
Ground truth in TUM format (use viorb_tpu.io.euroc.groundtruth_to_tum for
EuRoC state_groundtruth_estimate0 CSVs).
"""

import json
import sys

import numpy as np

import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_ROOT, _os.path.join(_ROOT, "tests")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)
from viorb_tpu.io import evaluate


def load_tum(path):
    rows = np.loadtxt(path)
    return rows[:, 0], rows[:, 1:4]


def main():
    if len(sys.argv) < 3 or sys.argv[1] in ("-h", "--help"):
        print(__doc__.strip())
        sys.exit(0 if len(sys.argv) > 1 else 1)
    est_path, gt_path = sys.argv[1], sys.argv[2]
    ts_e, p_e = load_tum(est_path)
    ts_g, p_g = load_tum(gt_path)
    rmse_auto, scale, _ = evaluate.ate_rmse(ts_e, p_e, ts_g, p_g, with_scale=True)
    rmse_est, _, _ = evaluate.ate_rmse(ts_e, p_e, ts_g, p_g, with_scale=False)
    print(json.dumps({
        "ate_rmse_autoscale_m": round(rmse_auto, 5),
        "ate_rmse_estimatedscale_m": round(rmse_est, 5),
        "sim3_scale": round(scale, 5),
        "n_est": len(ts_e),
    }))


if __name__ == "__main__":
    main()
