#!/usr/bin/env python
"""Plot VIO-initialization convergence from the per-attempt dump files.

Equivalent of the reference's MATLAB scripts
(`/root/reference/Examples/ROS/ORB_VIO/results/plot*.m` — e.g.
plotGroundTruthAndEstimatedExtrinsicParametersForVIORB.m): reads the
txt files written when `test.InitVIOTmpPath` is set (scale.txt, gw.txt,
biasg.txt, biasa.txt, R_bc_estimate.txt, p_bc_refined.txt,
Processing_Time.txt) and renders one convergence figure.

Usage:
    python tools/plot_vio_init.py <dump_dir> [--out init.png]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


FILES = [
    ("scale", ["s*", "s_refined"]),
    ("gw", ["gx*", "gy*", "gz*", "gx", "gy", "gz"]),
    ("biasg", ["bgx", "bgy", "bgz"]),
    ("biasa", ["bax", "bay", "baz"]),
    ("R_bc_estimate", ["yaw", "pitch", "roll"]),
    ("p_bc_refined", ["px", "py", "pz"]),
    ("Processing_Time", ["ms"]),
]


def load(path):
    rows = [[float(v) for v in line.split()] for line in open(path)
            if line.strip()]
    a = np.asarray(rows)
    return a[:, 0], a[:, 1:]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dump_dir")
    ap.add_argument("--out", default="vio_init.png")
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    present = [
        (n, lbls) for n, lbls in FILES
        if os.path.exists(os.path.join(args.dump_dir, f"{n}.txt"))
    ]
    if not present:
        ap.error(f"no dump files in {args.dump_dir}")
    fig, axes = plt.subplots(
        len(present), 1, figsize=(8, 2.2 * len(present)), sharex=True
    )
    if len(present) == 1:
        axes = [axes]
    for ax, (name, labels) in zip(axes, present):
        t, vals = load(os.path.join(args.dump_dir, f"{name}.txt"))
        t = t - t[0]
        for c in range(vals.shape[1]):
            lbl = labels[c] if c < len(labels) else f"c{c}"
            ax.plot(t, vals[:, c], lw=1.0, label=lbl)
        ax.set_ylabel(name)
        ax.legend(fontsize=6, ncol=vals.shape[1], loc="upper right")
        ax.grid(alpha=0.3)
    axes[-1].set_xlabel("time since first attempt [s]")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
