#!/usr/bin/env python
"""Train a binary ORB vocabulary for place recognition.

The reference ships a pre-trained DBoW2 ORBvoc (k=10 branching, L=6 levels;
the blob itself is missing from the repo, .MISSING_LARGE_BLOBS:5) plus a
text<->binary converter (`/root/reference/tools/bin_vocabulary.cc`). This
tool is the TPU build's equivalent producer: it extracts ORB descriptors
from dataset images with the JAX front-end, then trains the hierarchical
binary-k-medians tree in the C++ native runtime (native/src/bow.cpp) and
saves it in the framework's own binary format (VIORBVOC).

Usage:
  python tools/train_vocab.py --euroc /data/MH_01 --out orbvoc.viorb
  python tools/train_vocab.py --images 'path/*.png' --k 10 --levels 4
  python tools/train_vocab.py --synthetic 20000 --out small.viorb   # testing
"""

from __future__ import annotations

import argparse
import glob
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from viorb_tpu import native  # noqa: E402


def descriptors_from_images(paths, n_features=1000, stride=1):
    import jax

    from viorb_tpu.io.euroc import load_image
    from viorb_tpu.ops import orb

    out = []
    extract = None
    for p in paths[::stride]:
        img = load_image(p)
        if extract is None:
            params = orb.OrbParams(
                n_features=n_features, height=img.shape[0], width=img.shape[1]
            )
            extract = jax.jit(lambda im: orb.extract(im, params))
        feats = extract(img)
        pm1 = np.asarray(feats.desc_pm1 > 0, np.uint8)
        valid = np.asarray(feats.valid, bool)
        out.append(np.packbits(pm1[valid], axis=1, bitorder="little"))
    return np.concatenate(out, axis=0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--euroc", help="EuRoC sequence root (mav0/cam0/data)")
    ap.add_argument("--images", help="glob of image files")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N random descriptors (testing only)")
    ap.add_argument("--out", default="orbvoc.viorb")
    ap.add_argument("--k", type=int, default=10, help="branching factor")
    ap.add_argument("--levels", type=int, default=4, help="tree depth")
    ap.add_argument("--stride", type=int, default=10,
                    help="use every Nth image")
    ap.add_argument("--n-features", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not native.available():
        ap.error("native toolchain unavailable; cannot train a vocabulary")

    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        descs = rng.integers(0, 256, (args.synthetic, 32), dtype=np.uint8)
    elif args.euroc:
        from viorb_tpu.io.euroc import mono_stream

        paths = [p for p, _ in mono_stream(args.euroc)]
        descs = descriptors_from_images(paths, args.n_features, args.stride)
    elif args.images:
        paths = sorted(glob.glob(args.images))
        if not paths:
            ap.error(f"no images match {args.images}")
        descs = descriptors_from_images(paths, args.n_features, args.stride)
    else:
        ap.error("one of --euroc / --images / --synthetic is required")

    print(f"training k={args.k} L={args.levels} on {len(descs)} descriptors")
    voc = native.Vocabulary.train(descs, k=args.k, levels=args.levels,
                                  seed=args.seed)
    voc.save(args.out)
    print(f"saved {voc.n_words}-word vocabulary -> {args.out}")


if __name__ == "__main__":
    main()
