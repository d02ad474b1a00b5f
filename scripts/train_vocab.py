#!/usr/bin/env python
"""Train a bag-of-words vocabulary from images (the reference ships a
prebuilt DBoW3 vocab + a `yml2bin` converter, `config/yml2bin.cpp`; here the
vocabulary is trained in-framework and stored as npz).

Usage:
    python scripts/train_vocab.py --images dir_of_pngs --out vocab.npz
    python scripts/train_vocab.py --synthetic --out vocab.npz   # demo corpus
"""

import argparse
import glob
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help="directory of grayscale images")
    ap.add_argument("--synthetic", action="store_true", help="train on simulator renders")
    ap.add_argument("--out", required=True)
    ap.add_argument("--words", type=int, default=512)
    ap.add_argument("--max-features", type=int, default=512)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from lv_slam_tpu.graph.bow import Vocabulary
    from lv_slam_tpu.ops.orb import OrbExtractor

    orb = OrbExtractor(max_features=args.max_features)
    descs = []
    if args.images:
        import matplotlib.image as mpimg

        for path in sorted(glob.glob(os.path.join(args.images, "*"))):
            img = mpimg.imread(path)
            if img.ndim == 3:
                img = img.mean(axis=2)
            if img.max() <= 1.0:
                img = img * 255.0
            d, _ = orb.detect_and_compute(img.astype(np.float32))
            if len(d):
                descs.append(d)
    elif args.synthetic:
        from lv_slam_tpu.io import synthetic

        world = synthetic.make_world(seed=3)
        rng = np.random.default_rng(0)
        for i in range(40):
            pose = np.eye(4)
            pose[:2, 3] = rng.uniform(-60, 60, 2)
            yaw = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(yaw), np.sin(yaw)
            pose[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
            pose[2, 3] = 1.6
            img = synthetic.render_camera_image(world, pose, seed=3)
            d, _ = orb.detect_and_compute(img)
            if len(d):
                descs.append(d)
    else:
        ap.error("one of --images / --synthetic required")

    print(f"training on {len(descs)} images, {sum(len(d) for d in descs)} descriptors")
    vocab = Vocabulary.train(descs, n_words=args.words)
    vocab.save(args.out)
    print(f"wrote {args.out} ({vocab.n_words} words)")


if __name__ == "__main__":
    main()
