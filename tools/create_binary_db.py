"""Convert the Rendered Handpose Dataset (RHD) into fixed-length binary
records for fast streaming reads (<- create_binary_db.py in the reference;
byte layout in hand3d_tpu.data.codec, compatible with existing .bin files).

Usage:
  python tools/create_binary_db.py --rhd-path ./RHD_published_v2 \
      --set evaluation --out ./data/bin/rhd_evaluation.bin
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hand3d_tpu.data.codec import write_rhd_record  # noqa: E402


def load_png(path):
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.dtype != np.uint8:
        img = (img * 255).round().astype(np.uint8)
    return img


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rhd-path", required=True, help="RHD_published_v2 root")
    p.add_argument("--set", choices=["training", "evaluation"], default="evaluation")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    out = args.out or f"./data/bin/rhd_{args.set}.bin"
    os.makedirs(os.path.dirname(out), exist_ok=True)

    anno_path = os.path.join(args.rhd_path, args.set, f"anno_{args.set}.pickle")
    with open(anno_path, "rb") as f:
        anno_all = pickle.load(f)

    n = len(anno_all)
    with open(out, "wb") as f:
        for sample_id in sorted(anno_all):
            anno = anno_all[sample_id]
            image = load_png(
                os.path.join(args.rhd_path, args.set, "color", "%.5d.png" % sample_id)
            )
            mask = load_png(
                os.path.join(args.rhd_path, args.set, "mask", "%.5d.png" % sample_id)
            )
            kp_uv = anno["uv_vis"][:, :2]
            kp_vis = (anno["uv_vis"][:, 2] == 1).astype(np.uint8)
            write_rhd_record(
                f, anno["xyz"], kp_uv, anno["K"], image, mask, kp_vis
            )
            if sample_id % 100 == 0:
                print(f"{sample_id} / {n} images done: {sample_id * 100.0 / n:.3f} percent")
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
