"""Visual consistency check for converted .bin datasets.

Python equivalent of the reference's manual smoke test
(data/BinaryDbReaderSTB.py:413-451): for a few samples, plot the stored 2D
keypoints and the 3D keypoints re-projected through the stored intrinsics on
top of the image — if record layout, keypoint order, or intrinsics are
wrong, the two point sets visibly disagree.

Usage:
  python tools/inspect_db.py --dataset rhd --data ./data/bin/rhd_evaluation.bin \
      --num 4 --out inspect.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from hand3d_tpu.data.config import PreprocessConfig  # noqa: E402
from hand3d_tpu.data.preprocess import preprocess_rhd, preprocess_stb  # noqa: E402
from hand3d_tpu.data.rhd import RHDDataset  # noqa: E402
from hand3d_tpu.data.stb import STBDataset  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", choices=["rhd", "stb"], required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--num", type=int, default=4)
    p.add_argument("--out", default="inspect.png")
    args = p.parse_args()

    if args.dataset == "rhd":
        ds = RHDDataset("evaluation", path=args.data)
        pre = preprocess_rhd
    else:
        ds = STBDataset("evaluation", path=args.data)
        pre = preprocess_stb

    idx = np.arange(min(args.num, len(ds)))
    raw = {k: jnp.asarray(v) for k, v in ds.raw_batch(idx).items()}
    data = pre(PreprocessConfig(render_scoremap=False), raw)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(idx)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 5), squeeze=False)
    for i in range(n):
        ax = axes[0, i]
        image = np.asarray(data["image"][i]) + 0.5
        uv = np.asarray(data["keypoint_uv21"][i])
        vis = np.asarray(data["keypoint_vis21"][i]).astype(bool)
        xyz = np.asarray(data["keypoint_xyz21"][i])
        cam = np.asarray(data["cam_mat"][i])

        proj = xyz @ cam.T
        proj = proj[:, :2] / proj[:, 2:3]

        ax.imshow(image.clip(0, 1))
        ax.plot(uv[vis, 0], uv[vis, 1], "go", label="stored uv", ms=4)
        ax.plot(proj[vis, 0], proj[vis, 1], "r+", label="K @ xyz", ms=8)
        ax.set_title(f"sample {idx[i]}")
        if i == 0:
            ax.legend()

    fig.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"Wrote {args.out} — green dots and red crosses must coincide")


if __name__ == "__main__":
    main()
