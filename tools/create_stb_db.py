"""Convert the STB (Stereo Hand Tracking Benchmark) dataset into binary
records — a Python replacement for the reference's MATLAB pipeline
(data/stb/create_db.m + write_binary_record.m), producing byte-identical
stb_eval.bin files.

Projection math per create_db.m:13-39: annotations are 3D points in the BB
camera frame; the left frame projects through K directly, the right frame
through K after the stereo baseline shift (x - 120.054 mm). Each sample id
writes the left then the right frame (:84-85).

Usage:
  python tools/create_stb_db.py --stb-path /path/to/StereoHandTracking \
      --out ./data/stb/stb_eval.bin
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hand3d_tpu.data.codec import write_stb_record  # noqa: E402

SEQUENCES = ["B1Counting", "B1Random"]
FRAMES_PER_SEQ = 1500

# BB-camera intrinsics + stereo baseline (create_db.m:13-27)
FX = FY = 822.79041
TX, TY = 318.47345, 250.31296
BASELINE_MM = 120.054
K = np.array([[FX, 0.0, TX], [0.0, FY, TY], [0.0, 0.0, 1.0]])


def load_png(path):
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.dtype != np.uint8:
        img = (img * 255).round().astype(np.uint8)
    return img[..., :3]


def load_hand_para(labels_dir, seq_name):
    """Load handPara [3, 21, 1500] from the .mat annotation file."""
    path = os.path.join(labels_dir, f"{seq_name}_BB.mat")
    try:
        from scipy.io import loadmat

        return loadmat(path)["handPara"]
    except ImportError as e:
        raise ImportError(
            "Reading STB annotations requires scipy (for .mat files)."
        ) from e


def project(xyz_mm):
    """[21, 3] camera-frame mm -> [21, 2] pixel uv."""
    uvw = xyz_mm @ K.T
    return uvw[:, :2] / uvw[:, 2:3]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stb-path", required=True, help="StereoHandTracking root")
    p.add_argument("--out", default="./data/stb/stb_eval.bin")
    args = p.parse_args()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        for seq in SEQUENCES:
            print(f"Working on {seq}")
            hand_para = load_hand_para(os.path.join(args.stb_path, "labels"), seq)
            for im_id in range(FRAMES_PER_SEQ):
                xyz_l = hand_para[:, :, im_id].T  # [21, 3] mm, left/BB frame
                xyz_r = xyz_l - np.array([BASELINE_MM, 0.0, 0.0])
                uv_l = project(xyz_l)
                uv_r = project(xyz_r)
                vis = np.ones(21, np.float32)

                for side, xyz, uv in (("left", xyz_l, uv_l), ("right", xyz_r, uv_r)):
                    img = load_png(
                        os.path.join(args.stb_path, seq, f"BB_{side}_{im_id}.png")
                    )
                    write_stb_record(f, xyz, uv, vis, img)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
