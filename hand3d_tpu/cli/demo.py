"""Single-image demo: image file(s) -> mask + 2D keypoints + 3D pose
(<- run.py). Renders the reference's 4-panel figure (input with skeleton,
crop with skeleton, segmentation argmax, 3D skeleton) per image.
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from hand3d_tpu.cli._common import (
    add_quantize_arg,
    add_weights_arg,
    init_or_load,
    maybe_quantize,
)
from hand3d_tpu.models.cascade import ColorHandPose3D
from hand3d_tpu.ops.image import resize_bilinear
from hand3d_tpu.utils.viz import plot_hand, plot_hand_3d


def load_image(path):
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img[..., :3]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_weights_arg(p)
    p.add_argument("images", nargs="+", help="Input image files")
    p.add_argument("--out-dir", default=".", help="Where to write figures")
    p.add_argument("--left", dest="left", action="store_true", default=True,
                   help="Treat the hand as a left hand (default, as run.py)")
    p.add_argument("--right", dest="left", action="store_false",
                   help="Treat the hand as a right hand")
    p.add_argument("--seg-scale", type=float, default=1.0,
                   help="<1 = fast localization preset (models.cascade)")
    add_quantize_arg(p)
    args = p.parse_args()

    net = ColorHandPose3D(seg_scale=args.seg_scale)
    params = maybe_quantize(init_or_load(net, 0, args.weights), args)
    hand_side = jnp.asarray([[1.0, 0.0]] if args.left else [[0.0, 1.0]])

    @jax.jit
    def fwd(image):
        return net.inference(params, image, hand_side)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for path in args.images:
        raw = load_image(path)
        image = resize_bilinear(jnp.asarray(raw)[None], (240, 320)) - 0.5
        out = fwd(image)

        crop = (np.asarray(out.image_crop[0]) + 0.5).clip(0, 1)
        seg = np.argmax(np.asarray(out.hand_scoremap[0]), -1)
        uv = np.asarray(out.keypoint_uv21[0])  # global (u, v)
        coord_hw = uv[:, ::-1]
        crop_hw = (
            np.asarray(out.keypoint_uv21[0]) * 0
        )  # recompute in-crop coords from scoremap argmax
        sm = np.asarray(out.keypoints_scoremap[0])
        crop_hw = np.stack(
            np.unravel_index(sm.reshape(-1, 21).argmax(0), sm.shape[:2]), -1
        )

        fig = plt.figure(figsize=(10, 8))
        ax1 = fig.add_subplot(221)
        ax2 = fig.add_subplot(222)
        ax3 = fig.add_subplot(223)
        ax4 = fig.add_subplot(224, projection="3d")
        ax1.imshow(np.asarray(image[0]) + 0.5)
        plot_hand(coord_hw, ax1)
        ax2.imshow(crop)
        plot_hand(crop_hw, ax2)
        ax3.imshow(seg)
        plot_hand_3d(np.asarray(out.keypoint_coord3d[0]), ax4)
        ax4.view_init(azim=-90.0, elev=-90.0)
        ax4.set_xlim([-3, 3]); ax4.set_ylim([-3, 1]); ax4.set_zlim([-3, 3])

        out_path = os.path.join(
            args.out_dir,
            os.path.splitext(os.path.basename(path))[0] + "_pose.png",
        )
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        print(f"Wrote {out_path}")


if __name__ == "__main__":
    main()
