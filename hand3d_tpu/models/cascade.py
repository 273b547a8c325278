"""ColorHandPose3D: the full three-stage cascade, fully jittable.

Mirrors nets/ColorHandPose3DNetwork.py:61-129 but runs everything —
including the intermediate mask -> bbox -> crop glue and the keypoint argmax
decode the reference did on the host — inside one XLA program, so a batch of
images goes in and (mask, 2D keypoints, 3D pose) comes out with no host
round trips.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from hand3d_tpu.models import handsegnet, posenet, poseprior
from hand3d_tpu.ops.image import crop_image_from_xy, resize_bilinear
from hand3d_tpu.ops.keypoints import decode_upsampled, trafo_coords
from hand3d_tpu.ops.segmentation import calc_center_bb, single_obj_scoremap

CROP_SIZE = 256  # ColorHandPose3DNetwork.py:31
NUM_KP = 21


class CascadeOutput(NamedTuple):
    """Outputs of the full pipeline (ColorHandPose3DNetwork.inference :61-99)."""

    hand_scoremap: jnp.ndarray  # [B, H, W, 2]
    image_crop: jnp.ndarray  # [B, 256, 256, 3]
    scale_crop: jnp.ndarray  # [B, 1]
    center: jnp.ndarray  # [B, 2]
    keypoints_scoremap: jnp.ndarray  # [B, 256, 256, 21]
    keypoint_coord3d: jnp.ndarray  # [B, 21, 3]
    # extras beyond the reference's fetch list (free, since we're on-device):
    keypoint_uv21: Optional[jnp.ndarray] = None  # [B, 21, 2] global-frame (u, v)


class Pose2DOutput(NamedTuple):
    """Outputs of the 2D half (ColorHandPose3DNetwork.inference2d :101-129)."""

    keypoints_scoremap: jnp.ndarray  # [B, 256, 256, 21]
    image_crop: jnp.ndarray
    scale_crop: jnp.ndarray
    center: jnp.ndarray
    keypoint_uv21: Optional[jnp.ndarray] = None


class ColorHandPose3D:
    """Full cascade: HandSegNet -> crop -> PoseNet -> PosePrior/Viewpoint.

    Args:
      compute_dtype: conv/matmul compute dtype (None = float32).
      decode: 2D keypoint decoder — "argmax" (reference parity) or
        "soft_argmax" (sub-pixel, differentiable; an extension).
      seg_scale: localization-resolution factor in (0, 1]. 1.0 (default)
        is reference parity. Values < 1 run HandSegNet, the flood fill and
        the bbox at a downsampled resolution and rescale the crop box to
        full-res coordinates — the PoseNet/PosePrior stages still see a
        full-resolution 256x256 crop. The segmentation mask is
        low-frequency and the bbox is padded 1.25x, so localization is
        tolerant of this; it cuts the HandSegNet conv FLOPs by seg_scale^2
        (the dominant cascade cost). Accuracy delta is not validated
        against the reference benchmarks — an opt-in speed preset.
    """

    def __init__(self, compute_dtype=None, decode="argmax", seg_scale=1.0):
        assert decode in ("argmax", "soft_argmax")
        assert 0.0 < seg_scale <= 1.0, seg_scale
        self.compute_dtype = compute_dtype
        self.decode = decode
        self.seg_scale = seg_scale

    # --- parameters ---------------------------------------------------------

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            handsegnet.SCOPE: handsegnet.init(k1),
            posenet.SCOPE: posenet.init(k2),
            poseprior.POSEPRIOR_SCOPE: poseprior.init_poseprior(k3),
            poseprior.VIEWPOINT_SCOPE: poseprior.init_viewpoint(k4),
        }

    # --- stages -------------------------------------------------------------

    def inference_detection(self, params, image):
        """HandSegNet stage; [B, H, W, 3] -> list of [B, H, W, 2]."""
        return handsegnet.apply(
            params[handsegnet.SCOPE], image, compute_dtype=self.compute_dtype
        )

    def inference_pose2d(self, params, image_crop):
        """PoseNet stage; [B, 256, 256, 3] -> list of three [B, 32, 32, 21]."""
        return posenet.apply(
            params[posenet.SCOPE], image_crop, compute_dtype=self.compute_dtype
        )

    def inference_pose3d(self, params, keypoints_scoremap, hand_side, *,
                         train=False, key=None):
        """Lifting stage; [B, 32, 32, 21] + hand_side -> [B, 21, 3]."""
        kp, kv = (jax.random.split(key) if key is not None else (None, None))
        coord_can = poseprior.apply_poseprior(
            params[poseprior.POSEPRIOR_SCOPE], keypoints_scoremap, hand_side,
            train=train, key=kp, compute_dtype=self.compute_dtype,
        )
        rot_mat = poseprior.apply_viewpoint(
            params[poseprior.VIEWPOINT_SCOPE], keypoints_scoremap, hand_side,
            train=train, key=kv, compute_dtype=self.compute_dtype,
        )
        return poseprior.lift_to_relative(coord_can, rot_mat, hand_side)

    # --- glue ---------------------------------------------------------------

    def _localize_and_crop(self, params, image):
        """HandSegNet -> single blob -> bbox -> scaled crop.

        Mirrors the intermediate processing at ColorHandPose3DNetwork.py:77-86.
        With seg_scale < 1 the whole localization stage runs at reduced
        resolution; the crop is still taken from the full-res image.
        """
        _, h, w, _ = image.shape
        if self.seg_scale != 1.0:
            sh = max(1, round(h * self.seg_scale))
            sw = max(1, round(w * self.seg_scale))
            seg_input = resize_bilinear(image, (sh, sw))
        else:
            seg_input = image
        scoremap = self.inference_detection(params, seg_input)[-1]
        image_crop, scale_crop, center = self._crop_from_scoremap(image, scoremap)
        if scoremap.shape[1:3] != (h, w):
            scoremap = resize_bilinear(scoremap, (h, w))
        return scoremap, image_crop, scale_crop, center

    def _crop_from_scoremap(self, image, hand_scoremap):
        """Blob -> bbox at the scoremap's own resolution -> full-res crop.

        The mask/bbox math runs at ``hand_scoremap``'s resolution (so a
        downsampled scoremap also shrinks the flood-fill pass count,
        general.py:256); center and box size are then mapped back to image
        coordinates with the legacy-bilinear scale factor (src = dst*in/out).
        """
        _, h, w, _ = image.shape
        sh, sw = hand_scoremap.shape[1:3]
        hand_mask = single_obj_scoremap(hand_scoremap)
        if (sh, sw) != (h, w):
            # empty-mask fallbacks are defined in FULL-IMAGE pixels
            # (general.py:311-320); pre-divide them by the upsample factors
            # so the scaling below restores the reference constants instead
            # of pushing the fallback crop outside the image
            fmax = max(h / sh, w / sw)
            center, _, crop_size_best = calc_center_bb(
                hand_mask,
                fallback_center=(160.0 * sh / h, 160.0 * sw / w),
                fallback_size=100.0 / fmax,
            )
            factors = jnp.array([h / sh, w / sw], center.dtype)
            center = center * factors
            crop_size_best = crop_size_best * jnp.max(factors)
        else:
            center, _, crop_size_best = calc_center_bb(hand_mask)
        crop_size_best = crop_size_best * 1.25
        scale_crop = jnp.clip(CROP_SIZE / crop_size_best, 0.25, 5.0)  # [B, 1]
        image_crop = crop_image_from_xy(image, center, CROP_SIZE, scale_crop[:, 0])
        return image_crop, scale_crop, center

    def _decode_uv(self, scoremap_small, center, scale_crop):
        """Keypoints from the 32x32 scoremap -> global (u, v) coordinates.

        The reference resized to 256 and took the argmax on the host
        (run.py:72-74). Here the argmax over the upsampled map is computed
        without materializing it (ops.keypoints.decode_upsampled, Pallas on
        TPU, bit-identical XLA fallback elsewhere), then transformed
        crop -> global on device.
        """
        factor = CROP_SIZE // scoremap_small.shape[1]
        if self.decode == "soft_argmax":
            from hand3d_tpu.ops.keypoints import soft_argmax_2d

            coord_hw_crop = soft_argmax_2d(
                resize_bilinear(scoremap_small, (CROP_SIZE, CROP_SIZE))
            )
        else:
            coord_hw_crop = decode_upsampled(scoremap_small, factor)
        coord_hw = trafo_coords(coord_hw_crop, center, scale_crop[:, 0], CROP_SIZE)
        return coord_hw[..., ::-1]  # (u, v)

    # --- end-to-end ---------------------------------------------------------

    def inference(self, params, image, hand_side, *, train=False, key=None):
        """Full pipeline, [B, H, W, 3] image (mean-subtracted) -> CascadeOutput."""
        hand_scoremap, image_crop, scale_crop, center = self._localize_and_crop(
            params, image
        )
        scoremaps = self.inference_pose2d(params, image_crop)
        scoremap = scoremaps[-1]  # [B, 32, 32, 21]
        coord3d = self.inference_pose3d(
            params, scoremap, hand_side, train=train, key=key
        )
        scoremap_large = resize_bilinear(scoremap, (CROP_SIZE, CROP_SIZE))
        keypoint_uv21 = self._decode_uv(scoremap, center, scale_crop)
        return CascadeOutput(
            hand_scoremap, image_crop, scale_crop, center,
            scoremap_large, coord3d, keypoint_uv21,
        )

    def inference2d(self, params, image):
        """2D half of the pipeline -> Pose2DOutput."""
        _, image_crop, scale_crop, center = self._localize_and_crop(params, image)
        scoremaps = self.inference_pose2d(params, image_crop)
        scoremap_large = resize_bilinear(scoremaps[-1], (CROP_SIZE, CROP_SIZE))
        keypoint_uv21 = self._decode_uv(scoremaps[-1], center, scale_crop)
        return Pose2DOutput(
            scoremap_large, image_crop, scale_crop, center, keypoint_uv21
        )
