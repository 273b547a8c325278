"""Training losses for the three stages (ref: training_*.py)."""

import jax
import jax.numpy as jnp

from hand3d_tpu.ops.image import resize_bilinear
from hand3d_tpu.ops.kinematics import bone_rel_trafo_inv


def posenet_scoremap_loss(scoremap_preds, scoremap_gt, keypoint_vis):
    """Visibility-masked L2 scoremap loss, summed over prediction heads.

    Mirrors training_posenet.py:57-61: per head, per keypoint
    vis * sqrt(mean_over_pixels((pred - gt)^2)), summed over keypoints and
    normalized by (sum(vis) + 0.001); predictions are first upsampled to the
    ground-truth scoremap resolution.

    Args:
      scoremap_preds: list of [B, h, w, K] predictions (any resolution).
      scoremap_gt: [B, H, W, K] ground truth.
      keypoint_vis: [B, K] bool/float.
    """
    _, gh, gw, _ = scoremap_gt.shape
    vis = keypoint_vis.astype(jnp.float32)
    denom = jnp.sum(vis) + 0.001
    loss = 0.0
    for pred in scoremap_preds:
        pred = resize_bilinear(pred, (gh, gw))
        per_kp = jnp.sqrt(jnp.mean(jnp.square(pred - scoremap_gt), axis=(1, 2)))
        loss += jnp.sum(vis * per_kp) / denom
    return loss


def handsegnet_loss(seg_logits_list, hand_mask):
    """Mean softmax cross-entropy over all pixels.

    Mirrors training_handsegnet.py:55-60 (2-class bg/hand mask). The
    reference's loop body reshapes the WHOLE prediction list each iteration
    (`tf.reshape(hand_mask_pred, ...)`), which only type-checks because
    inference_detection returns one head; for that executed length-1
    surface the packed list equals the head, which is what the per-item
    sum here mirrors (reference-executed: test_tf_reference_parity.py).

    Args:
      seg_logits_list: list of [B, H, W, 2] logits (already input-size).
      hand_mask: [B, H, W, 2] one-hot int/float labels.
    """
    labels = hand_mask.astype(jnp.float32)
    loss = 0.0
    for logits in seg_logits_list:
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss += -jnp.mean(jnp.sum(labels * logp, axis=-1))
    return loss


def lifting_loss(variant, lifting_output, batch):
    """Per-variant lifting loss (training_lifting.py:64-77).

    Args:
      variant: one of hand3d_tpu.models.poseprior.VARIANTS.
      lifting_output: models.poseprior.LiftingOutput.
      batch: dict with keypoint_xyz21_normed / keypoint_xyz21_local /
        keypoint_xyz21_can / rot_mat as needed by the variant.
    """
    coord3d = lifting_output.coord3d
    if variant in ("direct", "bottleneck"):
        return jnp.mean(jnp.square(coord3d - batch["keypoint_xyz21_normed"]))
    if variant == "local":
        return jnp.mean(jnp.square(coord3d - batch["keypoint_xyz21_local"]))
    if variant == "local_w_xyz_loss":
        coord_xyz = bone_rel_trafo_inv(coord3d)
        return jnp.mean(jnp.square(coord_xyz - batch["keypoint_xyz21_normed"]))
    if variant == "proposed":
        loss = jnp.mean(jnp.square(coord3d - batch["keypoint_xyz21_can"]))
        loss += jnp.mean(jnp.square(lifting_output.rot_mat - batch["rot_mat"]))
        return loss
    raise ValueError(f"Unknown variant: {variant}")
