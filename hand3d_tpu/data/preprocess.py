"""On-device batched preprocessing: raw records -> training/eval features.

This is the TPU-native replacement for the derived-data graph of
data/BinaryDbReader.py:126-459 and data/BinaryDbReaderSTB.py:96-410. The
host only slices raw records out of a memmap; everything else — decode,
hand-side selection from the part mask, normalization, canonical/local
coordinate frames, ground-truth crops, Gaussian scoremaps, augmentation —
runs inside one jitted program per (dataset, config), fully batched.

All semantic quirks of the reference are preserved and documented inline:
uv truncation to integer pixels, palm-vs-wrist keypoint variants, the
visible-extent crop sizing with its clamps and non-finite fallbacks, and the
exact cam_mat update under cropping.
"""

import functools

import jax
import jax.numpy as jnp

from hand3d_tpu.data import augment
from hand3d_tpu.data.codec import RHD_IMAGE_SIZE, STB_IMAGE_SIZE
from hand3d_tpu.ops.canonical import canonical_trafo, flip_right_hand
from hand3d_tpu.ops.image import (
    create_gaussian_maps,
    crop_image_from_xy,
    resize_bilinear,
)
from hand3d_tpu.ops.kinematics import bone_rel_trafo

# STB -> reference keypoint order (BinaryDbReaderSTB.convert_kp :396-410):
# new[0] = old[0], new[i] = old[21 - i] for i in 1..20
STB_KP_PERM = [0] + list(range(20, 0, -1))


def _keys(key, n):
    if key is None:
        return [None] * n
    return list(jax.random.split(key, n))


# --- shared derived features -------------------------------------------------


def _xyz_representations(kp_xyz21, flip_cond=None):
    """Root-relative / normalized / local / canonical coordinate frames.

    Mirrors BinaryDbReader.py:237-254 (and BinaryDbReaderSTB.py:192-209,
    which skips the right-hand flip).

    Args:
      kp_xyz21: [B, 21, 3].
      flip_cond: optional [B] bool — true where the sample is a right hand
        (RHD only; STB is all left hands).
    """
    rel = kp_xyz21 - kp_xyz21[:, :1, :]
    scale = jnp.linalg.norm(rel[:, 12, :] - rel[:, 11, :], axis=-1)  # [B]
    normed = rel / scale[:, None, None]

    local = bone_rel_trafo(normed)
    can, rot = canonical_trafo(normed)
    if flip_cond is not None:
        can = flip_right_hand(can, flip_cond[:, None, None])
    # rot is a product of elementary rotations -> orthogonal; its inverse
    # (the reference uses tf.matrix_inverse, BinaryDbReader.py:254) is the
    # transpose, computed in closed form here.
    rot_inv = jnp.swapaxes(rot, -1, -2)
    return {
        "keypoint_scale": scale,
        "keypoint_xyz21_normed": normed,
        "keypoint_xyz21_local": local,
        "keypoint_xyz21_can": can,
        "rot_mat": rot_inv,
    }



def _uv_to_crop(uv, center, scale, crop_size):
    """Map full-frame (u, v) into the crop frame (BinaryDbReader.py:319-323).

    One definition for both the GT-crop path and STB's re-map with the
    effective (noise-shifted) center — they must stay consistent.
    """
    half = crop_size // 2
    u = (uv[:, :, 0] - center[:, None, 1]) * scale[:, None] + half
    v = (uv[:, :, 1] - center[:, None, 0]) * scale[:, None] + half
    return jnp.stack([u, v], axis=-1)

def _hand_crop_features(cfg, keys, image, uv21, vis21, cam_mat, image_size):
    """Ground-truth hand crop + updated uv/intrinsics.

    Mirrors BinaryDbReader.py:268-346: center at keypoint 12, size from the
    visible-keypoint extent (clamped [50, 500] px, fallback 200), scale
    clamped [1, 10], optional center/scale/offset noise.
    """
    b = uv21.shape[0]
    crop_size = cfg.crop_size
    k_center, k_scale, k_offset = keys

    crop_center = uv21[:, 12, ::-1]  # (v, u) = (row, col)
    crop_center = jnp.where(
        jnp.all(jnp.isfinite(crop_center), axis=-1, keepdims=True), crop_center, 0.0
    )
    if cfg.crop_center_noise:
        crop_center += augment.truncated_normal(
            k_center, (b, 2), cfg.crop_center_noise_sigma
        )

    scale_noise = 1.0
    if cfg.crop_scale_noise:
        scale_noise = jax.random.uniform(k_scale, (b,), minval=1.0, maxval=1.2)

    # visible-extent bounding box, clamped to the image
    coord_hw = uv21[:, :, ::-1]  # [B, 21, 2] (row, col)
    vis = vis21.astype(bool)[..., None]
    min_coord = jnp.maximum(
        jnp.min(jnp.where(vis, coord_hw, jnp.inf), axis=1), 0.0
    )
    max_coord = jnp.minimum(
        jnp.max(jnp.where(vis, coord_hw, -jnp.inf), axis=1),
        jnp.asarray(image_size, jnp.float32),
    )
    crop_size_best = 2.0 * jnp.maximum(
        max_coord - crop_center, crop_center - min_coord
    )
    crop_size_best = jnp.max(crop_size_best, axis=-1)
    crop_size_best = jnp.clip(crop_size_best, 50.0, 500.0)
    crop_size_best = jnp.where(jnp.isfinite(crop_size_best), crop_size_best, 200.0)

    scale = jnp.clip(jnp.float32(crop_size) / crop_size_best, 1.0, 10.0)
    scale = scale * scale_noise

    if cfg.crop_offset_noise:
        crop_center += augment.truncated_normal(
            k_offset, (b, 2), cfg.crop_offset_noise_sigma
        )

    image_crop = crop_image_from_xy(image, crop_center, crop_size, scale)

    # uv into the crop frame (BinaryDbReader.py:319-323)
    uv21_crop = _uv_to_crop(uv21, crop_center, scale, crop_size)
    half = crop_size // 2

    # intrinsics: K' = T(-center*scale + half) @ S(scale) @ K (:325-346)
    zeros = jnp.zeros((b,), jnp.float32)
    ones = jnp.ones((b,), jnp.float32)
    t1 = crop_center[:, 0] * scale - half  # row translation
    t2 = crop_center[:, 1] * scale - half  # col translation
    scale_mat = jnp.stack(
        [
            jnp.stack([scale, zeros, zeros], -1),
            jnp.stack([zeros, scale, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    trans_mat = jnp.stack(
        [
            jnp.stack([ones, zeros, -t2], -1),
            jnp.stack([zeros, ones, -t1], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    # exact f32: the TPU default matmul precision would round the
    # intrinsics through bf16 (~1% relative — several pixels of focal
    # length), corrupting every projection made with the cropped-frame K
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    cam_mat_new = mm(trans_mat, mm(scale_mat, cam_mat))
    return {
        "crop_scale": scale,
        "image_crop": image_crop,
        "keypoint_uv21": uv21_crop,
        "cam_mat": cam_mat_new,
        # effective (possibly noise-shifted) center, for callers that remap
        # a different uv set into the crop frame (STB, :266-271)
        "_crop_center": crop_center,
    }


def _scoremap_features(cfg, key, uv21, vis21, size):
    """GT Gaussian scoremaps + optional channel dropout
    (BinaryDbReader.py:348-367)."""
    coords_hw = uv21[:, :, ::-1]
    scoremap = create_gaussian_maps(coords_hw, size, cfg.sigma, vis21)
    if cfg.scoremap_dropout:
        scoremap = augment.scoremap_channel_dropout(
            key, scoremap, cfg.scoremap_dropout_prob
        )
    return scoremap


# --- RHD ---------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def preprocess_rhd(cfg, raw, key=None):
    """RHD raw record batch -> feature dict.

    Args:
      cfg: PreprocessConfig (static).
      raw: dict of device arrays from RHDDataset.raw_batch:
        kp_xyz [B,42,3] f32, kp_uv [B,42,2] f32, cam_mat [B,3,3] f32,
        image [B,320,320,3] u8, hand_parts [B,320,320] u8|i32,
        kp_vis [B,42] u8|bool.
      key: PRNG key (required iff cfg.needs_rng).
    """
    ks = _keys(key, 6)
    b = raw["kp_xyz"].shape[0]

    kp_xyz = raw["kp_xyz"].astype(jnp.float32)
    # the reference decodes uv, casts to int32 and back (truncation) before
    # any use (BinaryDbReader.py:149-152)
    kp_uv = raw["kp_uv"].astype(jnp.float32).astype(jnp.int32).astype(jnp.float32)
    kp_vis = raw["kp_vis"].astype(bool)
    cam_mat = raw["cam_mat"].astype(jnp.float32)
    parts = raw["hand_parts"].astype(jnp.int32)

    if not cfg.use_wrist_coord:
        # palm = midpoint(wrist, middle-finger root) per hand (:141-158)
        def palmify(arr, l0=0, l1=12, r0=21, r1=33):
            palm_l = 0.5 * (arr[:, l0] + arr[:, l1])
            palm_r = 0.5 * (arr[:, r0] + arr[:, r1])
            return jnp.concatenate(
                [palm_l[:, None], arr[:, 1:21], palm_r[:, None], arr[:, 22:]], axis=1
            )

        kp_xyz = palmify(kp_xyz)
        kp_uv = palmify(kp_uv)
        palm_vis_l = kp_vis[:, 0] | kp_vis[:, 12]
        palm_vis_r = kp_vis[:, 21] | kp_vis[:, 33]
        kp_vis = jnp.concatenate(
            [palm_vis_l[:, None], kp_vis[:, 1:21], palm_vis_r[:, None], kp_vis[:, 22:]],
            axis=1,
        )

    if cfg.coord_uv_noise:
        kp_uv = kp_uv + augment.truncated_normal(
            ks[0], (b, 42, 2), cfg.coord_uv_noise_sigma
        )

    image = raw["image"].astype(jnp.float32) / 255.0 - 0.5
    if cfg.hue_aug:
        image = augment.random_hue(ks[1], image, cfg.hue_aug_max)

    hand_mask_fg = parts > 1
    hand_mask = jnp.stack([~hand_mask_fg, hand_mask_fg], axis=-1).astype(jnp.int32)

    data = {
        "image": image,
        "hand_parts": parts,
        "hand_mask": hand_mask,
        "keypoint_xyz": kp_xyz,
        "keypoint_uv": kp_uv,
        "keypoint_vis": kp_vis,
        "cam_mat": cam_mat,
    }

    # dominant hand from part-mask pixel counts (:213-233): parts 2..17 are
    # left-hand segments, >= 18 right-hand
    cond_l = (parts > 1) & (parts < 18)
    cond_r = parts > 17
    num_l = jnp.sum(cond_l, axis=(1, 2))
    num_r = jnp.sum(cond_r, axis=(1, 2))
    left = num_l > num_r  # [B]
    data["hand_side"] = jax.nn.one_hot(jnp.where(left, 0, 1), 2)

    sel = left[:, None, None]
    kp_xyz21 = jnp.where(sel, kp_xyz[:, :21], kp_xyz[:, 21:])
    uv21 = jnp.where(sel, kp_uv[:, :21], kp_uv[:, 21:])
    vis21 = jnp.where(left[:, None], kp_vis[:, :21], kp_vis[:, 21:])
    data["keypoint_xyz21"] = kp_xyz21
    data["keypoint_vis21"] = vis21
    data["keypoint_uv21"] = uv21

    data.update(_xyz_representations(kp_xyz21, flip_cond=~left))

    if cfg.scale_to_size:
        # eval2d's downscale mode (:369-380): every other item is
        # invalidated by the scaling, so skip computing them
        th, tw = cfg.scale_target_size
        h, w = RHD_IMAGE_SIZE
        image_s = resize_bilinear(image, (th, tw))
        uv = uv21 * jnp.asarray([tw / w, th / h], jnp.float32)
        return {
            "image": image_s,
            "keypoint_uv21": uv,
            "keypoint_vis21": vis21,
        }

    if cfg.random_crop_to_size:
        # segmentation-training mode (:382-392); other items invalidated
        stacked = jnp.concatenate(
            [image, parts[..., None].astype(jnp.float32),
             hand_mask.astype(jnp.float32)], axis=-1,
        )
        cropped = augment.random_crop_hw(
            ks[3], stacked, (cfg.random_crop_size, cfg.random_crop_size)
        )
        return {
            "image": cropped[..., :3],
            "hand_parts": cropped[..., 3].astype(jnp.int32),
            "hand_mask": cropped[..., 4:].astype(jnp.int32),
        }

    if cfg.hand_crop:
        crop = _hand_crop_features(
            cfg, ks[2:5], image, uv21, vis21, cam_mat, RHD_IMAGE_SIZE
        )
        crop.pop("_crop_center")
        data.update(crop)
        scoremap_size = (cfg.crop_size, cfg.crop_size)
    else:
        scoremap_size = RHD_IMAGE_SIZE
    if cfg.render_scoremap:
        data["scoremap"] = _scoremap_features(
            cfg, ks[5], data["keypoint_uv21"], vis21, scoremap_size
        )

    return data


# --- STB ---------------------------------------------------------------------


def _extrapolate_wrist(arr):
    """STB stores the palm at kp0; the wrist is extrapolated past it:
    kp0' = kp16 + 2*(kp0 - kp16) (BinaryDbReaderSTB.py:131-154)."""
    wrist = arr[:, 16] + 2.0 * (arr[:, 0] - arr[:, 16])
    return jnp.concatenate([wrist[:, None], arr[:, 1:]], axis=1)


@functools.partial(jax.jit, static_argnums=0)
def preprocess_stb(cfg, raw, key=None):
    """STB raw record batch -> feature dict (BinaryDbReaderSTB.py:96-343).

    Differences from RHD handled here: xyz arrives in mm (scaled to meters),
    keypoints are reordered via STB_KP_PERM, the wrist is extrapolated from
    the palm (kp0' = kp16 + 2*(kp0 - kp16)) when use_wrist_coord, intrinsics
    are dataset constants, hand_side is always left, and the canonical frame
    has no right-hand flip.
    """
    ks = _keys(key, 6)
    b = raw["kp_xyz"].shape[0]
    perm = jnp.asarray(STB_KP_PERM)

    kp_xyz21 = raw["kp_xyz"].astype(jnp.float32)[:, perm] / 1000.0
    uv_vis = raw["kp_uv_vis"].astype(jnp.float32)[:, perm]
    uv21 = uv_vis[:, :, :2]
    vis21 = uv_vis[:, :, 2] == 1.0

    if cfg.use_wrist_coord:
        kp_xyz21 = _extrapolate_wrist(kp_xyz21)
        uv21 = _extrapolate_wrist(uv21)
        wrist_vis = vis21[:, 16] | vis21[:, 0]
        vis21 = jnp.concatenate([wrist_vis[:, None], vis21[:, 1:]], axis=1)

    if cfg.coord_uv_noise:
        uv21 = uv21 + augment.truncated_normal(
            ks[0], (b, 21, 2), cfg.coord_uv_noise_sigma
        )

    image = raw["image"].astype(jnp.float32) / 255.0 - 0.5
    if cfg.hue_aug:
        image = augment.random_hue(ks[1], image, cfg.hue_aug_max)

    # BB-camera intrinsics (BinaryDbReaderSTB.py:180-185)
    cam = jnp.asarray(
        [[822.79041, 0.0, 318.47345], [0.0, 822.79041, 250.31296], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    cam_mat = jnp.tile(cam[None], (b, 1, 1))

    data = {
        "image": image,
        "keypoint_xyz21": kp_xyz21,
        "keypoint_uv21": uv21,
        "keypoint_vis21": vis21,
        "cam_mat": cam_mat,
        "hand_side": jnp.tile(jnp.asarray([[1.0, 0.0]]), (b, 1)),
    }
    data.update(_xyz_representations(kp_xyz21, flip_cond=None))

    if cfg.hand_crop:
        uv_for_crop = uv21
        if not cfg.use_wrist_coord:
            # the reference still extrapolates a wrist for crop extents
            # (BinaryDbReaderSTB.py:228-231)
            uv_for_crop = _extrapolate_wrist(uv21)
        crop = _hand_crop_features(
            cfg, ks[2:5], image, uv_for_crop, vis21, cam_mat, STB_IMAGE_SIZE
        )
        # uv mapped into the crop uses the original uv21 but the effective
        # (noise-shifted) crop center and scale (:266-271)
        center = crop.pop("_crop_center")
        crop["keypoint_uv21"] = _uv_to_crop(
            uv21, center, crop["crop_scale"], cfg.crop_size
        )
        data.update(crop)
        scoremap_size = (cfg.crop_size, cfg.crop_size)
    else:
        scoremap_size = STB_IMAGE_SIZE
    if cfg.render_scoremap:
        data["scoremap"] = _scoremap_features(
            cfg, ks[5], data["keypoint_uv21"], vis21, scoremap_size
        )
    return data
