"""PoseNet: CPM-style 2D keypoint heatmap network with recurrent refinement.

Architecture per nets/ColorHandPose3DNetwork.inference_pose2d (:170-219):
encoder blocks [2, 2, 4, 2] x [64, 128, 256, 512] with 3 pools (256 -> 32),
conv4_3..4_6 (256) + conv4_7 encoding (128), an initial 1x1 head
conv5_1(512) -> conv5_2(21), then two refinement units, each
concat(prev scoremap, encoding) -> 5x (7x7 conv, 128) -> 1x1(128) -> 1x1(21).
Returns all three scoremaps (deep supervision), each [B, H/8, W/8, 21].
"""

import jax
import jax.numpy as jnp

from hand3d_tpu.ops import nn

SCOPE = "PoseNet2D"
NUM_KP = 21
ENC_CHAN = 128
NUM_REFINEMENT_UNITS = 2

_ENCODER = (
    [(f"conv1_{i}", 3, 64) for i in (1, 2)]
    + ["pool"]
    + [(f"conv2_{i}", 3, 128) for i in (1, 2)]
    + ["pool"]
    + [(f"conv3_{i}", 3, 256) for i in (1, 2, 3, 4)]
    + ["pool"]
    + [(f"conv4_{i}", 3, 512) for i in (1, 2)]
    + [(f"conv4_{i}", 3, 256) for i in (3, 4, 5, 6)]
    + [("conv4_7", 3, ENC_CHAN)]
)


def _refinement_layers(unit):
    """Layer specs for refinement unit ``unit`` (6 or 7 in reference naming)."""
    n = unit + 6
    specs = [(f"conv{n}_{i}", 7, 128, True) for i in range(1, 6)]
    specs.append((f"conv{n}_6", 1, 128, True))
    specs.append((f"conv{n}_7", 1, NUM_KP, False))
    return specs


def init(key, dtype=None):
    params = {}
    keys = iter(jax.random.split(key, 64))
    in_chan = 3
    for layer in _ENCODER:
        if layer == "pool":
            continue
        name, ksize, out_chan = layer
        params[name] = nn.conv_init(next(keys), ksize, ksize, in_chan, out_chan)
        in_chan = out_chan
    params["conv5_1"] = nn.conv_init(next(keys), 1, 1, ENC_CHAN, 512)
    params["conv5_2"] = nn.conv_init(next(keys), 1, 1, 512, NUM_KP)
    for unit in range(NUM_REFINEMENT_UNITS):
        in_chan = NUM_KP + ENC_CHAN
        for name, ksize, out_chan, _ in _refinement_layers(unit):
            params[name] = nn.conv_init(next(keys), ksize, ksize, in_chan, out_chan)
            in_chan = out_chan
    return params


def apply_trunk(params, image_crop, compute_dtype=None, constrain=None):
    """Encoder + initial 1x1 head: image [B, H, W, 3] -> (encoding, scoremap).

    The heterogeneous prologue of the network (everything before the two
    structurally-identical refinement units) — factored out so the pipeline
    parallel layer (parallel/pipeline.py) can run it batch-sharded while the
    refinement units flow through a GPipe schedule.
    """
    x = image_crop
    layers = list(_ENCODER)
    i = 0
    while i < len(layers):
        layer = layers[i]
        if layer == "pool":
            x = nn.max_pool_2x2(x)
            i += 1
            continue
        name, _, _ = layer
        p = params[name]
        if "weights_p2" in p:
            # fused packed conv+relu+pool (ops.phasepack)
            from hand3d_tpu.ops import phasepack

            next_is_pool = i + 1 < len(layers) and layers[i + 1] == "pool"
            fused = phasepack.maybe_fused_conv_pool(
                x, p, next_is_pool, compute_dtype
            )
            if fused is not None:
                x = fused
                if constrain is not None:
                    x = constrain(x)
                i += 2
                continue
        x = nn.conv2d_relu(x, p, compute_dtype=compute_dtype)
        if constrain is not None:
            x = constrain(x)
        i += 1
    encoding = x

    x = nn.conv2d_relu(encoding, params["conv5_1"], compute_dtype=compute_dtype)
    scoremap = nn.conv2d(x, params["conv5_2"], compute_dtype=compute_dtype)
    return encoding, scoremap


def apply_refinement_unit(layer_params, scoremap, encoding, compute_dtype=None):
    """One refinement unit: concat(scoremap, encoding) -> new scoremap.

    ``layer_params``: the unit's 7 conv layer dicts IN ORDER (a list, or any
    iterable of {"weights", "biases"}); the caller owns the naming scheme so
    both the reference layout (conv6_*/conv7_* in the flat param dict) and
    the stage-stacked pipeline layout can share this code.
    """
    x = jnp.concatenate([scoremap, encoding], axis=-1)
    layer_params = list(layer_params)
    for i, p in enumerate(layer_params):
        x = nn.conv2d(x, p, compute_dtype=compute_dtype)
        if i < len(layer_params) - 1:
            x = nn.leaky_relu(x)
    return x


def apply(params, image_crop, compute_dtype=None, constrain=None):
    """image_crop [B, H, W, 3] -> list of three [B, H/8, W/8, 21] scoremaps.

    ``constrain``: optional activation-sharding hook (spatial partitioning;
    see parallel.mesh.spatial_constrainer), applied through the encoder.
    """
    encoding, scoremap = apply_trunk(
        params, image_crop, compute_dtype=compute_dtype, constrain=constrain
    )
    scoremaps = [scoremap]
    for unit in range(NUM_REFINEMENT_UNITS):
        unit_params = [
            params[name] for name, _, _, _ in _refinement_layers(unit)
        ]
        scoremaps.append(
            apply_refinement_unit(
                unit_params, scoremaps[-1], encoding, compute_dtype=compute_dtype
            )
        )
    return scoremaps
