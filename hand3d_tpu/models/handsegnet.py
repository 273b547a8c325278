"""HandSegNet: VGG-style encoder -> 2-class hand segmentation scoremap.

Architecture per nets/ColorHandPose3DNetwork.inference_detection (:131-168):
blocks of [2, 2, 4, 4] 3x3 convs with [64, 128, 256, 512] channels, 2x2 max
pool after the first three blocks, then conv5_1(512)/conv5_2(128) encoding
and a 1x1 head conv6_1(512) -> conv6_2(2), bilinearly upsampled back to the
input resolution. All activations are leaky-relu(0.01) except the final
scoremap.
"""

import jax

from hand3d_tpu.ops import nn
from hand3d_tpu.ops.image import resize_bilinear

SCOPE = "HandSegNet"

# (name, kernel, out_chan, relu); "pool" entries are 2x2 max pools
_LAYERS = (
    [(f"conv1_{i}", 3, 64, True) for i in (1, 2)]
    + ["pool"]
    + [(f"conv2_{i}", 3, 128, True) for i in (1, 2)]
    + ["pool"]
    + [(f"conv3_{i}", 3, 256, True) for i in (1, 2, 3, 4)]
    + ["pool"]
    + [(f"conv4_{i}", 3, 512, True) for i in (1, 2, 3, 4)]
    + [("conv5_1", 3, 512, True), ("conv5_2", 3, 128, True)]
    + [("conv6_1", 1, 512, True), ("conv6_2", 1, 2, False)]
)


def init(key, dtype=None):
    """Initialize a {layer: {"weights", "biases"}} tree (Xavier / 1e-4 bias)."""
    params = {}
    in_chan = 3
    convs = [l for l in _LAYERS if l != "pool"]
    keys = jax.random.split(key, len(convs))
    for k, (name, ksize, out_chan, _) in zip(keys, convs):
        params[name] = nn.conv_init(k, ksize, ksize, in_chan, out_chan)
        in_chan = out_chan
    return params


def apply(params, image, compute_dtype=None, constrain=None):
    """image [B, H, W, 3] -> list of one [B, H, W, 2] segmentation scoremap.

    Returns a list (deep-supervision convention shared with PoseNet) even
    though HandSegNet has a single head, matching the reference's API.
    ``constrain``: optional activation-sharding hook (see
    parallel.mesh.spatial_constrainer) applied after each conv block.
    """
    _, h, w, _ = image.shape
    x = image
    layers = list(_LAYERS)
    i = 0
    while i < len(layers):
        layer = layers[i]
        if layer == "pool":
            x = nn.max_pool_2x2(x)
            i += 1
            continue
        name, _, _, relu = layer
        p = params[name]
        if "weights_p2" in p:
            # phase-packed layer feeding a pool: fused conv+relu+pool keeps
            # the packed layout off HBM entirely (ops.phasepack)
            from hand3d_tpu.ops import phasepack

            next_is_pool = i + 1 < len(layers) and layers[i + 1] == "pool"
            fused = phasepack.maybe_fused_conv_pool(
                x, p, relu and next_is_pool, compute_dtype
            )
            if fused is not None:
                x = fused
                if constrain is not None:
                    x = constrain(x)
                i += 2
                continue
        x = nn.conv2d(x, p, compute_dtype=compute_dtype)
        if relu:
            x = nn.leaky_relu(x)
        if constrain is not None:
            x = constrain(x)
        i += 1
    return [resize_bilinear(x, (h, w))]
