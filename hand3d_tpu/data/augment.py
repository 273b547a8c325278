"""Stateless augmentation primitives (jax.random keyed per batch).

The reference used TF's stateful RNG ops (truncated_normal, random_uniform,
random_hue, random_crop, scoremap dropout — BinaryDbReader.py:160-392).
These are their jax.random equivalents; every call takes an explicit key, so
a training step's data augmentation is reproducible from its step key.
"""

import jax
import jax.numpy as jnp


def truncated_normal(key, shape, stddev):
    """N(0, stddev) truncated at 2 sigma, like tf.truncated_normal."""
    return jax.random.truncated_normal(key, -2.0, 2.0, shape) * stddev


def rgb_to_hsv(rgb):
    """[..., 3] in [0, 1] -> HSV, matching tf.image.rgb_to_hsv."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    c = v - mn
    safe_c = jnp.where(c == 0, 1.0, c)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c == 0, 0.0, (h / 6.0) % 1.0)
    s = jnp.where(v == 0, 0.0, c / jnp.where(v == 0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """Inverse of :func:`rgb_to_hsv`."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def random_hue(key, image, max_delta):
    """Shift hue by U(-max_delta, max_delta) PER SAMPLE, like the
    reference's per-sample graph (tf.image.random_hue runs before batching,
    BinaryDbReader.py:184, so every sample draws its own delta).

    ``image`` is [B, H, W, 3] mean-subtracted ([-0.5, 0.5]); the rotation
    happens in [0, 1] space. Intentional difference (PARITY.md): the
    reference feeds mean-subtracted values straight into TF's HSV
    round-trip, outside that op's [0, 1] contract and degenerate for
    negative channels; rotating in [0, 1] is the well-defined version of
    the same augmentation.
    """
    b = image.shape[0]
    delta = jax.random.uniform(
        key, (b, 1, 1), minval=-max_delta, maxval=max_delta
    )
    rgb = jnp.clip(image + 0.5, 0.0, 1.0)
    hsv = rgb_to_hsv(rgb)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
    return hsv_to_rgb(hsv) - 0.5


def random_crop_hw(key, stacked, crop_hw):
    """Per-sample random spatial crop of [B, H, W, C], like tf.random_crop.

    Returns [B, ch, cw, C]; offsets are uniform over the valid range.
    """
    b, h, w, _ = stacked.shape
    ch, cw = crop_hw
    kr, kc = jax.random.split(key)
    r0 = jax.random.randint(kr, (b,), 0, h - ch + 1)
    c0 = jax.random.randint(kc, (b,), 0, w - cw + 1)

    def crop_one(img, r, c):
        return jax.lax.dynamic_slice(img, (r, c, 0), (ch, cw, img.shape[-1]))

    return jax.vmap(crop_one)(stacked, r0, c0)


def scoremap_channel_dropout(key, scoremap, keep_prob):
    """Zero whole keypoint channels, keeping survivors unscaled.

    The reference applies tf.nn.dropout (which scales kept values by
    1/keep_prob) and then multiplies by keep_prob (BinaryDbReader.py:362-365),
    so the net effect is a pure channel mask — implemented directly.
    ``scoremap``: [B, H, W, K].
    """
    b, _, _, k = scoremap.shape
    mask = jax.random.bernoulli(key, keep_prob, (b, 1, 1, k))
    return scoremap * mask.astype(scoremap.dtype)
