"""Numeric helpers with reference-parity semantics."""

import jax.numpy as jnp

PI = 3.141592653589793


def atan2_safe(y, x):
    """atan2 built from atan with quadrant corrections, returning (-pi, pi].

    The reference hand-rolled atan2 this way because TF 1.3 lacked it
    (/root/reference/utils/canonical_trafo.py:21-38, duplicated at
    relative_trafo.py:28-45). We keep the exact formulation — including the
    eps=1e-8 shift of x — instead of jnp.arctan2, because the shipped weights
    and published metrics were produced with these bit patterns, and the eps
    changes results near the axes (e.g. x == 0).
    """
    x_eps = x + 1e-8
    t = jnp.arctan(y / x_eps)  # (-pi/2, pi/2)
    t = jnp.where(x_eps < 0.0, t + PI, t)  # (-pi/2, 3pi/2)
    t = jnp.where(t < 0.0, t + 2.0 * PI, t)  # [0, 2pi)
    t = jnp.where(t > PI, t - 2.0 * PI, t)  # (-pi, pi]
    return t
