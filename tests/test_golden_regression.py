"""Golden-output regression: the full cascade's numbers for a fixed seed
and fixed input must not drift across refactors.

The parity/property tests check the MATH against independent goldens; this
test freezes the composed end-to-end result (random init, fixed PRNG keys)
so that any unintended numeric change — op reordering, dtype change, glue
rewiring — fails loudly. Regenerate deliberately with:
    python tests/test_golden_regression.py --regen
(only when a change is MEANT to alter numerics; say why in the commit).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "goldens", "cascade_v1.npz"
)


def _compute():
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    image = (
        jax.random.uniform(jax.random.PRNGKey(1), (2, 120, 160, 3)) - 0.5
    )
    hand_side = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = net.inference(params, image, hand_side)
    return {
        "keypoint_coord3d": np.asarray(out.keypoint_coord3d),
        "keypoint_uv21": np.asarray(out.keypoint_uv21),
        "center": np.asarray(out.center),
        "scale_crop": np.asarray(out.scale_crop),
    }


def test_cascade_outputs_match_golden():
    got = _compute()
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run: python tests/test_golden_regression.py --regen"
    )
    with np.load(GOLDEN_PATH) as ref:
        for k in got:
            np.testing.assert_allclose(
                got[k], ref[k], atol=1e-4, rtol=1e-4,
                err_msg=f"cascade output {k!r} drifted from the golden; if "
                "intentional, regenerate (--regen) and justify in the commit",
            )


if __name__ == "__main__":
    import sys

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **_compute())
        print(f"Wrote {GOLDEN_PATH}")
    else:
        print(__doc__)
