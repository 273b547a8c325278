"""TPU-vs-CPU numeric parity smoke check for the glue/geometry ops.

The test suite pins the CPU backend (tests/conftest.py), so it can never
catch TPU-only numeric regressions — most notably JAX's default matmul
precision, which rounds f32 operands through bf16 MXU passes and once cost
the crop kernel ~1e-2 absolute error (see docs/DESIGN.md "Matmul
precision"). This tool runs the parity-critical ops on both backends and
reports the max abs difference against per-op budgets chosen just above
the f32-emulation floor measured on v5e.

Usage (needs a TPU-visible JAX and a CPU device, which jax always has):
  python tools/chip_parity_check.py            # exit 0 = within budget
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def _run(fn, args, device):
    placed = [jax.device_put(a, device) for a in args]
    out = jax.jit(fn)(*placed)
    return jax.tree_util.tree_map(np.asarray, out)


def _max_diff(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return max(
        float(np.abs(x.astype(np.float32) - y.astype(np.float32)).max())
        for x, y in zip(fa, fb)
    )


def checks():
    from hand3d_tpu.data.config import PreprocessConfig
    from hand3d_tpu.data.preprocess import preprocess_rhd
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.ops import canonical, kinematics
    from hand3d_tpu.ops.image import crop_and_resize

    rs = np.random.RandomState(0)
    img = rs.randn(4, 240, 320, 3).astype(np.float32)
    boxes = np.asarray([[0.1, 0.2, 0.8, 0.9]] * 4, np.float32)
    xyz = rs.randn(4, 21, 3).astype(np.float32)

    yield ("crop_and_resize",
           lambda i, b: crop_and_resize(i, b, (256, 256)), (img, boxes),
           1e-3)
    yield ("canonical_trafo", canonical.canonical_trafo, (xyz,), 1e-5)
    yield ("bone_rel_trafo_roundtrip",
           lambda x: kinematics.bone_rel_trafo_inv(
               kinematics.bone_rel_trafo(x)), (xyz,), 1e-4)

    # full cascade at SCOREMAP level: accumulates every op above plus the
    # conv stacks, whose bf16 MXU passes legitimately differ from CPU f32 —
    # the budget reflects that hardware precision. Decoded keypoints are
    # NOT compared here: with random init the scoremaps are near-flat, so
    # any conv noise moves argmaxes arbitrarily (with trained peaky maps
    # the decode is stable; the eval harnesses are the real check there).
    net = ColorHandPose3D()
    params = net.init(jax.random.PRNGKey(0))
    hand_side = np.tile(np.asarray([[1.0, 0.0]], np.float32), (4, 1))

    def cascade(p, im, hs):
        return net.inference(p, im, hs).hand_scoremap

    yield ("cascade_hand_scoremap", cascade,
           (params, img * 0.1, hand_side), 5e-2)

    # jitted preprocess (cam-matrix composition + crop + gaussian maps)
    raw = {
        "image": (rs.rand(2, 320, 320, 3) * 255).astype(np.uint8),
        "kp_xyz": rs.rand(2, 42, 3).astype(np.float32),
        "kp_uv": (rs.rand(2, 42, 2) * 300).astype(np.float32),
        "cam_mat": np.tile(np.asarray(
            [[283.0, 0, 160.0], [0, 283.0, 160.0], [0, 0, 1.0]],
            np.float32), (2, 1, 1)),
        "hand_parts": np.full((2, 320, 320), 2, np.uint8),
        "kp_vis": np.ones((2, 42), np.uint8),
    }
    cfg = PreprocessConfig(hand_crop=True)

    def pre(r):
        out = dict(preprocess_rhd(cfg, r))
        out.pop("scoremap", None)  # gaussian tails underflow differently
        return out

    yield ("preprocess_rhd", pre, (raw,), 1e-2)


def main():
    cpu = jax.devices("cpu")[0]
    accel = jax.devices()[0]
    if accel.platform == "cpu":
        print("no accelerator visible; nothing to compare", file=sys.stderr)
        return 0
    failures = 0
    for name, fn, args, budget in checks():
        ref = _run(fn, args, cpu)
        got = _run(fn, args, accel)
        diff = _max_diff(ref, got)
        ok = diff <= budget
        failures += 0 if ok else 1
        print(f"{name:28s} max|Δ| {diff:.3e}  budget {budget:.0e}  "
              f"{'OK' if ok else 'FAIL'}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
