"""Minimal repro driver for the Pallas dispatch wedge (round-1 bench
postmortem, VERDICT.md "What's weak" #1).

FINDINGS (2026-08-17, v5 lite chip over the axon tunnel):
  case 0 (EAGER pallas_call, no jit):   WEDGED >300 s, deterministic
  cases 1-5 (same kernel under jax.jit,
    incl. round-1's exact bf16+scan
    "wedge path", case 4):              all pass, 50-110 s cold compile
So the deterministic trigger is eager Pallas dispatch on the remote-device
platform, not scan/bf16; round-1's in-the-day scan wedge was compiler/
cache-state-dependent. Fix shipped: the kernels' public entry points route
through an inner jax.jit (see docs/DESIGN.md "Pallas dispatch wedge"), which
makes case 0 pass — keep this ladder to re-triage any future wedge. Each
case runs in a subprocess with a hard timeout. Usage:

    python tools/repro_pallas_scan.py            # run the whole ladder
    python tools/repro_pallas_scan.py --case N   # run one case in-process
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _floodfill_input(batch=8, h=240, w=320):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    det = (jax.random.uniform(key, (batch, h, w)) > 0.4).astype(jnp.float32)
    seed = jnp.tile(jnp.asarray([[h // 2, w // 2]], jnp.int32), (batch, 1))
    return det, seed


def case_0():
    """Pallas floodfill alone, EAGER (the deterministic wedge pre-fix)."""
    import jax.numpy as jnp
    from hand3d_tpu.ops.pallas.floodfill import flood_fill_pallas

    det, seed = _floodfill_input()
    out = flood_fill_pallas(det, seed, 32)
    print("sum", float(jnp.sum(out)))


def case_1():
    """Pallas floodfill inside lax.scan, f32 inputs."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from hand3d_tpu.ops.pallas.floodfill import flood_fill_pallas

    det, seed = _floodfill_input()

    @jax.jit
    def fn(det, seed):
        def body(c, _):
            out = flood_fill_pallas(det + c * 0.0, seed, 32)
            return jnp.sum(out) * 1e-9, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=4)
        return s

    print("sum", float(fn(det, seed)))


def case_2():
    """bf16 conv producer -> floodfill, inside lax.scan."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from hand3d_tpu.ops.pallas.floodfill import flood_fill_pallas

    b, h, w = 8, 240, 320
    img = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 2)) * 0.1
    seed = jnp.tile(jnp.asarray([[h // 2, w // 2]], jnp.int32), (b, 1))

    @jax.jit
    def fn(img, kern, seed):
        def body(c, _):
            x = lax.conv_general_dilated(
                (img + c * 0.0).astype(jnp.bfloat16), kern.astype(jnp.bfloat16),
                (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32)
            det = jnp.round(jax.nn.sigmoid(x[..., 0]))
            out = flood_fill_pallas(det, seed, 32)
            return jnp.sum(out) * 1e-9, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=4)
        return s

    print("sum", float(fn(img, kern, seed)))


def case_3():
    """Same as case_2 but fp32 conv (control)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from hand3d_tpu.ops.pallas.floodfill import flood_fill_pallas

    b, h, w = 8, 240, 320
    img = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 2)) * 0.1
    seed = jnp.tile(jnp.asarray([[h // 2, w // 2]], jnp.int32), (b, 1))

    @jax.jit
    def fn(img, kern, seed):
        def body(c, _):
            x = lax.conv_general_dilated(
                img + c * 0.0, kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            det = jnp.round(jax.nn.sigmoid(x[..., 0]))
            out = flood_fill_pallas(det, seed, 32)
            return jnp.sum(out) * 1e-9, ()

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=4)
        return s

    print("sum", float(fn(img, kern, seed)))


def case_4():
    """Full cascade bf16 + scan chain=1 + pallas floodfill (round-1 default)."""
    import jax
    import jax.numpy as jnp

    os.environ.pop("HAND3D_FLOODFILL", None)
    from bench import _chained
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D(compute_dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0))
    image = jax.random.uniform(jax.random.PRNGKey(1), (8, 240, 320, 3)) - 0.5
    hand_side = jnp.tile(jnp.asarray([[1.0, 0.0]]), (8, 1))
    print("sum", float(_chained(net, 1)(params, image, hand_side)))


def case_5():
    """Full cascade bf16, plain jit (no scan), pallas floodfill."""
    import jax
    import jax.numpy as jnp
    from hand3d_tpu.models.cascade import ColorHandPose3D

    net = ColorHandPose3D(compute_dtype=jnp.bfloat16)
    params = net.init(jax.random.PRNGKey(0))
    image = jax.random.uniform(jax.random.PRNGKey(1), (8, 240, 320, 3)) - 0.5
    hand_side = jnp.tile(jnp.asarray([[1.0, 0.0]]), (8, 1))
    fn = jax.jit(lambda p, i, h: jnp.sum(net.inference(p, i, h).keypoint_coord3d))
    print("sum", float(fn(params, image, hand_side)))


CASES = [case_0, case_1, case_2, case_3, case_4, case_5]


def main():
    timeout = int(os.environ.get("REPRO_TIMEOUT", "240"))
    for i in range(len(CASES)):
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", str(i)],
                capture_output=True, text=True, timeout=timeout, cwd=REPO,
            )
            status = f"rc={proc.returncode}"
            tail = (proc.stderr or proc.stdout)[-300:].replace("\n", " | ")
        except subprocess.TimeoutExpired:
            status, tail = "TIMEOUT (wedged)", ""
        dt = time.time() - t0
        doc = CASES[i].__doc__.splitlines()[0]
        print(f"case {i}: {status} in {dt:5.1f}s — {doc}  {tail if 'rc=1' in status else ''}",
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--case":
        CASES[int(sys.argv[2])]()
    else:
        main()
