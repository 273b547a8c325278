"""Accuracy bounds for the speed presets (VERDICT round-1, next-round #6).

The README perf table quotes opt-in speed presets (``seg_scale=0.5``, int8
PTQ, phase_pack, bf16) whose accuracy deltas could not be validated against
the published RHD/STB benchmarks (no real data or shipped weights exist in
this environment). This tool produces the strongest bound obtainable here:
run the FULL f32 parity cascade and each preset variant on the same synthetic
RHD fixtures with the same weights, and report

  * seg_scale: the crop-box drift distribution (center L2 px, relative crop
    scale drift) — the preset only changes localization, so box drift IS its
    failure mode — plus downstream 2D-keypoint EPE delta;
  * int8 / phase_pack / bf16: 2D-keypoint EPE (px, global frame) and
    relative 3D-coordinate drift vs the f32 baseline.

Weights: random init is a weak oracle for localization (a random HandSegNet
segments noise), so by default this tool expects the synthetic-overfit
weights produced by ``tools/overfit_check.py --keep DIR`` — trained nets
that actually localize the fixture hands. Random init remains available
(``--random-init``) for the quantization-noise rows, which do not depend on
mask quality.

Usage:
  python tools/overfit_check.py --keep /tmp/overfit --write-doc docs/OVERFIT.md
  python tools/preset_accuracy.py --overfit-dir /tmp/overfit --write-doc docs/PRESETS.md
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _load_overfit_params(net, overfit_dir):
    """Merge per-trainer overfit snapshots over a fresh init.

    overfit_check writes flax-msgpack TrainState snapshots; msgpack_restore
    reads them without an optimizer-state template. Scopes present in a
    snapshot override the init (seg -> HandSegNet, pose -> PoseNet,
    lifting -> PosePrior+ViewpointNet).
    """
    import jax
    from flax.serialization import msgpack_restore

    from hand3d_tpu.train.checkpoints import latest_snapshot

    params = dict(net.init(jax.random.PRNGKey(0)))
    found = []
    for sub in sorted(os.listdir(overfit_dir)):
        snap_dir = os.path.join(overfit_dir, sub)
        if not (sub.startswith("snap") and os.path.isdir(snap_dir)):
            continue
        path = latest_snapshot(snap_dir)
        if path is None:
            continue
        raw = msgpack_restore(open(path, "rb").read())
        snap_params = raw["params"]
        for scope, tree in snap_params.items():
            if scope in params:
                params[scope] = tree
                found.append(scope)
    if not found:
        raise SystemExit(
            f"no snapshots under {overfit_dir} — run "
            "tools/overfit_check.py --keep first"
        )
    print(f"overfit weights loaded for scopes: {sorted(set(found))}",
          file=sys.stderr)
    return params


def _fixture_images(n_images, batch):
    """Decode n_images synthetic RHD records (multiple seeds for diversity)
    into mean-subtracted [B, H, W, 3] batches + hand_side."""
    from fixtures import make_rhd_bin

    from hand3d_tpu.data.rhd import RHDDataset

    images = []
    with tempfile.TemporaryDirectory() as d:
        seed = 0
        while sum(len(x) for x in images) < n_images:
            path = os.path.join(d, f"rhd_{seed}.bin")
            make_rhd_bin(path, num_records=min(16, n_images), seed=seed,
                         dominant="left" if seed % 2 == 0 else "right")
            ds = RHDDataset("evaluation", path=path)
            raw = ds.raw_batch(np.arange(len(ds)))
            images.append(raw["image"].astype(np.float32) / 255.0 - 0.5)
            seed += 1
    images = np.concatenate(images)[:n_images]
    hand_side = np.tile(np.asarray([[1.0, 0.0]], np.float32), (batch, 1))
    return [images[i:i + batch] for i in range(0, n_images, batch)
            if len(images[i:i + batch]) == batch], hand_side


def _run(net, params, batches, hand_side):
    import jax

    fn = jax.jit(net.inference)
    outs = [fn(params, jax.numpy.asarray(b), hand_side) for b in batches]
    return {
        "center": np.concatenate([np.asarray(o.center) for o in outs]),
        "scale_crop": np.concatenate([np.asarray(o.scale_crop) for o in outs]),
        "uv21": np.concatenate([np.asarray(o.keypoint_uv21) for o in outs]),
        "coord3d": np.concatenate(
            [np.asarray(o.keypoint_coord3d) for o in outs]),
        "scoremap": np.concatenate(
            [np.asarray(o.keypoints_scoremap, np.float32) for o in outs]),
    }


def _stats(x):
    x = np.asarray(x, np.float64).ravel()
    return {"mean": float(x.mean()), "p50": float(np.percentile(x, 50)),
            "p95": float(np.percentile(x, 95)), "max": float(x.max())}


def _deltas(base, var):
    """Drift metrics of a variant vs the f32 parity baseline."""
    center_px = np.linalg.norm(var["center"] - base["center"], axis=-1)
    scale_rel = np.abs(var["scale_crop"] - base["scale_crop"]) / np.maximum(
        np.abs(base["scale_crop"]), 1e-6)
    uv_epe = np.linalg.norm(var["uv21"] - base["uv21"], axis=-1)  # [N, 21] px
    # coord3d is canonically normalized (unit middle-MCP bone), so absolute
    # differences are already relative to hand size
    c3d = np.linalg.norm(var["coord3d"] - base["coord3d"], axis=-1)
    # Scoremap-space drift, per image: ||dS|| / ||S|| over the [256,256,21]
    # map. The uv EPE's heavy tail comes from near-tie argmax flips (a tiny
    # perturbation of a two-peak scoremap moves the argmax tens of px);
    # this metric is immune to ties and measures the perturbation itself.
    num = np.linalg.norm(
        (var["scoremap"] - base["scoremap"]).reshape(len(uv_epe), -1), axis=1)
    den = np.maximum(np.linalg.norm(
        base["scoremap"].reshape(len(uv_epe), -1), axis=1), 1e-12)
    return {
        "crop_center_px": _stats(center_px),
        "crop_scale_rel": _stats(scale_rel),
        "uv21_epe_px": _stats(uv_epe),
        "coord3d_drift": _stats(c3d),
        "scoremap_rel_l2": _stats(num / den),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--overfit-dir", default=None,
                    help="work dir from tools/overfit_check.py --keep")
    ap.add_argument("--random-init", action="store_true",
                    help="use random-init weights (weak localization oracle)")
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--write-doc", default=None)
    ap.add_argument("--label", default=None,
                    help="weights label for the doc section title (e.g. "
                         "'overfit+QAT'); default: overfit|random_init")
    args = ap.parse_args()
    if not args.overfit_dir and not args.random_init:
        ap.error("pass --overfit-dir DIR (preferred) or --random-init")

    import jax

    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.ops.phasepack import phase_pack_params
    from hand3d_tpu.ops.quant import (calibrate_act_scales,
                                      quantize_params_int8)

    net = ColorHandPose3D()
    if args.overfit_dir:
        params = _load_overfit_params(net, args.overfit_dir)
    else:
        params = net.init(jax.random.PRNGKey(0))
    batches, hand_side = _fixture_images(args.images, args.batch)
    print(f"running f32 baseline on {len(batches)}x{args.batch} fixtures ...",
          file=sys.stderr)
    base = _run(net, params, batches, hand_side)

    # static activation scales, calibrated on the first fixture batches
    # (eager float cascade; VERDICT r4 #3 — the candidate cure for the
    # PoseNet2D dynamic-grid drift)
    print("calibrating static act scales ...", file=sys.stderr)
    calib = calibrate_act_scales(
        lambda p, b: net.inference(p, jax.numpy.asarray(b), hand_side),
        params, batches[:max(1, len(batches) // 2)],
        margin=float(os.environ.get("HAND3D_CALIB_MARGIN", "1.0")))

    variants = {
        "seg_scale=0.5": (ColorHandPose3D(seg_scale=0.5), params),
        "bf16": (ColorHandPose3D(compute_dtype=jax.numpy.bfloat16), params),
        "int8": (net, quantize_params_int8(params)),
        # full int8 with calibrated STATIC per-input-channel act scales
        "int8_static": (net, quantize_params_int8(params,
                                                  act_scales=calib)),
        # HandSegNet-scoped int8: the drift-free half of the int8 speedup
        # (DESIGN.md ablation: all uv drift localizes to PoseNet2D)
        "int8_seg": (net, quantize_params_int8(params,
                                               scopes={"handsegnet"})),
        # HandSegNet + only the PoseNet refinement units (the trunk that
        # feeds the first scoremap head stays float)
        "int8_seg_refiners": (net, quantize_params_int8(
            quantize_params_int8(params, scopes={"handsegnet"}),
            scopes={"posenet2d"}, include_substrings={"conv6", "conv7"})),
        # ... composed with phase_pack (candidate parity-accuracy headline:
        # both constituents bound at 0.00 px individually)
        "int8_seg_pp": (net, phase_pack_params(
            quantize_params_int8(params, scopes={"handsegnet"}))),
        "phase_pack": (net, phase_pack_params(params)),
    }
    results = {}
    for name, (vnet, vparams) in variants.items():
        print(f"running {name} ...", file=sys.stderr)
        results[name] = _deltas(base, _run(vnet, vparams, batches, hand_side))

    summary = {
        "gate": "preset_accuracy",
        "weights": args.label or ("overfit" if args.overfit_dir
                                  else "random_init"),
        "images": args.images,
        "platform": jax.devices()[0].platform,
        "presets": results,
    }
    print(json.dumps(summary))
    if args.write_doc:
        with open(args.write_doc, "a") as f:
            f.write(_markdown(summary))


def _git_rev():
    import subprocess

    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=REPO, timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _markdown(summary):
    lines = [
        "",
        f"## Preset accuracy bounds ({summary['weights']} weights, "
        f"{summary['images']} synthetic RHD fixtures, platform "
        f"{summary['platform']}) — commit {_git_rev()}",
        "",
        "Drift vs the f32 parity cascade (same weights, same inputs). "
        "coord3d is in canonical units (middle-MCP bone = 1).",
        "",
        "| Preset | crop center px (p95/max) | crop scale rel (p95) "
        "| uv21 EPE px (mean/p95/max) | coord3d drift (mean/p95) "
        "| scoremap rel-l2 (p50/p95) |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in summary["presets"].items():
        c, s, u, d = (r["crop_center_px"], r["crop_scale_rel"],
                      r["uv21_epe_px"], r["coord3d_drift"])
        sm = r.get("scoremap_rel_l2")
        sm_cell = f"{sm['p50']:.4f} / {sm['p95']:.4f}" if sm else "—"
        lines.append(
            f"| {name} | {c['p95']:.2f} / {c['max']:.2f} | {s['p95']:.4f} "
            f"| {u['mean']:.2f} / {u['p95']:.2f} / {u['max']:.2f} "
            f"| {d['mean']:.4f} / {d['p95']:.4f} | {sm_cell} |"
        )
    lines += [""]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
