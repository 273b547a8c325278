"""Analytic roofline for the full cascade on one v5e chip (VERDICT round-2,
next-round #7: prove where the parity-cascade ceiling is).

Walks the REAL layer tables of all four nets (hand3d_tpu.models.*), assigns
each conv a per-layer time of

    t = max(FLOPs / (R_wide * min(cin, 128) / 128),   # MXU lane fill
            bytes_moved / BW_HBM)                     # HBM streaming floor

with R_wide = the measured wide-conv rate on this chip (docs/DESIGN.md
"What we deliberately did NOT hand-optimize": 3x3x256@60x80 186-190,
3x3x512@30x40 183-188, 7x7x128@32x32 237 eff TFLOP/s -> 190 here) and
BW_HBM = v5e HBM bandwidth (819 GB/s). The lane-fill factor reproduces the
measured 64-channel laggard (conv1_2 @256^2 measured ~72-75 TF/s; the model
gives 95 -- the model is an UPPER bound, ~25% optimistic for half-filled
lanes, which only strengthens the ceiling argument). Non-conv glue
(floodfill, crop, resizes, argmax decode) is charged at its measured
per-stage time from tools/profile_stages.py runs.

Prints a per-stage table and the predicted frames/s upper bound at a given
batch, to compare against the measured headline (bench.py / docs/PERF.md).

Usage:
  python tools/roofline.py --batch 128 [--image-hw 240x320] [--int8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R_WIDE = 190e12   # measured bf16 wide-conv eff rate, this chip (DESIGN.md)
R_INT8 = 380e12   # int8 doubles the MXU rate (measured 366-398)
BW_HBM = 819e9    # v5e HBM GB/s (public spec)
CROP = 256


def conv_cost(h, w, k, cin, cout, rate, dtype_bytes=2):
    flops = 2.0 * h * w * k * k * cin * cout
    lane_fill = min(cin, 128) / 128.0
    t_mxu = flops / (rate * lane_fill)
    bytes_moved = dtype_bytes * (h * w * cin + h * w * cout + k * k * cin * cout)
    t_hbm = bytes_moved / BW_HBM
    return flops, max(t_mxu, t_hbm), t_hbm > t_mxu


def handsegnet_layers(h, w):
    from hand3d_tpu.models.handsegnet import _LAYERS
    cin = 3
    for entry in _LAYERS:
        if entry == "pool":
            h, w = h // 2, w // 2
            continue
        name, k, cout, _ = entry
        yield name, h, w, k, cin, cout
        cin = cout


def posenet_layers():
    from hand3d_tpu.models import posenet

    h = w = CROP
    cin = 3
    for entry in posenet._ENCODER:
        if entry == "pool":
            h, w = h // 2, w // 2
            continue
        name, k, cout = entry
        yield name, h, w, k, cin, cout
        cin = cout
    # initial head conv5_1(512, 1x1) -> conv5_2(21) at 32x32
    yield "conv5_1", h, w, 1, cin, 512
    yield "conv5_2", h, w, 1, 512, posenet.NUM_KP
    for unit in (1, 2):
        cin_u = posenet.NUM_KP + posenet.ENC_CHAN
        for name, k, cout, _ in posenet._refinement_layers(unit):
            yield name, h, w, k, cin_u, cout
            cin_u = cout


def prior_layers():
    # PosePrior tower [32,64,128] + ViewpointNet tower [64,128,256], each
    # (stride1 + stride2) x3 from 32x32x21; FCs are negligible (<20 MFLOP).
    for prefix, chans in (("pose", [32, 64, 128]), ("vp", [64, 128, 256])):
        h = w = 32
        cin = 21
        for i, cout in enumerate(chans):
            yield f"{prefix}{i}_1", h, w, 3, cin, cout
            yield f"{prefix}{i}_2", h // 2, w // 2, 3, cout, cout  # stride 2
            h, w, cin = h // 2, w // 2, cout


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image-hw", default="240x320")
    ap.add_argument("--seg-scale", type=float, default=1.0)
    ap.add_argument("--int8", action="store_true",
                    help="int8 rate for cin>=128 layers (quant default)")
    ap.add_argument("--int8-scope", default=None, choices=["handsegnet"],
                    help="with --int8: apply the int8 rate only to this "
                         "stage (the drift-free quantize_scope preset)")
    ap.add_argument("--glue-ms", type=float, default=0.0,
                    help="measured non-conv glue ms/frame (floodfill + crop"
                         " + resizes + decode) from tools/profile_stages.py;"
                         " default 0 = conv-only bound")
    ap.add_argument("--per-layer", action="store_true")
    args = ap.parse_args()
    ih, iw = (int(v) for v in args.image_hw.split("x"))
    sh, sw = round(ih * args.seg_scale), round(iw * args.seg_scale)

    stages = {
        "HandSegNet": list(handsegnet_layers(sh, sw)),
        "PoseNet": list(posenet_layers()),
        "Prior+Viewpoint": list(prior_layers()),
    }
    total_t, total_f = 0.0, 0.0
    print(f"batch={args.batch} image={ih}x{iw} seg_scale={args.seg_scale} "
          f"rate_wide={R_WIDE/1e12:.0f}TF/s hbm={BW_HBM/1e9:.0f}GB/s "
          f"int8={args.int8}")
    print(f"{'stage':<16} {'GFLOP/frame':>12} {'ms/frame':>9} "
          f"{'bound':>12}")
    for stage, layers in stages.items():
        st, sf, n_bw = 0.0, 0.0, 0
        stage_int8 = args.int8 and (
            args.int8_scope is None or
            (args.int8_scope == "handsegnet" and stage == "HandSegNet"))
        for name, h, w, k, cin, cout in layers:
            rate = R_INT8 if stage_int8 and cin >= 128 else R_WIDE
            f, t, bw_bound = conv_cost(h, w, k, cin, cout, rate)
            # batch amortizes weight reloads; activations scale with batch
            st += t
            sf += f
            n_bw += bw_bound
            if args.per_layer:
                print(f"  {name:<14} {f/1e9:10.2f}G {t*1e3:8.4f}ms "
                      f"{'HBM' if bw_bound else 'MXU'} "
                      f"({h}x{w} k{k} {cin}->{cout})")
        total_t += st
        total_f += sf
        print(f"{stage:<16} {sf/1e9:12.2f} {st*1e3:9.3f} "
              f"{n_bw:>3}/{len(layers)} HBM-bound")
    glue = args.glue_ms / 1e3
    total = total_t + glue
    print(f"{'glue (measured)':<16} {'—':>12} {glue*1e3:9.3f}")
    print(f"{'TOTAL':<16} {total_f/1e9:12.2f} {total*1e3:9.3f}")
    print(f"upper-bound throughput: {1.0/total:,.0f} frames/s "
          f"({total_f/total/1e12:.1f} eff TFLOP/s aggregate; a flat "
          f"{R_WIDE/1e12:.0f} TF/s would give {R_WIDE/total_f:,.0f} fps)")


if __name__ == "__main__":
    main()
