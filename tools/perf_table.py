"""Re-measure every README perf row at the current commit (VERDICT round-2,
next-round #4: "no number in README older than the commit that produced it").

Each row is one subprocess running ``bench.py --child <batch>`` with the
row's env overrides (same measurement methodology as the headline bench:
chained data-dependent iterations, differential timing — see bench.py
docstring). Batch-1 latency rows use the in-jit ``scan`` chaining method:
at ~1.5 ms/frame the per-call host dispatch (~hundreds of ms through the
tunnel) would dominate a pychain differential, so the chain must live on
device; scan rows disable the Pallas floodfill (the round-1 bf16+scan+Pallas
compiler wedge, VERDICT round-1).

Writes/refreshes a stamped markdown table in docs/PERF.md plus a JSON line
per row on stdout. README's summary table should quote this file's commit.

Usage:
  python tools/perf_table.py                    # all rows (~20 min warm)
  python tools/perf_table.py --rows headline fast_b128
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (row key, description, batch, timeout_s, env overrides)
# All rows default to bf16 compute + Pallas floodfill + pychain (the bench
# headline path) unless overridden. Timeouts are 700 s for the preset rows:
# the round-3 sweep measured cold compiles through the tunnel past 420 s on
# fast/int8/int8_pp rows while the SAME configs succeeded on other rows in
# the same sweep — the variance is host/tunnel load, not any one config.
_ROWS = [
    ("parity_b32", "full cascade, parity, batch 32", 32, 420, {}),
    ("headline", "full cascade, parity, batch 128", 128, 420, {}),
    ("parity_b256", "full cascade, parity, batch 256", 256, 700, {}),
    ("fast_b32", "fast preset seg_scale=0.5, batch 32", 32, 700,
     {"HAND3D_BENCH_SEG_SCALE": "0.5"}),
    ("fast_b128", "fast preset seg_scale=0.5, batch 128", 128, 700,
     {"HAND3D_BENCH_SEG_SCALE": "0.5"}),
    ("int8_b32", "int8 PTQ, batch 32", 32, 700,
     {"HAND3D_BENCH_QUANT": "int8"}),
    ("int8_static_b32", "int8 static act scales (see PRESETS drift), b32",
     32, 900, {"HAND3D_BENCH_QUANT": "int8_static"}),
    ("int8_static_b128", "int8 static act scales (see PRESETS drift), b128",
     128, 900, {"HAND3D_BENCH_QUANT": "int8_static"}),
    ("int8_static_fast_b128", "int8 static + fast preset, batch 128",
     128, 900, {"HAND3D_BENCH_QUANT": "int8_static",
                "HAND3D_BENCH_SEG_SCALE": "0.5"}),
    ("lat_b1_int8_static", "batch-1 latency, int8 static (scan chain)", 1,
     900, {"HAND3D_BENCH_QUANT": "int8_static", "HAND3D_BENCH_METHOD": "scan",
           "HAND3D_BENCH_CHAIN": "32", "HAND3D_PALLAS": "0"}),
    ("int8_seg_b32", "int8 HandSegNet-scoped (drift-free), batch 32", 32,
     700, {"HAND3D_BENCH_QUANT": "int8",
           "HAND3D_BENCH_QUANT_SCOPE": "handsegnet"}),
    ("int8_seg_b128", "int8 HandSegNet-scoped (drift-free), batch 128", 128,
     700, {"HAND3D_BENCH_QUANT": "int8",
           "HAND3D_BENCH_QUANT_SCOPE": "handsegnet"}),
    ("int8_fast_b32", "int8 + fast preset, batch 32", 32, 700,
     {"HAND3D_BENCH_QUANT": "int8", "HAND3D_BENCH_SEG_SCALE": "0.5"}),
    ("int8_fast_b128", "int8 + fast preset, batch 128", 128, 700,
     {"HAND3D_BENCH_QUANT": "int8", "HAND3D_BENCH_SEG_SCALE": "0.5"}),
    ("int8_seg_pp_b32", "int8 HandSegNet-scoped + phase_pack, batch 32", 32,
     700, {"HAND3D_BENCH_QUANT": "int8",
           "HAND3D_BENCH_QUANT_SCOPE": "handsegnet",
           "HAND3D_BENCH_PHASEPACK": "1"}),
    ("int8_seg_pp_b128", "int8 HandSegNet-scoped + phase_pack, batch 128",
     128, 700, {"HAND3D_BENCH_QUANT": "int8",
                "HAND3D_BENCH_QUANT_SCOPE": "handsegnet",
                "HAND3D_BENCH_PHASEPACK": "1"}),
    ("int8_pp_b32", "int8 + phase_pack (parity res), batch 32", 32, 700,
     {"HAND3D_BENCH_QUANT": "int8", "HAND3D_BENCH_PHASEPACK": "1"}),
    ("int8_pp_b128", "int8 + phase_pack (parity res), batch 128", 128, 700,
     {"HAND3D_BENCH_QUANT": "int8", "HAND3D_BENCH_PHASEPACK": "1"}),
    ("pp_b32", "phase_pack alone, batch 32", 32, 700,
     {"HAND3D_BENCH_PHASEPACK": "1"}),
    ("lat_b1", "batch-1 latency, parity (scan chain)", 1, 420,
     {"HAND3D_BENCH_METHOD": "scan", "HAND3D_BENCH_CHAIN": "32",
      "HAND3D_PALLAS": "0"}),
    ("lat_b1_pp", "batch-1 latency, phase_pack (scan chain)", 1, 420,
     {"HAND3D_BENCH_METHOD": "scan", "HAND3D_BENCH_CHAIN": "32",
      "HAND3D_PALLAS": "0", "HAND3D_BENCH_PHASEPACK": "1"}),
    ("lat_b1_fast", "batch-1 latency, fast preset (scan chain)", 1, 700,
     {"HAND3D_BENCH_METHOD": "scan", "HAND3D_BENCH_CHAIN": "32",
      "HAND3D_PALLAS": "0", "HAND3D_BENCH_SEG_SCALE": "0.5"}),
]


def _log(msg):
    print(f"[perf_table] {msg}", file=sys.stderr, flush=True)


def _git_rev():
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=REPO, timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def measure(batch, timeout, env_over):
    env = dict(os.environ, **env_over)
    try:
        proc = subprocess.run(
            [sys.executable, "bench.py", "--child", str(batch)],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"TIMEOUT after {timeout}s"}
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    return {"error": f"rc={proc.returncode}: {(proc.stderr or '')[-400:]}"}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", nargs="*", default=None,
                    help="row keys to measure (default: all)")
    ap.add_argument("--write-doc", default=os.path.join(REPO, "docs/PERF.md"))
    args = ap.parse_args()
    keys = {r[0] for r in _ROWS}
    if args.rows:
        unknown = set(args.rows) - keys
        if unknown:
            ap.error(f"unknown rows {sorted(unknown)}; available {sorted(keys)}")

    # Row results persist in a sidecar JSON so partial re-runs merge:
    # a full sweep seeds it, `--rows <failed>` re-measures only those
    # (e.g. tunnel/compile-cache flakes) and the markdown regenerates
    # from the merged record — each row keeps the commit it was measured
    # at, so a stale row is visible rather than silently re-stamped.
    sidecar = args.write_doc.rsplit(".", 1)[0] + ".json" if args.write_doc \
        else None
    merged = {}
    if sidecar and os.path.exists(sidecar) and args.rows:
        with open(sidecar) as f:
            merged = {r["row"]: r for r in json.load(f)}

    for key, desc, batch, timeout, env_over in _ROWS:
        if args.rows and key not in args.rows:
            continue
        _log(f"{key}: {desc}")
        t0 = time.time()
        r = measure(batch, timeout, env_over)
        r.update(row=key, desc=desc, wall_s=round(time.time() - t0, 1),
                 env={k: v for k, v in env_over.items()}, commit=_git_rev())
        merged[key] = r
        print(json.dumps(r), flush=True)

    results = [merged[k] for k, *_ in _ROWS if k in merged]
    if args.write_doc:
        with open(sidecar, "w") as f:
            json.dump(results, f, indent=1)
        with open(args.write_doc, "w") as f:
            f.write(_markdown(results))
        _log(f"wrote {args.write_doc} + {sidecar}")


def _markdown(results):
    method_note = (
        "Method: bench.py chained data-dependent iterations, differential "
        "timing (pychain for batch>=8, in-jit scan for batch 1); bf16 "
        "compute; one v5e chip."
    )
    lines = [
        "# Measured performance rows",
        "",
        "Regenerated by `python tools/perf_table.py`; each row is stamped "
        "with the commit it was measured at (partial `--rows` re-runs merge "
        "into docs/PERF.json).",
        method_note,
        "",
        "| Row | Config | Batch | frames/s | ms/frame | Env | Commit |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        if "value" in r:
            fps = r["value"]
            msf = 1000.0 / fps if fps else float("nan")
            cell = f"{fps:.1f}", f"{msf:.2f}"
        else:
            cell = f"FAILED: {r.get('error')}", ""
        env = " ".join(f"{k.replace('HAND3D_BENCH_', '').replace('HAND3D_', '')}"
                       f"={v}" for k, v in r["env"].items()) or "—"
        lines.append(
            f"| {r['row']} | {r['desc']} | {r.get('batch', '')} "
            f"| {cell[0]} | {cell[1]} | {env} | {r.get('commit', '?')} |"
        )
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
