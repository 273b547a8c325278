"""Shared CLI helpers."""

import argparse

import jax

from hand3d_tpu.weights import convert_reference_pickles, load_npz


def add_weights_arg(parser, required=False):
    parser.add_argument(
        "--weights", nargs="+", default=None, required=required,
        help="Weight files: .npz (hand3d_tpu export) and/or reference "
        ".pickle files (converted on the fly).",
    )


def _load_tf_ckpt_tree(path):
    """TF V2 checkpoint (prefix or .index path) -> param tree.

    Reads without tensorflow (weights/tf_ckpt.py). Optimizer slots are
    dropped (SNAPSHOT_DISCARD, eval2d_gt_cropped.py:62). If the variables
    carry CPM-MPII scopes, the reference's warm-start discard/rename rules
    (training_handsegnet.py:73-75, training_posenet.py:74-76) are applied so
    ``--weights cpm-model-mpii`` works directly on the shipped checkpoint.
    """
    from hand3d_tpu.weights.convert import (
        CPM_HANDSEGNET_DISCARD, CPM_HANDSEGNET_RENAME, CPM_POSENET_DISCARD,
        CPM_POSENET_RENAME, SNAPSHOT_DISCARD, apply_discard_rename,
        flat_to_tree, load_tf_checkpoint_flat,
    )

    prefix = path[: -len(".index")] if path.endswith(".index") else path
    flat = load_tf_checkpoint_flat(prefix, discard_list=SNAPSHOT_DISCARD)
    if any(n.startswith("CPM/") for n in flat):
        seg = apply_discard_rename(flat, CPM_HANDSEGNET_DISCARD,
                                   CPM_HANDSEGNET_RENAME)
        pose = apply_discard_rename(flat, CPM_POSENET_DISCARD,
                                    CPM_POSENET_RENAME)
        flat = {
            **{k: v for k, v in seg.items() if k.startswith("HandSegNet")},
            **{k: v for k, v in pose.items() if k.startswith("PoseNet2D")},
        }
    return flat_to_tree(flat)


def load_weight_trees(paths, exclude_var_list=None):
    """Merge .npz / reference-.pickle / TF-checkpoint files into one tree."""
    import os

    merged = {}
    for path in paths:
        if path.endswith(".npz"):
            tree = load_npz(path)
        elif path.endswith(".msgpack"):
            # native training snapshot: params only, optimizer state
            # dropped (the reference's load_weights_from_snapshot
            # semantics, utils/general.py:614-651)
            from hand3d_tpu.train.checkpoints import load_snapshot_params

            tree = load_snapshot_params(path)
        elif path.endswith(".index") or os.path.exists(path + ".index"):
            tree = _load_tf_ckpt_tree(path)
        else:
            tree = convert_reference_pickles([path], exclude_var_list)
        for scope, sub in tree.items():
            merged.setdefault(scope, {}).update(sub)
    return merged


def init_or_load(net, seed, weight_paths, exclude_var_list=None):
    params = net.init(jax.random.PRNGKey(seed))
    if weight_paths:
        loaded = load_weight_trees(weight_paths, exclude_var_list)
        for scope in params:
            if scope in loaded:
                params[scope].update(loaded[scope])
    return params


def progress_printer(total, batch_size):
    def progress(batch_idx, valid):
        done = batch_idx * batch_size + valid
        if batch_idx % 10 == 0:
            print(f"{done} / {total} images done: {done * 100.0 / total:.3f} percent")

    return progress


def base_parser(description):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    return p


def add_show_loss_arg(p):
    p.add_argument("--show-loss-freq", type=int, default=1000,
                   help="Steps between loss reports (print + --metrics-log)")
    return p


def add_steps_per_call_arg(p):
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="Run this many training steps per device call "
                        "(lax.scan over a device-resident dataset). "
                        "Amortizes per-step dispatch latency when the "
                        "dataset fits device memory (fine-tuning, small "
                        "sets); trajectory-identical to --steps-per-call 1. "
                        "Requires the fused preprocess path and no --mesh.")


def add_memory_args(p):
    """Activation-memory levers shared by the training CLIs."""
    p.add_argument("--remat", nargs="?", const=True, default=False,
                   help="jax.checkpoint the loss: recompute activations in "
                        "the backward pass instead of storing them. Takes "
                        "an optional jax.checkpoint_policies name (e.g. "
                        "--remat dots_saveable keeps conv/matmul outputs "
                        "and only recomputes elementwise work)")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="Gradient accumulation: split the batch into this "
                        "many microbatches, average their grads, apply one "
                        "update (batch size must be divisible)")
    return p


def _metrics_logger(args):
    """MetricsLogger for --metrics-log, or None (echo stays on the prints).

    Fresh runs truncate an existing log (a re-run's curve must not be
    judged against a stale first line); --resume appends so the curve is
    contiguous across the restart.
    """
    path = getattr(args, "metrics_log", None)
    if not path:
        return None
    from hand3d_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(path, echo=False,
                           fresh=not getattr(args, "resume", False))

    # annotate every step row with the scheduled lr so logs carry direct
    # evidence of LR-boundary crossings (train/schedule.piecewise_constant
    # semantics: values[i] while step < steps[i], step >= boundary advances)
    lr_values = getattr(args, "lr", None)
    lr_steps = getattr(args, "lr_iter", None)
    if lr_values and lr_steps is not None:
        bounds = list(lr_steps)
        vals = [float(v) for v in lr_values]
        orig_log = logger.log

        def log_with_lr(step=None, **kw):
            if step is not None and "lr" not in kw:
                idx = sum(int(step) >= b for b in bounds)
                kw["lr"] = vals[min(idx, len(vals) - 1)]
            return orig_log(step=step, **kw)

        logger.log = log_with_lr
    return logger


def add_qat_arg(parser):
    parser.add_argument(
        "--qat", action="store_true",
        help="Quantization-aware training: train under the int8 fake-quant "
        "view (ops.quant.qat_view) so the weights adapt to the deployed "
        "int8 numerics; export + quantize_params_int8 afterwards.",
    )


def maybe_qat(loss_fn, args):
    """Wrap a loss to train under the QAT view when --qat is set."""
    if not getattr(args, "qat", False):
        return loss_fn
    from hand3d_tpu.ops.quant import qat_view

    def wrapped(params, batch, key):
        return loss_fn(qat_view(params), batch, key)

    return wrapped


def add_quantize_arg(parser):
    parser.add_argument(
        "--quantize", choices=["int8"], default=None,
        help="Post-training quantization of the conv/FC path (ops.quant); "
        "use to measure the quantized EPE delta against the fp32 numbers.",
    )
    parser.add_argument(
        "--phase-pack", action="store_true",
        help="Pack conv1_2's horizontal output phases into the MXU's 128 "
        "lanes with a fused conv+relu+pool (ops.phasepack; +10%% at batch 1 "
        "/ +6%% at batch 32 in bf16, neutral at 128, slower in fp32; "
        "float-reassociation-level numeric delta only).",
    )


def maybe_quantize(params, args):
    """Apply the opt-in inference param-tree transforms (--quantize,
    --phase-pack; composable — packing skips quantized layers)."""
    if getattr(args, "quantize", None) == "int8":
        from hand3d_tpu.ops.quant import quantize_params_int8

        params = quantize_params_int8(params)
    if getattr(args, "phase_pack", False):
        from hand3d_tpu.ops.phasepack import phase_pack_params

        params = phase_pack_params(params)
    return params


def add_mesh_arg(parser):
    parser.add_argument(
        "--mesh", default=None, metavar="DATAxMODEL",
        help="Device mesh, e.g. '8x1' (data-parallel over 8 chips) or "
        "'4x2' (DP x tensor-parallel). 'auto' = all devices data-parallel. "
        "Default: single device.",
    )


def build_mesh(spec):
    """'auto' | 'NxM' -> jax.sharding.Mesh (or None for single device)."""
    if spec is None:
        return None
    from hand3d_tpu.parallel import make_mesh

    if spec == "auto":
        return make_mesh()
    n_data, n_model = (int(x) for x in spec.lower().split("x"))
    return make_mesh(n_data, n_model)
