"""One-time converter: reference TF1 weights -> hand3d_tpu parameter trees.

The reference distributes weights two ways (SURVEY.md §2.5):
  * pickled {variable_name: ndarray} dicts (handsegnet-rhd.pickle,
    posenet3d-rhd-stb*.pickle, lifting-<variant>.pickle), loaded by
    net.init() with substring-based exclusion
    (nets/ColorHandPose3DNetwork.py:34-59);
  * TF checkpoints (training snapshots + the CPM-MPII warm start), loaded by
    utils/general.load_weights_from_snapshot (:614-651) with substring
    discard + rename.

Conversion is purely structural: TF variable names like
'HandSegNet/conv1_1/weights' become nested dict paths, and the arrays are
layout-compatible as-is (TF conv kernels are HWIO which is exactly what
hand3d_tpu.ops.nn.conv2d consumes; dense kernels are [in, out]; the NHWC
flatten order before the lifting FCs matches TF's reshape).
"""

import pickle

import numpy as np

_SUFFIXES = (":0",)


def _clean_name(name):
    for suf in _SUFFIXES:
        if name.endswith(suf):
            name = name[: -len(suf)]
    return name


def apply_discard_rename(flat, discard_list=None, rename_dict=None):
    """Substring-based discard + rename, mirroring general.py:614-651.

    ``discard_list``: drop any variable whose name contains any entry.
    ``rename_dict``: for each (old, new), substring-replace old -> new.
    """
    out = {}
    for name, value in flat.items():
        if discard_list and any(d in name for d in discard_list):
            continue
        new_name = name
        if rename_dict:
            for old, new in rename_dict.items():
                if old in new_name:
                    new_name = new_name.replace(old, new)
        out[new_name] = value
    return out


def flat_to_tree(flat):
    """{'A/b/weights': arr} -> {'A': {'b': {'weights': arr}}}."""
    tree = {}
    for name, value in flat.items():
        parts = _clean_name(name).split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return tree


def tree_to_flat(tree, prefix=""):
    """Inverse of :func:`flat_to_tree`."""
    flat = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(tree_to_flat(v, path))
        else:
            flat[path] = np.asarray(v)
    return flat


def load_pickle_flat(path, exclude_var_list=None):
    """Load one reference pickle as a flat {name: ndarray} dict.

    ``exclude_var_list`` uses the same substring semantics as
    ColorHandPose3DNetwork.init (:55).
    """
    with open(path, "rb") as f:
        weight_dict = pickle.load(f, encoding="latin1")
    exclude_var_list = exclude_var_list or []
    return {
        _clean_name(k): np.asarray(v)
        for k, v in weight_dict.items()
        if not any(x in k for x in exclude_var_list)
    }


def convert_reference_pickles(weight_files, exclude_var_list=None,
                              rename_dict=None):
    """Merge one or more reference pickles into a hand3d_tpu param tree.

    Later files override earlier ones on name collision, matching the
    sequential assignment order of net.init (:51-59).
    """
    flat = {}
    for path in weight_files:
        flat.update(load_pickle_flat(path, exclude_var_list))
    flat = apply_discard_rename(flat, None, rename_dict)
    return flat_to_tree(flat)


def load_tf_checkpoint_flat(checkpoint_path, discard_list=None, rename_dict=None):
    """Read a TF V2 checkpoint (e.g. the CPM-MPII warm start or a reference
    training snapshot) into a flat dict, with the discard/rename semantics
    of utils/general.load_weights_from_snapshot (:614-651).

    Uses the native TF-free parser (weights/tf_ckpt.py) — tensorflow is not
    required or used."""
    from hand3d_tpu.weights.tf_ckpt import load_tf_checkpoint

    flat = load_tf_checkpoint(checkpoint_path)
    return apply_discard_rename(flat, discard_list, rename_dict)


# Warm-start rules used by the reference training scripts. The CPM-MPII
# person/pose model shares the encoder architecture; variables are renamed
# into our scopes and the incompatible heads are dropped.
CPM_HANDSEGNET_RENAME = {"CPM/PersonNet": "HandSegNet", "_CPM": ""}
CPM_HANDSEGNET_DISCARD = ["PoseNet", "Mconv", "conv6"]  # training_handsegnet.py:73-75
CPM_POSENET_RENAME = {"CPM/PoseNet": "PoseNet2D", "_CPM": ""}
CPM_POSENET_DISCARD = ["PersonNet", "PoseNet/Mconv", "conv5_2_CPM"]  # training_posenet.py:74-76
SNAPSHOT_DISCARD = ["Adam", "global_step", "beta"]  # eval2d_gt_cropped.py:62


def convert_cpm_warmstart(flat, target="posenet"):
    """Apply the reference's CPM-MPII warm-start discard/rename rules.

    Args:
      flat: {tf_variable_name: ndarray} from the CPM checkpoint (use
        load_tf_checkpoint_flat on a machine with TF, or any pre-dumped
        flat dict).
      target: "posenet" or "handsegnet".
    Returns:
      param tree with the renamed subset.
    """
    if target == "posenet":
        flat = apply_discard_rename(flat, CPM_POSENET_DISCARD, CPM_POSENET_RENAME)
    elif target == "handsegnet":
        flat = apply_discard_rename(
            flat, CPM_HANDSEGNET_DISCARD, CPM_HANDSEGNET_RENAME
        )
    else:
        raise ValueError(f"Unknown warm-start target: {target}")
    return flat_to_tree(flat)


def save_npz(path, tree):
    """Save a param tree as an .npz with '/'-joined keys."""
    np.savez(path, **tree_to_flat(tree))


def load_npz(path):
    with np.load(path) as data:
        return flat_to_tree({k: data[k] for k in data.files})
