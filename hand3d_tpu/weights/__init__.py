from hand3d_tpu.weights.convert import (
    convert_reference_pickles,
    convert_cpm_warmstart,
    flat_to_tree,
    tree_to_flat,
    apply_discard_rename,
    save_npz,
    load_npz,
    SNAPSHOT_DISCARD,
)

__all__ = [
    "convert_reference_pickles",
    "convert_cpm_warmstart",
    "flat_to_tree",
    "tree_to_flat",
    "apply_discard_rename",
    "save_npz",
    "load_npz",
    "SNAPSHOT_DISCARD",
]
