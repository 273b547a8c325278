from hand3d_tpu.weights.convert import (
    convert_reference_pickles,
    flat_to_tree,
    tree_to_flat,
    apply_discard_rename,
    save_npz,
    load_npz,
)

__all__ = [
    "convert_reference_pickles",
    "flat_to_tree",
    "tree_to_flat",
    "apply_discard_rename",
    "save_npz",
    "load_npz",
]
