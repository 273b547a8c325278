"""Average parameter trees ("model soup" / checkpoint averaging).

    python tools/average_params.py a.npz b.npz c.npz --out soup.npz
    python tools/average_params.py --snapshots snapshots_posenet --last 3 \
        --out avg.npz

Uniform-average weights of same-structure npz param trees, or of the last
K training snapshots' params (tail averaging — a cheap variance reducer
for SGD-family training). The output is a normal npz weight file usable by
every estimator/eval/export surface.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def average_trees(trees):
    assert trees, "nothing to average"
    flat = []
    for t in trees:
        leaves = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(prefix + (k,), v)
            else:
                leaves[prefix] = np.asarray(node)

        walk((), t)
        flat.append(leaves)
    keys = set(flat[0])
    for i, f in enumerate(flat[1:], 1):
        assert set(f) == keys, (
            f"tree {i} structure differs: "
            f"{sorted(set(f) ^ keys)[:4]} ..."
        )
    avg = {}
    for k in keys:
        stack = [f[k] for f in flat]
        shapes = {a.shape for a in stack}
        assert len(shapes) == 1, f"shape mismatch at {k}: {shapes}"
        avg[k] = np.mean(np.stack(stack), axis=0).astype(stack[0].dtype)
    # unflatten
    out = {}
    for path, v in avg.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("npz", nargs="*", help="npz weight files to average")
    p.add_argument("--snapshots", default=None,
                   help="snapshot directory: average the params of the "
                        "last --last snapshots instead of npz files")
    p.add_argument("--last", type=int, default=3)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from hand3d_tpu.weights import load_npz, save_npz

    if args.snapshots:
        import jax

        from hand3d_tpu.train.checkpoints import sorted_snapshots
        from flax import serialization

        snaps = sorted_snapshots(args.snapshots)[-args.last:]
        assert snaps, f"no snapshots in {args.snapshots}"
        trees = []
        for _, path in snaps:
            with open(path, "rb") as f:
                # TrainState serializes by field name
                state = serialization.msgpack_restore(f.read())
                trees.append(jax.tree.map(np.asarray, state["params"]))
        print(f"averaging params of {len(snaps)} snapshots: "
              f"{[s for s, _ in snaps]}")
    else:
        assert len(args.npz) >= 2, "need >= 2 npz files (or --snapshots)"
        trees = [load_npz(p) for p in args.npz]
        print(f"averaging {len(trees)} npz trees")

    save_npz(args.out, average_trees(trees))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
