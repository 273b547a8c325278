"""TF-free checkpoint reader/writer (weights/tf_ckpt.py).

The reference warm-starts from the CPM-MPII TF checkpoint
(training_handsegnet.py:73-75); tensorflow is not installed here, so the
V2-checkpoint (leveldb table + bundle protos) parser must stand on its own.
Round-trip tests use our own fixture writer; the prefix-compression and
multi-restart block paths — which the writer does not emit — are covered by
hand-crafted block bytes, so a symmetric misunderstanding of the leveldb
format would still be caught where it matters most.
"""

import struct

import numpy as np
import pytest

from hand3d_tpu.weights.tf_ckpt import (
    _block_bytes,
    _parse_block,
    _read_varint,
    _write_varint,
    load_tf_checkpoint,
    write_checkpoint,
)


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 300, 2**21, 2**35 + 7, 2**63 - 1):
        buf = _write_varint(v)
        got, pos = _read_varint(buf, 0)
        assert got == v and pos == len(buf)


def test_block_roundtrip():
    entries = [(b"", b"header"), (b"alpha", b"1"), (b"beta/x", b"\x00\x01")]
    assert _parse_block(_block_bytes(entries)) == entries


def test_block_with_prefix_compression():
    """Hand-crafted block using shared-prefix encoding (as real TF files do:
    leveldb's default restart interval is 16, so consecutive keys share
    prefixes). Our writer never emits this; the reader must still parse it."""
    # entries: "net/conv1/weights" -> b"W1", "net/conv1/biases"... keys must
    # be sorted; share prefixes explicitly
    k1, v1 = b"net/conv1/biases", b"B1"
    k2, v2 = b"net/conv1/weights", b"W2"
    k3, v3 = b"net/conv2/weights", b"W3"
    out = bytearray()
    # entry 1: restart (shared=0)
    out += _write_varint(0) + _write_varint(len(k1)) + _write_varint(len(v1))
    out += k1 + v1
    # entry 2: shares "net/conv1/" (10 bytes) with k1
    shared = 10
    out += _write_varint(shared) + _write_varint(len(k2) - shared)
    out += _write_varint(len(v2)) + k2[shared:] + v2
    # entry 3: shares "net/conv" (8 bytes) with k2
    shared = 8
    out += _write_varint(shared) + _write_varint(len(k3) - shared)
    out += _write_varint(len(v3)) + k3[shared:] + v3
    out += struct.pack("<I", 0)  # one restart at offset 0
    out += struct.pack("<I", 1)  # num_restarts
    assert _parse_block(bytes(out)) == [(k1, v1), (k2, v2), (k3, v3)]


def test_checkpoint_roundtrip_dtypes_and_shapes(tmp_path):
    rng = np.random.RandomState(0)
    flat = {
        "HandSegNet/conv1_1/weights": rng.randn(3, 3, 3, 64).astype(np.float32),
        "HandSegNet/conv1_1/biases": rng.randn(64).astype(np.float32),
        "scalar_step": np.asarray(12345, np.int64),
        "mask": np.asarray([[True, False], [False, True]]),
        "halfs": rng.randn(5, 7).astype(np.float16),
        "doubles": rng.randn(2, 2).astype(np.float64),
        "empty_shape": np.asarray(2.5, np.float32),
    }
    import ml_dtypes

    flat["bf16"] = rng.randn(4, 4).astype(ml_dtypes.bfloat16)

    prefix = str(tmp_path / "model-5000")
    write_checkpoint(prefix, flat)
    got = load_tf_checkpoint(prefix)
    assert sorted(got) == sorted(flat)
    for name in flat:
        assert got[name].dtype == flat[name].dtype, name
        np.testing.assert_array_equal(got[name], flat[name])


def test_checkpoint_reader_rejects_non_table(tmp_path):
    bad = tmp_path / "junk.index"
    bad.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="bad magic"):
        load_tf_checkpoint(str(tmp_path / "junk"))


def test_load_tf_checkpoint_flat_discard_rename(tmp_path):
    """The general.py:614-651 semantics on top of the native reader."""
    from hand3d_tpu.weights.convert import load_tf_checkpoint_flat

    flat = {
        "PoseNet/conv1/weights": np.zeros(2, np.float32),
        "PoseNet/conv1/weights/Adam": np.ones(2, np.float32),
        "global_step": np.asarray(7, np.int64),
        "beta1_power": np.asarray(0.9, np.float32),
    }
    prefix = str(tmp_path / "snap-100")
    write_checkpoint(prefix, flat)
    got = load_tf_checkpoint_flat(
        prefix, discard_list=["Adam", "global_step", "beta"],
        rename_dict={"PoseNet": "PoseNet2D"},
    )
    assert list(got) == ["PoseNet2D/conv1/weights"]


def test_cpm_warmstart_executable_end_to_end(tmp_path):
    """A synthetic CPM-MPII checkpoint loads through the CLI weight loader
    into both HandSegNet and PoseNet2D scopes with heads discarded — the
    round-1 gap: this path previously hard-required tensorflow."""
    from hand3d_tpu.cli._common import load_weight_trees

    rng = np.random.RandomState(1)
    flat = {
        "CPM/PersonNet/conv1_1_CPM/weights": rng.randn(3, 3, 3, 64).astype(np.float32),
        "CPM/PersonNet/conv1_1_CPM/biases": rng.randn(64).astype(np.float32),
        "CPM/PersonNet/conv6_1/weights": rng.randn(1, 1, 512, 512).astype(np.float32),
        "CPM/PoseNet/conv1_1_CPM/weights": rng.randn(3, 3, 3, 64).astype(np.float32),
        "CPM/PoseNet/Mconv1_stage2/weights": rng.randn(7, 7, 149, 128).astype(np.float32),
        "CPM/PoseNet/conv5_2_CPM/weights": rng.randn(1, 1, 128, 15).astype(np.float32),
    }
    prefix = str(tmp_path / "cpm-model-mpii")
    write_checkpoint(prefix, flat)

    tree = load_weight_trees([prefix])
    assert "HandSegNet" in tree and "PoseNet2D" in tree
    np.testing.assert_array_equal(
        tree["HandSegNet"]["conv1_1"]["weights"],
        flat["CPM/PersonNet/conv1_1_CPM/weights"],
    )
    # incompatible heads dropped (training_handsegnet.py:73-75)
    assert "conv6_1" not in tree["HandSegNet"]
    assert not any("Mconv" in k for k in tree["PoseNet2D"])
    assert "conv5_2" not in tree["PoseNet2D"]
