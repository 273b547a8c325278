"""AOT model export: serialize the compiled cascade to a deployment artifact.

The reference had no deployment story beyond "load the pickle into a TF1
session" (ColorHandPose3DNetwork.py:34-59). This module gives the TPU
framework one: `export_estimator` traces the full inference cascade once,
lowers it through `jax.export` (StableHLO), bakes the weights in as
constants, and writes a single self-describing artifact that a serving host
can load and run with NO model code, weight files, or Python framework
imports beyond jax itself.

Artifact layout (version 1):
    b"H3DX"            magic
    u32 little-endian  JSON header length
    JSON header        {"version", "batch_size", "input_hw", "left_hand",
                        "seg_scale", "quantize", "phase_pack",
                        "compute_dtype", "platforms"}
    payload            jax.export serialized Exported (StableHLO + vjp-less
                        calling convention)

The exported function has signature f32[B,H,W,3] -> dict of outputs (same
keys as serving.HandPoseEstimator). Shapes are static — one artifact per
(batch, height, width) serving bucket, exactly like the serving API's
compiled-bucket model.
"""

import json
import struct

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

_MAGIC = b"H3DX"
ARTIFACT_VERSION = 1


def export_estimator(params, path=None, *, batch_size=16, input_hw=(240, 320),
                     left_hand=True, compute_dtype=None, seg_scale=1.0,
                     quantize=None, phase_pack=False, platforms=None):
    """Serialize the full cascade (weights baked in) to a deployment artifact.

    ``params``: cascade param tree (e.g. ``weights.load_npz(...)``).
    ``platforms``: optional list like ["tpu"] or ["tpu", "cpu"] to lower for
    platforms other than (or in addition to) the one jax is running on;
    None = current backend only.

    Returns the artifact bytes; also writes them to ``path`` if given.
    """
    from hand3d_tpu.models.cascade import ColorHandPose3D
    from hand3d_tpu.serving import prepare_params, select_serving_outputs

    params = prepare_params(params, quantize, phase_pack)
    net = ColorHandPose3D(compute_dtype=compute_dtype, seg_scale=seg_scale)
    params = jax.tree.map(jnp.asarray, params)
    hand_side = jnp.tile(
        jnp.asarray([[1.0, 0.0]] if left_hand else [[0.0, 1.0]]),
        (batch_size, 1),
    )

    def fwd(image):
        return select_serving_outputs(net.inference(params, image, hand_side))

    image_spec = jax.ShapeDtypeStruct(
        (batch_size, *input_hw, 3), jnp.float32
    )
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exported = jax_export.export(jax.jit(fwd), **kwargs)(image_spec)

    header = {
        "version": ARTIFACT_VERSION,
        "batch_size": int(batch_size),
        "input_hw": [int(x) for x in input_hw],
        "left_hand": bool(left_hand),
        "seg_scale": float(seg_scale),
        "quantize": quantize,
        "phase_pack": bool(phase_pack),
        "compute_dtype": str(compute_dtype) if compute_dtype else None,
        "platforms": list(exported.platforms),
    }
    head = json.dumps(header).encode("utf-8")
    blob = _MAGIC + struct.pack("<I", len(head)) + head + bytes(
        exported.serialize()
    )
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


class ExportedEstimator:
    """Loaded deployment artifact with the serving predict() contract.

    Needs only jax + numpy at load time — no model code, no weight files.
    """

    def __init__(self, blob):
        if not blob.startswith(_MAGIC):
            raise ValueError("not a hand3d-tpu export artifact (bad magic)")
        (hlen,) = struct.unpack_from("<I", blob, len(_MAGIC))
        off = len(_MAGIC) + 4
        self.meta = json.loads(blob[off : off + hlen].decode("utf-8"))
        if self.meta["version"] != ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {self.meta['version']} != "
                f"supported {ARTIFACT_VERSION}"
            )
        exported = jax_export.deserialize(bytearray(blob[off + hlen :]))
        self._fwd = jax.jit(exported.call)
        self.batch_size = self.meta["batch_size"]
        self.input_hw = tuple(self.meta["input_hw"])

    @classmethod
    def load(cls, path_or_bytes):
        if isinstance(path_or_bytes, (bytes, bytearray)):
            return cls(bytes(path_or_bytes))
        with open(path_or_bytes, "rb") as f:
            return cls(f.read())

    def warmup(self):
        dummy = np.zeros((self.batch_size, *self.input_hw, 3), np.float32)
        jax.block_until_ready(self._fwd(dummy))
        return self

    def predict(self, images, *, normalized=False):
        """Same contract as serving.HandPoseEstimator.predict: [N,H,W,3]
        uint8 / [0,1] float / mean-subtracted float in, dict of numpy out."""
        from hand3d_tpu.serving import chunked_predict, normalize_images

        images = np.asarray(images) if normalized else normalize_images(
            images)
        assert images.shape[1:3] == self.input_hw, (
            f"artifact expects {self.input_hw} input, got {images.shape[1:3]}"
        )
        return chunked_predict(
            lambda chunk: self._fwd(jnp.asarray(chunk)),
            images, self.batch_size,
        )
