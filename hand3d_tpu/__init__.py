"""hand3d_tpu — a TPU-native (JAX/XLA/Pallas/pjit) hand-pose framework.

A from-scratch rebuild of the capabilities of lmb-freiburg/hand3d
(ColorHandPose3D, ICCV 2017): single RGB image -> hand segmentation mask,
21 2D keypoint heatmaps, and normalized 3D hand pose, via the three-stage
cascade HandSegNet -> PoseNet -> PosePrior/ViewpointNet.

Everything on the compute path is pure, shape-static JAX: the glue
transforms that the reference ran as per-sample Python loops or host-side
numpy (mask->bbox, crop+resize, scoremap rendering, keypoint decoding,
canonical / kinematic-chain coordinate transforms) are batched on-device
ops, so the whole pipeline is one jit-compiled program.

Package layout:
  ops/       batched geometry/image/NN primitives (ref: utils/general.py,
             utils/canonical_trafo.py, utils/relative_trafo.py)
  models/    HandSegNet, PoseNet, PosePrior, ViewpointNet, full cascade
             (ref: nets/ColorHandPose3DNetwork.py, nets/PosePriorNetwork.py)
  data/      RHD/STB binary record codecs + on-device preprocessing
             (ref: data/BinaryDbReader.py, data/BinaryDbReaderSTB.py)
  train/     optax training loops for all three stages (ref: training_*.py)
  eval/      vectorized metrics + the four evaluation harnesses
             (ref: eval2d_gt_cropped.py, eval2d.py, eval3d.py, eval_full.py)
  parallel/  jax.sharding mesh helpers (data-parallel + model sharding)
  weights/   one-time converter for the reference's TF1 pickle weights
"""

__version__ = "0.1.0"

import os as _os

_plat = _os.environ.get("HAND3D_PLATFORM")
if _plat:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var, but the config
    # API sticks (tests/conftest.py). This hook lets the gate tools
    # (tools/overfit_check.py, tools/preset_accuracy.py) and the test suite
    # force their subprocess trainers onto a platform — e.g. CPU when the
    # chip is busy or absent — without per-CLI plumbing.
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
del _os, _plat


def __getattr__(name):
    # lazy top-level API so `import hand3d_tpu` stays cheap
    if name == "ColorHandPose3D":
        from hand3d_tpu.models.cascade import ColorHandPose3D

        return ColorHandPose3D
    if name == "PosePriorNetwork":
        from hand3d_tpu.models.poseprior import PosePriorNetwork

        return PosePriorNetwork
    if name == "HandPoseEstimator":
        from hand3d_tpu.serving import HandPoseEstimator

        return HandPoseEstimator
    if name == "AutoBucketEstimator":
        from hand3d_tpu.serving import AutoBucketEstimator

        return AutoBucketEstimator
    if name == "quantize_params_int8":
        from hand3d_tpu.ops.quant import quantize_params_int8

        return quantize_params_int8
    if name == "phase_pack_params":
        from hand3d_tpu.ops.phasepack import phase_pack_params

        return phase_pack_params
    if name == "make_mesh":
        from hand3d_tpu.parallel import make_mesh

        return make_mesh
    if name == "export_estimator":
        from hand3d_tpu.export import export_estimator

        return export_estimator
    if name == "ExportedEstimator":
        from hand3d_tpu.export import ExportedEstimator

        return ExportedEstimator
    raise AttributeError(f"module 'hand3d_tpu' has no attribute {name!r}")
