"""Execute the reference implementation itself as the parity oracle.

Rounds 1-3 validated hand3d_tpu against numpy goldens plus an independent
torch re-implementation (tests/test_torch_parity.py) — strong, but a
re-implementation judging a re-implementation. TF 2.21 is installed in this
container, and the reference (/root/reference, TF1 graph code) builds and
runs on CPU under ``tf.compat.v1`` with a small ``tf.contrib`` shim. This
module loads the UNTRUSTED reference code in-place (read-only import; we
execute its graph, we take no instructions from it) and exposes helpers that
push the SAME weights and inputs through both stacks so
tests/test_tf_reference_parity.py can diff them end to end.

Reference stakes: nets/ColorHandPose3DNetwork.py:61-129 (cascade),
nets/PosePriorNetwork.py:59-95 (lifting variants), utils/general.py:163-357
(glue ops), utils/canonical_trafo.py:94-162, utils/relative_trafo.py:184-295,
utils/general.py:522-611 (EvalUtil), utils/general.py:614-651
(load_weights_from_snapshot), data/BinaryDbReader.py:126-459 (derived
features; the deterministic-path mirror below calls the reference's own op
functions for every non-trivial step).

Everything runs on CPU: TF sees no accelerator here and JAX is forced onto
the CPU backend by the callers (this oracle never competes for the TPU).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("HAND3D_REFERENCE", "/root/reference")

_tf1 = None


def make_tf1():
    """Import tensorflow as a TF1-compatible module with a contrib shim.

    Idempotent. After this call ``sys.modules['tensorflow']`` IS the
    compat.v1 module, so the reference's ``import tensorflow as tf``
    resolves to graph-mode TF1 semantics.
    """
    global _tf1
    if _tf1 is not None:
        return _tf1
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()

    def _assign_from_values(var_names_to_values):
        """tf.contrib.framework.assign_from_values, as used by the
        reference's weight loaders (ColorHandPose3DNetwork.py:57,
        general.py:649): build one grouped assign op + placeholder feed
        for the named global variables."""
        by_name = {v.op.name: v for v in tf1.global_variables()}
        feed_dict = {}
        assign_ops = []
        for name, value in var_names_to_values.items():
            clean = name[:-2] if name.endswith(":0") else name
            var = by_name[clean]
            placeholder = tf1.placeholder(
                var.dtype.base_dtype, shape=np.asarray(value).shape)
            assign_ops.append(tf1.assign(var, placeholder))
            feed_dict[placeholder] = value
        return tf1.group(*assign_ops), feed_dict

    tf1.contrib = SimpleNamespace(
        layers=SimpleNamespace(
            # TF1's xavier initializers == glorot uniform (the moved-to-core
            # names); only used to build initial values we capture/overwrite
            xavier_initializer=tf1.glorot_uniform_initializer,
            xavier_initializer_conv2d=tf1.glorot_uniform_initializer,
        ),
        framework=SimpleNamespace(assign_from_values=_assign_from_values),
    )
    # general.py:614 reads checkpoints through the long-removed
    # tensorflow.python.pywrap_tensorflow.NewCheckpointReader; the same
    # C++ reader lives at tf.train.NewCheckpointReader in TF2
    from tensorflow.python import pywrap_tensorflow as _pw

    if not hasattr(_pw, "NewCheckpointReader"):
        _pw.NewCheckpointReader = tf1.train.NewCheckpointReader

    sys.modules["tensorflow"] = tf1
    _tf1 = tf1
    return tf1


def import_reference():
    """Import the reference packages (nets/, utils/, data/) from REFERENCE.

    Returns a namespace with the imported modules. Must be called before
    anything else imports a top-level ``utils``/``nets``/``data`` package.
    """
    tf1 = make_tf1()
    if REFERENCE not in sys.path:
        # APPEND, never insert(0): the reference root also contains
        # top-level scripts named like ours (create_binary_db.py, ...) that
        # execute work at import time; prepending would shadow the repo's
        # own modules for the rest of the process (observed: test_tools
        # imported the REFERENCE's converter after a parity test ran)
        sys.path.append(REFERENCE)
    import data.BinaryDbReader as bdb  # noqa: E402
    import nets.ColorHandPose3DNetwork as chp  # noqa: E402
    import nets.PosePriorNetwork as ppn  # noqa: E402
    import utils.canonical_trafo as ct  # noqa: E402
    import utils.general as general  # noqa: E402
    import utils.relative_trafo as rt  # noqa: E402

    return SimpleNamespace(tf1=tf1, cascade_mod=chp, poseprior_mod=ppn,
                           general=general, canonical=ct, relative=rt,
                           reader_mod=bdb)


def reference_cascade_outputs(image, hand_side, seed=0):
    """Build + run the reference's full cascade on CPU.

    Returns (outputs, flat_vars):
      outputs: dict with hand_scoremap, image_crop, scale_crop, center,
        keypoints_scoremap, keypoint_coord3d (numpy, reference fetch list
        ColorHandPose3DNetwork.py:61-99)
      flat_vars: {tf_variable_name: ndarray} of every variable the graph
        created — push these through hand3d_tpu.weights.convert.flat_to_tree
        to run the SAME weights in the JAX cascade.
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(seed)
        image_ph = tf1.placeholder(tf1.float32, image.shape)
        side_ph = tf1.placeholder(tf1.float32, hand_side.shape)
        eval_ph = tf1.placeholder_with_default(True, [])
        net = ref.cascade_mod.ColorHandPose3DNetwork()
        fetches = net.inference(image_ph, side_ph, eval_ph)
        init = tf1.global_variables_initializer()
        var_list = tf1.global_variables()
        with tf1.Session(graph=graph) as sess:
            sess.run(init)
            flat_vars = {v.op.name: np.asarray(sess.run(v)) for v in var_list}
            outs = sess.run(fetches, {image_ph: image, side_ph: hand_side})
    names = ["hand_scoremap", "image_crop", "scale_crop", "center",
             "keypoints_scoremap", "keypoint_coord3d"]
    return dict(zip(names, [np.asarray(o) for o in outs])), flat_vars


def reference_inference2d_outputs(image, seed=0):
    """Build + run the reference's 2D half (ColorHandPose3DNetwork.py:101-129).

    Returns (outputs, flat_vars) with keypoints_scoremap, image_crop,
    scale_crop, center.
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(seed)
        image_ph = tf1.placeholder(tf1.float32, image.shape)
        net = ref.cascade_mod.ColorHandPose3DNetwork()
        fetches = net.inference2d(image_ph)
        init = tf1.global_variables_initializer()
        var_list = tf1.global_variables()
        with tf1.Session(graph=graph) as sess:
            sess.run(init)
            flat_vars = {v.op.name: np.asarray(sess.run(v)) for v in var_list}
            outs = sess.run(fetches, {image_ph: image})
    names = ["keypoints_scoremap", "image_crop", "scale_crop", "center"]
    return dict(zip(names, [np.asarray(o) for o in outs])), flat_vars


def reference_posepriornet_outputs(scoremap, hand_side, variant, seed=0):
    """Build + run a reference PosePriorNetwork variant (PosePriorNetwork.py).

    Returns ((coord_xyz_rel_normed, coord3d), flat_vars). ``scoremap`` is
    the [B, 256, 256, 21] PoseNet-resolution map the standalone lifting
    network consumes (it avg-pools 8x8 itself, PosePriorNetwork.py:61).
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(seed)
        sm_ph = tf1.placeholder(tf1.float32, scoremap.shape)
        side_ph = tf1.placeholder(tf1.float32, hand_side.shape)
        eval_ph = tf1.placeholder_with_default(True, [])
        net = ref.poseprior_mod.PosePriorNetwork(variant)
        coord_rel, coord3d, _ = net.inference(sm_ph, side_ph, eval_ph)
        init = tf1.global_variables_initializer()
        var_list = tf1.global_variables()
        with tf1.Session(graph=graph) as sess:
            sess.run(init)
            flat_vars = {v.op.name: np.asarray(sess.run(v)) for v in var_list}
            out = sess.run([coord_rel, coord3d],
                           {sm_ph: scoremap, side_ph: hand_side})
    return (np.asarray(out[0]), np.asarray(out[1])), flat_vars


def reference_derived_features(sample, use_wrist_coord=True, hand_crop=False,
                               sigma=25.0, image_size=(320, 320),
                               crop_size=256, num_kp=42):
    """The reference reader's derived-data graph on one DECODED sample.

    Mirrors the deterministic paths of data/BinaryDbReader.py:126-368 (all
    noise/augmentation flags off), calling the reference's OWN op functions
    (bone_rel_trafo, canonical_trafo, flip_right_hand, crop_image_from_xy,
    create_multiple_gaussian_map) so every non-trivial step is reference
    code. The byte-decode plumbing is replaced by placeholders because the
    codec round-trip is covered elsewhere (tests/test_data.py).

    Args:
      sample: dict with kp_xyz [42,3] f32, kp_uv [42,2] f32, cam_mat [3,3]
        f32, image [H,W,3] u8, hand_parts [H,W] u8/i32, kp_vis [42] u8/bool.
    Returns:
      {name: ndarray} of every data_dict entry the reference produces.
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        kp_xyz_ph = tf1.placeholder(tf1.float32, [num_kp, 3])
        kp_uv_ph = tf1.placeholder(tf1.float32, [num_kp, 2])
        cam_ph = tf1.placeholder(tf1.float32, [3, 3])
        img_ph = tf1.placeholder(tf1.uint8, list(image_size) + [3])
        parts_ph = tf1.placeholder(tf1.int32, list(image_size))
        vis_ph = tf1.placeholder(tf1.bool, [num_kp])

        data_dict = {}
        keypoint_xyz = kp_xyz_ph
        # palm-from-wrist midpoint (BinaryDbReader.py:139-144)
        if not use_wrist_coord:
            palm_l = tf1.expand_dims(
                0.5 * (keypoint_xyz[0, :] + keypoint_xyz[12, :]), 0)
            palm_r = tf1.expand_dims(
                0.5 * (keypoint_xyz[21, :] + keypoint_xyz[33, :]), 0)
            keypoint_xyz = tf1.concat(
                [palm_l, keypoint_xyz[1:21, :], palm_r,
                 keypoint_xyz[-20:, :]], 0)
        data_dict["keypoint_xyz"] = keypoint_xyz

        # uv decode truncates through int32 BEFORE palmification (:148-158)
        keypoint_uv = tf1.cast(tf1.cast(kp_uv_ph, tf1.int32), tf1.float32)
        if not use_wrist_coord:
            palm_uv_l = tf1.expand_dims(
                0.5 * (keypoint_uv[0, :] + keypoint_uv[12, :]), 0)
            palm_uv_r = tf1.expand_dims(
                0.5 * (keypoint_uv[21, :] + keypoint_uv[33, :]), 0)
            keypoint_uv = tf1.concat(
                [palm_uv_l, keypoint_uv[1:21, :], palm_uv_r,
                 keypoint_uv[-20:, :]], 0)
        data_dict["keypoint_uv"] = keypoint_uv
        cam_mat = cam_ph
        data_dict["cam_mat"] = cam_mat

        image = tf1.cast(img_ph, tf1.float32) / 255.0 - 0.5
        data_dict["image"] = image

        hand_parts_mask = parts_ph
        data_dict["hand_parts"] = hand_parts_mask
        hand_mask = tf1.greater(hand_parts_mask, 1)
        bg_mask = tf1.logical_not(hand_mask)
        data_dict["hand_mask"] = tf1.cast(
            tf1.stack([bg_mask, hand_mask], 2), tf1.int32)

        keypoint_vis = vis_ph
        if not use_wrist_coord:
            palm_vis_l = tf1.expand_dims(
                tf1.logical_or(keypoint_vis[0], keypoint_vis[12]), 0)
            palm_vis_r = tf1.expand_dims(
                tf1.logical_or(keypoint_vis[21], keypoint_vis[33]), 0)
            keypoint_vis = tf1.concat(
                [palm_vis_l, keypoint_vis[1:21], palm_vis_r,
                 keypoint_vis[-20:]], 0)
        data_dict["keypoint_vis"] = keypoint_vis

        # dominant hand from part-mask pixel counts (:212-233)
        one_map = tf1.ones_like(hand_parts_mask)
        zero_map = tf1.zeros_like(hand_parts_mask)
        cond_l = tf1.logical_and(tf1.greater(hand_parts_mask, one_map),
                                 tf1.less(hand_parts_mask, one_map * 18))
        cond_r = tf1.greater(hand_parts_mask, one_map * 17)
        hand_map_l = tf1.where(cond_l, one_map, zero_map)
        hand_map_r = tf1.where(cond_r, one_map, zero_map)
        num_px_left = tf1.reduce_sum(hand_map_l)
        num_px_right = tf1.reduce_sum(hand_map_r)

        kp_xyz_left = keypoint_xyz[:21, :]
        kp_xyz_right = keypoint_xyz[-21:, :]
        cond_left = tf1.logical_and(
            tf1.cast(tf1.ones_like(kp_xyz_left), tf1.bool),
            tf1.greater(num_px_left, num_px_right))
        kp_coord_xyz21 = tf1.where(cond_left, kp_xyz_left, kp_xyz_right)
        hand_side = tf1.where(tf1.greater(num_px_left, num_px_right),
                              tf1.constant(0, dtype=tf1.int32),
                              tf1.constant(1, dtype=tf1.int32))
        data_dict["hand_side"] = tf1.one_hot(
            hand_side, depth=2, on_value=1.0, off_value=0.0, dtype=tf1.float32)
        data_dict["keypoint_xyz21"] = kp_coord_xyz21

        # root-relative / normalized / local / canonical (:237-254)
        root = kp_coord_xyz21[0, :]
        rel = kp_coord_xyz21 - root
        scale_kp = tf1.sqrt(tf1.reduce_sum(
            tf1.square(rel[12, :] - rel[11, :])))
        data_dict["keypoint_scale"] = scale_kp
        normed = rel / scale_kp
        data_dict["keypoint_xyz21_normed"] = normed

        local = ref.relative.bone_rel_trafo(normed)
        data_dict["keypoint_xyz21_local"] = tf1.squeeze(local)

        can, rot_mat = ref.canonical.canonical_trafo(normed)
        can, rot_mat = tf1.squeeze(can), tf1.squeeze(rot_mat)
        can = ref.canonical.flip_right_hand(can, tf1.logical_not(cond_left))
        data_dict["keypoint_xyz21_can"] = can
        data_dict["rot_mat"] = tf1.matrix_inverse(rot_mat)

        vis_left = keypoint_vis[:21]
        vis_right = keypoint_vis[-21:]
        keypoint_vis21 = tf1.where(cond_left[:, 0], vis_left, vis_right)
        data_dict["keypoint_vis21"] = keypoint_vis21
        uv_left = keypoint_uv[:21, :]
        uv_right = keypoint_uv[-21:, :]
        keypoint_uv21 = tf1.where(cond_left[:, :2], uv_left, uv_right)
        data_dict["keypoint_uv21"] = keypoint_uv21

        if hand_crop:
            # deterministic crop path (:268-346, noise flags off)
            crop_center = keypoint_uv21[12, ::-1]
            crop_center = tf1.cond(
                tf1.reduce_all(tf1.is_finite(crop_center)),
                lambda: crop_center, lambda: tf1.constant([0.0, 0.0]))
            crop_center.set_shape([2])
            kp_h = tf1.boolean_mask(keypoint_uv21[:, 1], keypoint_vis21)
            kp_w = tf1.boolean_mask(keypoint_uv21[:, 0], keypoint_vis21)
            kp_hw = tf1.stack([kp_h, kp_w], 1)
            min_c = tf1.maximum(tf1.reduce_min(kp_hw, 0), 0.0)
            max_c = tf1.minimum(tf1.reduce_max(kp_hw, 0),
                                [float(s) for s in image_size])
            crop_size_best = 2 * tf1.maximum(max_c - crop_center,
                                             crop_center - min_c)
            crop_size_best = tf1.reduce_max(crop_size_best)
            crop_size_best = tf1.minimum(
                tf1.maximum(crop_size_best, 50.0), 500.0)
            crop_size_best = tf1.cond(
                tf1.reduce_all(tf1.is_finite(crop_size_best)),
                lambda: crop_size_best, lambda: tf1.constant(200.0))
            crop_size_best.set_shape([])
            scale = tf1.cast(crop_size, tf1.float32) / crop_size_best
            scale = tf1.minimum(tf1.maximum(scale, 1.0), 10.0)
            data_dict["crop_scale"] = scale
            img_crop = ref.general.crop_image_from_xy(
                tf1.expand_dims(image, 0), crop_center, crop_size, scale)
            data_dict["image_crop"] = tf1.squeeze(img_crop)
            ccf = tf1.cast(crop_center, tf1.float32)
            u = (keypoint_uv21[:, 0] - ccf[1]) * scale + crop_size // 2
            v = (keypoint_uv21[:, 1] - ccf[0]) * scale + crop_size // 2
            keypoint_uv21 = tf1.stack([u, v], 1)
            data_dict["keypoint_uv21"] = keypoint_uv21
            scale1 = tf1.reshape(scale, [1])
            scale_matrix = tf1.reshape(tf1.dynamic_stitch(
                [[0], [1], [2], [3], [4], [5], [6], [7], [8]],
                [scale1, [0.0], [0.0], [0.0], scale1, [0.0],
                 [0.0], [0.0], [1.0]]), [3, 3])
            trans1 = tf1.reshape(ccf[0] * scale - crop_size // 2, [1])
            trans2 = tf1.reshape(ccf[1] * scale - crop_size // 2, [1])
            trans_matrix = tf1.reshape(tf1.dynamic_stitch(
                [[0], [1], [2], [3], [4], [5], [6], [7], [8]],
                [[1.0], [0.0], -trans2, [0.0], [1.0], -trans1,
                 [0.0], [0.0], [1.0]]), [3, 3])
            data_dict["cam_mat"] = tf1.matmul(
                trans_matrix, tf1.matmul(scale_matrix, cam_mat))

        # GT scoremaps from the 21-subset (:348-368)
        keypoint_hw21 = tf1.stack(
            [keypoint_uv21[:, 1], keypoint_uv21[:, 0]], -1)
        scoremap_size = (crop_size, crop_size) if hand_crop else image_size
        data_dict["scoremap"] = (
            ref.reader_mod.BinaryDbReader.create_multiple_gaussian_map(
                keypoint_hw21, scoremap_size, sigma,
                valid_vec=keypoint_vis21))

        with tf1.Session(graph=graph) as sess:
            keys, fetches = zip(*sorted(data_dict.items()))
            outs = sess.run(list(fetches), {
                kp_xyz_ph: sample["kp_xyz"], kp_uv_ph: sample["kp_uv"],
                cam_ph: sample["cam_mat"], img_ph: sample["image"],
                parts_ph: np.asarray(sample["hand_parts"], np.int32),
                vis_ph: np.asarray(sample["kp_vis"], bool),
            })
    return {k: np.asarray(v) for k, v in zip(keys, outs)}


def reference_read_bin(bin_path, batch_size=2, num_batches=1, dataset="rhd",
                       **reader_kwargs):
    """Run the reference's FULL queue pipeline on an actual .bin FILE and
    fetch the first batches in on-disk order.

    This is the byte-compatibility oracle for tools/create_binary_db.py /
    create_stb_db.py and data/codec.py: the reference's own
    FixedLengthRecordReader + decode_raw graph (data/BinaryDbReader.py:
    101-459 or data/BinaryDbReaderSTB.py:84-300, queue runners and all)
    consumes the file our tools wrote. The readers hardcode
    './data/bin/rhd_evaluation.bin' / './data/stb/stb_eval.bin', so the
    file is staged into a temp cwd.

    Pass shuffle=False (default here) for deterministic record order.
    Returns a list of {name: ndarray} batches.
    """
    import shutil
    import tempfile

    ref = import_reference()
    tf1 = ref.tf1
    if dataset == "stb":
        import data.BinaryDbReaderSTB as stb_mod
        reader_cls = stb_mod.BinaryDbReaderSTB
        staged = os.path.join("data", "stb", "stb_eval.bin")
    else:
        reader_cls = ref.reader_mod.BinaryDbReader
        staged = os.path.join("data", "bin", "rhd_evaluation.bin")
    reader_kwargs.setdefault("shuffle", False)
    workdir = tempfile.mkdtemp(prefix="refbin_")
    os.makedirs(os.path.dirname(os.path.join(workdir, staged)))
    shutil.copy(bin_path, os.path.join(workdir, staged))
    old_cwd = os.getcwd()
    graph = tf1.Graph()
    try:
        os.chdir(workdir)
        with graph.as_default():
            reader = reader_cls(
                mode="evaluation", batch_size=batch_size, **reader_kwargs)
            data = reader.get()
            with tf1.Session(graph=graph) as sess:
                sess.run(tf1.global_variables_initializer())
                sess.run(tf1.local_variables_initializer())
                coord = tf1.train.Coordinator()
                threads = tf1.train.start_queue_runners(sess=sess,
                                                        coord=coord)
                batches = [
                    {k: np.asarray(v) for k, v in sess.run(data).items()}
                    for _ in range(num_batches)
                ]
                coord.request_stop()
                coord.join(threads, stop_grace_period_secs=10)
    finally:
        os.chdir(old_cwd)
        shutil.rmtree(workdir, ignore_errors=True)
    return batches


def reference_load_weights_from_snapshot(checkpoint_path, var_shapes,
                                         discard_list=None, rename_dict=None):
    """Run the reference's load_weights_from_snapshot (general.py:614-651).

    Builds a graph holding zero-initialized variables named per
    ``var_shapes`` ({post-rename-name: shape}), invokes the reference
    loader against ``checkpoint_path`` and returns the variable values it
    assigned — the ground truth for weights/convert.apply_discard_rename +
    tf_ckpt parsing.
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        for name, shape in var_shapes.items():
            tf1.get_variable(name, shape=shape, dtype=tf1.float32,
                             initializer=tf1.zeros_initializer())
        var_list = tf1.global_variables()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            ref.general.load_weights_from_snapshot(
                sess, checkpoint_path, discard_list=discard_list,
                rename_dict=rename_dict)
            return {v.op.name: np.asarray(sess.run(v)) for v in var_list}


def reference_cascade_from_pickles(image, hand_side, weight_files,
                                   exclude_var_list=None, seed=0):
    """Run the cascade with weights loaded by the REFERENCE'S OWN net.init.

    Builds the full cascade graph, random-initializes, then calls
    ``ColorHandPose3DNetwork.init(sess, weight_files, exclude_var_list)``
    (ColorHandPose3DNetwork.py:34-59) — the exact code path the shipped
    handsegnet-rhd / posenet3d-* pickles go through — and fetches the six
    outputs plus every variable's post-init value. Ground truth for
    weights/convert.convert_reference_pickles (same substring-exclude and
    last-file-wins override semantics).
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(seed)
        image_ph = tf1.placeholder(tf1.float32, image.shape)
        side_ph = tf1.placeholder(tf1.float32, hand_side.shape)
        eval_ph = tf1.placeholder_with_default(True, [])
        net = ref.cascade_mod.ColorHandPose3DNetwork()
        fetches = net.inference(image_ph, side_ph, eval_ph)
        init = tf1.global_variables_initializer()
        var_list = tf1.global_variables()
        with tf1.Session(graph=graph) as sess:
            sess.run(init)
            net.init(sess, weight_files, exclude_var_list)
            flat_vars = {v.op.name: np.asarray(sess.run(v)) for v in var_list}
            outs = sess.run(fetches, {image_ph: image, side_ph: hand_side})
    names = ["hand_scoremap", "image_crop", "scale_crop", "center",
             "keypoints_scoremap", "keypoint_coord3d"]
    return dict(zip(names, [np.asarray(o) for o in outs])), flat_vars


def reference_lr_schedule(values, steps, query_steps):
    """Evaluate the reference's LearningRateScheduler (general.py:480-519).

    Returns the lr at each query step. Note the training scripts never pass
    ``global_step`` to ``opt.minimize`` (training_posenet.py:66-69), so the
    reference actually trains at values[0] forever; this helper exists to
    pin the schedule GRAPH's semantics (including its boundary comparisons)
    against hand3d_tpu.train.schedule.piecewise_constant.
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        step_ph = tf1.placeholder(tf1.int64, [])
        sched = ref.general.LearningRateScheduler(values=values, steps=steps)
        lr = sched.get_lr(step_ph)
        with tf1.Session(graph=graph) as sess:
            return [float(sess.run(lr, {step_ph: s})) for s in query_steps]


def reference_train_step(stage, inputs, lr, variant="proposed", seed=0,
                         num_steps=1, track_vars=False):
    """Build a reference stage TRAINING graph and run Adam step(s) on CPU.

    Replicates the loss + optimizer wiring of the reference's training
    scripts exactly:

      * stage="posenet": training_posenet.py:46-69 — inference_pose2d,
        per-head resize_images to GT scoremap size, visibility-weighted
        sqrt-of-mean-square loss normalized by (sum(vis)+0.001).
      * stage="handsegnet": training_handsegnet.py:44-60 —
        inference_detection, mean softmax cross-entropy against the 2-class
        mask (including the loop's pack-the-whole-list reshape, which for
        the actual single-head list equals the head itself).
      * stage="lifting": training_lifting.py:49-77 — PosePriorNetwork
        ``variant`` with the ``evaluation`` placeholder left at its default
        True, exactly as the reference runs it (sess.run never feeds it, so
        the reference trains lifting with dropout DISABLED).

    Args:
      stage: "posenet" | "handsegnet" | "lifting".
      inputs: dict of numpy feeds —
        posenet: image_crop [B,H,W,3], scoremap [B,Hs,Ws,21],
          keypoint_vis21 [B,21] (0/1 float);
        handsegnet: image [B,H,W,3], hand_mask [B,H,W,2] (0/1 float);
        lifting: scoremap [B,256,256,21], hand_side [B,2], plus the
          variant's target(s) (keypoint_xyz21_normed / _local / _can,
          rot_mat).
      lr: scalar learning rate (the scheduler output at step 0; the
        reference's AdamOptimizer sees a constant because global_step is
        never advanced).
      num_steps: how many Adam steps to run on the SAME batch (full-batch
        deterministic trajectory; the executed stage graphs have no active
        dropout — posenet/handsegnet have none, lifting's is disabled by
        the unfed evaluation placeholder — so the trajectory is exact).
    Returns:
      dict with loss (float, at step 0), losses ([num_steps] floats, the
      loss evaluated before each step), grads {var_name: ndarray} at step 0
      for every trainable variable, vars0 {name: ndarray} at init (push
      through flat_to_tree to run the same steps in JAX), vars1
      {name: ndarray} after num_steps.
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(seed)
        phs = {k: tf1.placeholder(tf1.float32, np.asarray(v).shape)
               for k, v in inputs.items()}

        if stage == "posenet":
            net = ref.cascade_mod.ColorHandPose3DNetwork()
            preds = net.inference_pose2d(phs["image_crop"], train=True)
            s = phs["scoremap"].get_shape().as_list()
            preds = [tf1.image.resize_images(x, (s[1], s[2])) for x in preds]
            vis = tf1.cast(
                tf1.reshape(phs["keypoint_vis21"], [s[0], s[3]]), tf1.float32)
            loss = 0.0
            for pred_item in preds:
                loss += tf1.reduce_sum(
                    vis * tf1.sqrt(tf1.reduce_mean(
                        tf1.square(pred_item - phs["scoremap"]), [1, 2]))
                ) / (tf1.reduce_sum(vis) + 0.001)
        elif stage == "handsegnet":
            net = ref.cascade_mod.ColorHandPose3DNetwork()
            pred_list = net.inference_detection(phs["image"], train=True)
            s = phs["hand_mask"].get_shape().as_list()
            loss = 0.0
            for _pred_item in pred_list:
                gt = tf1.reshape(phs["hand_mask"], [s[0] * s[1] * s[2], -1])
                pred = tf1.reshape(pred_list, [s[0] * s[1] * s[2], -1])
                loss += tf1.reduce_mean(
                    tf1.nn.softmax_cross_entropy_with_logits(
                        logits=pred, labels=gt))
        elif stage == "lifting":
            evaluation = tf1.placeholder_with_default(True, shape=())
            net = ref.poseprior_mod.PosePriorNetwork(variant)
            _, coord3d_pred, R = net.inference(
                phs["scoremap"], phs["hand_side"], evaluation)
            if variant in ("direct", "bottleneck"):
                loss = tf1.reduce_mean(
                    tf1.square(coord3d_pred - phs["keypoint_xyz21_normed"]))
            elif variant == "local":
                loss = tf1.reduce_mean(
                    tf1.square(coord3d_pred - phs["keypoint_xyz21_local"]))
            elif variant == "local_w_xyz_loss":
                coord3d_pred_xyz = ref.relative.bone_rel_trafo_inv(coord3d_pred)
                loss = tf1.reduce_mean(
                    tf1.square(coord3d_pred_xyz
                               - phs["keypoint_xyz21_normed"]))
            elif variant == "proposed":
                loss = tf1.reduce_mean(
                    tf1.square(coord3d_pred - phs["keypoint_xyz21_can"]))
                loss += tf1.reduce_mean(tf1.square(R - phs["rot_mat"]))
            else:
                raise ValueError(f"unknown variant {variant!r}")
        else:
            raise ValueError(f"unknown stage {stage!r}")

        opt = tf1.train.AdamOptimizer(lr)
        train_op = opt.minimize(loss)
        tvars = tf1.trainable_variables()
        grads = tf1.gradients(loss, tvars)
        # model variables = everything that is not an optimizer slot
        slot_names = {"Adam", "Adam_1", "beta1_power", "beta2_power"}
        model_vars = [v for v in tf1.global_variables()
                      if v.op.name.split("/")[-1] not in slot_names]
        feed = {phs[k]: np.asarray(v, np.float32) for k, v in inputs.items()}
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            vars0 = {v.op.name: np.asarray(sess.run(v)) for v in model_vars}
            loss_v, grads_v = sess.run([loss, grads], feed)
            losses = []
            vars_steps = []
            for _ in range(num_steps):
                step_loss, _ = sess.run([loss, train_op], feed)
                losses.append(float(step_loss))
                if track_vars:
                    # post-update parameters after this step (only the
                    # trainables — the flip-aware trajectory test diffs
                    # them against the JAX trajectory per step)
                    vars_steps.append({v.op.name: np.asarray(sess.run(v))
                                       for v in tvars})
            vars1 = {v.op.name: np.asarray(sess.run(v)) for v in model_vars}
    out = {
        "loss": float(loss_v),
        "losses": losses,
        "grads": {v.op.name: np.asarray(g)
                  for v, g in zip(tvars, grads_v)},
        "vars0": vars0,
        "vars1": vars1,
    }
    if track_vars:
        out["vars_steps"] = vars_steps
    return out


def reference_eval_harness(kind, bin_path, num_samples, variant="direct",
                           dataset="rhd", seed=0, weight_files=None,
                           exclude_var_list=None):
    """Run a reference EVAL SCRIPT's full composition end-to-end on CPU.

    This is the harness-level oracle: everything between a .bin file on
    disk and the final printed metrics — the reference's own queue reader,
    network graph, per-sample ``sess.run`` loop, host-side numpy decode
    (detect_keypoints / trafo_coords), EvalUtil accumulation and the
    get_measures / subset-AUC math — executed exactly as the script wires
    it. Diffing these numbers against hand3d_tpu.eval.harnesses on the same
    .bin + weights proves BASELINE.md rows 1-13 reduce to data acquisition:
    every computational step from bytes to benchmark number is equal.

    Mirrored scripts (graph + loop, line for line):
      * kind="eval2d_gt_cropped": eval2d_gt_cropped.py:37-91 (reader
        hand_crop=True use_wrist_coord=False, inference_pose2d last head
        upscaled to crop size, EPE fed /crop_scale, thresholds 0-30 px).
      * kind="eval2d": eval2d.py:44-110 (reader scale_to_size=True,
        inference2d on the 240x320 resize, detect_keypoints + trafo_coords
        crop->global, /image-scale, scale2orig_res hasattr probe).
      * kind="eval3d": eval3d.py:50-103 (reader hand_crop=True
        use_wrist_coord=False, PosePriorNetwork(variant) on GT scoremaps,
        pred * keypoint_scale vs root-centered GT, all kps visible).
      * kind="eval_full": eval_full.py:46-101 (STB or RHD reader
        use_wrist_coord=False, full cascade on the 240x320 resize,
        pred * keypoint_scale vs root-centered GT, AUC 0-50mm plus the
        curve[8:] 20-50mm subset).

    The network weights are the graph's random init at ``seed`` — or, when
    ``weight_files`` is given, the result of the reference's OWN
    ``net.init(sess, weight_files, exclude_var_list)`` pickle loader
    (ColorHandPose3DNetwork.py:34-59), exactly as each script loads its
    paper weights (eval_full.py:66-67, eval2d.py:78-79, eval3d.py:76,
    eval2d_gt_cropped.py:66). Either way the effective weights are returned
    as ``flat_vars`` so the caller can push the SAME weights through the
    JAX harness (weights/convert.flat_to_tree) — this is how
    tools/run_baseline_parity.py can self-validate against the executed
    reference the day the shipped artifacts appear.

    Args:
      kind: which script composition to run.
      bin_path: a .bin file in the reference byte layout (RHD or STB).
      num_samples: how many records to evaluate (the scripts loop
        ``dataset.num_samples``; the queue cycles the staged file, so N
        must be <= the record count for on-disk order).
      variant: PosePriorNetwork variant (kind="eval3d" only).
      dataset: "rhd" | "stb" (kind="eval_full" only; others are RHD).
    Returns:
      (metrics, flat_vars): metrics has mean/median/auc (plus auc_subset
      for eval_full) in the script's units (px or meters).

    NOT thread/parallel-safe: the reference readers hardcode relative .bin
    paths, so this helper os.chdir's into a temp workdir — a process-global
    side effect. Don't run it concurrently from multiple threads or under
    parallel test runners (pytest-xdist) in the same process.
    """
    import shutil
    import tempfile

    ref = import_reference()
    tf1 = ref.tf1
    # the reference's net.init asserts os.path.exists on each weight file
    # AFTER we chdir into the temp workdir below — resolve caller-relative
    # paths now so they keep pointing at the real files (ADVICE r4)
    if weight_files is not None:
        weight_files = [os.path.abspath(p) for p in weight_files]
    if dataset == "stb":
        import data.BinaryDbReaderSTB as stb_mod
        reader_cls = stb_mod.BinaryDbReaderSTB
        staged = os.path.join("data", "stb", "stb_eval.bin")
    else:
        reader_cls = ref.reader_mod.BinaryDbReader
        staged = os.path.join("data", "bin", "rhd_evaluation.bin")
    workdir = tempfile.mkdtemp(prefix="refeval_")
    os.makedirs(os.path.dirname(os.path.join(workdir, staged)))
    shutil.copy(bin_path, os.path.join(workdir, staged))
    old_cwd = os.getcwd()
    graph = tf1.Graph()
    try:
        os.chdir(workdir)
        with graph.as_default():
            tf1.set_random_seed(seed)
            if kind == "eval2d_gt_cropped":
                # eval2d_gt_cropped.py:37-51
                reader = reader_cls(mode="evaluation", shuffle=False,
                                    hand_crop=True, use_wrist_coord=False)
                data = reader.get()
                net = ref.cascade_mod.ColorHandPose3DNetwork()
                scoremap = net.inference_pose2d(data["image_crop"])[-1]
                s = data["image_crop"].get_shape().as_list()
                scoremap = tf1.image.resize_images(scoremap, (s[1], s[2]))
                fetches = [data["crop_scale"], scoremap,
                           data["keypoint_uv21"], data["keypoint_vis21"]]
            elif kind == "eval2d":
                # eval2d.py:44-58
                reader = reader_cls(mode="evaluation", shuffle=False,
                                    use_wrist_coord=True, scale_to_size=True)
                data = reader.get()
                net = ref.cascade_mod.ColorHandPose3DNetwork()
                image_scaled = tf1.image.resize_images(data["image"],
                                                       (240, 320))
                s = data["image"].get_shape().as_list()
                img_scale = (240.0 / s[1], 320.0 / s[2])
                keypoints_scoremap, _, scale_crop, center = net.inference2d(
                    image_scaled)
                fetches = [keypoints_scoremap, scale_crop, center,
                           data["keypoint_uv21"], data["keypoint_vis21"]]
            elif kind == "eval3d":
                # eval3d.py:50-61
                reader = reader_cls(mode="evaluation", shuffle=False,
                                    hand_crop=True, use_wrist_coord=False)
                data = reader.get()
                evaluation = tf1.placeholder_with_default(True, shape=())
                net = ref.poseprior_mod.PosePriorNetwork(variant)
                coord3d_pred, _, _ = net.inference(
                    data["scoremap"], data["hand_side"], evaluation)
                fetches = [data["keypoint_xyz21"], data["keypoint_scale"],
                           coord3d_pred]
            elif kind == "eval_full":
                # eval_full.py:46-59 (the RHD branch is the script's
                # commented-out reader line :45, BASELINE row 13)
                reader = reader_cls(mode="evaluation", shuffle=False,
                                    use_wrist_coord=False)
                data = reader.get()
                image_scaled = tf1.image.resize_images(data["image"],
                                                       (240, 320))
                net = ref.cascade_mod.ColorHandPose3DNetwork()
                evaluation = tf1.placeholder_with_default(True, shape=())
                _, _, _, _, _, coord3d_pred = net.inference(
                    image_scaled, data["hand_side"], evaluation)
                fetches = [data["keypoint_xyz21"], data["keypoint_vis21"],
                           data["keypoint_scale"], coord3d_pred]
            else:
                raise ValueError(f"unknown kind {kind!r}")

            init = tf1.global_variables_initializer()
            var_list = tf1.global_variables()
            util = ref.general.EvalUtil()
            with tf1.Session(graph=graph) as sess:
                sess.run(init)
                sess.run(tf1.local_variables_initializer())
                if weight_files is not None:
                    net.init(sess, weight_files, exclude_var_list)
                flat_vars = {v.op.name: np.asarray(sess.run(v))
                             for v in var_list}
                coord = tf1.train.Coordinator()
                threads = tf1.train.start_queue_runners(sess=sess,
                                                        coord=coord)
                # finally: a sess.run failure mid-loop (e.g. a truncated
                # .bin -> OutOfRangeError) must still stop + join the
                # queue-runner threads, or they die noisily on the closed
                # session (ADVICE r4)
                try:
                    for _ in range(num_samples):
                        vals = sess.run(fetches)
                        _feed_eval_util(ref, util, kind, vals, img_scale
                                        if kind == "eval2d" else None,
                                        reader)
                finally:
                    coord.request_stop()
                    coord.join(threads, stop_grace_period_secs=10)
    finally:
        os.chdir(old_cwd)
        shutil.rmtree(workdir, ignore_errors=True)

    if kind in ("eval2d_gt_cropped", "eval2d"):
        # :87 / :109 — thresholds 0-30 px over 20 steps
        mean, median, auc, _, _ = util.get_measures(0.0, 30.0, 20)
        metrics = {"mean": mean, "median": median, "auc": auc}
    elif kind == "eval3d":
        mean, median, auc, _, _ = util.get_measures(0.0, 0.050, 20)
        metrics = {"mean": mean, "median": median, "auc": auc}
    else:
        # eval_full.py:92-101 — 0-50mm + the curve[8:] 20-50mm subset
        mean, median, auc, curve, threshs = util.get_measures(0.0, 0.050, 20)
        curve_sub, thr_sub = curve[8:], threshs[8:] * 1000.0
        metrics = {"mean": mean, "median": median, "auc": auc,
                   "auc_subset": ref.general.calc_auc(thr_sub, curve_sub)}
    return metrics, flat_vars


def _feed_eval_util(ref, util, kind, vals, img_scale, reader):
    """One reference eval-script loop body: host decode + EvalUtil.feed."""
    if kind == "eval2d_gt_cropped":
        # eval2d_gt_cropped.py:72-84
        crop_scale, sm_v, uv_gt, vis = vals
        sm_v = np.squeeze(sm_v)
        uv_gt = np.squeeze(uv_gt)
        vis = np.squeeze(vis)
        crop_scale = np.squeeze(crop_scale)
        chw = ref.general.detect_keypoints(np.squeeze(sm_v))
        uv_pred = np.stack([chw[:, 1], chw[:, 0]], 1)
        util.feed(uv_gt / crop_scale, vis, uv_pred / crop_scale)
    elif kind == "eval2d":
        # eval2d.py:85-106 (incl. the hasattr resolution
        # probe :101-103; BinaryDbReader has none -> 1.0)
        sm_v, scale_crop_v, center_v, uv_gt, vis = vals
        sm_v = np.squeeze(sm_v)
        uv_gt = np.squeeze(uv_gt)
        vis = np.squeeze(vis)
        chw_crop = ref.general.detect_keypoints(np.squeeze(sm_v))
        chw = ref.general.trafo_coords(chw_crop, center_v, scale_crop_v, 256)
        uv_pred = np.stack([chw[:, 1], chw[:, 0]], 1)
        uv_pred[:, 1] /= img_scale[0]
        uv_pred[:, 0] /= img_scale[1]
        s2o = 1.0
        if hasattr(reader, "resolution"):
            s2o = reader.resolution
        util.feed(uv_gt / s2o, vis, uv_pred / s2o)
    elif kind == "eval3d":
        # eval3d.py:85-98
        xyz21, kp_scale, pred = [np.squeeze(v) for v in vals]
        pred = pred * kp_scale
        xyz21 = xyz21 - xyz21[0, :]
        util.feed(xyz21, np.ones_like(xyz21[:, 0]), pred)
    else:  # eval_full
        # eval_full.py:74-86
        xyz21, vis21, kp_scale, pred = [np.squeeze(v) for v in vals]
        pred = pred * kp_scale
        xyz21 = xyz21 - xyz21[0, :]
        util.feed(xyz21, vis21, pred)


def save_tf_checkpoint(path, flat_vars):
    """Write {name: ndarray} as a real TF V2 checkpoint via tf1.train.Saver —
    ground-truth input for the TF-free parser (weights/tf_ckpt.py)."""
    tf1 = make_tf1()
    graph = tf1.Graph()
    with graph.as_default():
        for name, value in flat_vars.items():
            tf1.get_variable(name, initializer=np.asarray(value))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(sess, path)


def run_tf(fn_builder, feeds, seed=0):
    """Run an arbitrary reference graph snippet.

    ``fn_builder(ref, placeholders) -> fetches`` with ``feeds`` a
    {name: array} dict (float64 arrays are fed as float32, matching the
    reference's uniformly-f32 graphs).
    """
    ref = import_reference()
    tf1 = ref.tf1
    graph = tf1.Graph()
    with graph.as_default():
        tf1.set_random_seed(seed)
        arrays = {k: np.asarray(v) for k, v in feeds.items()}
        arrays = {k: v.astype(np.float32) if v.dtype == np.float64 else v
                  for k, v in arrays.items()}
        phs = {k: tf1.placeholder(tf1.as_dtype(v.dtype.name), v.shape)
               for k, v in arrays.items()}
        fetches = fn_builder(ref, phs)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            out = sess.run(fetches, {phs[k]: arrays[k] for k in arrays})
    return out


if __name__ == "__main__":
    # smoke: build + run the full reference cascade on a random batch
    rng = np.random.RandomState(0)
    image = rng.rand(2, 240, 320, 3).astype("float32") - 0.5
    hand_side = np.tile(np.asarray([[1.0, 0.0]], "float32"), (2, 1))
    outs, flat = reference_cascade_outputs(image, hand_side)
    print({k: v.shape for k, v in outs.items()})
    print(f"{len(flat)} reference variables captured")
