"""Generic jitted train-step machinery (optax Adam + mesh sharding).

The reference's training loops (training_*.py:85-95) are sess.run loops over
a queue-fed graph; here a train step is a pure donated jitted function
``(state, batch, key) -> (state, metrics)`` whose arrays carry
jax.sharding.NamedSharding — data-parallel over the "data" mesh axis with
optional tensor parallelism (see hand3d_tpu.parallel.mesh). XLA/GSPMD
inserts the gradient all-reduce over ICI; there is no hand-written
collective code.
"""

from typing import Any, NamedTuple

import jax
import optax

from hand3d_tpu.parallel import mesh as mesh_lib
from hand3d_tpu.train.schedule import piecewise_constant


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Any


def fuse_preprocess(loss_fn, preprocess_fn, cfg):
    """Fuse data preprocessing into the loss, making the whole training step
    (decode -> augment -> forward -> backward -> update) ONE jitted program.

    The reference achieved this with TF1's single graph; the unfused path
    here runs preprocess and train step as two dispatches. Fusing removes a
    dispatch per step and lets XLA overlap preprocessing with compute.

    Args:
      loss_fn: loss over preprocessed features (params, batch, key) -> scalar.
      preprocess_fn: data.preprocess.preprocess_rhd / preprocess_stb.
      cfg: the PreprocessConfig (static).
    Returns:
      loss over raw record batches with the same signature.
    """

    def fused(params, raw_batch, key):
        k_data, k_loss = jax.random.split(key)
        batch = preprocess_fn(cfg, raw_batch, k_data if cfg.needs_rng else None)
        return loss_fn(params, batch, k_loss)

    return fused


def make_optimizer(lr_values, lr_steps):
    """Adam with the reference's multistep LR schedule (TF defaults: b1=0.9,
    b2=0.999, eps=1e-8, matching tf.train.AdamOptimizer)."""
    schedule = piecewise_constant(lr_steps, lr_values)
    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)


def init_state(params, optimizer):
    return TrainState(params, optimizer.init(params), jax.numpy.zeros((), jax.numpy.int32))


def _make_step_core(loss_fn, optimizer, remat=False, accum_steps=1):
    """Unjitted ``step(state, batch, key) -> (state, metrics)`` shared by the
    per-step (make_train_step) and multi-step (make_resident_train_step)
    builders — one definition of remat/accumulation/update semantics."""
    if remat:
        if isinstance(remat, str):
            policy = getattr(jax.checkpoint_policies, remat, None)
            assert policy is not None, (
                f"unknown remat policy {remat!r}; see jax.checkpoint_policies"
            )
            loss_fn = jax.checkpoint(loss_fn, policy=policy)
        else:
            loss_fn = jax.checkpoint(loss_fn)

    def grads_of(params, batch, key):
        if accum_steps == 1:
            return jax.value_and_grad(loss_fn)(params, batch, key)

        def split(x):
            n = x.shape[0]
            assert n % accum_steps == 0, (
                f"batch axis {n} not divisible by accum_steps {accum_steps}"
            )
            return x.reshape((accum_steps, n // accum_steps) + x.shape[1:])

        micro = jax.tree_util.tree_map(split, batch)
        keys = jax.random.split(key, accum_steps)

        # Unrolled on purpose: a lax.scan body measured 26x slower at
        # runtime on XLA:CPU (scan serializes what the unrolled program
        # runs thread-parallel); accum_steps is small and static, so the
        # linear compile-size growth is the cheaper trade on every backend.
        loss_sum, grad_sum = None, None
        for i in range(accum_steps):
            mb = jax.tree_util.tree_map(lambda x: x[i], micro)
            loss, grads = jax.value_and_grad(loss_fn)(params, mb, keys[i])
            if grad_sum is None:
                loss_sum, grad_sum = loss, grads
            else:
                loss_sum = loss_sum + loss
                grad_sum = jax.tree_util.tree_map(
                    jax.numpy.add, grad_sum, grads
                )
        inv = 1.0 / accum_steps
        return loss_sum * inv, jax.tree_util.tree_map(
            lambda g: g * inv, grad_sum
        )

    def step(state, batch, key):
        loss, grads = grads_of(state.params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return step


def make_train_step(loss_fn, optimizer, mesh=None, donate=True, remat=False,
                    accum_steps=1):
    """Build a jitted train step for ``loss_fn(params, batch, key) -> scalar``.

    If ``mesh`` is given, params/opt state use the TP sharding rules and the
    batch is expected sharded over the "data" axis; otherwise single-device.
    ``remat=True`` wraps the loss in jax.checkpoint, trading recompute for
    activation memory (useful for large batches/resolutions on one chip).
    ``remat`` may also name a jax.checkpoint_policies policy (e.g.
    "dots_saveable" / "nothing_saveable" / "everything_saveable") for a
    finer recompute/memory trade: dots_saveable keeps matmul/conv outputs
    (MXU work is never recomputed, elementwise is), nothing_saveable
    recomputes everything.

    ``accum_steps > 1`` enables gradient accumulation: the batch's leading
    axis is split into ``accum_steps`` equal microbatches, gradients of the
    per-microbatch backward passes are averaged, and ONE optimizer update
    is applied — activations are live one microbatch at a time, so the
    effective batch can exceed what one forward/backward fits in HBM.
    Exactly equal to the unaccumulated step when the loss is a mean over
    samples; for losses with batch-coupled normalizers (e.g. the PoseNet
    visibility-weighted loss, training_posenet.py:57-61) it is the standard
    mean-of-microbatch-losses approximation. Each microbatch gets its own
    fold of the step RNG key (dropout/aug noise stay i.i.d. per sample).
    """
    step = _make_step_core(loss_fn, optimizer, remat=remat,
                           accum_steps=accum_steps)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def shardings_for_state(state):
        p_sh = mesh_lib.param_sharding(mesh, state.params)
        opt_sh = jax.tree_util.tree_map(
            lambda x: mesh_lib.param_sharding(mesh, x) if isinstance(x, dict)
            else mesh_lib.replicate(mesh),
            state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        )
        return TrainState(p_sh, opt_sh, mesh_lib.replicate(mesh))

    def sharded_step(state, batch, key):
        return step(state, batch, key)

    return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())


def make_resident_train_step(loss_fn, optimizer, donate=True, remat=False,
                             accum_steps=1):
    """Multi-step training over a device-resident dataset: ONE device call
    runs ``K = idx.shape[0]`` full training steps under ``lax.scan``.

    Motivation: the per-step path costs one host->device dispatch per step;
    on a remote-tunneled chip that round trip (~1s) dwarfs the step's actual
    compute (tens of ms at batch 8), capping training at ~1 it/s regardless
    of the hardware. When the dataset fits HBM (fine-tuning, calibration,
    the synthetic-overfit gate), parking it on device and scanning K steps
    per call amortizes dispatch K-fold. The reference has no equivalent (TF1
    queues still paid a sess.run per step, training_posenet.py:85-95).

    Returns a jitted
        ``multi(state, data, idx, base_key, step0) -> (state, losses[K])``
    where ``data`` is the raw record dict with a leading record axis,
    ``idx`` is an int32 [K, batch] table of record rows (one row per step,
    host-computed with the same epoch shuffle as data.pipeline), and the
    step-j key is ``fold_in(base_key, step0 + j)`` — exactly the key
    train.loop.fit uses on the per-step path, so a resident run replays the
    per-step run's exact batches and RNG keys (asserted by
    tests/test_train_loop.py; numerics match to fusion-order float
    tolerance). ``loss_fn`` must consume RAW record batches, i.e.
    be wrapped with fuse_preprocess. K is static per compile; the loop uses
    one ragged tail window at most.
    """
    step = _make_step_core(loss_fn, optimizer, remat=remat,
                           accum_steps=accum_steps)

    def multi(state, data, idx, base_key, step0):
        def body(carry, inp):
            step_idx, idx_row = inp
            key = jax.random.fold_in(base_key, step_idx)
            batch = jax.tree_util.tree_map(
                lambda x: jax.numpy.take(x, idx_row, axis=0), data
            )
            carry, metrics = step(carry, batch, key)
            return carry, metrics["loss"]

        steps = step0 + jax.numpy.arange(idx.shape[0], dtype=jax.numpy.int32)
        state, losses = jax.lax.scan(body, state, (steps, idx))
        return state, losses

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def shard_state(mesh, state):
    """Place a TrainState on the mesh (params + matching opt state)."""
    params = mesh_lib.shard_params(mesh, state.params)
    # Adam moments mirror the param tree; shard any param-shaped leaf the
    # same way, replicate scalars/counters.
    p_shardings = mesh_lib.param_sharding(mesh, state.params)

    def place(opt_leaf):
        return jax.device_put(opt_leaf, mesh_lib.replicate(mesh))

    def place_tree(tree):
        if isinstance(tree, dict) or hasattr(tree, "keys"):
            return jax.device_put(tree, p_shardings)
        return place(tree)

    opt_state = jax.tree_util.tree_map(
        place_tree, state.opt_state, is_leaf=lambda x: isinstance(x, dict)
    )
    step = jax.device_put(state.step, mesh_lib.replicate(mesh))
    return TrainState(params, opt_state, step)
