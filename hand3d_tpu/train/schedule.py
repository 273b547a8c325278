"""Learning-rate schedules."""

import jax.numpy as jnp


def piecewise_constant(steps, values):
    """Multi-step LR schedule: values[i] while step < steps[i].

    Functional equivalent of utils/general.LearningRateScheduler (:480-519).
    (Note: the reference's training scripts never pass global_step to
    opt.minimize, so their graphs actually trained at values[0] forever; this
    implementation steps the schedule correctly.)

    Args:
      steps: increasing list of step boundaries (len n-1).
      values: list of LR values (len n).
    Returns:
      schedule(step) -> lr, usable as an optax schedule.
    """
    assert len(steps) + 1 == len(values), "need one more value than steps"
    boundaries = jnp.asarray(steps)
    vals = jnp.asarray(values, jnp.float32)

    def schedule(step):
        idx = jnp.sum(step >= boundaries)
        return vals[idx]

    return schedule
