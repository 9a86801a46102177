"""Learning-rate schedules matching the reference semantics.

Reference: epos_lib/train_utils.py:117-195 — 'poly' and 'step' policies with
an optional slow-start phase at a fixed small LR.
"""

import jax.numpy as jnp


def model_learning_rate(learning_policy='poly',
                        base_learning_rate=1e-4,
                        learning_rate_decay_step=2000,
                        learning_rate_decay_factor=0.1,
                        train_steps=2000000,
                        learning_power=0.9,
                        slow_start_step=0,
                        slow_start_learning_rate=1e-4):
  """Returns schedule fn step -> lr (usable inside jit / optax)."""

  def schedule(step):
    step_f = jnp.asarray(step, jnp.float32)
    if learning_policy == 'step':
      lr = base_learning_rate * jnp.power(
          learning_rate_decay_factor,
          jnp.floor(step_f / learning_rate_decay_step))
    elif learning_policy == 'poly':
      frac = jnp.minimum(step_f / train_steps, 1.0)
      lr = base_learning_rate * jnp.power(1.0 - frac, learning_power)
    else:
      raise ValueError(f'Unknown learning policy: {learning_policy}')
    return jnp.where(step_f < slow_start_step,
                     jnp.asarray(slow_start_learning_rate, jnp.float32), lr)

  return schedule


def from_config(cfg):
  return model_learning_rate(
      learning_policy=cfg.learning_policy,
      base_learning_rate=cfg.base_learning_rate,
      learning_rate_decay_step=cfg.learning_rate_decay_step,
      learning_rate_decay_factor=cfg.learning_rate_decay_factor,
      train_steps=cfg.train_steps,
      learning_power=cfg.learning_power,
      slow_start_step=cfg.slow_start_step,
      slow_start_learning_rate=cfg.slow_start_learning_rate)
