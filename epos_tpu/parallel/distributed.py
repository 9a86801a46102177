"""Multi-host (multi-process) training setup.

Replaces the reference's TF1 parameter-server replication
(scripts/train.py:35-50: --master/--task/--num_replicas,
tf.train.replica_device_setter at :456, is_chief at :544) with the JAX
single-controller-per-process model: every process calls
`jax.distributed.initialize`, sees the GLOBAL device set, feeds its local
shard of the batch, and XLA runs the gradient all-reduce over ICI/DCN.
Checkpoint and summary IO is gated to process 0 (the reference's is_chief).

The reference flag names are kept:
  --master        coordinator address (host:port); empty = single process.
  --num_replicas  number of processes.
  --task          this process's index.
"""

import jax


def initialize_from_config(cfg):
  """Initializes jax.distributed when cfg requests multi-process training.

  Must run before any other JAX API touches the backend. No-op for
  single-process runs (master empty / num_replicas <= 1).
  """
  if not getattr(cfg, 'master', None) or cfg.num_replicas <= 1:
    return
  jax.distributed.initialize(
      coordinator_address=cfg.master,
      num_processes=cfg.num_replicas,
      process_id=cfg.task)


def process_index():
  return jax.process_index()


def process_count():
  return jax.process_count()


def is_chief():
  """Process 0 owns checkpoint/summary IO (reference train.py:544)."""
  return jax.process_index() == 0
