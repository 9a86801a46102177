"""Device mesh and sharding helpers.

The reference implements data parallelism with per-GPU graph clones and
CPU-side gradient averaging (scripts/train.py:344-366). TPU-native equivalent:
a `jax.sharding.Mesh`, batch sharded over the 'data' axis, parameters
replicated (or sharded over 'model' for the wide f256 heads), and XLA emitting
the all-reduce over ICI inside the single jitted step — no explicit
communication code (SURVEY.md §2.5).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def create_mesh(mesh_shape=None, devices=None):
  """Creates a Mesh over the available devices.

  In multi-process runs jax.devices() is the GLOBAL device list (all
  hosts), so the mesh spans every chip and XLA routes the data-axis
  all-reduce over ICI within a host and DCN across hosts.

  Args:
    mesh_shape: [data, model] sizes; None -> all devices on the data axis.
    devices: Optional explicit device list (default jax.devices()).
  """
  if devices is None:
    devices = jax.devices()
  n = len(devices)
  if mesh_shape is None:
    mesh_shape = [n, 1]
  if int(np.prod(mesh_shape)) != n:
    raise ValueError(f'mesh_shape {mesh_shape} != {n} devices')
  dev_array = np.asarray(devices).reshape(mesh_shape)
  return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh):
  """Batch dim sharded over the data axis."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
  return NamedSharding(mesh, P())


def state_shardings(mesh, state):
  """Parameter shardings for a TrainState: EPOS head kernels/biases are
  sharded over the 'model' axis, everything else replicated.

  The fragment heads are the memory-critical tensors (num_objs * num_frags
  * 4 output channels per pixel — SURVEY §5: up to ~30k channels for
  T-LESS f256); splitting their output-channel axis over the model axis is
  the natural tensor parallelism for this architecture. XLA propagates the
  sharding through the head matmul (channel-sharded activations) and
  inserts the gathers the losses need.
  """
  import jax as _jax

  def shard_param(path, x):
    keys = [str(getattr(p, 'key', p)) for p in path]
    in_head = any(k.startswith('logits/') for k in keys)
    if in_head and x.ndim >= 1 and x.shape[-1] % mesh.shape[MODEL_AXIS] == 0:
      spec = [None] * (x.ndim - 1) + [MODEL_AXIS]
      return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())

  repl = NamedSharding(mesh, P())
  params_sh = _jax.tree_util.tree_map_with_path(shard_param, state.params)
  # Optimizer buffers (momentum etc.) mirror the param tree inside the
  # optax state, so the same path rule applies — the param names appear in
  # the optax leaf paths and shapes match.
  opt_sh = _jax.tree_util.tree_map_with_path(shard_param, state.opt_state)
  return state.replace(
      step=repl, params=params_sh,
      batch_stats=_jax.tree_util.tree_map(lambda x: repl, state.batch_stats),
      opt_state=opt_sh)


def shard_batch(batch, mesh):
  """Places a host batch dict on the mesh, sharded on the leading dim.

  Single-process: a plain device_put with the sharding. Multi-process:
  each process passes its LOCAL slice of the global batch (leading dim =
  global_batch / process_count) and the pieces are assembled into one
  global array (jax.make_array_from_process_local_data)."""
  sh = batch_sharding(mesh)
  if jax.process_count() == 1:
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
  import numpy as np_
  return jax.tree_util.tree_map(
      lambda x: jax.make_array_from_process_local_data(sh, np_.asarray(x)),
      batch)
