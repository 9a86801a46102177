"""TensorBoard scalar summaries without TensorFlow.

The reference logs losses/LR/histograms via tf.summary (train.py:237-282).
Here Event protos are hand-encoded (the schema is three nested fields) and
framed with our TFRecord writer, producing files TensorBoard reads natively.
A JSONL mirror is written alongside for machine-readable metrics.
"""

import json
import os
import socket
import struct
import time

from epos_tpu.data import records


def _varint(out, v):
  records._write_varint(out, v)


def _event_bytes(wall_time, step, summary_payload=None, file_version=None):
  out = bytearray()
  # field 1: wall_time (double, wire type 1)
  _varint(out, (1 << 3) | 1)
  out.extend(struct.pack('<d', wall_time))
  # field 2: step (int64 varint)
  _varint(out, (2 << 3) | 0)
  _varint(out, step & 0xFFFFFFFFFFFFFFFF)
  if file_version is not None:
    payload = file_version.encode('utf8')
    _varint(out, (3 << 3) | 2)
    _varint(out, len(payload))
    out.extend(payload)
  if summary_payload is not None:
    _varint(out, (5 << 3) | 2)
    _varint(out, len(summary_payload))
    out.extend(summary_payload)
  return bytes(out)


def _scalar_summary(tag_values):
  """Summary proto: repeated Value{tag=1, simple_value=2}."""
  out = bytearray()
  for tag, value in tag_values.items():
    val = bytearray()
    tag_b = tag.encode('utf8')
    _varint(val, (1 << 3) | 2)
    _varint(val, len(tag_b))
    val.extend(tag_b)
    _varint(val, (2 << 3) | 5)  # float, wire type 5
    val.extend(struct.pack('<f', float(value)))
    _varint(out, (1 << 3) | 2)
    _varint(out, len(val))
    out.extend(val)
  return bytes(out)


class SummaryWriter:
  """Scalar summary writer (TensorBoard events + metrics.jsonl)."""

  def __init__(self, logdir):
    os.makedirs(logdir, exist_ok=True)
    fname = 'events.out.tfevents.{}.{}'.format(
        int(time.time()), socket.gethostname())
    self._writer = records.RecordWriter(os.path.join(logdir, fname))
    self._writer.write(_event_bytes(time.time(), 0,
                                    file_version='brain.Event:2'))
    self._jsonl = open(os.path.join(logdir, 'metrics.jsonl'), 'a')

  def scalars(self, step, tag_values):
    self._writer.write(_event_bytes(
        time.time(), int(step), _scalar_summary(tag_values)))
    self._jsonl.write(json.dumps(
        {'step': int(step), **{k: float(v) for k, v in tag_values.items()}})
        + '\n')
    self._jsonl.flush()

  def close(self):
    self._writer.close()
    self._jsonl.close()
