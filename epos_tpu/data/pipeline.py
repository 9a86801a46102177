"""Input pipeline: threaded record reading -> parsed samples -> device batches.

The reference's tf.data pipeline is pinned to a single reader because its
renderer is not thread-safe (epos_lib/datagen.py:674-705). Here parsing
workers run concurrently over the thread-safe rasterizer and feed a
prefetch queue; batches are fixed-shape (padded GT) so the jitted step never
retraces. Photometric augmentation happens on DEVICE (data/augment.py), so
the host only decodes/crops/renders GT.
"""

import queue
import threading

import numpy as np

from epos_tpu import common


class DataLoader:
  """Iterates batches from a Dataset (epos_tpu.data.dataset.Dataset)."""

  def __init__(self, dataset, batch_size, shuffle=False, repeat=False,
               num_workers=1, seed=0, prefetch=4, files=None):
    self.dataset = dataset
    self.batch_size = batch_size
    self.shuffle = shuffle
    self.repeat = repeat
    self.num_workers = max(1, num_workers)
    self.seed = seed
    self.prefetch = prefetch
    self.files = files if files is not None else dataset.record_files()

  def _record_iter(self):
    """Yields raw example bytes; interleaved across files, shuffled,
    repeated (datagen.py:674-705 semantics)."""
    from epos_tpu.data import records
    rng = np.random.default_rng(self.seed)
    epoch = 0
    while True:
      files = list(self.files)
      if self.shuffle:
        rng.shuffle(files)
      buf = []
      for path in files:
        for rec in records.read_records(path):
          if self.shuffle:
            buf.append(rec)
            if len(buf) >= 64:
              idx = rng.integers(0, len(buf))
              buf[idx], buf[-1] = buf[-1], buf[idx]
              yield buf.pop()
          else:
            yield rec
      for rec in buf:
        yield rec
      epoch += 1
      if not self.repeat:
        return

  def __iter__(self):
    sample_q = queue.Queue(maxsize=self.prefetch * self.batch_size)
    stop = threading.Event()
    record_iter = self._record_iter()
    record_lock = threading.Lock()
    n_workers = self.num_workers
    done_workers = []

    def worker(widx):
      rng = np.random.default_rng(self.seed + 1000 + widx)
      while not stop.is_set():
        with record_lock:
          try:
            rec = next(record_iter)
          except StopIteration:
            break
        try:
          sample = self.dataset.parse_and_preprocess(rec, rng)
          sample_q.put(sample)
        except Exception as e:  # Surface parse errors, don't hang.
          sample_q.put(e)
      done_workers.append(widx)
      sample_q.put(None)

    threads = [threading.Thread(target=worker, args=(i,), daemon=True)
               for i in range(n_workers)]
    for t in threads:
      t.start()

    try:
      finished = 0
      batch = []
      while True:
        item = sample_q.get()
        if item is None:
          finished += 1
          if finished == n_workers:
            if batch:
              yield self._collate(batch)
            return
          continue
        if isinstance(item, Exception):
          raise item
        batch.append(item)
        if len(batch) == self.batch_size:
          yield self._collate(batch)
          batch = []
    finally:
      stop.set()

  @staticmethod
  def _collate(samples):
    out = {}
    for key in samples[0]:
      vals = [s[key] for s in samples]
      if key == common.IMAGE_PATH:
        out[key] = vals
      else:
        out[key] = np.stack(vals)
    return out
