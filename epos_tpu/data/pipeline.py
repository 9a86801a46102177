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
               num_workers=1, seed=0, prefetch=4, files=None,
               shard_index=0, num_shards=1, start_sample=0):
    """shard_index/num_shards: multi-process input sharding — each process
    reads a disjoint 1/num_shards slice of every epoch's (shared-seed)
    permutation, so hosts never feed duplicate examples.

    start_sample: number of this shard's samples already consumed by a
    previous (checkpointed) run. The stream resumes exactly where an
    uninterrupted run would be: whole epochs are skipped by drawing (and
    discarding) their permutations, then the partial epoch is fast-
    forwarded — the reference's shuffle state likewise advances for the
    whole session across its training loop (epos_lib/datagen.py:674-705).
    Restarting a chunked run therefore continues the permutation stream
    instead of replaying the first chunk's batches."""
    self.dataset = dataset
    self.batch_size = batch_size
    self.shuffle = shuffle
    self.repeat = repeat
    self.num_workers = max(1, num_workers)
    self.seed = seed
    self.prefetch = prefetch
    self.files = files if files is not None else dataset.record_files()
    self.shard_index = shard_index
    self.num_shards = max(1, num_shards)
    self.start_sample = int(start_sample)

  def _record_iter(self):
    """Yields raw example bytes; index-based GLOBAL shuffle per epoch.

    Replaces the reference's bounded tf.data shuffle buffer
    (datagen.py:674-705) with a full permutation over (file, offset)
    record indices — perfect decorrelation at O(num_records) memory, no
    record payloads buffered on the 1-core host."""
    from epos_tpu.data import records
    rng = np.random.default_rng(self.seed)
    handles = {}

    def handle(path):
      if path not in handles:
        handles[path] = open(path, 'rb')
      return handles[path]

    # Resume offset within this shard's stream (whole epochs are skipped by
    # advancing the permutation RNG; the partial epoch by slicing).
    skip = self.start_sample if self.repeat else 0
    try:
      index = None
      while True:
        if self.shuffle or self.num_shards > 1:
          if index is None:
            index = [(path, off) for path in self.files
                     for off in records.read_record_index(path)]
          if self.shuffle:
            order = rng.permutation(len(index))
          else:
            order = range(len(index))
          shard = list(order)[self.shard_index::self.num_shards]
          if skip >= len(shard):
            skip -= len(shard)
            continue
          for i in shard[skip:]:
            path, off = index[i]
            yield records.read_record_at(handle(path), off)
          skip = 0
        else:
          for path in self.files:
            yield from records.read_records(path)
        if not self.repeat:
          return
    finally:
      for f in handles.values():
        f.close()

  def __iter__(self):
    sample_q = queue.Queue(maxsize=self.prefetch * self.batch_size)
    stop = threading.Event()
    record_iter = self._record_iter()
    record_lock = threading.Lock()
    n_workers = self.num_workers
    done_workers = []

    def worker(widx):
      # Per-(resume-offset, worker) RNG: a restarted chunk must not replay
      # the first chunk's per-sample randomness (crops, scale jitter).
      rng = np.random.default_rng(
          (self.seed, 1000 + widx, self.start_sample))
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
