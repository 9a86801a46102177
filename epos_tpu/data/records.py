"""TFRecord + tf.train.Example I/O without TensorFlow.

The reference stores examples as tf.train.Example protos in TFRecord files
(epos_lib/tfrecord.py, epos_lib/datagen.py:384-422). This module implements
a minimal, dependency-free codec for exactly that format so EPOS-TPU reads
the reference's data files and writes compatible ones:

- TFRecord framing: <u64 length><u32 masked-crc32c(len)><bytes><u32 crc>.
  CRCs are verified lazily (readers skip them for speed; writer emits valid
  masked crc32c so files interop with TF readers).
- Example proto: features{ map<string, Feature> } with BytesList / FloatList
  / Int64List, hand-encoded (the schema is tiny and stable).
"""

import os
import struct

import numpy as np

# --- crc32c (Castagnoli) ------------------------------------------------------
# Fast path: google_crc32c (C extension, ~GB/s). Fallback: slice-by-8
# table-driven Python (the old per-byte loop was ~2M interpreter iterations
# per 1MB image on the 1-core host, run twice per record write).

try:
  import google_crc32c as _gcrc
except ImportError:  # pragma: no cover - present in this image
  _gcrc = None

_CRC_TABLES = None


def _crc_tables():
  """8 slice-by-8 tables: table[0] is the classic byte table."""
  global _CRC_TABLES
  if _CRC_TABLES is None:
    poly = 0x82F63B78
    tables = np.zeros((8, 256), np.uint64)
    for i in range(256):
      c = i
      for _ in range(8):
        c = (c >> 1) ^ poly if c & 1 else c >> 1
      tables[0, i] = c
    for k in range(1, 8):
      for i in range(256):
        c = int(tables[k - 1, i])
        tables[k, i] = (c >> 8) ^ int(tables[0, c & 0xFF])
    _CRC_TABLES = tables
  return _CRC_TABLES


def crc32c(data):
  if _gcrc is not None:
    return _gcrc.value(bytes(data))
  t = _crc_tables()
  arr = np.frombuffer(data, np.uint8)
  n8 = (len(arr) // 8) * 8
  crc = 0xFFFFFFFF
  if n8:
    words = arr[:n8].reshape(-1, 8)
    for row in words:
      x = crc ^ (int(row[0]) | int(row[1]) << 8 | int(row[2]) << 16
                 | int(row[3]) << 24)
      crc = int(t[7, x & 0xFF] ^ t[6, (x >> 8) & 0xFF]
                ^ t[5, (x >> 16) & 0xFF] ^ t[4, (x >> 24) & 0xFF]
                ^ t[3, row[4]] ^ t[2, row[5]] ^ t[1, row[6]] ^ t[0, row[7]])
  for b in arr[n8:]:
    crc = (crc >> 8) ^ int(t[0, (crc ^ int(b)) & 0xFF])
  return crc ^ 0xFFFFFFFF


def masked_crc(data):
  crc = crc32c(data)
  return ((crc >> 15 | crc << 17) + 0xa282ead8) & 0xFFFFFFFF


# --- varint / proto primitives ------------------------------------------------

def _write_varint(out, value):
  while True:
    b = value & 0x7F
    value >>= 7
    if value:
      out.append(b | 0x80)
    else:
      out.append(b)
      return


def _read_varint(buf, pos):
  result = shift = 0
  while True:
    b = buf[pos]
    pos += 1
    result |= (b & 0x7F) << shift
    if not b & 0x80:
      return result, pos
    shift += 7


def _tag(field, wire):
  return (field << 3) | wire


def _write_len_delimited(out, field, payload):
  _write_varint(out, _tag(field, 2))
  _write_varint(out, len(payload))
  out.extend(payload)


# --- Feature encoding ---------------------------------------------------------

def bytes_feature(values):
  """values: list of bytes -> Feature proto bytes (BytesList, field 1)."""
  if isinstance(values, (bytes, str)):
    values = [values]
  inner = bytearray()
  for v in values:
    if isinstance(v, str):
      v = v.encode('utf8')
    _write_len_delimited(inner, 1, v)
  out = bytearray()
  _write_len_delimited(out, 1, bytes(inner))
  return bytes(out)


def float_feature(values):
  """values: list of floats -> Feature proto (FloatList packed, field 2)."""
  values = np.asarray(values, np.float32).reshape(-1)
  inner = bytearray()
  _write_varint(inner, _tag(1, 2))
  payload = values.tobytes()
  _write_varint(inner, len(payload))
  inner.extend(payload)
  out = bytearray()
  _write_len_delimited(out, 2, bytes(inner))
  return bytes(out)


def int64_feature(values):
  """values: list of ints -> Feature proto (Int64List packed varint)."""
  values = np.asarray(values, np.int64).reshape(-1)
  payload = bytearray()
  for v in values:
    _write_varint(payload, int(v) & 0xFFFFFFFFFFFFFFFF)
  inner = bytearray()
  _write_varint(inner, _tag(1, 2))
  _write_varint(inner, len(payload))
  inner.extend(payload)
  out = bytearray()
  _write_len_delimited(out, 3, bytes(inner))
  return bytes(out)


def encode_example(features):
  """features: {name: encoded Feature bytes} -> Example proto bytes."""
  fmap = bytearray()
  for name, feat in sorted(features.items()):
    entry = bytearray()
    _write_len_delimited(entry, 1, name.encode('utf8'))
    _write_len_delimited(entry, 2, feat)
    _write_len_delimited(fmap, 1, bytes(entry))
  out = bytearray()
  _write_len_delimited(out, 1, bytes(fmap))
  return bytes(out)


def _parse_feature(buf):
  """Feature proto bytes -> (kind, value) with kind in {bytes,float,int64}."""
  pos = 0
  while pos < len(buf):
    tag, pos = _read_varint(buf, pos)
    field, wire = tag >> 3, tag & 7
    ln, pos = _read_varint(buf, pos)
    payload = buf[pos:pos + ln]
    pos += ln
    if field == 1:   # BytesList
      vals, p = [], 0
      while p < len(payload):
        t, p = _read_varint(payload, p)
        l2, p = _read_varint(payload, p)
        vals.append(bytes(payload[p:p + l2]))
        p += l2
      return 'bytes', vals
    if field == 2:   # FloatList
      p = 0
      vals = []
      while p < len(payload):
        t, p = _read_varint(payload, p)
        if t & 7 == 2:    # packed
          l2, p = _read_varint(payload, p)
          vals.append(np.frombuffer(payload[p:p + l2], np.float32))
          p += l2
        else:             # unpacked fixed32
          vals.append(np.frombuffer(payload[p:p + 4], np.float32))
          p += 4
      return 'float', (np.concatenate(vals) if vals
                       else np.zeros(0, np.float32))
    if field == 3:   # Int64List
      p = 0
      vals = []
      while p < len(payload):
        t, p = _read_varint(payload, p)
        if t & 7 == 2:
          l2, p = _read_varint(payload, p)
          end = p + l2
          while p < end:
            v, p = _read_varint(payload, p)
            vals.append(np.int64(np.uint64(v).astype(np.int64)))
        else:
          v, p = _read_varint(payload, p)
          vals.append(np.int64(np.uint64(v).astype(np.int64)))
      return 'int64', np.array(vals, np.int64)
  return 'bytes', []


def decode_example(buf):
  """Example proto bytes -> {name: value} (bytes list / float / int64 arr)."""
  out = {}
  pos = 0
  buf = memoryview(buf)
  while pos < len(buf):
    tag, pos = _read_varint(buf, pos)
    ln, pos = _read_varint(buf, pos)
    if tag >> 3 == 1:  # features
      fpos = 0
      fbuf = buf[pos:pos + ln]
      while fpos < len(fbuf):
        t2, fpos = _read_varint(fbuf, fpos)
        l2, fpos = _read_varint(fbuf, fpos)
        entry = fbuf[fpos:fpos + l2]
        fpos += l2
        # Map entry: key (1), value (2).
        epos = 0
        key = None
        val = None
        while epos < len(entry):
          t3, epos = _read_varint(entry, epos)
          l3, epos = _read_varint(entry, epos)
          if t3 >> 3 == 1:
            key = bytes(entry[epos:epos + l3]).decode('utf8')
          else:
            val = entry[epos:epos + l3]
          epos += l3
        if key is not None and val is not None:
          out[key] = _parse_feature(bytes(val))
    pos += ln
  return out


# --- TFRecord files -----------------------------------------------------------

class RecordWriter:
  def __init__(self, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    self._f = open(path, 'wb')

  def write(self, record):
    header = struct.pack('<Q', len(record))
    self._f.write(header)
    self._f.write(struct.pack('<I', masked_crc(header)))
    self._f.write(record)
    self._f.write(struct.pack('<I', masked_crc(record)))

  def close(self):
    self._f.close()

  def __enter__(self):
    return self

  def __exit__(self, *a):
    self.close()


def read_records(path, verify_crc=False):
  """Yields raw record bytes from a TFRecord file."""
  with open(path, 'rb') as f:
    while True:
      header = f.read(8)
      if len(header) < 8:
        return
      length = struct.unpack('<Q', header)[0]
      lcrc = f.read(4)
      data = f.read(length)
      dcrc = f.read(4)
      if len(data) < length:
        return
      if verify_crc:
        if struct.unpack('<I', lcrc)[0] != masked_crc(header):
          raise IOError('Corrupt TFRecord length CRC')
        if struct.unpack('<I', dcrc)[0] != masked_crc(data):
          raise IOError('Corrupt TFRecord data CRC')
      yield data


def read_record_index(path):
  """Byte offsets of every record in a TFRecord file (one cheap header
  scan; no payload reads). Enables index-based global shuffling — a full
  permutation of the dataset per epoch instead of a bounded shuffle
  buffer — with O(num_records) memory."""
  offsets = []
  with open(path, 'rb') as f:
    pos = 0
    while True:
      f.seek(pos)
      header = f.read(8)
      if len(header) < 8:
        return offsets
      offsets.append(pos)
      length = struct.unpack('<Q', header)[0]
      pos += 8 + 4 + length + 4


def read_record_at(f, offset):
  """Reads one record from an open file handle at a given index offset."""
  f.seek(offset)
  header = f.read(8)
  length = struct.unpack('<Q', header)[0]
  f.seek(4, 1)  # skip length crc
  return f.read(length)


# --- Example list files (epos_lib/tfrecord.py:11-26) --------------------------

def save_example_list(path, examples):
  """examples: list of (scene_id, im_id) -> text lines 'scene_id im_id'."""
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  with open(path, 'w') as f:
    for scene_id, im_id in examples:
      f.write(f'{scene_id} {im_id}\n')


def load_example_list(path):
  out = []
  with open(path, 'r') as f:
    for line in f:
      if line.strip():
        s, i = line.split()
        out.append((int(s), int(i)))
  return out
