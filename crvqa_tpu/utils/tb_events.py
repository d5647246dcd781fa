"""Dependency-free TensorBoard event-file writer (scalars only).

The reference logs through `torch.utils.tensorboard.SummaryWriter`
(`mask_trainer_Robust_VQA.py:51-65, 273-276, 785-799`). The JSONL
MetricsWriter stays the primary sink; this emitter produces real
`events.out.tfevents.*` files readable by stock TensorBoard, without
importing tensorboard/tensorflow: the Event/Summary protobufs and the
TFRecord framing (length + masked CRC32C) are hand-encoded below. Scalar
values only — exactly the surface the reference uses (tb_writer.add_scalar).
"""
from __future__ import annotations

import os
import socket
import struct
import time
from typing import Optional

# ---------------------------------------------------------------- crc32c ---

_CRC_TABLE = []


def _crc_table() -> list:
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reversed
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- protobuf encoding --


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def _float(field: int, v: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", v)


def _int64(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)


def _bytes(field: int, v: bytes) -> bytes:
    return _key(field, 2) + _varint(len(v)) + v


def _scalar_event(wall_time: float, step: int, tag: str, value: float) -> bytes:
    # Summary.Value { tag = 1 (string); simple_value = 2 (float) }
    val = _bytes(1, tag.encode()) + _float(2, float(value))
    summary = _bytes(1, val)  # Summary { repeated Value value = 1 }
    # Event { wall_time = 1 (double); step = 2 (int64); summary = 5 }
    return _double(1, wall_time) + _int64(2, int(step)) + _bytes(5, summary)


def _version_event(wall_time: float) -> bytes:
    # Event { wall_time = 1; file_version = 3 (string) }
    return _double(1, wall_time) + _bytes(3, b"brain.Event:2")


def _tfrecord(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


# --------------------------------------------------------------- writer ----


class TBEventWriter:
    """Minimal `SummaryWriter` analogue: `add_scalar(tag, value, step)` into
    a TensorBoard-readable event file. Process-0-gated like every artifact
    writer in this repo (no-op on other processes)."""

    def __init__(self, logdir: str):
        import jax

        self._fh = None
        if jax.process_index() != 0:
            return
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s.%d" % (
            int(time.time()), socket.gethostname(), os.getpid())
        self.path = os.path.join(logdir, fname)
        self._fh = open(self.path, "ab")
        self._fh.write(_tfrecord(_version_event(time.time())))
        self._fh.flush()

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: Optional[float] = None) -> None:
        if self._fh is None:
            return
        self._fh.write(_tfrecord(_scalar_event(
            wall_time if wall_time is not None else time.time(),
            step, tag, value)))

    def flush(self) -> None:
        if self._fh is not None:
            self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.flush()
            self._fh.close()
            self._fh = None
