"""Gorilla time-series compression: delta-of-delta timestamps + XOR'd
doubles, packed into a single binary blob per rollup chunk.

Format follows the public Gorilla paper (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015, §4.1):

  header : n_points (uint32 LE) | t0 (int64 LE)
  time   : first delta as varint-bucket, then delta-of-delta per point:
             '0'                    → dod == 0
             '10'  + 7  bits (zigzag) → dod in [-63, 64)
             '110' + 9  bits          → dod in [-255, 256)
             '1110'+ 12 bits          → dod in [-2047, 2048)
             '1111'+ 64 bits          → raw
  value  : first value raw 64 bits, then XOR with previous:
             '0'            → xor == 0
             '10'           → meaningful bits fit the previous
                              (leading, length) window → write `length` bits
             '11' + 6 bits leading + 6 bits length → write `length` bits

Encode/decode run inside Arrow-batched pandas UDFs, one blob per
(key, chunk) group — each group is bounded (e.g. 1440 points per
source-day at the 1m tier), so the per-point Python bit loop stays off the
raw-data path and scales with the number of rollup windows, not raw rows.

The reference has no compression anywhere (TODS holds pandas frames in RAM);
this is net-new engine capability required by the north star.
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining > 0:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_series(ts: np.ndarray, values: np.ndarray) -> bytes:
    """Pack (int64 timestamps, float64 values) — must be time-sorted."""
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    head = np.uint32(n).tobytes() + (ts[0].tobytes() if n else b"")
    if n == 0:
        return head
    w = _BitWriter()
    # --- timestamps: first delta raw-64, then DoD buckets for points 2..n-1
    deltas = np.diff(ts)
    if n > 1:
        w.write(_zigzag(int(deltas[0])), 64)
    for i in range(1, len(deltas)):
        dod = int(deltas[i]) - int(deltas[i - 1])
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod < 64:
            w.write(0b10, 2)
            w.write(_zigzag(dod) & 0x7F, 7)
        elif -255 <= dod < 256:
            w.write(0b110, 3)
            w.write(_zigzag(dod) & 0x1FF, 9)
        elif -2047 <= dod < 2048:
            w.write(0b1110, 4)
            w.write(_zigzag(dod) & 0xFFF, 12)
        else:
            w.write(0b1111, 4)
            w.write(_zigzag(dod) & _MASK64, 64)
    # --- values
    bits = vals.view(np.uint64)
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_len = 65, 0  # invalid window forces '11' first time
    for i in range(1, n):
        cur = int(bits[i])
        xor = prev ^ cur
        if xor == 0:
            w.write(0, 1)
        else:
            lead = 64 - xor.bit_length()
            trail = (xor & -xor).bit_length() - 1
            if lead > 31:
                lead = 31
            length = 64 - lead - trail
            if prev_len and lead >= prev_lead and (64 - prev_lead - prev_len) <= trail:
                w.write(0b10, 2)
                w.write(xor >> (64 - prev_lead - prev_len), prev_len)
            else:
                w.write(0b11, 2)
                w.write(lead, 6)
                w.write(length & 0x3F, 6)  # length 64 encodes as 0
                w.write(xor >> trail, length)
                prev_lead, prev_len = lead, length
        prev = cur
    return head + w.getvalue()


def decode_series(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    n = int(np.frombuffer(blob[:4], np.uint32)[0])
    if n == 0:
        return np.array([], np.int64), np.array([], np.float64)
    t0 = int(np.frombuffer(blob[4:12], np.int64)[0])
    r = _BitReader(blob[12:])
    ts = np.empty(n, np.int64)
    ts[0] = t0
    if n > 1:
        delta = _unzigzag(r.read(64))
        ts[1] = t0 + delta
        for i in range(2, n):
            tag = r.read(1)
            if tag == 0:
                dod = 0
            else:
                tag = (tag << 1) | r.read(1)
                if tag == 0b10:
                    dod = _unzigzag(r.read(7))
                else:
                    tag = (tag << 1) | r.read(1)
                    if tag == 0b110:
                        dod = _unzigzag(r.read(9))
                    else:
                        tag = (tag << 1) | r.read(1)
                        if tag == 0b1110:
                            dod = _unzigzag(r.read(12))
                        else:
                            dod = _unzigzag(r.read(64))
            delta += dod
            ts[i] = ts[i - 1] + delta
    vals = np.empty(n, np.uint64)
    prev = r.read(64)
    vals[0] = prev
    lead, length = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            vals[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            xor = r.read(length) << (64 - lead - length)
        else:  # '11' new window
            lead = r.read(6)
            length = r.read(6) or 64  # 0 means 64
            xor = r.read(length)
            trail = 64 - lead - length
            xor <<= trail
        prev ^= xor
        vals[i] = prev
    return ts, vals.view(np.float64)
