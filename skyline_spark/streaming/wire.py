"""Wire-format parity for the ingest bridges (SURVEY §2.4).

The reference's Horizon listener speaks two formats the round-2 bridges
stood in with newline-JSON:

- TCP: Graphite-style length-prefixed pickle frames — a 4-byte ``!I``
  big-endian length header followed by a pickle payload holding a list of
  metric tuples, deserialized through a restricted unpickler
  (`horizon/listen.py:110-227`; the SafeUnpickler allowlist pattern is
  Carbon's public one).
- UDP: one MessagePack-encoded metric per datagram
  (`horizon/listen.py:229-264`).

This module implements both formats with the standard library only:
:class:`SafeUnpickler` (a ``pickle.Unpickler`` with a module/name
allowlist — plain tuples/lists/str/float need no ``find_class`` at all, so
legitimate metric payloads decode while any object-constructing pickle is
rejected), the frame codec (:func:`pack_frames` / :func:`iter_frames` /
:func:`read_frames_from_socket` with the reference's read-until-n-or-close
semantics), and a msgpack codec (:func:`msgpack_packb` /
:func:`msgpack_unpackb`) covering the spec subset metric datagrams use —
nil/bool/int/float64/str/bin/array/map. The msgpack library is not
available in this environment; the format is the public msgpack.org spec,
and the codec is validated against fixed byte vectors in
tests/test_wire.py.

Page rows ride the wire as ``(url, warc_ts_epoch_seconds, text, lang)``
tuples — the page-table analog of the reference's ``(metric, (ts, value))``
— and :func:`rows_to_json_lines` normalizes decoded tuples into the
newline-JSON the existing staging-file readers already consume
(`streaming/ingest.py` TCP_WIRE_SCHEMA).
"""

from __future__ import annotations

import io
import json
import pickle
import struct
from datetime import datetime, timezone
from typing import Iterable, Iterator

__all__ = [
    "SafeUnpickler",
    "pack_frames",
    "iter_frames",
    "read_all",
    "read_frames_from_socket",
    "msgpack_packb",
    "msgpack_unpackb",
    "rows_to_json_lines",
]


class SafeUnpickler(pickle.Unpickler):
    """Restricted unpickler — the Carbon/Graphite allowlist pattern the
    reference vendors (`horizon/listen.py:64-107`).

    Metric payloads (lists/tuples of str/int/float) never call
    ``find_class``; anything that does must name an allowlisted
    (module, name) pair, so ``os.system``-style gadget pickles raise
    ``UnpicklingError`` instead of executing.
    """

    # py2 spellings kept alongside py3 so frames from legacy Graphite
    # relays (protocol ≤ 2) still decode
    PICKLE_SAFE = {
        "copy_reg": {"_reconstructor"},
        "copyreg": {"_reconstructor"},
        "__builtin__": {"object"},
        "builtins": {"object"},
    }

    def find_class(self, module, name):  # noqa: D102 — contract above
        allowed = self.PICKLE_SAFE.get(module)
        if allowed is None:
            raise pickle.UnpicklingError(
                f"Attempting to unpickle unsafe module {module}"
            )
        if name not in allowed:
            raise pickle.UnpicklingError(
                f"Attempting to unpickle unsafe class {module}.{name}"
            )
        import importlib

        return getattr(importlib.import_module(module), name)

    @classmethod
    def loads(cls, data: bytes):
        return cls(io.BytesIO(data)).load()


_LEN = struct.Struct("!I")


def pack_frames(batches: Iterable[list]) -> bytes:
    """Length-prefixed pickle frames, one per batch — the Graphite
    pickle-receiver wire format the reference consumes."""
    out = bytearray()
    for batch in batches:
        payload = pickle.dumps(batch, protocol=2)
        out += _LEN.pack(len(payload))
        out += payload
    return bytes(out)


def iter_frames(data: bytes) -> Iterator[list]:
    """Decode consecutive frames from a byte buffer; a truncated tail ends
    iteration (the reference's read_all-returns-short break,
    `listen.py:143-160`); a poisoned frame raises UnpicklingError."""
    pos = 0
    while pos + 4 <= len(data):
        (n,) = _LEN.unpack_from(data, pos)
        if pos + 4 + n > len(data):
            break
        yield SafeUnpickler.loads(data[pos + 4 : pos + 4 + n])
        pos += 4 + n


def read_all(sock, n: int) -> bytes:
    """Read exactly n bytes from a stream socket, short on close —
    `horizon/listen.py:141-160` semantics."""
    buf = bytearray()
    while n > 0:
        chunk = sock.recv(n)
        if not chunk:
            break
        buf += chunk
        n -= len(chunk)
    return bytes(buf)


def read_frames_from_socket(sock) -> Iterator[list]:
    """Yield unpickled frames from a connected socket until it closes."""
    while True:
        header = read_all(sock, 4)
        if len(header) < 4:
            return
        (n,) = _LEN.unpack(header)
        body = read_all(sock, n)
        if len(body) < n:
            return
        yield SafeUnpickler.loads(body)


# ---------------------------------------------------------------------------
# MessagePack codec — the metric-datagram subset of the public spec
# ---------------------------------------------------------------------------


def msgpack_packb(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(0x100 + obj)
        elif 0 <= obj <= 0xFF:
            out += struct.pack("!BB", 0xCC, obj)
        elif 0 <= obj <= 0xFFFF:
            out += struct.pack("!BH", 0xCD, obj)
        elif 0 <= obj <= 0xFFFFFFFF:
            out += struct.pack("!BI", 0xCE, obj)
        elif 0 <= obj:
            out += struct.pack("!BQ", 0xCF, obj)
        elif -0x80 <= obj:
            out += struct.pack("!Bb", 0xD0, obj)
        elif -0x8000 <= obj:
            out += struct.pack("!Bh", 0xD1, obj)
        elif -0x80000000 <= obj:
            out += struct.pack("!Bi", 0xD2, obj)
        else:
            out += struct.pack("!Bq", 0xD3, obj)
    elif isinstance(obj, float):
        out += struct.pack("!Bd", 0xCB, obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) <= 31:
            out.append(0xA0 | len(b))
        elif len(b) <= 0xFF:
            out += struct.pack("!BB", 0xD9, len(b))
        elif len(b) <= 0xFFFF:
            out += struct.pack("!BH", 0xDA, len(b))
        else:
            out += struct.pack("!BI", 0xDB, len(b))
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        if len(obj) <= 0xFF:
            out += struct.pack("!BB", 0xC4, len(obj))
        elif len(obj) <= 0xFFFF:
            out += struct.pack("!BH", 0xC5, len(obj))
        else:
            out += struct.pack("!BI", 0xC6, len(obj))
        out += obj
    elif isinstance(obj, (list, tuple)):
        if len(obj) <= 15:
            out.append(0x90 | len(obj))
        elif len(obj) <= 0xFFFF:
            out += struct.pack("!BH", 0xDC, len(obj))
        else:
            out += struct.pack("!BI", 0xDD, len(obj))
        for item in obj:
            _pack(item, out)
    elif isinstance(obj, dict):
        if len(obj) <= 15:
            out.append(0x80 | len(obj))
        elif len(obj) <= 0xFFFF:
            out += struct.pack("!BH", 0xDE, len(obj))
        else:
            out += struct.pack("!BI", 0xDF, len(obj))
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"msgpack_packb: unsupported type {type(obj).__name__}")


def msgpack_unpackb(data: bytes):
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"msgpack_unpackb: {len(data) - pos} trailing bytes")
    return obj


def _unpack(mv: memoryview, pos: int):
    b = mv[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        return bytes(mv[pos : pos + n]).decode("utf-8"), pos + n
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_seq(mv, pos, b & 0x0F)
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(mv, pos, b & 0x0F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xCC, 0xCD, 0xCE, 0xCF, 0xD0, 0xD1, 0xD2, 0xD3):
        fmt, size = {
            0xCC: ("!B", 1), 0xCD: ("!H", 2), 0xCE: ("!I", 4), 0xCF: ("!Q", 8),
            0xD0: ("!b", 1), 0xD1: ("!h", 2), 0xD2: ("!i", 4), 0xD3: ("!q", 8),
        }[b]
        return struct.unpack_from(fmt, mv, pos)[0], pos + size
    if b == 0xCA:
        return struct.unpack_from("!f", mv, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from("!d", mv, pos)[0], pos + 8
    if b in (0xD9, 0xDA, 0xDB):
        size = {0xD9: 1, 0xDA: 2, 0xDB: 4}[b]
        fmt = {1: "!B", 2: "!H", 4: "!I"}[size]
        n = struct.unpack_from(fmt, mv, pos)[0]
        pos += size
        return bytes(mv[pos : pos + n]).decode("utf-8"), pos + n
    if b in (0xC4, 0xC5, 0xC6):
        size = {0xC4: 1, 0xC5: 2, 0xC6: 4}[b]
        fmt = {1: "!B", 2: "!H", 4: "!I"}[size]
        n = struct.unpack_from(fmt, mv, pos)[0]
        pos += size
        return bytes(mv[pos : pos + n]), pos + n
    if b in (0xDC, 0xDD):
        size = {0xDC: 2, 0xDD: 4}[b]
        fmt = {2: "!H", 4: "!I"}[size]
        n = struct.unpack_from(fmt, mv, pos)[0]
        return _unpack_seq(mv, pos + size, n)
    if b in (0xDE, 0xDF):
        size = {0xDE: 2, 0xDF: 4}[b]
        fmt = {2: "!H", 4: "!I"}[size]
        n = struct.unpack_from(fmt, mv, pos)[0]
        return _unpack_map(mv, pos + size, n)
    raise ValueError(f"msgpack_unpackb: unsupported type byte 0x{b:02x}")


def _unpack_seq(mv: memoryview, pos: int, n: int):
    items = []
    for _ in range(n):
        item, pos = _unpack(mv, pos)
        items.append(item)
    return items, pos


def _unpack_map(mv: memoryview, pos: int, n: int):
    d = {}
    for _ in range(n):
        k, pos = _unpack(mv, pos)
        v, pos = _unpack(mv, pos)
        d[k] = v
    return d, pos


# ---------------------------------------------------------------------------
# wire tuples → staging JSON lines
# ---------------------------------------------------------------------------


def rows_to_json_lines(rows: Iterable) -> list[bytes]:
    """Normalize decoded wire tuples ``(url, warc_ts_epoch_seconds, text,
    lang)`` to the newline-JSON rows the staging-file readers parse with
    TCP_WIRE_SCHEMA. Malformed tuples are dropped — the reference's
    try/except-continue per datapoint (`listen.py:243-255`)."""
    lines: list[bytes] = []
    for row in rows:
        try:
            url, ts, text, lang = row
            if not isinstance(url, str):
                continue
            ts_str = datetime.fromtimestamp(float(ts), tz=timezone.utc).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            lines.append(
                json.dumps(
                    {"url": url, "warc_ts": ts_str, "text": text, "lang": lang},
                    ensure_ascii=True,
                ).encode("utf-8")
            )
        except (TypeError, ValueError, OverflowError):
            continue
    return lines
