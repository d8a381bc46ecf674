"""RTMP chunk-stream (de)serialization.

Reference semantics: ``/root/reference/Sources/SwiftVideo/rtmp/serialize.swift``
and ``deserialize.swift``:

* header type selection — type 3 for same-length/type/delta repeats, type 1
  on length/type change, type 2 on delta change, type 0 otherwise; forced
  type 0 on rollover, backwards time, msgStreamId change, chunk stream 3,
  or 2 s since the last type 0 (serialize.swift:92-129).
* serial-number timestamp arithmetic (RFC1982-style) so uint32 rollover
  reconstructs monotonically increasing absolute timestamps
  (deserialize.swift:92-101).
* extended timestamps (>= 0xFFFFFF) in headers and type-3 continuations.
* payload re-chunking every ``out_chunk_size`` bytes with type-3 headers
  (serialize.swift:149-177).
* incremental parsing with per-chunk-stream partial message assembly
  (deserialize.swift:24-49).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Tuple

DEFAULT_CHUNK_SIZE = 128


@dataclass(frozen=True)
class Chunk:
    """One RTMP message in flight (rtmp.swift:860-903)."""

    msg_stream_id: int
    msg_length: int
    msg_type: int
    chunk_stream_id: int
    timestamp: int          # absolute, rollover-extended (ms)
    timestamp_delta: int = 0
    extended: bool = False
    data: bytes = b""

    def changing(self, **kw) -> "Chunk":
        return replace(self, **kw)


def _be24(val: int) -> bytes:
    return bytes([(val >> 16) & 0xFF, (val >> 8) & 0xFF, val & 0xFF])


def _basic_header(csid: int, fmt: int) -> bytes:
    if csid < 64:
        return bytes([(csid & 0x3F) | ((fmt & 0x3) << 6)])
    if csid < 256 + 64:
        return bytes([(fmt & 0x3) << 6, csid - 64])
    return bytes([((fmt & 0x3) << 6) | 1]) + struct.pack("<H", csid & 0xFFFF)


class ChunkSerializer:
    """Stateful writer for one connection direction."""

    def __init__(self, out_chunk_size: int = DEFAULT_CHUNK_SIZE):
        self.out_chunk_size = out_chunk_size
        self._prev: Dict[int, Chunk] = {}
        self._last_chunk0: Dict[int, int] = {}

    def set_chunk_size(self, size: int) -> None:
        self.out_chunk_size = size

    # --- header type selection (serialize.swift:92-129) -------------------
    def serialize(self, chunk: Chunk) -> bytes:
        prev = self._prev.get(chunk.chunk_stream_id)
        serial_cur = chunk.timestamp % 0xFFFFFFFF
        rollover = False
        if prev is not None:
            serial_prev = prev.timestamp % 0xFFFFFFFF
            rollover = serial_prev > serial_cur and \
                (serial_prev - serial_cur) > 0x7FFFFFFF
        last0 = self._last_chunk0.get(chunk.chunk_stream_id)
        if (prev is not None and last0 is not None and not rollover
                and chunk.timestamp < last0 + 2000
                and chunk.timestamp > prev.timestamp
                and chunk.timestamp - prev.timestamp < 0x7FFFFFFF
                and prev.msg_stream_id == chunk.msg_stream_id
                and chunk.chunk_stream_id != 3):
            if (chunk.msg_length == prev.msg_length
                    and chunk.msg_type == prev.msg_type
                    and chunk.timestamp_delta == prev.timestamp_delta
                    and chunk.timestamp_delta > 0
                    and chunk.msg_length < self.out_chunk_size):
                return self._chunk3(chunk)
            if (chunk.msg_length != prev.msg_length
                    or chunk.msg_type != prev.msg_type
                    or prev.timestamp_delta == 0):
                return self._chunk1(chunk)
            if prev.timestamp_delta != chunk.timestamp_delta:
                return self._chunk2(chunk)
            return self._chunk0(chunk)
        return self._chunk0(chunk)

    # --- payload re-chunking (serialize.swift:149-177) --------------------
    def _chunk_payload(self, chunk: Chunk, header: bytes, ts_field: int,
                       use_extended: bool) -> bytes:
        cont = _basic_header(chunk.chunk_stream_id, 3)
        if use_extended:
            cont += struct.pack(">I", ts_field)
        out = [header]
        data = chunk.data
        pos = 0
        while True:
            size = min(self.out_chunk_size, len(data) - pos)
            out.append(data[pos:pos + size])
            pos += size
            if pos >= len(data):
                break
            out.append(cont)
        return b"".join(out)

    def _store(self, chunk: Chunk, is0: bool) -> None:
        self._prev[chunk.chunk_stream_id] = chunk.changing(data=b"")
        if is0:
            self._last_chunk0[chunk.chunk_stream_id] = chunk.timestamp

    def _ts_parts(self, value: int) -> Tuple[bytes, int, bool]:
        serial = value % 0xFFFFFFFF
        if serial >= 0xFFFFFF:
            return _be24(0xFFFFFF), serial, True
        return _be24(serial), serial, False

    def _chunk0(self, chunk: Chunk) -> bytes:
        ts3, ts_full, ext = self._ts_parts(chunk.timestamp)
        header = (_basic_header(chunk.chunk_stream_id, 0) + ts3
                  + _be24(chunk.msg_length) + bytes([chunk.msg_type])
                  + struct.pack("<I", chunk.msg_stream_id & 0xFFFFFFFF))
        if ext:
            header += struct.pack(">I", ts_full)
        # store the delta as the receiver now knows it: a type-0 header
        # resets it to 0, so the next message must carry an explicit delta
        # (type 1/2) before type-3 continuation becomes legal
        self._store(chunk.changing(extended=ext, timestamp_delta=0), True)
        return self._chunk_payload(chunk, header, ts_full, ext)

    def _chunk1(self, chunk: Chunk) -> bytes:
        ts3, ts_full, ext = self._ts_parts(chunk.timestamp_delta)
        header = (_basic_header(chunk.chunk_stream_id, 1) + ts3
                  + _be24(chunk.msg_length) + bytes([chunk.msg_type]))
        if ext:
            header += struct.pack(">I", ts_full)
        self._store(chunk.changing(extended=ext), False)
        return self._chunk_payload(chunk, header, ts_full, ext)

    def _chunk2(self, chunk: Chunk) -> bytes:
        ts3, ts_full, ext = self._ts_parts(chunk.timestamp_delta)
        header = _basic_header(chunk.chunk_stream_id, 2) + ts3
        if ext:
            header += struct.pack(">I", ts_full)
        self._store(chunk.changing(extended=ext), False)
        return self._chunk_payload(chunk, header, ts_full, ext)

    def _chunk3(self, chunk: Chunk) -> bytes:
        prev = self._prev[chunk.chunk_stream_id]
        ext = prev.extended
        header = _basic_header(chunk.chunk_stream_id, 3)
        ts_full = chunk.timestamp % 0xFFFFFFFF
        if ext:
            header += struct.pack(">I", ts_full)
        self._store(chunk.changing(extended=ext), False)
        return self._chunk_payload(chunk, header, ts_full, ext)


class ChunkDeserializer:
    """Incremental parser with per-chunk-stream partial assembly."""

    def __init__(self, in_chunk_size: int = DEFAULT_CHUNK_SIZE):
        self.in_chunk_size = in_chunk_size
        self._partial: Dict[int, Chunk] = {}
        self._buffer = b""

    def set_chunk_size(self, size: int) -> None:
        self.in_chunk_size = size

    def feed(self, data: bytes) -> List[Chunk]:
        """Append bytes; return every completed message chunk.

        NOTE: when a consumer reacts to control messages that change parse
        state (set-chunk-size), use ``append`` + ``poll`` instead so the
        state change applies before the next message is parsed
        (rtmp.swift Deserialize interleaves parse and handle, :633-659).
        """
        self.append(data)
        out: List[Chunk] = []
        while True:
            chunk = self.poll()
            if chunk is None:
                break
            out.append(chunk)
        return out

    def append(self, data: bytes) -> None:
        self._buffer += data

    def poll(self) -> Optional[Chunk]:
        """Parse and return the next complete message, or None."""
        while True:
            chunk, consumed = self._try_parse(self._buffer)
            if consumed == 0:
                return None
            self._buffer = self._buffer[consumed:]
            if chunk is not None:
                return chunk

    # returns (complete_chunk_or_None, bytes_consumed); consumed==0 => wait
    def _try_parse(self, buf: bytes) -> Tuple[Optional[Chunk], int]:
        if not buf:
            return None, 0
        fmt = (buf[0] & 0xC0) >> 6
        csid = buf[0] & 0x3F
        pos = 1
        if csid == 0:
            if len(buf) < 2:
                return None, 0
            csid = buf[1] + 64
            pos = 2
        elif csid == 1:
            if len(buf) < 3:
                return None, 0
            csid = struct.unpack_from("<H", buf, 1)[0]
            pos = 3
        prev = self._partial.get(csid)
        parser = [self._chunk0, self._chunk1, self._chunk2, self._chunk3][fmt]
        result = parser(buf, pos, csid, prev)
        if result is None:
            return None, 0
        chunk, consumed = result
        if chunk.data is not None and len(chunk.data) == chunk.msg_length:
            # complete: store header state with empty data for continuations
            self._partial[csid] = chunk.changing(data=b"")
            return chunk, consumed
        self._partial[csid] = chunk
        return None, consumed

    @staticmethod
    def _read_ts(buf: bytes, pos: int, need: int):
        """Read be24 ts field + optional extended. Returns (ts, pos) or None."""
        if len(buf) < pos + need:
            return None
        ts = (buf[pos] << 16) | (buf[pos + 1] << 8) | buf[pos + 2]
        if ts == 0xFFFFFF:
            if len(buf) < pos + need + 4:
                return None
            full = struct.unpack_from(">I", buf, pos + need)[0]
            return full, need + 4, True
        return ts, need, False

    def _chunk0(self, buf, pos, csid, prev):
        if len(buf) < pos + 11:
            return None
        r = self._read_ts(buf, pos, 11)
        if r is None:
            return None
        serial_ts, hdr_len, ext = r
        length = (buf[pos + 3] << 16) | (buf[pos + 4] << 8) | buf[pos + 5]
        msg_type = buf[pos + 6]
        msid = struct.unpack_from("<I", buf, pos + 7)[0]
        body_pos = pos + hdr_len
        take = min(length, self.in_chunk_size)
        if len(buf) < body_pos + take:
            return None
        # RFC1982 serial arithmetic (deserialize.swift:92-101)
        if prev is not None:
            prev_serial = prev.timestamp % 0xFFFFFFFF
            if prev_serial > serial_ts and (prev_serial - serial_ts) > 0x7FFFFFFF:
                timestamp = prev.timestamp + serial_ts + (0xFFFFFFFF - prev_serial)
            else:
                timestamp = prev.timestamp + (serial_ts - prev_serial)
        else:
            timestamp = serial_ts
        chunk = Chunk(msg_stream_id=msid, msg_length=length, msg_type=msg_type,
                      chunk_stream_id=csid, timestamp=timestamp,
                      timestamp_delta=0, extended=serial_ts >= 0xFFFFFF,
                      data=buf[body_pos:body_pos + take])
        return chunk, body_pos + take

    def _chunk1(self, buf, pos, csid, prev):
        if prev is None or len(buf) < pos + 7:
            return None
        r = self._read_ts(buf, pos, 7)
        if r is None:
            return None
        delta, hdr_len, ext = r
        length = (buf[pos + 3] << 16) | (buf[pos + 4] << 8) | buf[pos + 5]
        msg_type = buf[pos + 6]
        body_pos = pos + hdr_len
        take = min(length, self.in_chunk_size)
        if len(buf) < body_pos + take:
            return None
        chunk = prev.changing(msg_length=length, msg_type=msg_type,
                              timestamp=prev.timestamp + delta,
                              timestamp_delta=delta,
                              extended=delta >= 0xFFFFFF,
                              data=prev.data + buf[body_pos:body_pos + take])
        return chunk, body_pos + take

    def _chunk2(self, buf, pos, csid, prev):
        if prev is None or len(buf) < pos + 3:
            return None
        r = self._read_ts(buf, pos, 3)
        if r is None:
            return None
        delta, hdr_len, ext = r
        body_pos = pos + hdr_len
        take = min(prev.msg_length, self.in_chunk_size)
        if len(buf) < body_pos + take:
            return None
        chunk = prev.changing(timestamp=prev.timestamp + delta,
                              timestamp_delta=delta,
                              extended=delta >= 0xFFFFFF,
                              data=prev.data + buf[body_pos:body_pos + take])
        return chunk, body_pos + take

    def _chunk3(self, buf, pos, csid, prev):
        if prev is None:
            return None
        body_pos = pos + (4 if prev.extended else 0)
        already = len(prev.data)
        take = min(prev.msg_length - already, self.in_chunk_size)
        if len(buf) < body_pos + take:
            return None
        continuation = already > 0
        timestamp = prev.timestamp if continuation else \
            prev.timestamp + prev.timestamp_delta
        chunk = prev.changing(timestamp=timestamp,
                              data=prev.data + buf[body_pos:body_pos + take])
        return chunk, body_pos + take
