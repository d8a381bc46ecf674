"""Subprocess-FFmpeg codec backend (gated on an ``ffmpeg`` binary).

Role parity with the reference's SwiftFFmpeg-backed codecs
(``dec/enc.video.ffmpeg.swift``, ``dec/enc.audio.ffmpeg.swift``) for
deployments that ship an ffmpeg binary (this image does not; the framing
helpers below are unit-tested regardless, the process plumbing is exercised
only where ffmpeg exists).

Design: one persistent ffmpeg process per codec instance with a stdout
reader thread (pipes would deadlock otherwise).  Bitstream framing:

* H.264 decode: AVCC samples convert to Annex B with SPS/PPS from the
  AVCDecoderConfigurationRecord prepended on keyframes; output is rawvideo
  yuv420p at dimensions parsed from the SPS (codec.bitstream); a pts ring
  restores timestamps across the decoder delay (enc.video.ffmpeg.swift:92-93
  uses the same trick).
* H.264 encode: libx264 with the reference's low-latency operating point
  (enc.video.ffmpeg.swift:240-265) + forced access-unit delimiters so the
  output splits into samples without a full parser.
* AAC: ADTS framing in/out (self-describing 7-byte headers).
"""

from __future__ import annotations

import shutil
import struct
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

from ..core import EventBox, EventError, TimePoint, Tx
from ..media.coded import CodedMediaSample, MediaFormat, MediaType
from ..media.picture import ImageBuffer, PictureSample
from ..media.pixel import BufferType, PixelFormat, planes_for_format


def ffmpeg_path() -> Optional[str]:
    return shutil.which("ffmpeg")


# --- bitstream framing helpers (pure, unit-tested) -------------------------

def avcc_to_annexb(data: bytes, length_size: int = 4) -> bytes:
    """Length-prefixed NALs -> start-code NALs."""
    out = bytearray()
    pos = 0
    while pos + length_size <= len(data):
        n = int.from_bytes(data[pos:pos + length_size], "big")
        pos += length_size
        if n <= 0 or pos + n > len(data):
            break
        out += b"\x00\x00\x00\x01" + data[pos:pos + n]
        pos += n
    return bytes(out)


def annexb_to_avcc(data: bytes, length_size: int = 4) -> bytes:
    """Start-code NALs -> length-prefixed NALs."""
    out = bytearray()
    for nal in split_annexb(data):
        out += len(nal).to_bytes(length_size, "big") + nal
    return bytes(out)


def split_annexb(data: bytes) -> List[bytes]:
    """Split an Annex B stream into NAL payloads (no start codes)."""
    nals = []
    i = 0
    n = len(data)
    start = None
    while i + 3 <= n:
        if data[i:i + 3] == b"\x00\x00\x01":
            if start is not None:
                end = i
                while end > start and data[end - 1] == 0:
                    end -= 1
                nals.append(data[start:end])
            i += 3
            start = i
        else:
            i += 1
    if start is not None:
        nals.append(data[start:])
    return nals


def sps_pps_from_avcdcr(record: bytes) -> Tuple[List[bytes], List[bytes]]:
    """Parameter sets from an AVCDecoderConfigurationRecord (ISO 14496-15)."""
    if len(record) < 7:
        raise ValueError("short AVCDCR")
    pos = 5
    num_sps = record[pos] & 0x1F
    pos += 1
    sps = []
    for _ in range(num_sps):
        n = struct.unpack_from(">H", record, pos)[0]
        pos += 2
        sps.append(record[pos:pos + n])
        pos += n
    num_pps = record[pos]
    pos += 1
    pps = []
    for _ in range(num_pps):
        n = struct.unpack_from(">H", record, pos)[0]
        pos += 2
        pps.append(record[pos:pos + n])
        pos += n
    return sps, pps


def make_avcdcr(sps: bytes, pps: bytes) -> bytes:
    """Build an AVCDecoderConfigurationRecord from one SPS + PPS
    (enc.video.ffmpeg.swift:267-297)."""
    return (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)


_ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350]


def parse_adts_frames(data: bytes) -> Tuple[List[bytes], bytes]:
    """Split a byte stream into complete ADTS frames; returns
    (frames_with_headers, remainder)."""
    frames = []
    pos = 0
    while pos + 7 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xF0) != 0xF0:
            pos += 1
            continue
        length = ((data[pos + 3] & 0x03) << 11) | (data[pos + 4] << 3) | \
            (data[pos + 5] >> 5)
        if length < 7 or pos + length > len(data):
            break
        frames.append(data[pos:pos + length])
        pos += length
    return frames, data[pos:]


def adts_payload(frame: bytes) -> bytes:
    """Strip the 7- or 9-byte ADTS header."""
    protection_absent = frame[1] & 1
    header = 7 if protection_absent else 9
    return frame[header:]


def adts_header(sample_rate: int, channels: int, payload_len: int,
                profile: int = 1) -> bytes:
    """7-byte ADTS header (no CRC)."""
    idx = _ADTS_RATES.index(sample_rate)
    length = payload_len + 7
    return bytes([
        0xFF, 0xF1,
        ((profile & 3) << 6) | ((idx & 0xF) << 2) | ((channels >> 2) & 1),
        ((channels & 3) << 6) | ((length >> 11) & 3),
        (length >> 3) & 0xFF,
        ((length & 7) << 5) | 0x1F,
        0xFC,
    ])


# --- persistent ffmpeg process ---------------------------------------------

class _PipeProcess:
    """ffmpeg with a stdout reader thread."""

    def __init__(self, args: List[str]):
        exe = ffmpeg_path()
        if exe is None:
            raise RuntimeError("ffmpeg binary not available")
        self.proc = subprocess.Popen(
            [exe, "-hide_banner", "-loglevel", "error"] + args,
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL)
        self._buf = bytearray()
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._reader, daemon=True)
        self._thread.start()

    def _reader(self) -> None:
        while True:
            chunk = self.proc.stdout.read(65536)
            if not chunk:
                return
            with self._lock:
                self._buf += chunk

    def write(self, data: bytes) -> None:
        self.proc.stdin.write(data)
        self.proc.stdin.flush()

    def take(self, n: Optional[int] = None) -> bytes:
        with self._lock:
            if n is None or len(self._buf) >= (n or 0):
                out = bytes(self._buf if n is None else self._buf[:n])
                del self._buf[:len(out)]
                return out
            return b""

    def pending(self) -> int:
        with self._lock:
            return len(self._buf)

    def close(self) -> None:
        try:
            self.proc.stdin.close()
        except Exception:
            pass
        self.proc.terminate()


class FFmpegVideoDecoder(Tx):
    """Tx[CodedMediaSample, PictureSample] for AVC/HEVC via a persistent
    ffmpeg rawvideo pipe (dec.video.ffmpeg.swift role)."""

    _FORMATS = {MediaFormat.avc: "h264", MediaFormat.hevc: "hevc"}

    def __init__(self):
        self._proc: Optional[_PipeProcess] = None
        self._size: Optional[Tuple[int, int]] = None
        self._pts_queue: List[TimePoint] = []
        self._meta: Optional[CodedMediaSample] = None
        super().__init__(self._impl)

    def _ensure(self, sample: CodedMediaSample) -> None:
        if self._proc is not None:
            return
        if ffmpeg_path() is None:
            raise RuntimeError("ffmpeg binary not available")
        from . import bitstream
        fmt = self._FORMATS[sample.media_format]
        config = sample.side_data().get("config", b"")
        sps_list, pps_list = sps_pps_from_avcdcr(config)
        w, h = bitstream.h264_sps_frame_size(sps_list[0])
        self._size = (w, h)
        self._proc = _PipeProcess([
            "-f", fmt, "-i", "pipe:0",
            "-f", "rawvideo", "-pix_fmt", "yuv420p", "pipe:1"])
        header = b"".join(b"\x00\x00\x00\x01" + n
                          for n in sps_list + pps_list)
        self._proc.write(header)

    def _impl(self, sample: CodedMediaSample) -> EventBox:
        if sample.media_format not in self._FORMATS:
            return EventBox.nothing(sample.info())
        try:
            self._ensure(sample)
        except Exception as exc:  # noqa: BLE001
            return EventBox.error(EventError("ffmpeg.dec", -1, str(exc)))
        self._meta = sample
        self._pts_queue.append(sample.pts())
        self._proc.write(avcc_to_annexb(sample.data()))
        w, h = self._size
        frame_bytes = w * h * 3 // 2
        data = self._proc.take(frame_bytes)
        if not data:
            return EventBox.nothing(sample.info())
        y = np.frombuffer(data, np.uint8, w * h).reshape(h, w).copy()
        u = np.frombuffer(data, np.uint8, w * h // 4, w * h
                          ).reshape(h // 2, w // 2).copy()
        v = np.frombuffer(data, np.uint8, w * h // 4, w * h * 5 // 4
                          ).reshape(h // 2, w // 2).copy()
        img = ImageBuffer(PixelFormat.y420p, BufferType.cpu, (w, h),
                          tuple(planes_for_format(PixelFormat.y420p, (w, h))),
                          (y, u, v))
        pts = self._pts_queue.pop(0) if self._pts_queue else sample.pts()
        return EventBox.just(PictureSample(
            img, sample.asset_id(), sample.workspace_id(),
            time_point=sample.time(), pts_value=pts,
            event_info=sample.info()))

    def close(self) -> None:
        if self._proc is not None:
            self._proc.close()


class FFmpegVideoEncoder(Tx):
    """Tx[PictureSample, CodedMediaSample] via libx264 with the reference's
    low-latency settings (enc.video.ffmpeg.swift:240-265)."""

    def __init__(self, bitrate: int = 3_000_000, fps: int = 30,
                 keyframe_interval_s: float = 2.0):
        self._proc: Optional[_PipeProcess] = None
        self._size: Optional[Tuple[int, int]] = None
        self.bitrate = bitrate
        self.fps = fps
        self.keyint = max(1, int(round(keyframe_interval_s * fps)))
        self._pts_queue: List[TimePoint] = []
        self._config: Optional[bytes] = None
        self._carry = b""
        super().__init__(self._impl)

    def _ensure(self, sample: PictureSample) -> None:
        if self._proc is not None:
            return
        if ffmpeg_path() is None:
            raise RuntimeError("ffmpeg binary not available")
        w, h = sample.size()
        self._size = (w, h)
        x264 = (f"keyint={self.keyint}:min-keyint={self.keyint}:"
                "scenecut=0:bframes=0:rc-lookahead=0:sync-lookahead=0:"
                "sliced-threads:slices=4:aud=1")
        self._proc = _PipeProcess([
            "-f", "rawvideo", "-pix_fmt", "yuv420p", "-s", f"{w}x{h}",
            "-r", str(self.fps), "-i", "pipe:0",
            "-c:v", "libx264", "-preset", "veryfast", "-tune", "zerolatency",
            "-b:v", str(self.bitrate), "-x264-params", x264,
            "-f", "h264", "pipe:1"])

    def _impl(self, sample: PictureSample) -> EventBox:
        if sample.pixel_format() != PixelFormat.y420p:
            return EventBox.error(EventError("ffmpeg.enc", -2,
                                             "encoder wants y420p"))
        try:
            self._ensure(sample)
        except Exception as exc:  # noqa: BLE001
            return EventBox.error(EventError("ffmpeg.enc", -1, str(exc)))
        self._pts_queue.append(sample.pts())
        for plane in sample.planes():
            self._proc.write(np.ascontiguousarray(np.asarray(plane)).tobytes())
        self._carry += self._proc.take()
        # split on access-unit delimiters (NAL type 9, forced via aud=1)
        nals = split_annexb(self._carry)
        if not nals:
            return EventBox.nothing(sample.info())
        units: List[List[bytes]] = []
        for nal in nals:
            if nal and (nal[0] & 0x1F) == 9:
                units.append([])
            elif units:
                units[-1].append(nal)
        if len(units) <= 1:
            return EventBox.nothing(sample.info())
        complete, self._carry = units[:-1], b"".join(
            b"\x00\x00\x00\x01" + n for n in ([b"\x09\xf0"] + units[-1]))
        out = []
        for unit in complete:
            sps = next((n for n in unit if (n[0] & 0x1F) == 7), None)
            pps = next((n for n in unit if (n[0] & 0x1F) == 8), None)
            if sps is not None and pps is not None:
                self._config = make_avcdcr(sps, pps)
            payload = annexb_to_avcc(b"".join(
                b"\x00\x00\x00\x01" + n for n in unit
                if (n[0] & 0x1F) not in (7, 8)))
            if not payload or self._config is None:
                continue
            pts = self._pts_queue.pop(0) if self._pts_queue else sample.pts()
            out.append(CodedMediaSample(
                buffer=payload, pts_value=pts, dts_value=pts,
                media_type=MediaType.video, media_format=MediaFormat.avc,
                id_asset=sample.asset_id(),
                id_workspace=sample.workspace_id(),
                time_point=sample.time(), side={"config": self._config},
                event_info=sample.info()))
        if not out:
            return EventBox.nothing(sample.info())
        return EventBox.just(out)

    def close(self) -> None:
        if self._proc is not None:
            self._proc.close()
