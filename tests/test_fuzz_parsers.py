"""Adversarial-input robustness for every wire/container parser.

Production ingest means hostile bytes: each parser must either return a
result or raise its own controlled error type — never IndexError /
struct.error / MemoryError / an infinite loop.  The reference gets this
for free from Swift's bounds-checked `Data` (a bad index traps instead
of corrupting); here the contract is made explicit and enforced.

Three generators per parser: pure random bytes, truncations of valid
messages, and single-byte mutations of valid messages.
"""

import struct

import numpy as np
import pytest

from swiftvideo_tpu.codec import bitstream, containers
from swiftvideo_tpu.codec.ffmpeg_subprocess import (avcc_to_annexb,
                                                    parse_adts_frames,
                                                    split_annexb)
from swiftvideo_tpu.media import wire
from swiftvideo_tpu.net import flavor
from swiftvideo_tpu.net.rtmp import amf
from swiftvideo_tpu.net.rtmp.chunks import (Chunk, ChunkDeserializer,
                                            ChunkSerializer)

RNG = np.random.default_rng(0xF022)

# Error types a parser is ALLOWED to raise on bad input.  ValueError
# covers ordinary validation (and UnicodeDecodeError is a subclass);
# each protocol adds its own domain error.
ALLOWED = (ValueError, amf.AmfError, flavor.FlavorError, KeyError,
           EOFError)


def _rand(n: int) -> bytes:
    return RNG.integers(0, 256, n, np.int64).astype(np.uint8).tobytes()


def _mutations(valid: bytes, n: int = 40):
    """Truncations and single-byte mutations of a valid message."""
    for cut in range(0, min(len(valid), 24)):
        yield valid[:cut]
    for _ in range(n):
        pos = int(RNG.integers(0, len(valid)))
        b = bytearray(valid)
        b[pos] ^= int(RNG.integers(1, 256))
        yield bytes(b)


def _survives(fn, blobs):
    for blob in blobs:
        try:
            fn(blob)
        except ALLOWED:
            pass
    # reaching here without an unexpected exception type is the assertion


def test_amf_parse_garbage():
    valid = amf.serialize(["connect", 1.0, {"app": "live", "ok": True},
                           None, [1.0, "x"]])
    assert amf.parse(valid)[0] == "connect"
    _survives(amf.parse, _mutations(valid))
    _survives(amf.parse, (_rand(n) for n in (0, 1, 2, 7, 64, 1024)))
    # declared length past the buffer end must raise, not yield truncated
    # garbage: long string (marker 0x0C) and date (0x0B, 8+2 bytes)
    for hostile in (b"\x0c\xff\xff\xff\xff" + b"ten bytes!",
                    b"\x0b" + b"\x00" * 9):
        with pytest.raises(amf.AmfError):
            amf.parse(hostile)
    # hostile nesting must surface as AmfError, never RecursionError
    # (which escapes the session handlers): strict-arrays-of-strict-arrays
    # and objects-of-objects thousands deep
    deep_arrays = b"\x0a\x00\x00\x00\x01" * 2000
    deep_objects = (b"\x08\x00\x00\x00\x01\x00\x01k" * 2000)
    for hostile in (deep_arrays, deep_objects):
        with pytest.raises(amf.AmfError):
            amf.parse(hostile)
    # ...while legitimate shallow nesting still parses
    nested = {"a": {"b": {"c": [1.0, {"d": "e"}]}}}
    assert amf.parse(amf.serialize([nested]))[0] == nested


def test_rtmp_chunk_deserializer_garbage():
    ser = ChunkSerializer()
    data = _rand(300)
    valid = ser.serialize(Chunk(msg_stream_id=1, msg_length=len(data),
                                msg_type=9, chunk_stream_id=6,
                                timestamp=1234, data=data))

    def run(blob):
        d = ChunkDeserializer()
        d.feed(blob)
        d.feed(blob[len(blob) // 2:])      # incremental second half too

    _survives(run, _mutations(valid))
    _survives(run, (_rand(n) for n in (1, 3, 12, 128, 4096)))


def test_rtmp_chunk_huge_declared_length_bounded():
    """A chunk header declaring a giant message length must not
    preallocate/accumulate unboundedly from a few input bytes."""
    d = ChunkDeserializer()
    # fmt0, csid 3, ts 0, msg length 0xFFFFFF, type 9, stream 1
    hdr = bytes([0x03]) + b"\x00\x00\x00" + b"\xff\xff\xff" + b"\x09" \
        + struct.pack("<I", 1)
    out = d.feed(hdr + b"\x00" * 64)
    assert out == []                       # waiting for more, no crash


def test_flavor_atoms_garbage():
    valid = flavor.serialize_atom("moov", flavor.atom_dict({
        "trak": flavor.atom_list([flavor.atom_in32(5)]),
        "name": flavor.atom_utf8("x"),
    }))

    def run(blob):
        for tag, body in flavor.parse_atoms(blob):
            flavor.decode_value(tag, body)

    # the valid message must round-trip through the same path
    (tag, moov_body), = flavor.parse_atoms(valid)
    assert tag == "moov"
    (dtag, dbody), = flavor.parse_atoms(moov_body)
    assert flavor.decode_value(dtag, dbody)["name"] == "x"

    _survives(run, _mutations(valid))
    _survives(run, (_rand(n) for n in (0, 3, 8, 100, 2048)))


def test_flavor_trak_garbage():
    t = flavor.TrackInfo(fourcc="avc1", stream_id=1, track_id=3,
                         time_base=30000, uses_dts=True)
    # parse_trak takes the atom BODY (the framing layer strips headers)
    tag, valid = next(iter(flavor.parse_atoms(flavor.serialize_trak(t))))
    assert tag == "trak" and flavor.parse_trak(valid).track_id == 3
    _survives(flavor.parse_trak, _mutations(valid))
    _survives(flavor.parse_trak, (_rand(n) for n in (0, 4, 16, 256)))


def test_wire_sample_garbage():
    from swiftvideo_tpu.core import TimePoint
    from swiftvideo_tpu.media import (CodedMediaSample, MediaFormat,
                                      MediaType)
    sample = CodedMediaSample(
        buffer=_rand(64), pts_value=TimePoint(1, 30),
        dts_value=TimePoint(1, 30), media_type=MediaType.video,
        media_format=MediaFormat.avc, id_asset="a", id_workspace="w",
        side={"config": _rand(16)})
    valid = wire.serialize(sample)
    assert wire.deserialize(valid).data() == sample.data()
    _survives(wire.deserialize, _mutations(valid))
    _survives(wire.deserialize, (_rand(n) for n in (0, 2, 9, 333)))


def test_containers_garbage():
    ivf = (containers.ivf_header("vp8", 64, 48)
           + containers.ivf_frame(b"\x01" * 9, 0))
    _survives(containers.parse_ivf, _mutations(ivf))
    _survives(containers.parse_ivf, (_rand(n) for n in (0, 5, 40, 500)))

    w = containers.OggOpusWriter(2)
    ogg = w.header() + w.page(b"\xfc\x00\x01")

    def run_ogg(blob):
        r = containers.OggPacketReader()
        r.feed(blob)
        r.packets()

    _survives(run_ogg, _mutations(ogg))
    _survives(run_ogg, (_rand(n) for n in (1, 27, 100, 4000)))

    y4m = containers.make_y4m_header(16, 8) + b"FRAME\n" + b"\x00" * 192

    def run_y4m(blob):
        r = containers.Y4MReader()
        r.feed(blob)

    _survives(run_y4m, _mutations(y4m))
    _survives(run_y4m, (_rand(n) for n in (0, 9, 80)))

    _survives(containers.parse_opus_head, (_rand(n) for n in (0, 8, 19)))
    _survives(containers.params_from_hvcc, (_rand(n) for n in (0, 22, 90)))


def test_config_records_truncated():
    """Config records that PASS the magic/version checks but truncate or
    mutate mid-structure (random bytes almost never reach those paths:
    the version byte gates them) — network-facing parsers must raise
    controlled errors, not IndexError/struct.error."""
    from swiftvideo_tpu.codec.ffmpeg_subprocess import (make_avcdcr,
                                                        sps_pps_from_avcdcr)
    hvcc = containers.make_hvcc(b"\x40\x01" + _rand(12),
                                b"\x42\x01" + _rand(20),
                                b"\x44\x01" + _rand(4))
    _survives(containers.params_from_hvcc,
              (hvcc[:cut] for cut in range(len(hvcc))))
    _survives(containers.params_from_hvcc, _mutations(hvcc))

    avcdcr = make_avcdcr(b"\x67" + _rand(15), b"\x68" + _rand(3))
    _survives(sps_pps_from_avcdcr,
              (avcdcr[:cut] for cut in range(len(avcdcr))))
    _survives(sps_pps_from_avcdcr, _mutations(avcdcr))

    head = containers.make_opus_head(2)
    _survives(containers.parse_opus_head,
              (head[:cut] for cut in range(len(head))))
    _survives(containers.parse_opus_head, _mutations(head))


def test_bitstream_parsers_garbage():
    _survives(bitstream.h264_sps_frame_size,
              (_rand(n) for n in (0, 1, 4, 20, 64)))
    _survives(bitstream.h265_sps_frame_size,
              (_rand(n) for n in (0, 1, 2, 8, 24, 80)))
    _survives(bitstream.vp8_frame_size, (_rand(10) for _ in range(30)))
    _survives(bitstream.vp9_frame_size, (_rand(12) for _ in range(30)))
    _survives(bitstream.aac_parse_asc, (_rand(n) for n in (0, 1, 2, 5)))
    from tests.test_containers import make_av1_seq_obu
    _survives(bitstream.av1_frame_size, (_rand(n) for n in (0, 1, 2, 8, 24)))
    _survives(bitstream.av1_frame_size,
              _mutations(make_av1_seq_obu(1920, 1080)))
    _survives(bitstream.av1_is_keyframe, (_rand(12) for _ in range(30)))


def test_rtmp_ex_header_media_garbage():
    """Enhanced-RTMP ex-header media handlers fed hostile payloads:
    truncated fourCCs, bogus packet types, short hvc1 cts fields."""
    from swiftvideo_tpu.core import StepClock, TimePoint
    from swiftvideo_tpu.net.rtmp.chunks import Chunk
    from swiftvideo_tpu.net.rtmp.session import RtmpSessionCore

    sess = RtmpSessionCore(is_server=True, asset_id="fuzz",
                           clock=StepClock(TimePoint(16, 1000)))
    payloads = [b"\x80", b"\x90", b"\x81hvc", b"\x81hvc1",
                b"\x81hvc1\x00", b"\x81hvc1\x00\x00",
                b"\x8fhvc1" + _rand(8), b"\x91Opus", b"\x90Opus",
                b"\x81vp09", b"\x83vp09" + _rand(4),
                b"\x80av01" + _rand(30)]
    payloads += [bytes([0x80 | i]) + _rand(12) for i in range(16)]
    for data in payloads:
        for mtype in (0x8, 0x9):
            chunk = Chunk(msg_stream_id=1, msg_length=len(data),
                          msg_type=mtype, chunk_stream_id=6, timestamp=0,
                          timestamp_delta=0, data=data)
            try:
                sess._handle_chunk(chunk)
            except ALLOWED:
                pass


def test_adts_annexb_garbage():
    _survives(parse_adts_frames, (_rand(n) for n in (0, 2, 7, 100, 900)))
    _survives(split_annexb, (_rand(n) for n in (0, 3, 50, 700)))
    _survives(avcc_to_annexb, (_rand(n) for n in (0, 3, 50, 700)))
    # declared NAL length far beyond the buffer must not allocate/loop
    assert avcc_to_annexb(b"\x7f\xff\xff\xff" + b"ab") == b""


def test_rtmp_session_handshake_garbage():
    """A server session fed random bytes instead of C0C1 must error or
    wait — never crash with an internal exception."""
    from swiftvideo_tpu.net.rtmp.session import RtmpSessionCore

    for blob in (_rand(1), _rand(1537), _rand(3073), b"\x06" + _rand(1536)):
        sess = RtmpSessionCore(is_server=True, asset_id="fuzz")
        try:
            sess.feed(blob)
        except ALLOWED:
            pass


def test_proto_wire_garbage():
    from swiftvideo_tpu import proto

    if not proto.available():
        pytest.skip("protobuf runtime unavailable")

    def run(blob):
        msg = proto.pb().CodedMediaSampleWire()
        try:
            msg.ParseFromString(blob)
        except Exception:  # noqa: BLE001 — protobuf DecodeError family
            return
        proto.coded_sample_from_pb(msg)

    _survives(run, (_rand(n) for n in (0, 4, 33, 256)))
