"""Container/framing codecs for the subprocess FFmpeg backend.

Pure bytes-level tests (no ffmpeg binary needed): IVF, Ogg/Opus, Y4M,
hvcC, VP8/VP9 frame-size parsing, ASC build, annex-b trailing zeros,
and the list-lifting `flat` combinator.
"""

import numpy as np
import pytest

from swiftvideo_tpu.codec import bitstream, containers
from swiftvideo_tpu.codec.ffmpeg_subprocess import (annexb_to_avcc,
                                                    avcc_to_annexb,
                                                    split_annexb)
from swiftvideo_tpu.codec.transcode import flat
from swiftvideo_tpu.core import EventBox, Tx


# --- IVF ---------------------------------------------------------------------

def test_ivf_roundtrip_incremental():
    payloads = [bytes([i]) * (10 + i) for i in range(5)]
    stream = containers.ivf_header("vp9", 640, 360, n_frames=5)
    for i, p in enumerate(payloads):
        stream += containers.ivf_frame(p, i)
    # feed in awkward chunk sizes
    got, rem, header = [], b"", None
    for pos in range(0, len(stream), 7):
        rem += stream[pos:pos + 7]
        h, frames, rem = containers.parse_ivf(rem)
        header = h or header
        got.extend(frames)
    assert header["width"] == 640 and header["height"] == 360
    assert header["codec"] == b"VP90"
    assert [p for _, p in got] == payloads
    assert [t for t, _ in got] == list(range(5))
    assert rem == b""


# --- Ogg ----------------------------------------------------------------------

def test_ogg_page_roundtrip_with_long_packets():
    pkts = [b"a" * 10, b"b" * 600, b"c" * 510]  # 510 = 2*255: 0-lacing case
    pages = b"".join(
        containers.ogg_page([p], serial=7, seq=i, granule=i * 960)
        for i, p in enumerate(pkts))
    reader = containers.OggPacketReader()
    for pos in range(0, len(pages), 13):
        reader.feed(pages[pos:pos + 13])
    got = reader.packets()
    assert [p for p, _ in got] == pkts
    assert [g for _, g in got] == [0, 960, 1920]


def test_ogg_corrupt_page_resync():
    good1 = containers.ogg_page([b"one"], serial=1, seq=0, granule=0)
    bad = bytearray(containers.ogg_page([b"two"], serial=1, seq=1, granule=1))
    bad[30] ^= 0xFF  # corrupt body -> CRC mismatch
    good2 = containers.ogg_page([b"three"], serial=1, seq=2, granule=2)
    reader = containers.OggPacketReader()
    reader.feed(good1 + bytes(bad) + good2)
    assert [p for p, _ in reader.packets()] == [b"one", b"three"]


def test_opus_head_roundtrip():
    head = containers.make_opus_head(2, pre_skip=312)
    info = containers.parse_opus_head(head)
    assert info["channels"] == 2
    assert info["pre_skip"] == 312
    assert info["input_rate"] == 48000


def test_ogg_opus_writer_stream():
    w = containers.OggOpusWriter(2)
    stream = w.page(b"\xfc\xff\xfe") + w.page(b"\xfc\x01\x02")
    reader = containers.OggPacketReader()
    reader.feed(stream)
    pkts = [p for p, _ in reader.packets()]
    assert pkts[0][:8] == b"OpusHead"
    assert pkts[1][:8] == b"OpusTags"
    assert pkts[2:] == [b"\xfc\xff\xfe", b"\xfc\x01\x02"]


# --- Y4M ----------------------------------------------------------------------

def test_y4m_reader_incremental():
    w, h = 32, 16
    frames = [bytes([i]) * (w * h * 3 // 2) for i in range(3)]
    stream = containers.make_y4m_header(w, h)
    for f in frames:
        stream += b"FRAME\n" + f
    reader = containers.Y4MReader()
    got = []
    for pos in range(0, len(stream), 11):
        got.extend(reader.feed(stream[pos:pos + 11]))
    assert reader.width == w and reader.height == h
    assert reader.pix_fmt == "y420p"
    assert got == frames


def test_y4m_frame_params_tolerated():
    w, h = 8, 4
    frame = bytes(w * h * 3 // 2)
    stream = (b"YUV4MPEG2 W8 H4 F30:1 Ip A1:1 C420mpeg2\n"
              + b"FRAME Xsome=param\n" + frame)
    reader = containers.Y4MReader()
    assert reader.feed(stream) == [frame]
    assert reader.fps == (30, 1)


def test_y4m_reader_fps_token():
    """The 'F' rate token paces file emission (a 24/60 fps file must not
    play on a 30 fps timeline)."""
    stream = (b"YUV4MPEG2 W8 H4 F24000:1001 Ip A1:1 C420jpeg\n"
              + b"FRAME\n" + bytes(8 * 4 * 3 // 2))
    reader = containers.Y4MReader()
    reader.feed(stream)
    assert reader.fps == (24000, 1001)


def test_y4m_frame_to_planes_helper():
    w, h = 8, 4
    data = bytes(range(w * h)) + bytes([7]) * (w * h // 4) \
        + bytes([9]) * (w * h // 4)
    y, u, v = containers.y4m_frame_to_planes(data, w, h)
    assert y.shape == (h, w) and y[0, 3] == 3
    assert u.shape == (h // 2, w // 2) and int(u[0, 0]) == 7
    assert v.shape == (h // 2, w // 2) and int(v[1, 1]) == 9


# --- hvcC ----------------------------------------------------------------------

def test_hvcc_roundtrip():
    vps = b"\x40\x01" + bytes(range(10))
    sps = b"\x42\x01" + bytes(range(20))
    pps = b"\x44\x01" + bytes(range(4))
    rec = containers.make_hvcc(vps, sps, pps)
    params = containers.params_from_hvcc(rec)
    assert params[32] == [vps]
    assert params[33] == [sps]
    assert params[34] == [pps]
    # lengthSizeMinusOne must say 4-byte lengths
    assert (rec[21] & 0x3) == 3


# --- VP8/VP9 frame sizes --------------------------------------------------------

def test_vp8_frame_size():
    frame = bytes([0x10, 0x00, 0x00, 0x9D, 0x01, 0x2A,
                   640 & 0xFF, 640 >> 8, 360 & 0xFF, 360 >> 8]) + b"\x00" * 8
    assert bitstream.vp8_frame_size(frame) == (640, 360)
    with pytest.raises(ValueError):
        bitstream.vp8_frame_size(bytes([0x11]) + frame[1:])  # interframe


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in reversed(range(n)):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        out = bytearray()
        bits = self.bits + [0] * (-len(self.bits) % 8)
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def make_vp9_keyframe(w, h, *, color_space=3, full_range=0):
    """Minimal profile-0 VP9 keyframe uncompressed header (spec §6.2)."""
    bw = _BitWriter()
    bw.put(2, 2)        # frame marker
    bw.put(0, 1)        # profile low
    bw.put(0, 1)        # profile high
    bw.put(0, 1)        # show_existing_frame
    bw.put(0, 1)        # frame_type = KEY
    bw.put(1, 1)        # show_frame
    bw.put(0, 1)        # error_resilient
    bw.put(0x498342, 24)  # sync code
    bw.put(color_space, 3)
    bw.put(full_range, 1)  # color_range
    bw.put(w - 1, 16)
    bw.put(h - 1, 16)
    return bw.bytes()


def test_vp9_frame_size():
    assert bitstream.vp9_frame_size(make_vp9_keyframe(1280, 720)) \
        == (1280, 720)


def test_vp9_keyframe_info():
    info = bitstream.vp9_keyframe_info(
        make_vp9_keyframe(640, 360, color_space=1, full_range=0))
    assert info == {"profile": 0, "bit_depth": 8, "subsampling_x": 1,
                    "subsampling_y": 1, "full_range": 0, "color_space": 1,
                    "width": 640, "height": 360}


def test_vpcc_record_roundtrip():
    rec = containers.make_vpcc(make_vp9_keyframe(1920, 1080, color_space=1))
    got = containers.parse_vpcc(rec)
    assert got["profile"] == 0 and got["bit_depth"] == 8
    assert got["chroma_subsampling"] == 1           # 4:2:0 colocated
    assert got["level"] == 40                       # 1920*1080 fits level 4.0
    assert (got["colour_primaries"], got["transfer_characteristics"],
            got["matrix_coefficients"]) == (6, 6, 6)   # BT.601
    assert got["codec_initialization_data"] == b""
    # VP9 Annex A level boundaries + CICP (spec §7.2.2 color_space)
    got2 = containers.parse_vpcc(containers.make_vpcc(
        make_vp9_keyframe(352, 288, color_space=5)))    # CS_BT_2020
    assert got2["level"] == 20                          # 101376 <= 122880
    assert (got2["colour_primaries"], got2["transfer_characteristics"],
            got2["matrix_coefficients"]) == (9, 14, 9)
    assert containers.parse_vpcc(containers.make_vpcc(
        make_vp9_keyframe(640, 360)))["level"] == 21    # 230400 <= 245760
    with pytest.raises(ValueError):
        containers.parse_vpcc(rec[:4])
    with pytest.raises(ValueError):                 # inter frame: no header
        containers.make_vpcc(b"\x84" + b"\x00" * 12)


def make_av1_seq_obu(w, h, *, reduced=False, wbits=11, hbits=11):
    """Build a sequence-header OBU (type 1, has_size) per AV1 §5.5.1."""
    bw = _BitWriter()
    bw.put(0, 3)            # seq_profile
    bw.put(0, 1)            # still_picture
    bw.put(1 if reduced else 0, 1)   # reduced_still_picture_header
    if reduced:
        bw.put(0, 5)        # seq_level_idx[0]
    else:
        bw.put(0, 1)        # timing_info_present_flag
        bw.put(1, 1)        # initial_display_delay_present_flag
        bw.put(0, 5)        # operating_points_cnt_minus_1
        bw.put(0, 12)       # operating_point_idc[0]
        bw.put(8, 5)        # seq_level_idx[0] (>7 -> tier bit)
        bw.put(0, 1)        # seq_tier[0]
        bw.put(1, 1)        # initial_display_delay_present_for_this_op
        bw.put(3, 4)        # initial_display_delay_minus_1
    bw.put(wbits - 1, 4)    # frame_width_bits_minus_1
    bw.put(hbits - 1, 4)    # frame_height_bits_minus_1
    bw.put(w - 1, wbits)
    bw.put(h - 1, hbits)
    payload = bw.bytes()
    assert len(payload) < 128          # single-byte leb128
    return bytes([0x0A, len(payload)]) + payload


def test_av1_frame_size():
    # full (non-reduced) header with an inter-frame OBU appended
    frame_obu = bytes([0x32, 0x03]) + b"xyz"       # OBU_FRAME, 3 bytes
    tu = make_av1_seq_obu(1920, 1080) + frame_obu
    assert bitstream.av1_frame_size(tu) == (1920, 1080)
    # reduced_still_picture_header path + 16-bit size fields
    tu = make_av1_seq_obu(640, 360, reduced=True, wbits=16, hbits=16)
    assert bitstream.av1_frame_size(tu) == (640, 360)
    # seq header NOT first: temporal delimiter (type 2, empty) leads
    td = bytes([0x12, 0x00])
    assert bitstream.av1_frame_size(
        td + make_av1_seq_obu(320, 240)) == (320, 240)
    with pytest.raises(ValueError):
        bitstream.av1_frame_size(frame_obu)        # no seq header
    with pytest.raises(ValueError):
        bitstream.av1_frame_size(bytes([0x0A, 0x40]))  # truncated OBU


def test_av1_leb128():
    assert bitstream.leb128(b"\x05", 0) == (5, 1)
    assert bitstream.leb128(b"\x80\x02", 0) == (256, 2)
    with pytest.raises(ValueError):
        bitstream.leb128(b"\x80", 0)               # truncated
    with pytest.raises(ValueError):
        bitstream.leb128(b"\xff" * 9, 0)           # too long


def av1_frame_obu(first_byte, *, header_only=False):
    """OBU_FRAME (6) or OBU_FRAME_HEADER (3) with a chosen first
    payload byte (show_existing_frame f(1), frame_type f(2), ...)."""
    obu_type = 3 if header_only else 6
    payload = bytes([first_byte]) + b"xy"
    return bytes([(obu_type << 3) | 0x02, len(payload)]) + payload


def test_av1_keyframe_detection():
    from swiftvideo_tpu.codec.bitstream import av1_is_keyframe
    td = bytes([0x12, 0x00])
    seq = make_av1_seq_obu(64, 64)
    key = av1_frame_obu(0x00)        # show_existing=0, frame_type=KEY
    inter = av1_frame_obu(0x20)      # frame_type=INTER
    shown = av1_frame_obu(0x80)      # show_existing_frame=1
    assert av1_is_keyframe(seq + key)
    assert not av1_is_keyframe(td + inter)                # inter TU
    # repeat-headers stream: seq header on EVERY TU must not flag the
    # inter frames as keyframes (a bare presence check did)
    assert not av1_is_keyframe(seq + inter)
    assert not av1_is_keyframe(seq + shown)
    assert av1_is_keyframe(td + av1_frame_obu(0x00, header_only=True))
    # reduced_still_picture_header streams are keyframes by definition
    assert av1_is_keyframe(make_av1_seq_obu(64, 64, reduced=True) + b"\x01")
    assert not av1_is_keyframe(b"\x80bogus")       # forbidden bit
    # seq header seen before the bytes go bad: still a RAP
    assert av1_is_keyframe(seq + b"\x80garbage")


def test_av1c_record_roundtrip():
    tu = make_av1_seq_obu(1920, 1080) + av1_frame_obu(0x00)
    rec = containers.make_av1c(tu)
    got = containers.parse_av1c(rec)
    assert got["profile"] == 0 and got["level"] == 8 and got["tier"] == 0
    assert (got["chroma_subsampling_x"], got["chroma_subsampling_y"]) \
        == (1, 1)
    assert got["high_bitdepth"] == 0 and got["monochrome"] == 0
    # configOBUs carries the sequence header verbatim and re-parses
    assert got["config_obus"] == make_av1_seq_obu(1920, 1080)
    assert bitstream.av1_frame_size(got["config_obus"]) == (1920, 1080)
    with pytest.raises(ValueError):
        containers.parse_av1c(b"\x01\x00\x00\x00")   # bad marker
    with pytest.raises(ValueError):                  # inter TU: no header
        containers.make_av1c(av1_frame_obu(0x20))


# --- ASC -------------------------------------------------------------------------

def test_make_asc_roundtrip():
    asc = bitstream.make_asc(48000, 2)
    channels, rate, spf = bitstream.aac_parse_asc(asc)
    assert (channels, rate, spf) == (2, 48000, 1024)
    asc = bitstream.make_asc(44100, 1)
    channels, rate, _ = bitstream.aac_parse_asc(asc)
    assert (channels, rate) == (1, 44100)


# --- annex-b trailing zeros -------------------------------------------------------

def test_split_annexb_preserves_payload_zeros():
    # NAL payload legitimately ends in zeros (cabac_zero_words)
    nal1 = b"\x65\x11\x22\x00\x00"
    nal2 = b"\x41\x33"
    # 4-byte start code before nal2: exactly ONE zero is the lead-in
    stream = b"\x00\x00\x01" + nal1 + b"\x00" + b"\x00\x00\x01" + nal2
    assert split_annexb(stream) == [nal1, nal2]
    # avcc -> annexb -> avcc keeps payload bytes intact
    avcc = (len(nal1).to_bytes(4, "big") + nal1
            + len(nal2).to_bytes(4, "big") + nal2)
    assert annexb_to_avcc(avcc_to_annexb(avcc)) == avcc


# --- flat combinator ---------------------------------------------------------------

def test_flat_combinator():
    double = Tx(lambda v: EventBox.just(v * 2))
    assert flat(double)(3).value() == 6
    assert flat(double)([1, 2, 3]).value() == [2, 4, 6]
    expand = Tx(lambda v: EventBox.just([v, v + 10]))
    assert flat(expand)([1, 2]).value() == [1, 11, 2, 12]
    err = Tx(lambda v: EventBox.error(None))
    assert flat(err)([1]).is_error()
    skip = Tx(lambda v: EventBox.nothing(None))
    assert flat(skip)([1, 2]).is_nothing()


def test_ogg_multi_packet_page_granule_on_last_only():
    """The page granule position belongs to the LAST packet completed on
    the page; earlier packets report -1 so granule-delta consumers can
    divide the page duration instead of charging it all to the first."""
    page = containers.ogg_page([b"p0", b"p1", b"p2"], serial=3, seq=0,
                               granule=2880)
    reader = containers.OggPacketReader()
    reader.feed(page)
    got = reader.packets()
    assert [p for p, _ in got] == [b"p0", b"p1", b"p2"]
    assert [g for _, g in got] == [-1, -1, 2880]


def test_ogg_opus_writer_multi_packet_page():
    w = containers.OggOpusWriter(2)
    stream = w.page_packets([b"\xfc\x00" * 3, b"\xfc\x01", b"\xfc\x02"])
    reader = containers.OggPacketReader()
    reader.feed(stream)
    got = reader.packets()
    assert [p[:8] for p, _ in got[:2]] == [b"OpusHead", b"OpusTags"]
    assert [g for _, g in got[2:]] == [-1, -1, 2880]


def test_ogg_reader_dropped_page_orphans_partial():
    """A CRC-failed page that carried the middle of a spanning packet
    must invalidate the continuation: the tail on the NEXT continued
    page is discarded instead of being spliced onto stale data."""
    import struct as _st

    def raw_page(lacing, body, *, continued=False, seq=0, granule=-1):
        hdr = (b"OggS\x00" + bytes([1 if continued else 0])
               + _st.pack("<q", granule) + _st.pack("<I", 7)
               + _st.pack("<I", seq) + b"\x00\x00\x00\x00"
               + bytes([len(lacing)]) + bytes(lacing))
        page = bytearray(hdr + body)
        page[22:26] = _st.pack("<I", containers.ogg_crc(bytes(page)))
        return bytes(page)

    head = b"A" * 510                      # spans pages (lacing 255,255)
    mid = b"B" * 255
    tail = b"C" * 40
    ok1, ok2 = b"fine1", b"fine2"
    p1 = raw_page([255, 255], head, seq=0)            # unterminated
    p2 = bytearray(raw_page([255], mid, continued=True, seq=1))
    p2[-1] ^= 0xFF                                    # CRC-corrupt middle
    p3 = raw_page([40, 5], tail + ok1, continued=True, seq=2, granule=100)
    p4 = raw_page([5], ok2, seq=3, granule=200)
    r = containers.OggPacketReader()
    r.feed(p1 + bytes(p2) + p3 + p4)
    pkts = [p for p, _g in r.packets()]
    assert head + mid + tail not in pkts   # complete packet impossible
    assert head + tail not in pkts         # and NOT spliced without mid
    assert pkts == [ok1, ok2]
