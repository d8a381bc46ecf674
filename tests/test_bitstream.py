"""Bitstream parser tests: Exp-Golomb self-test, H.264 SPS, AAC ASC.

The SPS test vector is a baseline-profile 1280x720 SPS generated from the
spec syntax; ASC vectors are hand-assembled (AAC-LC 44.1kHz stereo and the
960-frame / explicit-rate variants).  Native (C++) and Python paths must
agree (csrc/bitstream.cpp vs swiftvideo_tpu/codec/bitstream.py).
"""

from swiftvideo_tpu.codec import bitstream


class _BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)
        return self

    def ue(self, val: int):
        k = val + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)
        return self

    def se(self, val: int):
        k = 2 * val - 1 if val > 0 else -2 * val
        return self.ue(k)

    def bytes(self) -> bytes:
        bits = self.bits + [0] * ((8 - len(self.bits) % 8) % 8)
        return bytes(int("".join(map(str, bits[i:i + 8])), 2)
                     for i in range(0, len(bits), 8))


def make_sps(width_mbs: int, height_mbs: int, crop=(0, 0, 0, 0),
             profile: int = 66) -> bytes:
    w = _BitWriter()
    w.u(0x67, 8)          # NAL header: type 7 (SPS)
    w.u(profile, 8)       # profile_idc
    w.u(0, 8)             # constraint flags
    w.u(31, 8)            # level_idc
    w.ue(0)               # sps_id
    if profile == 100:
        w.ue(1)           # chroma_format_idc 4:2:0
        w.ue(0).ue(0)     # bit depths
        w.u(0, 1)         # qpprime
        w.u(0, 1)         # no scaling matrix
    w.ue(4)               # log2_max_frame_num_minus4
    w.ue(0)               # poc type 0
    w.ue(4)               # log2_max_poc_lsb_minus4
    w.ue(1)               # max_num_ref_frames
    w.u(0, 1)             # gaps allowed
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)             # frame_mbs_only
    w.u(1, 1)             # direct_8x8
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    return w.bytes()


def test_golomb_self_test():
    assert bitstream.test_golomb_dec() == 254


def test_sps_720p():
    sps = make_sps(80, 45)
    assert bitstream.h264_sps_frame_size(sps) == (1280, 720)


def test_sps_1080p_with_crop():
    # 1920x1088 coded, bottom crop of 8 px -> crop_bottom = 4 chroma units
    sps = make_sps(120, 68, crop=(0, 0, 0, 4))
    assert bitstream.h264_sps_frame_size(sps) == (1920, 1080)


def test_sps_high_profile():
    sps = make_sps(80, 45, profile=100)
    assert bitstream.h264_sps_frame_size(sps) == (1280, 720)


def test_sps_python_matches_native():
    sps = make_sps(120, 68, crop=(0, 0, 0, 4))
    py = bitstream._h264_sps_frame_size_py(sps)
    assert py == bitstream.h264_sps_frame_size(sps)


def _asc(aot=2, freq_index=4, chan=2, frame960=False) -> bytes:
    w = _BitWriter()
    w.u(aot, 5).u(freq_index, 4).u(chan, 4)
    w.u(1 if frame960 else 0, 1)  # frameLengthFlag
    w.u(0, 1).u(0, 1)             # dependsOnCoreCoder, extensionFlag
    return w.bytes()


def test_asc_lc_44100_stereo():
    assert bitstream.aac_parse_asc(_asc()) == (2, 44100, 1024)


def test_asc_960_frames():
    assert bitstream.aac_parse_asc(_asc(freq_index=3, frame960=True)) == (2, 48000, 960)


def test_asc_explicit_rate():
    w = _BitWriter()
    w.u(2, 5).u(15, 4).u(41000, 24).u(1, 4).u(0, 3)
    assert bitstream.aac_parse_asc(w.bytes()) == (1, 41000, 1024)


def test_asc_python_matches_native():
    blob = _asc(freq_index=3, frame960=True)
    assert bitstream._aac_parse_asc_py(blob) == bitstream.aac_parse_asc(blob)


def test_random_bytes():
    a = bitstream.generate_random_bytes(64)
    b = bitstream.generate_random_bytes(64)
    assert len(a) == 64 and a != b


def make_h265_sps(width: int, height: int, crop=(0, 0, 0, 0),
                  chroma: int = 1, max_sub: int = 0,
                  nal_header: bool = True, vps_id: int = 0,
                  nesting: int = 1) -> bytes:
    """Assemble an HEVC SPS per H.265 §7.3.2.2.1 syntax."""
    w = _BitWriter()
    if nal_header:
        w.u(33 << 1, 8).u(1, 8)     # nal_unit_header (type 33, tid 0)
    w.u(vps_id, 4)                  # sps_video_parameter_set_id
    w.u(max_sub, 3)                 # sps_max_sub_layers_minus1
    w.u(nesting, 1)                 # temporal_id_nesting
    # profile_tier_level(1, max_sub)
    w.u(0, 2).u(0, 1).u(1, 5)       # space / tier / profile_idc (Main)
    w.u(0x60000000, 32)             # compatibility flags
    w.u(0b1011, 4)                  # progressive/interlaced/non-packed/frame-only
    w.u(0, 32).u(0, 12)             # 43 reserved + inbld
    w.u(120, 8)                     # general_level_idc (4.0)
    for _ in range(max_sub):
        w.u(0, 1).u(0, 1)           # sub-layer profile/level absent
    if max_sub > 0:
        for _ in range(max_sub, 8):
            w.u(0, 2)               # reserved_zero_2bits
    w.ue(0)                        # sps_seq_parameter_set_id
    w.ue(chroma)                   # chroma_format_idc
    if chroma == 3:
        w.u(0, 1)                  # separate_colour_plane_flag
    w.ue(width)
    w.ue(height)
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(1, 1)                      # rbsp stop bit (parse never reaches it)
    return w.bytes()


def test_h265_sps_raw_payload_mimicking_header():
    """A header-less SPS whose first two bytes look like a NAL header
    (vps_id=4, one sub-layer, nesting=0 -> 0x42; profile_idc=1 -> 0x01)
    must still parse: the autodetect falls back to the raw
    interpretation when the header-stripped parse fails."""
    sps = make_h265_sps(1280, 720, vps_id=4, max_sub=1, nesting=0,
                        nal_header=False)
    assert sps[:2] == b"\x42\x01"    # genuinely ambiguous prefix
    assert bitstream.h265_sps_frame_size(sps) == (1280, 720)
    # and the honest with-header form of the same SPS still parses
    hdr = make_h265_sps(1280, 720, vps_id=4, max_sub=1, nesting=0)
    assert bitstream.h265_sps_frame_size(hdr) == (1280, 720)


def test_h265_sps_1080p_with_crop():
    # 1920x1088 luma grid cropped to 1080: bottom crop 4 chroma units (x2)
    sps = make_h265_sps(1920, 1088, crop=(0, 0, 0, 4))
    assert bitstream.h265_sps_frame_size(sps) == (1920, 1080)


def test_h265_sps_no_crop_no_header():
    sps = make_h265_sps(1280, 720, nal_header=False)
    assert bitstream.h265_sps_frame_size(sps) == (1280, 720)


def test_h265_sps_sub_layers_and_444():
    # max_sub=2 exercises the sub-layer flag + reserved-bit path; 4:4:4
    # chroma means crop units are 1 luma sample
    sps = make_h265_sps(640, 480, crop=(2, 2, 0, 0), chroma=3, max_sub=2)
    assert bitstream.h265_sps_frame_size(sps) == (636, 480)


def test_h265_sps_truncated_raises():
    sps = make_h265_sps(1920, 1088)[:8]
    try:
        bitstream.h265_sps_frame_size(sps)
    except ValueError:
        pass
    else:
        raise AssertionError("expected overrun error")


def test_golomb_32_zero_run_is_corrupt_both_impls():
    """A ue() run of 32+ leading zeros encodes a value >= 2^32-1 — no
    legal SPS field.  Both implementations must agree it is corrupt
    (the naive C++ 1u<<32 was UB and could diverge from Python's
    bignum arithmetic on hostile input)."""
    br = bitstream.ExpGolomb(b"\x00" * 12)
    assert br.ue() == 0 and br.overrun
    # end-to-end through both SPS parsers: profile/level bytes then a
    # 33+-bit zero run where seq_parameter_set_id's ue() sits
    sps = bytes([0x67, 66, 0x00, 30]) + b"\x00" * 12
    outcomes = []
    for fn in (bitstream._h264_sps_frame_size_py,
               bitstream.h264_sps_frame_size):
        try:
            outcomes.append(("ok", fn(sps)))
        except ValueError:
            outcomes.append(("err", None))
    assert outcomes[0] == outcomes[1] == ("err", None)
