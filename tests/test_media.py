"""Media sample type tests: plane geometry, copy-on-modify, wire roundtrip."""

import numpy as np
import pytest

from swiftvideo_tpu.core import TimePoint
from swiftvideo_tpu.media import (AudioFormat, BufferType, CodedMediaSample,
                                  MediaConstituent, MediaFormat, MediaType,
                                  PixelFormat, bytes_per_sample,
                                  create_picture_sample, is_keyframe,
                                  make_audio_sample, number_of_buffers,
                                  plane_array_shape, planes_for_format, wire)
from swiftvideo_tpu.utils import matrix as m4


def test_plane_geometry_y420p():
    planes = planes_for_format(PixelFormat.y420p, (1920, 1080))
    assert len(planes) == 3
    assert planes[0].size == (1920, 1080) and planes[0].stride == 1920
    assert planes[1].size == (960, 540) and planes[1].stride == 960
    assert plane_array_shape(PixelFormat.y420p, (1920, 1080), 1) == (540, 960)


def test_plane_geometry_nv12_rgba():
    nv12 = planes_for_format(PixelFormat.nv12, (1280, 720))
    assert len(nv12) == 2 and nv12[1].stride == 1280
    assert plane_array_shape(PixelFormat.nv12, (1280, 720), 1) == (360, 640, 2)
    rgba = planes_for_format(PixelFormat.RGBA, (64, 64))
    assert rgba[0].stride == 256
    assert plane_array_shape(PixelFormat.RGBA, (64, 64), 0) == (64, 64, 4)


def test_create_picture_sample():
    s = create_picture_sample((320, 240), PixelFormat.y420p,
                              asset_id="a", workspace_id="w")
    assert s.size() == (320, 240)
    assert s.buffer_type() == BufferType.cpu
    assert [b.shape for b in s.planes()] == [(240, 320), (120, 160), (120, 160)]
    assert all(b.dtype == np.uint8 for b in s.planes())
    # copy-on-modify preserves buffers, changes state
    s2 = s.with_(opacity=0.5, matrix=m4.translation(1, 2, 3))
    assert s2.opacity() == 0.5 and s.opacity() == 1.0
    assert s2.z_index() == 3
    assert s2.planes() is s.planes()


def test_audio_sample_helpers():
    assert number_of_buffers(AudioFormat.s16i, 2) == 1
    assert number_of_buffers(AudioFormat.s16p, 2) == 2
    assert bytes_per_sample(AudioFormat.s16i, 2) == 4
    assert bytes_per_sample(AudioFormat.f32p, 2) == 4
    s = make_audio_sample([np.zeros(960 * 2, np.int16)], frequency=48000,
                          channels=2, fmt=AudioFormat.s16i, sample_count=960)
    assert s.duration() == TimePoint(960, 48000)
    pos, gain = m4.audio_position_gain(s.transform)
    assert gain == 1.0 and np.allclose(pos, [0, 0])


def test_audio_transform_position_gain():
    t = m4.translation3(0.5, -0.25) @ m4.scale3(0.7)
    pos, gain = m4.audio_position_gain(t)
    assert np.allclose(pos, [0.5, -0.25], atol=1e-6)
    assert abs(gain - 0.7) < 1e-6


def test_coded_sample_keyframe_and_wire():
    sample = CodedMediaSample(
        buffer=b"\x00\x00\x00\x01\x65rest-of-idr",
        pts_value=TimePoint(3003, 30000), dts_value=TimePoint(3003, 30000),
        media_type=MediaType.video, media_format=MediaFormat.avc,
        id_asset="cam1", id_workspace="ws", side={"config": b"\x01conf"},
        constituents_value=(MediaConstituent(
            "src", TimePoint(0, 1000),
            constituents=(MediaConstituent("nested", TimePoint(5, 10)),)),))
    assert is_keyframe(sample)  # byte 4 = 0x65 -> nal type 5
    blob = wire.serialize(sample)
    out = wire.deserialize(blob)
    assert out.data() == sample.data()
    assert out.pts() == sample.pts()
    assert out.media_format == MediaFormat.avc
    assert out.side_data() == {"config": b"\x01conf"}
    assert out.constituents()[0].id_asset == "src"
    assert out.constituents()[0].constituents[0].id_asset == "nested"
    assert out.asset_id() == "cam1"


def test_non_keyframe():
    s = CodedMediaSample(buffer=b"\x00\x00\x00\x01\x41x", pts_value=TimePoint(0, 1),
                         dts_value=TimePoint(0, 1), media_type=MediaType.video,
                         media_format=MediaFormat.avc)
    assert not is_keyframe(s)
    audio = CodedMediaSample(buffer=b"", pts_value=TimePoint(0, 1),
                             dts_value=TimePoint(0, 1), media_type=MediaType.audio,
                             media_format=MediaFormat.aac)
    assert is_keyframe(audio)


def test_command_json_roundtrip():
    from swiftvideo_tpu.core import TimePoint
    from swiftvideo_tpu.scene import (BindCommand, ComposerCommand,
                                      ElementState, SetSceneCommand,
                                      SetStateCommand, command_from_json,
                                      command_to_json)
    cmd = ComposerCommand(
        set_scene=SetSceneCommand(scene="b"),
        after=(ComposerCommand(
            bind=BindCommand(asset_id="cam", element="e2"),
            after=(ComposerCommand(set_state=SetStateCommand(
                element="e2", state=ElementState(size=(20, 20)),
                duration=TimePoint(500, 1000))),)),))
    out = command_from_json(command_to_json(cmd))
    assert out.set_scene.scene == "b"
    assert out.after[0].bind.asset_id == "cam"
    inner = out.after[0].after[0].set_state
    assert inner.state.size == (20, 20)
    assert inner.duration == TimePoint(500, 1000)


def test_composition_json_roundtrip():
    from swiftvideo_tpu.core import TimePoint
    from swiftvideo_tpu.scene import (AspectMode, Composition, Element,
                                      ElementState, Scene,
                                      composition_from_json,
                                      composition_to_json)
    comp = Composition(
        name="c", canvas_size=(640, 360),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        scenes=(Scene(name="main", elements=(
            Element(name="e", initial_state=ElementState(
                size=(64, 64), pic_aspect=AspectMode.aspectFit)),)),),
        initial_scene="main")
    out = composition_from_json(composition_to_json(comp))
    assert out.canvas_size == (640, 360)
    assert out.frame_duration == TimePoint(1000, 30000)
    assert out.scenes[0].elements[0].initial_state.pic_aspect == \
        AspectMode.aspectFit


def test_packed422_roundtrip():
    from swiftvideo_tpu.media.pixel import (packed422_to_planar,
                                            planar_to_packed422)
    rng = np.random.default_rng(0)
    for fmt in (PixelFormat.yuvs, PixelFormat.zvuy):
        arr = rng.integers(0, 256, (16, 32, 2), np.int64).astype(np.uint8)
        y, cb, cr = packed422_to_planar(arr, fmt)
        assert y.shape == (16, 32) and cb.shape == (16, 16)
        back = planar_to_packed422((y, cb, cr), fmt)
        assert np.array_equal(back, arr)


def test_media_description_hevc_vpx_opus():
    """Beyond-parity basic_media_description coverage: hevc via hvcC,
    vp8/vp9 in-band keyframe headers, opus via OpusHead (the reference
    parses only avc SPS + aac ASC, sample.coded.swift:202-230)."""
    from swiftvideo_tpu.codec import containers
    from swiftvideo_tpu.media.coded import basic_media_description
    from tests.test_bitstream import make_h265_sps

    def coded(fmt, data=b"", side=None, mtype=MediaType.video):
        return CodedMediaSample(
            buffer=data, pts_value=TimePoint(0, 1), dts_value=TimePoint(0, 1),
            media_type=mtype, media_format=fmt, side=side or {})

    sps = make_h265_sps(1920, 1088, crop=(0, 0, 0, 4))
    rec = containers.make_hvcc(b"\x40\x01", sps, b"\x44\x01")
    d = basic_media_description(coded(MediaFormat.hevc, side={"config": rec}))
    assert d.size == (1920, 1080)

    vp8_key = bytes([0x00, 0x00, 0x00]) + b"\x9d\x01\x2a" + \
        (320).to_bytes(2, "little") + (240).to_bytes(2, "little")
    d = basic_media_description(coded(MediaFormat.vp8, data=vp8_key))
    assert d.size == (320, 240)

    head = containers.make_opus_head(2)
    d = basic_media_description(coded(MediaFormat.opus, side={"config": head},
                                      mtype=MediaType.audio))
    assert (d.sample_rate, d.channel_count, d.samples_per_packet) == \
        (48000.0, 2, 960)


def test_keyframe_hevc_vp8_vp9():
    from swiftvideo_tpu.media.coded import is_keyframe

    def coded(fmt, data):
        return CodedMediaSample(
            buffer=data, pts_value=TimePoint(0, 1), dts_value=TimePoint(0, 1),
            media_type=MediaType.video, media_format=fmt)

    def nal(t, payload=b"\x00"):
        body = bytes([t << 1, 1]) + payload
        return len(body).to_bytes(4, "big") + body

    # hevc: AUD (35) then IDR_W_RADL (19) -> keyframe; TRAIL_R (1) -> not
    assert is_keyframe(coded(MediaFormat.hevc, nal(35) + nal(19)))
    assert is_keyframe(coded(MediaFormat.hevc, nal(21)))       # CRA
    assert not is_keyframe(coded(MediaFormat.hevc, nal(35) + nal(1)))
    # vp8: frame-tag bit 0 is the interframe flag
    assert is_keyframe(coded(MediaFormat.vp8, b"\x00rest"))
    assert not is_keyframe(coded(MediaFormat.vp8, b"\x01rest"))
    # vp9: frame_marker=2, profile 0, show_existing=0, frame_type bit
    assert is_keyframe(coded(MediaFormat.vp9, b"\x80..."))
    assert not is_keyframe(coded(MediaFormat.vp9, b"\x84..."))  # interframe
    assert not is_keyframe(coded(MediaFormat.vp9, b"\x88..."))  # show_existing
    # av1: frame_type read from the frame header OBU
    from tests.test_containers import av1_frame_obu, make_av1_seq_obu
    assert is_keyframe(coded(MediaFormat.av1,
                             make_av1_seq_obu(64, 64) + av1_frame_obu(0x00)))
    assert not is_keyframe(coded(MediaFormat.av1,
                                 bytes([0x12, 0x00]) + av1_frame_obu(0x20)))


def test_media_description_hevc_malformed_hvcc():
    """A crafted hvcC that passes the length/version check but declares
    more arrays than it carries must surface as MediaDescriptionError,
    not IndexError (review finding: remote publishers control this)."""
    from swiftvideo_tpu.media.coded import (MediaDescriptionError,
                                            basic_media_description)
    bad = b"\x01" + b"\x00" * 21 + b"\xff"
    s = CodedMediaSample(
        buffer=b"\x00\x00\x00\x02\x26\x01", pts_value=TimePoint(0, 1),
        dts_value=TimePoint(0, 1), media_type=MediaType.video,
        media_format=MediaFormat.hevc, side={"config": bad})
    with pytest.raises(MediaDescriptionError):
        basic_media_description(s)


def test_media_description_av1():
    from swiftvideo_tpu.media.coded import basic_media_description
    from tests.test_containers import make_av1_seq_obu

    s = CodedMediaSample(
        buffer=make_av1_seq_obu(1280, 720), pts_value=TimePoint(0, 1),
        dts_value=TimePoint(0, 1), media_type=MediaType.video,
        media_format=MediaFormat.av1)
    assert basic_media_description(s).size == (1280, 720)


def test_wire_truncation_raises():
    """A truncated wire blob must raise, not silently default required
    fields (wrong-codec samples defeat the self-describing format)."""
    from swiftvideo_tpu.media.wire import deserialize, serialize
    s = CodedMediaSample(
        buffer=b"payload", pts_value=TimePoint(5, 1000),
        dts_value=TimePoint(5, 1000), media_type=MediaType.video,
        media_format=MediaFormat.vp9, id_asset="a", id_workspace="w")
    blob = serialize(s)
    assert deserialize(blob).media_format == MediaFormat.vp9
    with pytest.raises(ValueError):
        deserialize(blob[:-3])            # truncated payload
    with pytest.raises(ValueError):
        deserialize(blob[:-(len(blob) - 6)])  # header fragment only
    # drop the final record entirely: required-field check fires
    import struct as _st
    tag, length = _st.unpack_from("<BI", blob, 4)
    pos = 4
    records = []
    while pos < len(blob):
        t, ln = _st.unpack_from("<BI", blob, pos)
        records.append((t, blob[pos:pos + 5 + ln]))
        pos += 5 + ln
    no_fmt = blob[:4] + b"".join(r for t, r in records if t != 10)
    with pytest.raises(ValueError):
        deserialize(no_fmt)


def test_scene_composition_roundtrip_tuples():
    """composition_from_json re-tuples every sequence field (a list
    parent_anchor made round-tripped states unequal and unhashable)."""
    from swiftvideo_tpu.scene import (Composition, Element, ElementState,
                                      PictureAnchor, Scene,
                                      composition_from_json,
                                      composition_to_json)
    st = ElementState(pic_pos=(1.0, 2.0), size=(10.0, 10.0),
                      parent_anchor=(PictureAnchor.anchorTopLeft,))
    comp = Composition(
        name="c", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        sample_rate=48000, channel_count=2,
        scenes=(Scene(name="s", elements=(
            Element(name="e", initial_state=st),)),),
        initial_scene="s")
    back = composition_from_json(composition_to_json(comp))
    got = back.scenes[0].elements[0].initial_state
    assert got == st
    hash(got)                              # frozen dataclass stays hashable


def test_keyframe_avc_sei_led_idr():
    """x264's first access unit is [SEI, IDR] in AVCC framing: the
    keyframe check must walk to the first VCL NAL (the reference's
    first-NAL-only check gates out the whole first GOP)."""
    from swiftvideo_tpu.media.coded import is_keyframe

    def avcc(*nals):
        return b"".join(len(n).to_bytes(4, "big") + n for n in nals)

    def coded(buf):
        return CodedMediaSample(
            buffer=buf, pts_value=TimePoint(0, 1), dts_value=TimePoint(0, 1),
            media_type=MediaType.video, media_format=MediaFormat.avc)

    sei = b"\x06\x05\x10" + bytes(16)
    idr = b"\x65" + bytes(8)
    inter = b"\x41" + bytes(8)
    assert is_keyframe(coded(avcc(sei, idr)))
    assert not is_keyframe(coded(avcc(sei, inter)))
    assert is_keyframe(coded(avcc(idr)))
    assert not is_keyframe(coded(avcc(sei)))          # no VCL NAL at all


def test_minimal_manifest_applies_defaults():
    """A hand-written manifest may omit every field with a dataclass
    default (the documented CLI input shape); wire-form commands may
    omit optional duration."""
    import json

    from swiftvideo_tpu.scene import (command_from_json,
                                      composition_from_json)

    comp = composition_from_json(json.dumps({
        "name": "x",
        "scenes": [{"name": "main", "elements": []}],
    }))
    assert comp.canvas_size == (1920, 1080)
    assert comp.sample_rate == 48000 and comp.channel_count == 2
    assert comp.frame_duration.scale == 30000

    cmd = command_from_json(json.dumps({
        "set_state": {"element": "pip", "state_id": "big"}}))
    assert cmd.set_state.duration.value == 0
