"""Codec layer tests: uncompressed packing, image codecs, text rendering,
transcode chains, paced file source."""

import numpy as np

from swiftvideo_tpu.codec import (AudioDecoder, AudioEncoder, SyntheticSource,
                                  TextRenderer, TextSample, TranscodeContainer,
                                  VideoDecoder, VideoEncoder, asset_rename,
                                  make_video_transcoder,
                                  pack_uncompressed_picture,
                                  unpack_uncompressed_picture)
from swiftvideo_tpu.codec.codecs import (pack_uncompressed_audio,
                                         unpack_uncompressed_audio)
from swiftvideo_tpu.core import Bus, EventBox, StepClock, TimePoint, Tx
from swiftvideo_tpu.media import (AudioFormat, AudioSample, CodedMediaSample,
                                  MediaFormat, MediaType, PixelFormat,
                                  create_picture_sample)


def _pict(size=(32, 16), value=100):
    s = create_picture_sample(size, PixelFormat.y420p, asset_id="a",
                              workspace_id="w")
    s.planes()[0][:] = value
    return s


def test_uncompressed_picture_roundtrip():
    s = _pict()
    s.planes()[1][:] = 50
    data = pack_uncompressed_picture(s)
    out = unpack_uncompressed_picture(data, asset_id="a", workspace_id="w")
    assert out.size() == (32, 16)
    assert out.pixel_format() == PixelFormat.y420p
    for a, b in zip(s.planes(), out.planes()):
        assert np.array_equal(a, b)


def test_uncompressed_audio_roundtrip():
    a = AudioSample(buffers=(np.arange(960 * 2, dtype=np.int16),),
                    frequency=48000, channels=2, format=AudioFormat.s16i,
                    sample_count=960, id_asset="a", id_workspace="w")
    out = unpack_uncompressed_audio(pack_uncompressed_audio(a),
                                    asset_id="a", workspace_id="w")
    assert out.sample_rate() == 48000 and out.number_channels() == 2
    assert np.array_equal(out.data()[0], a.data()[0])


def test_video_codec_roundtrip_via_tx():
    s = _pict(value=200)
    enc = VideoEncoder(MediaFormat.uncompressed)
    dec = VideoDecoder()
    coded = enc(s).value()
    assert coded.media_format == MediaFormat.uncompressed
    decoded = dec(coded).value()
    assert np.array_equal(np.asarray(decoded.planes()[0]),
                          np.asarray(s.planes()[0]))


def test_png_codec_roundtrip():
    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 256, (16, 24, 4), np.int64).astype(np.uint8)
    rgba[..., 3] = 255
    from swiftvideo_tpu.media import ImageBuffer
    from swiftvideo_tpu.media.pixel import BufferType, planes_for_format
    from swiftvideo_tpu.media.picture import PictureSample
    img = ImageBuffer(PixelFormat.RGBA, BufferType.cpu, (24, 16),
                      tuple(planes_for_format(PixelFormat.RGBA, (24, 16))),
                      (rgba,))
    s = PictureSample(img, "a", "w")
    coded = VideoEncoder(MediaFormat.png)(s).value()
    assert coded.media_format == MediaFormat.png
    decoded = VideoDecoder()(coded).value()
    assert decoded.pixel_format() == PixelFormat.RGBA
    assert np.array_equal(np.asarray(decoded.planes()[0]), rgba)  # lossless


def test_unsupported_codec_errors_cleanly(monkeypatch):
    import swiftvideo_tpu.codec.codecs as codecs_mod
    # with no real-codec backend at all, bitstream formats error cleanly
    monkeypatch.setattr(codecs_mod, "bitstream_backend", lambda: None)
    s = CodedMediaSample(buffer=b"x", pts_value=TimePoint(0, 1),
                         dts_value=TimePoint(0, 1),
                         media_type=MediaType.video,
                         media_format=MediaFormat.avc, id_asset="a")
    box = VideoDecoder()(s)
    assert box.is_error()
    assert "avc" in box.err().desc


def test_garbage_bitstream_errors_cleanly():
    """With a live backend, undecodable bytes come back as an error box,
    not an exception (reference propagates libav errors the same way,
    dec.video.ffmpeg.swift:142-156)."""
    from swiftvideo_tpu.codec.codecs import bitstream_backend
    if bitstream_backend() is None:
        import pytest
        pytest.skip("no real-codec backend in this image")
    s = CodedMediaSample(buffer=b"x", pts_value=TimePoint(0, 1),
                         dts_value=TimePoint(0, 1),
                         media_type=MediaType.video,
                         media_format=MediaFormat.avc, id_asset="a")
    box = VideoDecoder()(s)
    assert box.is_error() or box.is_nothing()


def test_asset_rename_provenance():
    s = _pict().with_(pts=TimePoint(5, 30))
    out = asset_rename("new")(s).value()
    assert out.asset_id() == "new"
    assert out.constituents()[0].id_asset == "a"
    assert out.constituents()[0].pts == TimePoint(5, 30)


def test_video_transcode_chain():
    src = _pict(value=180)
    coded = VideoEncoder(MediaFormat.uncompressed)(src).value()
    chain = make_video_transcoder("out", MediaFormat.png)
    # y420p can't png-encode directly; expect clean error box
    box = chain(coded)
    assert box.is_error() or box.is_just()
    chain2 = make_video_transcoder("out", MediaFormat.uncompressed)
    out = chain2(coded).value()
    assert out.asset_id() == "out"
    assert out.media_format == MediaFormat.uncompressed
    decoded = VideoDecoder()(out).value()
    assert np.array_equal(np.asarray(decoded.planes()[0]),
                          np.asarray(src.planes()[0]))


def test_audio_encoder_segments():
    enc = AudioEncoder(MediaFormat.uncompressed, frame_size=960)
    buf = np.arange(1024 * 2, dtype=np.int16)
    out_all = []
    pts = TimePoint(0, 48000)
    for i in range(4):
        a = AudioSample(buffers=(buf,), frequency=48000, channels=2,
                        format=AudioFormat.s16i, sample_count=1024,
                        pts_value=pts, id_asset="a", id_workspace="w")
        box = enc(a)
        out_all.extend(box.value())
        pts = pts + TimePoint(1024, 48000)
    assert out_all
    dec = AudioDecoder()
    for c in out_all:
        seg = dec(c).value()
        assert seg.number_samples() == 960


def test_text_renderer():
    r = TextRenderer()
    sample = TextSample(text="Hi!", font_size=24,
                        color=(1.0, 0.5, 0.0, 1.0), id_asset="t",
                        id_workspace="w")
    out = r(sample).value()
    assert out.pixel_format() == PixelFormat.RGBA
    rgba = np.asarray(out.planes()[0])
    assert rgba.shape[2] == 4
    assert rgba[..., 3].max() > 128  # glyphs drew something
    # tint: where alpha is high, red channel ~255, blue ~0
    mask = rgba[..., 3] > 200
    assert mask.any()
    assert rgba[..., 0][mask].min() > 150
    assert rgba[..., 2][mask].max() < 50


def test_synthetic_source_pacing():
    clock = StepClock(TimePoint(100, 1000))
    frames = []

    def puller(i):
        if i >= 10:
            return None
        s = _pict(value=i * 10)
        return VideoEncoder(MediaFormat.uncompressed)(s).value()

    src = SyntheticSource(clock, puller, frame_duration=TimePoint(100, 1000),
                          asset_id="file")
    chain = src >> Tx(lambda s: (frames.append(s), EventBox.just(s))[1])
    src.play()
    for _ in range(30):
        clock.step()
    assert len(frames) == 10
    # pts advance by the frame duration
    for i, f in enumerate(frames):
        assert f.pts() == TimePoint(i * 100, 1000)
    assert frames[0].asset_id() == "file"


def test_transcode_container():
    clock = StepClock(TimePoint(1, 30))
    bus = Bus(clock)
    outputs = []
    publish = Tx(lambda s: (outputs.append(s), EventBox.just(s))[1])
    container = TranscodeContainer(bus, publish)
    coded = VideoEncoder(MediaFormat.uncompressed)(_pict()).value()
    bus.append(EventBox.just(coded))
    bus.append(EventBox.just(coded))
    assert len(outputs) == 2
    assert outputs[0].asset_id() == "a.transcode"


def test_annexb_avcc_roundtrip():
    from swiftvideo_tpu.codec import ffmpeg_subprocess as ff
    nals = [b"\x65" + b"idr-data" * 10, b"\x41" + b"p-frame"]
    annexb = b"".join(b"\x00\x00\x00\x01" + n for n in nals)
    assert ff.split_annexb(annexb) == nals
    avcc = ff.annexb_to_avcc(annexb)
    assert ff.avcc_to_annexb(avcc) == annexb
    # 3-byte start codes parse too
    short = b"\x00\x00\x01" + nals[0] + b"\x00\x00\x01" + nals[1]
    assert ff.split_annexb(short) == nals


def test_avcdcr_roundtrip():
    from swiftvideo_tpu.codec import ffmpeg_subprocess as ff
    sps = bytes([0x67, 66, 0, 31]) + b"sps-body"
    pps = bytes([0x68]) + b"pps"
    record = ff.make_avcdcr(sps, pps)
    sps_list, pps_list = ff.sps_pps_from_avcdcr(record)
    assert sps_list == [sps] and pps_list == [pps]


def test_adts_framing():
    from swiftvideo_tpu.codec import ffmpeg_subprocess as ff
    p1, p2 = b"a" * 50, b"b" * 99
    stream = (ff.adts_header(48000, 2, len(p1)) + p1
              + ff.adts_header(48000, 2, len(p2)) + p2)
    frames, rest = ff.parse_adts_frames(stream + b"\xff")  # trailing junk
    assert len(frames) == 2 and rest == b"\xff"
    assert ff.adts_payload(frames[0]) == p1
    assert ff.adts_payload(frames[1]) == p2


def test_ffmpeg_gating():
    from swiftvideo_tpu.codec import ffmpeg_subprocess as ff
    if ff.ffmpeg_path() is None:
        import pytest as _p
        dec = ff.FFmpegVideoDecoder()
        from swiftvideo_tpu.core import TimePoint
        s = CodedMediaSample(buffer=b"\x00\x00\x00\x05\x65abcd",
                             pts_value=TimePoint(0, 1), dts_value=TimePoint(0, 1),
                             media_type=MediaType.video,
                             media_format=MediaFormat.avc,
                             side={"config": b"\x01\x42\x00\x1f\xff\xe1\x00\x04\x67\x42\x00\x1f\x01\x00\x01\x68"})
        box = dec(s)
        assert box.is_error()
        assert "ffmpeg" in box.err().desc.lower() or "binary" in box.err().desc


def test_flat_keeps_partial_successes():
    """A failing item inside a list must not discard the outputs already
    produced by earlier items (live-media continuity); the error only
    surfaces when the whole batch fails."""
    from swiftvideo_tpu.codec.transcode import flat
    from swiftvideo_tpu.core import EventBox, EventError, Tx

    def impl(v):
        if v < 0:
            return EventBox.error(EventError("t", -1, "bad"))
        return EventBox.just(v * 10)

    lifted = flat(Tx(impl))
    box = lifted.apply(EventBox.just([1, -1, 2]))
    assert box.is_just() and box.value() == [10, 20]
    allbad = lifted.apply(EventBox.just([-1, -2]))
    assert allbad.is_error()


def test_synthetic_source_resume_after_stop():
    """play() after stop() rebases the pacing epoch: a source stopped at
    t=60s must resume emitting immediately, not after 60s of silence;
    frames scheduled before stop() must not fire after it."""
    from swiftvideo_tpu.codec.file_source import SyntheticSource
    from swiftvideo_tpu.core import EventBox, StepClock, TimePoint, Tx

    clock = StepClock(TimePoint(100, 1000))    # 100 ms steps
    mk = CodedMediaSample(
        buffer=b"x", pts_value=TimePoint(0, 1000),
        dts_value=TimePoint(0, 1000), media_type=MediaType.video,
        media_format=MediaFormat.uncompressed)
    src = SyntheticSource(clock, lambda i: mk,
                          frame_duration=TimePoint(100, 1000))
    got = []
    keep = src >> Tx(lambda s: (got.append(s.pts()),
                                EventBox.nothing(None))[1])
    src.play()
    for _ in range(30):                        # 3 s of playback
        clock.step()
    n_before = len(got)
    assert n_before >= 25
    src.stop()
    for _ in range(10):
        clock.step()
    n_stopped = len(got)
    # scheduled-but-unfired frames must not leak after stop (the 250 ms
    # emit-ahead may fire at most a couple already-due ones)
    assert n_stopped - n_before <= 1
    src.play()
    for _ in range(10):                        # 1 s after resume
        clock.step()
    assert len(got) - n_stopped >= 8, "resume did not emit promptly"
    # pts remain strictly monotonic across the stop/resume boundary
    assert all(b > a for a, b in zip(got, got[1:]))
    del keep
