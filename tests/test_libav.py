"""Real-codec contact: the in-process libavcodec backend.

These tests flow REAL H.264/HEVC/VP8/VP9/AV1/AAC/Opus bytes through
libavcodec (csrc/libav_shim.cpp), the same linkage model as the reference's
SwiftFFmpeg modules (dec.video.ffmpeg.swift:24-221,
enc.video.ffmpeg.swift:21-297).  Gated on the shim loading — the system
FFmpeg libraries exist in this image even though no ffmpeg binary does.
"""

import numpy as np
import pytest

from swiftvideo_tpu.codec.libav import (LibavAudioDecoder, LibavAudioEncoder,
                                        LibavVideoDecoder, LibavVideoEncoder,
                                        libav_available)
from swiftvideo_tpu.core import EventBox, TimePoint
from swiftvideo_tpu.media.audio import AudioSample
from swiftvideo_tpu.media.coded import MediaFormat, MediaType
from swiftvideo_tpu.media.picture import ImageBuffer, PictureSample
from swiftvideo_tpu.media.pixel import (BufferType, PixelFormat,
                                        planes_for_format)

pytestmark = pytest.mark.skipif(not libav_available(),
                                reason="libav shim not available")


def make_frame(w, h, i, *, asset="cam"):
    """Deterministic y420p frame with per-index content (gradient + offset
    so motion/pts mismatches show up as pixel errors)."""
    yy = ((np.arange(h)[:, None] * 2 + np.arange(w)[None, :] + i * 9)
          % 220 + 16).astype(np.uint8)
    u = np.full((h // 2, w // 2), 96 + (i * 5) % 64, np.uint8)
    v = np.full((h // 2, w // 2), 128 - (i * 3) % 64, np.uint8)
    img = ImageBuffer(PixelFormat.y420p, BufferType.cpu, (w, h),
                      tuple(planes_for_format(PixelFormat.y420p, (w, h))),
                      (yy, u, v))
    return PictureSample(img, asset, "ws",
                         pts_value=TimePoint(i * 33, 1000))


def roundtrip_video(fmt, n_frames=8, w=64, h=48, **enc_kw):
    enc = LibavVideoEncoder(fmt, bitrate=400_000, fps=30, **enc_kw)
    dec = LibavVideoDecoder()
    sent, packets = [], []
    for i in range(n_frames):
        f = make_frame(w, h, i)
        sent.append(f)
        box = enc(f)
        if box.is_just():
            packets.extend(box.value())
        assert not box.is_error(), box.err()
    packets.extend(enc.flush())
    enc.close()
    decoded = []
    for p in packets:
        assert p.media_format == fmt
        box = dec(p)
        assert not box.is_error(), box.err()
        if box.is_just():
            decoded.extend(box.value())
    decoded.extend(dec.flush())
    dec.close()
    return sent, packets, decoded


@pytest.mark.parametrize("fmt", [MediaFormat.avc, MediaFormat.hevc,
                                 MediaFormat.vp8, MediaFormat.vp9])
def test_video_roundtrip(fmt):
    """Encode -> decode recovers every frame: count, geometry, exact pts
    passthrough, and pixel content within lossy-codec tolerance."""
    sent, packets, decoded = roundtrip_video(fmt)
    assert len(packets) == len(sent)       # zero-latency operating point
    assert len(decoded) == len(sent)
    for orig, got in zip(sent, decoded):
        assert got.size() == orig.size()
        assert got.pts() == orig.pts()     # exact TimePoint round trip
        dy = (np.asarray(got.planes()[0]).astype(np.int16)
              - np.asarray(orig.planes()[0]).astype(np.int16))
        assert float(np.abs(dy).mean()) < 12.0, float(np.abs(dy).mean())


def test_video_roundtrip_av1():
    """AV1 via libaom realtime (slowest codec: tiny run)."""
    sent, packets, decoded = roundtrip_video(MediaFormat.av1, n_frames=3)
    assert len(decoded) == len(sent)
    assert packets[0].side_data()["config"][0] == 0x81  # av1C marker|version


def test_avc_config_record_is_real():
    """The side config is a real AVCDecoderConfigurationRecord whose SPS
    parses to the encoded geometry (csrc/bitstream.cpp independently)."""
    from swiftvideo_tpu.codec.bitstream import h264_sps_frame_size
    from swiftvideo_tpu.codec.ffmpeg_subprocess import sps_pps_from_avcdcr
    _, packets, _ = roundtrip_video(MediaFormat.avc, n_frames=2)
    cfg = packets[0].side_data()["config"]
    assert cfg[0] == 1                     # configurationVersion
    sps_list, pps_list = sps_pps_from_avcdcr(cfg)
    assert sps_list and pps_list
    assert h264_sps_frame_size(sps_list[0]) == (64, 48)


def test_avc_keyframe_flag_and_idr():
    """First packet is an IDR keyframe; AVCC framing parses to whole NALs."""
    from swiftvideo_tpu.codec.ffmpeg_subprocess import avcc_to_annexb, \
        split_annexb
    _, packets, _ = roundtrip_video(MediaFormat.avc, n_frames=4)
    nals = split_annexb(avcc_to_annexb(packets[0].data()))
    types = {n[0] & 0x1F for n in nals if n}
    assert 5 in types                      # IDR slice
    assert not {7, 8} & types              # parameter sets live in config
    from swiftvideo_tpu.media.coded import is_keyframe
    assert is_keyframe(packets[0])


def test_video_resolution_change_restarts_encoder():
    """Mid-stream size change drains and restarts, new config carries the
    new geometry (enc.video.ffmpeg.swift:92-130 semantics)."""
    from swiftvideo_tpu.codec.bitstream import h264_sps_frame_size
    from swiftvideo_tpu.codec.ffmpeg_subprocess import sps_pps_from_avcdcr
    enc = LibavVideoEncoder(MediaFormat.avc, bitrate=300_000, fps=30)
    out = []
    for i in range(3):
        box = enc(make_frame(64, 48, i))
        if box.is_just():
            out.extend(box.value())
    for i in range(3, 6):
        box = enc(make_frame(96, 64, i))
        if box.is_just():
            out.extend(box.value())
    out.extend(enc.flush())
    enc.close()
    assert len(out) == 6
    dims = []
    for p in out:
        sps_list, _ = sps_pps_from_avcdcr(p.side_data()["config"])
        dims.append(h264_sps_frame_size(sps_list[0]))
    assert dims == [(64, 48)] * 3 + [(96, 64)] * 3


def test_video_decoder_handles_config_change():
    """A decoder fed two segments with different avcC records re-opens and
    decodes both geometries."""
    enc1 = LibavVideoEncoder(MediaFormat.avc, bitrate=300_000, fps=30)
    enc2 = LibavVideoEncoder(MediaFormat.avc, bitrate=300_000, fps=30)
    packets = []
    for i in range(3):
        box = enc1(make_frame(64, 48, i))
        if box.is_just():
            packets.extend(box.value())
    packets.extend(enc1.flush())
    enc1.close()
    for i in range(3, 6):
        box = enc2(make_frame(96, 64, i))
        if box.is_just():
            packets.extend(box.value())
    packets.extend(enc2.flush())
    enc2.close()
    dec = LibavVideoDecoder()
    frames = []
    for p in packets:
        box = dec(p)
        assert not box.is_error(), box.err()
        if box.is_just():
            frames.extend(box.value())
    frames.extend(dec.flush())
    dec.close()
    assert [f.size() for f in frames] == [(64, 48)] * 3 + [(96, 64)] * 3


def make_audio(i, n=1024, rate=48000, channels=2, *, freq=440.0):
    t = (np.arange(n) + i * n) / rate
    wave = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
    pcm = np.stack([wave, (wave // 2)], axis=1)[:, :channels]
    return AudioSample(buffers=(pcm.reshape(-1).copy(),), frequency=rate,
                       channels=channels, format="s16i", sample_count=n,
                       id_asset="aud", id_workspace="ws",
                       pts_value=TimePoint(i * n, rate))


def roundtrip_audio(fmt, n_chunks=20, priming=None):
    enc = LibavAudioEncoder(fmt, bitrate=96_000)
    packets = []
    sent = []
    for i in range(n_chunks):
        a = make_audio(i)
        sent.append(a)
        box = enc(a)
        assert not box.is_error(), box.err()
        if box.is_just():
            packets.extend(box.value())
    packets.extend(enc.flush())
    enc.close()
    if priming is None:
        priming = {"aac": 1024, "opus": 0}[fmt.name]
    dec = LibavAudioDecoder(priming_samples=priming)
    pcm_out = []
    for p in packets:
        assert p.media_format == fmt
        box = dec(p)
        assert not box.is_error(), box.err()
        if box.is_just():
            pcm_out.extend(box.value())
    pcm_out.extend(dec.flush())
    dec.close()
    return sent, packets, pcm_out


def test_aac_roundtrip_carries_real_asc():
    """AAC: config side data is a REAL AudioSpecificConfig (parsed by the
    independent ASC parser), decode recovers a recognizable sine."""
    from swiftvideo_tpu.codec.bitstream import aac_parse_asc
    sent, packets, decoded = roundtrip_audio(MediaFormat.aac)
    channels, rate, _ = aac_parse_asc(packets[0].side_data()["config"])
    assert (channels, rate) == (2, 48000)
    got = np.concatenate([np.asarray(a.data()[0]).reshape(-1, 2)
                          for a in decoded], axis=0)
    sent_pcm = np.concatenate([np.asarray(a.data()[0]).reshape(-1, 2)
                               for a in sent], axis=0)
    # correlation, not exactness: AAC is lossy; the decoded stream leads
    # with exactly the 1024-sample encoder delay (measured with a noise
    # probe), which the priming_samples pts anchor accounts for — align
    # the sample content by that same delay here
    delay = 1024
    n = min(len(got) - delay, len(sent_pcm))
    assert n >= len(sent_pcm) // 2
    a = got[delay:delay + n, 0].astype(np.float64)
    b = sent_pcm[:n, 0].astype(np.float64)
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.9, corr
    # and the pts anchor backs up by the priming so content aligns on the
    # input timeline: first output pts == first input pts - 1024 samples
    assert decoded[0].pts() == sent[0].pts() - TimePoint(delay, 48000)


def test_opus_roundtrip_carries_opus_head():
    """Opus: config is a REAL OpusHead; packet durations come from TOC."""
    from swiftvideo_tpu.codec.containers import (opus_packet_samples,
                                                 parse_opus_head)
    sent, packets, decoded = roundtrip_audio(MediaFormat.opus)
    head = parse_opus_head(packets[0].side_data()["config"])
    assert head["channels"] == 2
    assert all(opus_packet_samples(p.data()) == 960 for p in packets)
    got = np.concatenate([np.asarray(a.data()[0]).reshape(-1, 2)
                          for a in decoded], axis=0)
    sent_pcm = np.concatenate([np.asarray(a.data()[0]).reshape(-1, 2)
                               for a in sent], axis=0)
    n = min(len(got), len(sent_pcm))
    a = got[960:n - 960, 0].astype(np.float64)
    b = sent_pcm[960:n - 960, 0].astype(np.float64)
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.9, corr


def test_audio_pts_is_gapless():
    """Emitted packet pts advance by exactly one frame duration."""
    _, packets, decoded = roundtrip_audio(MediaFormat.aac, n_chunks=10)
    for prev, nxt in zip(packets, packets[1:]):
        delta = nxt.pts() - prev.pts()
        assert delta == TimePoint(1024, 48000), delta
    for prev, nxt in zip(decoded, decoded[1:]):
        assert nxt.pts() - prev.pts() == TimePoint(prev.number_samples(),
                                                   48000)


def test_dispatch_prefers_libav(monkeypatch):
    """codecs.py auto mode routes bitstream formats to the in-process
    backend when no explicit SWIFTVIDEO_FFMPEG override exists."""
    from swiftvideo_tpu.codec.codecs import (VideoEncoder,
                                             bitstream_backend)
    monkeypatch.delenv("SWIFTVIDEO_FFMPEG", raising=False)
    monkeypatch.delenv("SV_CODEC_BACKEND", raising=False)
    assert bitstream_backend() == "libav"
    enc = VideoEncoder(MediaFormat.avc, bitrate=300_000, fps=30)
    box = enc(make_frame(64, 48, 0))
    assert not box.is_error(), box.err()
    out = (box.value() if box.is_just() else []) + enc.flush()
    enc.close()
    assert out and out[0].media_format == MediaFormat.avc
    from swiftvideo_tpu.codec.libav import LibavVideoEncoder as LV
    assert isinstance(enc._ffmpeg, LV)


def test_dispatch_respects_mock_override(monkeypatch, tmp_path):
    """SWIFTVIDEO_FFMPEG (the mock binary tests rely on) still forces the
    subprocess backend in auto mode."""
    from swiftvideo_tpu.codec import ffmpeg_subprocess
    from swiftvideo_tpu.codec.codecs import bitstream_backend
    mock = tmp_path / "ffmpeg"
    mock.write_text("#!/bin/sh\nexit 0\n")
    mock.chmod(0o755)
    monkeypatch.setenv("SWIFTVIDEO_FFMPEG", str(mock))
    monkeypatch.delenv("SV_CODEC_BACKEND", raising=False)
    ffmpeg_subprocess._FFMPEG_PATH_CACHE.clear()
    assert bitstream_backend() == "subprocess"
    monkeypatch.setenv("SV_CODEC_BACKEND", "libav")
    assert bitstream_backend() == "libav"


def test_decode_mixed_aac_framing():
    """The decoder accepts both raw AAC frames and pre-framed ADTS
    (serve records ADTS; RTMP carries raw frames)."""
    from swiftvideo_tpu.codec.ffmpeg_subprocess import adts_header
    sent, packets, _ = roundtrip_audio(MediaFormat.aac, n_chunks=6)
    dec = LibavAudioDecoder()
    got = []
    for i, p in enumerate(packets):
        payload = p.data()
        if i % 2:  # alternate framing
            payload = adts_header(48000, 2, len(payload)) + payload
        clone = p.with_(buffer=payload) if hasattr(p, "with_") else p
        box = dec(clone)
        assert not box.is_error(), box.err()
        if box.is_just():
            got.extend(box.value())
    got.extend(dec.flush())
    dec.close()
    assert sum(a.number_samples() for a in got) >= 4 * 1024


def test_decoder_reorders_bframe_stream():
    """External real-world streams carry B-frames: decode order !=
    presentation order and dts != pts.  The in-process ENCODERS are
    zero-latency by design (bframes=0), so author a bframes=2 stream
    through the shim directly and prove the DECODER returns frames in
    presentation order with an exact pts round trip (the _PtsMap key
    rides libavcodec's own frame reordering)."""
    import ctypes

    from swiftvideo_tpu.codec import libav as lv
    from swiftvideo_tpu.codec.ffmpeg_subprocess import (annexb_to_avcc,
                                                        make_avcdcr,
                                                        split_annexb)

    lib = lv._load()
    opts = (b"preset=veryfast,x264-params=keyint=32:min-keyint=32:"
            b"scenecut=0:bframes=2:b-adapt=0:rc-lookahead=8")
    h = lib.sv_venc_open(b"libx264", 64, 48, b"yuv420p", 30, 1,
                         400_000, 32, opts)
    assert h
    n = 12
    frames = [make_frame(64, 48, i) for i in range(n)]
    pkts = []    # (annexb payload, pts_key, dts_key)

    def drain():
        while True:
            data = ctypes.c_void_p()
            size = ctypes.c_int()
            ptsk = ctypes.c_int64()
            dtsk = ctypes.c_int64()
            flags = ctypes.c_int()
            rc = lib.sv_enc_recv(h, ctypes.byref(data), ctypes.byref(size),
                                 ctypes.byref(ptsk), ctypes.byref(dtsk),
                                 ctypes.byref(flags))
            if rc <= 0:
                return
            pkts.append((lv._copy_bytes(data, size.value), ptsk.value,
                         dtsk.value))

    for i, f in enumerate(frames):
        arrs = [np.ascontiguousarray(np.asarray(p)) for p in f.planes()]
        planes = (ctypes.c_void_p * 3)(*[a.ctypes.data for a in arrs])
        strides = (ctypes.c_int * 3)(*[a.shape[-1] for a in arrs])
        assert lib.sv_venc_send(h, planes, strides, i, 0) == 0
        drain()
    lib.sv_venc_send(h, None, None, 0, 0)
    drain()
    ptr = ctypes.c_void_p()
    size = ctypes.c_int()
    lib.sv_enc_extradata(h, ctypes.byref(ptr), ctypes.byref(size))
    extra = lv._copy_bytes(ptr, size.value)
    lib.sv_codec_free(h)
    nals = split_annexb(extra)
    sps = next(x for x in nals if x and x[0] & 0x1F == 7)
    pps = next(x for x in nals if x and x[0] & 0x1F == 8)
    config = make_avcdcr(sps, pps)

    assert len(pkts) == n
    keys = [p[1] for p in pkts]
    assert keys != sorted(keys), "stream has no B-frames (x264-params " \
                                 "did not override max_b_frames)"
    assert any(p[1] != p[2] for p in pkts)      # dts != pts somewhere

    from swiftvideo_tpu.media.coded import CodedMediaSample
    dec = LibavVideoDecoder()
    got = []
    for payload, ptsk, dtsk, in pkts:
        body = annexb_to_avcc(b"".join(
            b"\x00\x00\x00\x01" + x for x in split_annexb(payload)
            if x and x[0] & 0x1F not in (7, 8, 9)))
        s = CodedMediaSample(buffer=body,
                             pts_value=TimePoint(ptsk * 33, 1000),
                             dts_value=TimePoint(dtsk * 33, 1000),
                             media_type=MediaType.video,
                             media_format=MediaFormat.avc,
                             id_asset="b", id_workspace="ws",
                             side={"config": config})
        box = dec(s)
        assert not box.is_error(), box.err()
        if box.is_just():
            got.extend(box.value())
    got.extend(dec.flush())
    dec.close()
    assert len(got) == n
    assert [g.pts() for g in got] == [TimePoint(i * 33, 1000)
                                      for i in range(n)]
    for orig, g in zip(frames, got):
        dy = (np.asarray(g.planes()[0]).astype(np.int16)
              - np.asarray(orig.planes()[0]).astype(np.int16))
        assert float(np.abs(dy).mean()) < 12.0, float(np.abs(dy).mean())


def test_opus_pts_at_non_48k_input_rate():
    """Opus TOC durations are ALWAYS 48 kHz units (RFC 6716 3.1): at a
    16 kHz input rate each 20 ms packet reports 960 samples, and packet
    pts must still advance by exactly 20 ms — not by 960/16000 = 60 ms
    (a 3x stretched timeline, caught by review)."""
    from swiftvideo_tpu.core.time import seconds
    enc = LibavAudioEncoder(MediaFormat.opus, bitrate=32_000)
    packets = []
    for i in range(8):
        a = make_audio(i, n=640, rate=16000, channels=2, freq=330.0)
        box = enc(a)
        assert not box.is_error(), box.err()
        if box.is_just():
            packets.extend(box.value())
    packets.extend(enc.flush())
    enc.close()
    assert len(packets) >= 4
    from swiftvideo_tpu.codec.containers import opus_packet_samples
    assert all(opus_packet_samples(p.data()) == 960 for p in packets)
    for prev, nxt in zip(packets, packets[1:]):
        assert abs(seconds(nxt.pts() - prev.pts()) - 0.020) < 1e-9, \
            (prev.pts(), nxt.pts())
