"""Segmenter, SRC bookkeeping, repeater, and animator tests — ported from
the reference's audioSegmenterTests / sampleRateConversionTests plus
animator geometry checks."""

import numpy as np

from swiftvideo_tpu.core import EventBox, StepClock, TimePoint, Tx
from swiftvideo_tpu.media import AudioFormat, AudioSample, PixelFormat, create_picture_sample
from swiftvideo_tpu.mix import (AudioPacketSegmenter, AudioSampleRateConversion,
                                PictureAnimator, Repeater, SoundAnimator)
from swiftvideo_tpu.scene import AspectMode, ElementState, PicOrigin


def _sample(buf, pts, rate=48000, channels=2, fmt=AudioFormat.s16i,
            count=None):
    return AudioSample(buffers=(buf,), frequency=rate, channels=channels,
                       format=fmt, sample_count=count or (buf.size // channels),
                       pts_value=pts, id_asset="a", id_workspace="w")


def test_segmenter_1024_to_960():
    """audioSegmenterTests.segmenterTest: 1024-sample packets re-chunked to
    960 with sample continuity (a ramp signal survives re-chunking)."""
    seg = AudioPacketSegmenter(TimePoint(960, 48000))
    ramp = np.arange(1024 * 16 * 2, dtype=np.int16)  # interleaved stereo ramp
    out_samples = []
    pts = TimePoint(0, 48000)
    for i in range(16):
        chunk = ramp[i * 2048:(i + 1) * 2048]
        box = seg(_sample(chunk, pts))
        assert box.is_just()
        out_samples.extend(box.value())
        pts = pts + TimePoint(1024, 48000)
    assert all(s.number_samples() == 960 for s in out_samples)
    # continuity: concatenated output reproduces the ramp prefix
    cat = np.concatenate([np.asarray(s.data()[0]) for s in out_samples])
    assert np.array_equal(cat, ramp[:cat.size])
    # pts advance by exactly 960 per segment
    for a, b in zip(out_samples, out_samples[1:]):
        assert b.pts() - a.pts() == TimePoint(960, 48000)


def test_src_bookkeeping():
    """sampleRateConversionTests.sampleCountTest: mono f32 44.1k packets ->
    48k stereo s16i; every emitted sample's pts equals the cumulative
    output-sample count (exact bookkeeping over thousands of packets)."""
    src = AudioSampleRateConversion(48000, 2, AudioFormat.s16i)
    new_pts = TimePoint(0, 48000)
    checked = [0]

    def recv(sample):
        nonlocal new_pts
        assert sample.pts().scale == new_pts.scale
        assert sample.pts().value == new_pts.value
        new_pts = TimePoint(new_pts.value + sample.number_samples(), 48000)
        checked[0] += 1
        return EventBox.nothing(sample.info())

    txn = src >> Tx(recv)
    pts = TimePoint(0, 44100)
    blank = np.zeros(1024, np.float32)
    for _ in range(3000):
        s = AudioSample(buffers=(blank,), frequency=44100, channels=1,
                        format=AudioFormat.f32p, sample_count=1024,
                        pts_value=pts, id_asset="blank", id_workspace="test")
        txn(s)
        pts = pts + TimePoint(1024, 44100)
    assert checked[0] > 2900
    # cumulative output within one emission of the rational ratio
    expect = 3000 * 1024 * 48000 / 44100
    assert abs(new_pts.value - expect) < 1300


def test_src_passthrough():
    src = AudioSampleRateConversion(48000, 2, AudioFormat.s16i)
    s = _sample(np.zeros(960 * 2, np.int16), TimePoint(0, 48000))
    out = src(s)
    assert out.value() is s


def test_repeater_reemits():
    clock = StepClock(TimePoint(1000, 30000))
    rep = Repeater(clock, TimePoint(1000, 30000))
    got = []
    chain = rep >> Tx(lambda s: (got.append(s), EventBox.just(s))[1])
    chain("frame0")
    assert got == ["frame0"]
    for _ in range(3):
        clock.step()
    assert got == ["frame0"] * 4  # re-emitted every idle tick
    chain("frame1")
    clock.step()
    assert got[-1] == "frame1"


def test_picture_animator_rect():
    """An element at (x,y,w,h) produces matrices that map its corners to
    the expected canvas NDC positions."""
    clock = StepClock(TimePoint(1, 30))
    anim = PictureAnimator(clock, canvas_size=(1920, 1080))
    anim.set_state(ElementState(pic_pos=(480, 270), size=(960, 540)),
                   TimePoint(0, 1000))
    pic = create_picture_sample((64, 64), PixelFormat.y420p,
                                asset_id="a", workspace_id="w")
    out = anim(pic).value()
    m = out.matrix()
    # local (0,0) -> canvas (480,270) -> ndc (-0.5, -0.5)
    p0 = m @ np.array([0, 0, 0, 1], np.float32)
    p1 = m @ np.array([1, 1, 0, 1], np.float32)
    assert np.allclose(p0[:2], [-0.5, -0.5], atol=1e-5)
    assert np.allclose(p1[:2], [0.5, 0.5], atol=1e-5)
    assert out.opacity() == 1.0


def test_picture_animator_transition():
    """Transitions lerp between states and complete on the clock."""
    clock = StepClock(TimePoint(1, 10))
    anim = PictureAnimator(clock, canvas_size=(100, 100))
    anim.set_state(ElementState(pic_pos=(0, 0), size=(10, 10)), TimePoint(0, 1000))
    fut = anim.set_state(ElementState(pic_pos=(10, 10), size=(10, 10)),
                         TimePoint(1, 1))  # 1 s transition
    pic = create_picture_sample((8, 8), PixelFormat.y420p, asset_id="a",
                                workspace_id="w")
    clock.step()  # t = 0.1 -> 10% through
    m = anim(pic).value().matrix()
    p0 = m @ np.array([0, 0, 0, 1], np.float32)
    # 10% of the way from (0,0) to (10,10) in a 100-canvas: ndc -1 + 2*0.01
    assert np.allclose(p0[:2], [-0.98, -0.98], atol=1e-5)
    for _ in range(10):
        clock.step()
    assert fut.done() and anim.next_state is None
    m2 = anim(pic).value().matrix()
    p2 = m2 @ np.array([0, 0, 0, 1], np.float32)
    assert np.allclose(p2[:2], [-0.8, -0.8], atol=1e-5)


def test_picture_animator_no_overshoot_on_late_completion():
    """A sample arriving after the transition deadline but before the
    completion callback (late timer thread on a WallClock) must hold AT
    the target, not extrapolate past it."""
    class LateClock:
        """current() advances; scheduled callbacks never fire."""

        def __init__(self):
            self.t = TimePoint(0, 1000)

        def current(self):
            return self.t

        def schedule(self, at, fn):
            pass

    clock = LateClock()
    anim = PictureAnimator(clock, canvas_size=(100, 100))
    anim.set_state(ElementState(pic_pos=(0, 0), size=(10, 10)),
                   TimePoint(0, 1000))
    anim.set_state(ElementState(pic_pos=(50, 0), size=(10, 10)),
                   TimePoint(100, 1000))
    clock.t = TimePoint(250, 1000)          # 2.5x past the deadline
    pic = create_picture_sample((8, 8), PixelFormat.y420p, asset_id="a",
                                workspace_id="w")
    m = anim(pic).value().matrix()
    p0 = m @ np.array([0, 0, 0, 1], np.float32)
    # ndc x of canvas 50 on a 100 canvas is 0.0 — NOT 1.5 (pos 125)
    assert np.allclose(p0[0], 0.0, atol=1e-5), p0

    sanim = SoundAnimator(clock)
    sanim.set_state(ElementState(audio_gain=1.0), TimePoint(0, 1000))
    sanim.set_state(ElementState(audio_gain=0.5), TimePoint(100, 1000))
    clock.t = TimePoint(400, 1000)
    g = sanim.computed_matrix()[0, 0]
    assert np.isclose(g, 0.5), g             # not extrapolated to < 0.5


def test_picture_animator_aspect_fit():
    """16:9 sample in a square element letterboxes vertically."""
    clock = StepClock(TimePoint(1, 30))
    anim = PictureAnimator(clock, canvas_size=(100, 100))
    anim.set_state(ElementState(pic_pos=(0, 0), size=(100, 100),
                                pic_aspect=AspectMode.aspectFit),
                   TimePoint(0, 1000))
    pic = create_picture_sample((160, 90), PixelFormat.y420p,
                                asset_id="a", workspace_id="w")
    tm = anim(pic).value().texture_matrix()
    # scale y = geom/orig aspect = 1 / (16/9) = 0.5625, centered
    assert abs(tm[1, 1] - 0.5625) < 1e-4
    assert abs(tm[0, 0] - 1.0) < 1e-6
    assert abs(tm[1, 3] - (1 - 0.5625) / 2) < 1e-4


def test_sound_animator_gain_position():
    clock = StepClock(TimePoint(1, 30))
    anim = SoundAnimator(clock)
    anim.set_state(ElementState(audio_gain=0.5, audio_pos=(0.25, -0.5)),
                   TimePoint(0, 1000))
    s = _sample(np.zeros(64, np.int16), TimePoint(0, 48000))
    out = anim(s).value()
    from swiftvideo_tpu.utils.matrix import audio_position_gain
    pos, gain = audio_position_gain(out.transform)
    assert abs(gain - 0.5) < 1e-6
    assert np.allclose(pos, [0.25, -0.5], atol=1e-6)


def test_hidden_and_muted_swallow_samples():
    clock = StepClock(TimePoint(1, 30))
    panim = PictureAnimator(clock, canvas_size=(100, 100))
    panim.set_state(ElementState(hidden=True), TimePoint(0, 1000))
    pic = create_picture_sample((8, 8), PixelFormat.y420p, asset_id="a",
                                workspace_id="w")
    assert panim(pic).is_nothing()
    sanim = SoundAnimator(clock)
    sanim.set_state(ElementState(muted=True), TimePoint(0, 1000))
    assert sanim(_sample(np.zeros(4, np.int16), TimePoint(0, 48000))).is_nothing()


def test_repeater_goes_dormant_after_chain_drop():
    """A dropped downstream chain must stop the repeater's clock
    rescheduling (repeater.swift holds self weakly and dies with the
    chain); before the fix every bind/unbind leaked a Repeater plus one
    scheduled callback per interval forever."""
    import gc
    clock = StepClock(TimePoint(1000, 30000))
    rep = Repeater(clock, TimePoint(1000, 30000))
    got = []
    chain = rep >> Tx(lambda s: (got.append(s), EventBox.just(s))[1])
    chain("frame0")
    clock.step()
    assert got == ["frame0", "frame0"]
    del chain
    gc.collect()
    for _ in range(6):
        clock.step()
    # emit() returned gone -> repeater went dormant: no further
    # callbacks pending on the clock
    assert len(clock._scheduled) == 0
    assert got == ["frame0", "frame0"]


def test_picture_animator_overlapping_transitions():
    """A second set_state supersedes the first; the FIRST transition's
    deadline callback must not truncate the second (stale complete)."""
    clock = StepClock(TimePoint(1, 10))
    anim = PictureAnimator(clock, canvas_size=(100, 100))
    anim.set_state(ElementState(pic_pos=(0, 0), size=(10, 10)),
                   TimePoint(0, 1000))
    f1 = anim.set_state(ElementState(pic_pos=(10, 10), size=(10, 10)),
                        TimePoint(1, 1))       # 1 s
    for _ in range(5):
        clock.step()                            # t = 0.5
    target_c = ElementState(pic_pos=(50, 50), size=(10, 10))
    f2 = anim.set_state(target_c, TimePoint(1, 1))   # new 1 s transition
    for _ in range(6):
        clock.step()                            # t = 1.1: f1 deadline passed
    # the stale deadline resolved f1 but did NOT promote/truncate
    assert f1.done()
    assert not f2.done()
    assert anim.next_state == target_c          # still transitioning to C
    for _ in range(5):
        clock.step()                            # t = 1.6: f2 completes
    assert f2.done() and anim.next_state is None
    assert anim.current_state == target_c


def test_sound_animator_immediate_cancels_transition():
    """An immediate set_state (duration 0) cancels a pending transition —
    stale next_state must not keep interpolating toward the superseded
    target nor be promoted by the old deadline callback."""
    clock = StepClock(TimePoint(1, 10))
    anim = SoundAnimator(clock)
    anim.set_state(ElementState(audio_gain=1.0), TimePoint(0, 1000))
    anim.set_state(ElementState(audio_gain=0.0), TimePoint(1, 1))  # 1 s fade
    clock.step()
    final = ElementState(audio_gain=0.5)
    anim.set_state(final, TimePoint(0, 1000))   # immediate
    assert anim.next_state is None and anim.transition_duration is None
    for _ in range(12):
        clock.step()                            # old deadline passes
    assert anim.current_state == final          # not promoted to the fade


def test_src_mid_stream_rate_change():
    """A mid-stream input rate change rebuilds the polyphase filter with
    the new L/M ratio instead of resampling at the wrong speed."""
    src = AudioSampleRateConversion(48000, 1, AudioFormat.f32p)
    pts = TimePoint(0, 44100)
    n1 = 0
    for i in range(20):
        buf = np.zeros(441, np.float32)
        box = src(_sample(buf, pts, rate=44100, channels=1,
                          fmt=AudioFormat.f32p, count=441))
        if box.is_just():
            n1 += sum(s.number_samples() for s in [box.value()])
        pts = pts + TimePoint(441, 44100)
    assert abs(n1 - 20 * 480) < 1000            # 44.1k -> 48k ratio
    # rate change: 32 kHz packets must now produce 1.5x samples
    n2 = 0
    pts = TimePoint(0, 32000)
    for i in range(20):
        buf = np.zeros(320, np.float32)
        box = src(_sample(buf, pts, rate=32000, channels=1,
                          fmt=AudioFormat.f32p, count=320))
        if box.is_just():
            n2 += box.value().number_samples()
    assert src._resampler.in_rate == 32000
    assert abs(n2 - 20 * 480) < 1000            # 32k -> 48k ratio


def test_segmenter_f64_planar():
    """8-byte formats (f64/s64) were allocated at 2 units per sample
    instead of 1 per planar buffer; a ramp must survive re-chunking."""
    seg = AudioPacketSegmenter(TimePoint(960, 48000))
    ramp = np.arange(1024 * 8, dtype=np.float64)
    out = []
    pts = TimePoint(0, 48000)
    for i in range(8):
        chunk = ramp[i * 1024:(i + 1) * 1024]
        s = AudioSample(buffers=(chunk, chunk.copy()), frequency=48000,
                        channels=2, format=AudioFormat.f64p,
                        sample_count=1024, pts_value=pts,
                        id_asset="a", id_workspace="w")
        box = seg(s)
        if box.is_just():
            out.extend(box.value())
        pts = pts + TimePoint(1024, 48000)
    assert out and all(s.number_samples() == 960 for s in out)
    assert all(np.asarray(s.data()[0]).size == 960 for s in out)
    cat = np.concatenate([np.asarray(s.data()[0]) for s in out])
    assert np.array_equal(cat, ramp[:cat.size])


def test_repeater_single_armed_timer():
    """The repeater keeps ONE armed clock callback regardless of input
    rate (arming per received sample floods the clock queue at frame
    rate x source count in a composer wall)."""
    clock = StepClock(TimePoint(1000, 30000))
    rep = Repeater(clock, TimePoint(500, 1000))      # 500 ms hold
    got = []
    chain = rep >> Tx(lambda s: (got.append(s), EventBox.just(s))[1])
    for i in range(100):                             # 30 fps input
        chain(f"frame{i}")
        clock.step()
        assert len(clock._scheduled) <= 1, len(clock._scheduled)
    assert len(got) == 100                           # passthrough intact


def test_src_rate_change_through_passthrough_segment():
    """44.1k -> (exact 48k passthrough) -> 44.1k: the passthrough segment
    is a boundary — returning to a resampled rate must re-anchor pts from
    the stream (not resume the stale pre-passthrough anchor, which would
    jump the timeline backwards) and must not leak segment-1 filter
    history into segment 3."""
    src = AudioSampleRateConversion(48000, 2, AudioFormat.s16i)
    blank441 = np.zeros(1024 * 2, np.int16)
    blank48 = np.zeros(960 * 2, np.int16)
    pts = TimePoint(0, 44100)
    for _ in range(20):                       # segment 1: resampled
        src(_sample(blank441, pts, rate=44100))
        pts = pts + TimePoint(1024, 44100)
    r1 = src._resampler
    assert r1 is not None and src._pts is not None
    out48 = src(_sample(blank48, TimePoint(48000 * 100, 48000)))
    assert out48.is_just()                    # segment 2: pure passthrough
    assert out48.value().pts().value == 48000 * 100
    assert src._resampler is None and src._pts is None   # boundary reset
    # segment 3: back to 44.1k much later in stream time
    from swiftvideo_tpu.core.time import rescale
    late = TimePoint(44100 * 200, 44100)     # t = 200 s
    first = None
    p = late
    for _ in range(4):
        box = src(_sample(blank441, p, rate=44100))
        if first is None and box.is_just():
            first = box.value()
        p = p + TimePoint(1024, 44100)
    assert src._resampler is not None and src._resampler is not r1
    assert first is not None
    # pts re-anchored at the NEW segment's start (t=200 s), not resumed
    # from the stale pre-passthrough anchor (t~0.46 s)
    assert first.pts().value == rescale(late, 48000).value
