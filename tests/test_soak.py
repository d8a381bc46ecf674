"""Production soak: a Composer driven for thousands of virtual-time ticks
with sources joining, leaving, and stalling mid-run.

The reference is designed to run 24/7 behind an RTMP ingest
(composer.swift + mix.audio.swift recovery paths); these tests assert the
invariants that keep such a deployment healthy: bounded internal queues
(no leak when a source stalls or leaves), monotonic output pts at the
exact configured cadence through underruns, continuous frame emission,
and binding-state GC on unbind.
"""

import numpy as np

from swiftvideo_tpu.compose import Composer
from swiftvideo_tpu.core import Bus, EventBox, StepClock, TimePoint, Tx
from swiftvideo_tpu.media import PixelFormat, create_picture_sample
from swiftvideo_tpu.media.audio import AudioFormat, AudioSample
from swiftvideo_tpu.ops import make_compute_context
from swiftvideo_tpu.scene import Composition, Element, ElementState, Scene

TICK = TimePoint(480, 48000)          # 10 ms audio cadence
FRAME = TimePoint(1000, 30000)        # 30 fps video


def _composition(n_elements=3, canvas=(96, 54)):
    els = tuple(
        Element(name=f"e{i}", z_index=i,
                initial_state=ElementState(pic_pos=(i * 16, i * 8),
                                           size=(48, 27)))
        for i in range(n_elements))
    return Composition(
        name="soak", canvas_size=canvas, frame_duration=FRAME,
        audio_frame_duration=TICK, sample_rate=48000, channel_count=2,
        scenes=(Scene(name="main", elements=els),), initial_scene="main")


class _Feeder:
    """Feeds one asset's A/V into the buses at the configured cadence."""

    def __init__(self, asset, picture_bus, audio_bus, y=100):
        self.asset = asset
        self.picture_bus = picture_bus
        self.audio_bus = audio_bus
        self.y = y
        self.audio_pts = 0            # samples @48k
        self.frames_sent = 0
        self.active = True

    def tick(self, i):
        if not self.active:
            return
        # one 480-sample stereo packet per tick
        data = np.full(960, 50, np.int16)
        self.audio_bus.append(EventBox.just(AudioSample(
            buffers=(data,), frequency=48000, channels=2,
            format=AudioFormat.s16i, sample_count=480,
            id_asset=self.asset, id_workspace="w",
            pts_value=TimePoint(self.audio_pts, 48000))))
        self.audio_pts += 480
        # a new frame whenever 10 ms ticks cross a 33.3 ms frame boundary
        if (i * 10) // 33 > ((i - 1) * 10) // 33:
            pict = create_picture_sample((48, 28), PixelFormat.y420p,
                                         asset_id=self.asset,
                                         workspace_id="w")
            pict.planes()[0][:] = self.y
            pict = pict.with_(revision=f"{self.asset}-r{self.frames_sent}")
            self.picture_bus.append(EventBox.just(pict))
            self.frames_sent += 1


def test_soak_composer_join_leave_stall():
    clock = StepClock(TICK)
    audio_bus, picture_bus = Bus(clock), Bus(clock)
    comp = _composition()
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=audio_bus, picture_bus=picture_bus,
                        compute_context=make_compute_context("golden"))

    video_out, audio_out = [], []
    sub_p = picture_bus.subscribe(Tx(
        lambda s: (video_out.append((s.pts(), s)), EventBox.just(s))[1]
        if s.asset_id() == "soak" else EventBox.nothing(None)))
    sub_a = audio_bus.subscribe(Tx(
        lambda s: (audio_out.append((s.pts(), np.asarray(s.data()[0]))),
                   EventBox.just(s))[1]
        if s.asset_id() == composer.audio_mixer.asset_id()
        else EventBox.nothing(None)))

    feeders = {name: _Feeder(name, picture_bus, audio_bus, y=80 + 60 * i)
               for i, name in enumerate(["camA", "camB"])}
    composer.bind("camA", "e0")
    composer.bind("camB", "e1")

    N = 2400                          # 24 s of media
    queue_peak = 0
    sizes_at_checkpoint = None
    for i in range(1, N + 1):
        if i == 600:                  # camC joins live
            feeders["camC"] = _Feeder("camC", picture_bus, audio_bus, y=220)
            composer.bind("camC", "e2")
        if i == 1200:                 # camB leaves
            feeders["camB"].active = False
            composer.unbind("camB")
        if i == 1600:                 # camA stalls for 300 ms...
            feeders["camA"].active = False
        if i == 1630:                 # ...and resumes (discontinuity path)
            f = feeders["camA"]
            f.active = True
            # a realtime source resumes at "now", not where it left off
            f.audio_pts = i * 480
        for f in feeders.values():
            f.tick(i)
        clock.step()
        with composer.audio_mixer._lock:
            depth = sum(len(q) for q in composer.audio_mixer._samples.values())
        queue_peak = max(queue_peak, depth)
        if i == 500:
            sizes_at_checkpoint = depth

    # --- output continuity ------------------------------------------------
    # video ticks fire every FRAME from the mixer's own schedule
    assert len(video_out) >= (N * 10) // 34 - 2
    vpts = [p for p, _ in video_out]
    assert all(b > a for a, b in zip(vpts, vpts[1:])), "video pts not monotonic"
    # audio: exactly one 480-sample frame per tick, pts stride exact —
    # through the join, the leave, AND the stall (underrun ticks still
    # emit: mix.audio.swift:201-208 re-anchors instead of gapping)
    assert len(audio_out) >= N - 2
    apts = [p for p, _ in audio_out]
    strides = {(b - a).value for a, b in zip(apts, apts[1:])}
    assert strides == {480}, f"audio pts strides {strides}"

    # --- bounded state ----------------------------------------------------
    # per-tick consumption keeps the backlog to the coverage window, and a
    # stalled/removed source must not leave a growing queue behind
    # ~7 queued per live source = the 2-frame anchor offset + coverage
    # window; growth past that means a tick isn't consuming its input
    assert queue_peak <= 12 * len(feeders), \
        f"audio queue peaked at {queue_peak}"
    with composer.audio_mixer._lock:
        final_depth = sum(len(q)
                          for q in composer.audio_mixer._samples.values())
        assert "camB" not in composer.audio_mixer._samples
    assert final_depth <= max(sizes_at_checkpoint, 8), \
        f"queues grew {sizes_at_checkpoint} -> {final_depth}"
    assert {a for a, _e in composer._bindings} == {"camA", "camC"}
    # two-generation video map holds at most one frame per live revision
    with composer.video_mixer._lock:
        assert all(len(g) <= len(feeders) for g in
                   composer.video_mixer._samples)

    # --- content sanity ---------------------------------------------------
    y_last = np.asarray(video_out[-1][1].planes()[0])
    assert abs(int(y_last[14, 24]) - 80) <= 1      # camA in e0
    assert abs(int(y_last[30, 40]) - 220) <= 1     # camC in e2
    # camB's old element area shows camC overlap or clear, not stale camB
    mixed = np.asarray(audio_out[-1][1])
    assert mixed.dtype == np.int16 and mixed.size == 960
    composer.close()
    del sub_p, sub_a


def test_soak_rtmp_loopback_sustained():
    """2000 frames through real sockets: publish -> chunk -> TCP ->
    deserialize -> subscribe without loss, and the session cores keep no
    unbounded buffers (the deserializer's offset-walk buffer compacts)."""
    import asyncio
    import socket

    from swiftvideo_tpu.media.coded import (CodedMediaSample, MediaFormat,
                                            MediaType)
    from swiftvideo_tpu.net.rtmp import Rtmp

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    async def run():
        clock = StepClock(TimePoint(16, 1000))
        received, keep = [], {}

        async def on_connection(pub, sub):
            if sub is not None:
                keep["chain"] = sub >> Tx(
                    lambda s: (received.append(s), EventBox.nothing(None))[1])
            return True

        server = Rtmp(clock, on_connection=on_connection)
        await server.serve("127.0.0.1", port)
        client = Rtmp(clock)
        pub, _ = await client.connect(
            f"rtmp://127.0.0.1:{port}/soak/stream",
            publish_to_peer=True, max_attempts=3, retry_delay=0.2)
        rng = np.random.default_rng(3)
        data = bytearray(rng.integers(0, 256, 7993).astype(np.uint8)
                         .tobytes())
        data[4] = 0x65
        payload = bytes(data)
        for _ in range(14):                 # metadata grace (200 ms)
            clock.step()
            await asyncio.sleep(0)
        ts = TimePoint(0, 1000)
        n = 2000
        for i in range(n):
            pub.apply(EventBox.just(CodedMediaSample(
                buffer=payload, pts_value=ts, dts_value=ts,
                media_type=MediaType.video, media_format=MediaFormat.avc,
                id_asset="soak", id_workspace="w",
                side={"config": bytes(48)})))
            ts = ts + TimePoint(16, 1000)
            clock.step()
            if i % 16 == 0:
                await asyncio.sleep(0)
        deadline = asyncio.get_event_loop().time() + 20.0
        while (len(received) < n
               and asyncio.get_event_loop().time() < deadline):
            await asyncio.sleep(0)
        # session-core buffers must be compacted, not the whole backlog
        for state in server._sessions.values():
            core = state["core"]
            assert core.deserializer.pending < 1 << 20
            assert not core.fatal
        pub.close()
        await server.close()
        return received

    received = asyncio.run(run())
    assert len(received) == 2000
    assert received[-1].pts().value == 1999 * 16
    assert received[-1].data() == received[0].data()


def test_soak_audio_mixer_drops_stale_backlog():
    """A source that floods 5 s of future audio then disappears: the
    mixer consumes the backlog tick by tick and its queue drains to
    empty instead of pinning memory."""
    from swiftvideo_tpu.mix.audio_mixer import AudioMixer

    clock = StepClock(TICK)
    mixer = AudioMixer(clock, workspace_id="w", frame_duration=TICK,
                       sample_rate=48000, channel_count=2)
    out = []
    keep = mixer >> Tx(lambda s: (out.append(s), EventBox.just(s))[1])
    for k in range(500):              # 5 s of media, delivered instantly
        mixer.apply(EventBox.just(AudioSample(
            buffers=(np.full(960, 7, np.int16),), frequency=48000,
            channels=2, format=AudioFormat.s16i, sample_count=480,
            id_asset="burst", id_workspace="w",
            pts_value=TimePoint(k * 480, 48000))))
    with mixer._lock:
        assert len(mixer._samples["burst"]) == 500
    for _ in range(560):
        clock.step()
    with mixer._lock:
        backlog = len(mixer._samples.get("burst", []))
    # <=1: the window-overlap test keeps at most the boundary sample
    assert backlog <= 1, f"backlog retained {backlog} samples"
    assert len(out) >= 550
    mixer.close()
    del keep


def test_soak_concurrent_rtmp_ingest_16_publishers():
    """16 simultaneous publishers into ONE server/event loop — the
    reference's RtmpServer shape (Examples/RtmpServer/main.swift) and
    BASELINE config 5's ingest pattern.  Asserts per-session frame
    integrity: every session delivers every frame, in pts order, with
    per-stream distinct payload content intact (no cross-session chunk
    interleaving corruption), and every session core stays healthy."""
    import asyncio
    import socket

    from swiftvideo_tpu.media.coded import (CodedMediaSample, MediaFormat,
                                            MediaType)
    from swiftvideo_tpu.net.rtmp import Rtmp

    n_pub, n_frames = 16, 120

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    async def run():
        clock = StepClock(TimePoint(16, 1000))
        received, keep = {}, []

        async def on_connection(pub, sub):
            if sub is not None:
                lst = received.setdefault(sub.play_path(), [])
                keep.append(sub >> Tx(
                    lambda s, lst=lst: (lst.append(s),
                                        EventBox.nothing(None))[1]))
            return True

        server = Rtmp(clock, on_connection=on_connection)
        await server.serve("127.0.0.1", port)
        pubs = []
        for k in range(n_pub):
            client = Rtmp(clock)
            pub, _ = await client.connect(
                f"rtmp://127.0.0.1:{port}/soak/cam{k}",
                publish_to_peer=True, max_attempts=3, retry_delay=0.2)
            pubs.append(pub)
        for _ in range(14):                 # metadata grace (224 ms)
            clock.step()
            await asyncio.sleep(0)
        rng = np.random.default_rng(9)
        base = rng.integers(0, 256, 4093).astype(np.uint8).tobytes()

        def payload(k, i):
            # per-(session, frame) unique first bytes after the NAL
            head = bytearray(base[:16])
            head[4] = 0x65
            head[5], head[6] = k, i % 251
            return bytes(head) + base[16:]

        ts = TimePoint(0, 1000)
        for i in range(n_frames):
            for k, pub in enumerate(pubs):
                pub.apply(EventBox.just(CodedMediaSample(
                    buffer=payload(k, i), pts_value=ts, dts_value=ts,
                    media_type=MediaType.video, media_format=MediaFormat.avc,
                    id_asset=f"cam{k}", id_workspace="w",
                    side={"config": bytes(48)})))
            ts = ts + TimePoint(16, 1000)
            clock.step()
            await asyncio.sleep(0)
        deadline = asyncio.get_event_loop().time() + 30.0
        while (sum(len(v) for v in received.values()) < n_pub * n_frames
               and asyncio.get_event_loop().time() < deadline):
            await asyncio.sleep(0)
        for state in server._sessions.values():
            core = state["core"]
            assert core.deserializer.pending < 1 << 20
            assert not core.fatal
        for pub in pubs:
            pub.close()
        await server.close()
        return received

    received = asyncio.run(run())
    assert len(received) == n_pub
    for k in range(n_pub):
        frames = received[f"cam{k}"]
        assert len(frames) == n_frames, f"cam{k}: {len(frames)}"
        for i, f in enumerate(frames):
            assert f.pts().value == i * 16          # in order, no gaps
            d = f.data()
            assert d[5] == k and d[6] == i % 251    # no cross-talk
