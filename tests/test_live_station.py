"""Full live-mixing station over real sockets: RTMP ingest -> bitstream
decode -> Composer (mix) -> bitstream encode -> RTMP egress.

This is the reference's production topology end-to-end in one event loop
(Examples/RtmpServer ingest + composer.swift element chains + rtmp.swift
publish), with the codec legs running through the subprocess backend via
tests/mock_ffmpeg.py (lossless frame payloads, so the final assertion is
pixel-exact through FIVE hops: encode -> RTMP -> decode -> composite ->
encode -> RTMP -> decode).
"""

import asyncio
import os
import socket

import numpy as np
import pytest

from swiftvideo_tpu.codec.codecs import VideoDecoder, VideoEncoder
from swiftvideo_tpu.codec.transcode import flat
from swiftvideo_tpu.compose import Composer
from swiftvideo_tpu.core import Bus, EventBox, StepClock, TimePoint, Tx
from swiftvideo_tpu.media import (MediaFormat, PixelFormat,
                                  create_picture_sample)
from swiftvideo_tpu.scene import Composition, Element, ElementState, Scene

MOCK_FFMPEG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "mock_ffmpeg.py")

TICK = TimePoint(480, 48000)           # 10 ms
FRAME = TimePoint(1000, 30000)         # 30 fps


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _encode_cam(luma: int, asset: str, n: int = 12):
    """Synthetic constant-luma 48x28 frames through the mock avc encoder."""
    enc = VideoEncoder(MediaFormat.avc)
    coded = []
    for i in range(n):
        pict = create_picture_sample((48, 28), PixelFormat.y420p,
                                     asset_id=asset, workspace_id="w")
        pict.planes()[0][:] = luma
        pict.planes()[1][:] = 128
        pict.planes()[2][:] = 128
        box = enc(pict.with_(pts=TimePoint(i * 33, 1000)))
        if box.is_just():
            v = box.value()
            coded.extend(v if isinstance(v, list) else [v])
    coded.extend(enc.flush())
    enc.close()
    assert len(coded) == n, f"{asset}: {len(coded)} coded frames"
    return coded


@pytest.fixture
def mock_ffmpeg(monkeypatch):
    monkeypatch.setenv("SWIFTVIDEO_FFMPEG", MOCK_FFMPEG)
    return MOCK_FFMPEG


def test_live_station_rtmp_mix_rtmp(mock_ffmpeg):
    from swiftvideo_tpu.net.rtmp import Rtmp

    cam1 = _encode_cam(60, "cam1", 40)
    cam2 = _encode_cam(180, "cam2", 40)

    comp = Composition(
        name="program", canvas_size=(96, 56), frame_duration=FRAME,
        audio_frame_duration=TICK, sample_rate=48000, channel_count=2,
        scenes=(Scene(name="main", elements=(
            Element(name="left", z_index=0,
                    initial_state=ElementState(pic_pos=(0, 0),
                                               size=(48, 28))),
            Element(name="right", z_index=1,
                    initial_state=ElementState(pic_pos=(48, 28),
                                               size=(48, 28))),
        )),), initial_scene="main")

    port_in, port_out = _free_port(), _free_port()
    received = []            # mixed CodedMediaSamples arriving at egress

    async def run():
        clock = StepClock(TICK)
        audio_bus, picture_bus = Bus(clock), Bus(clock)
        composer = Composer(clock, workspace_id="w", composition=comp,
                            audio_bus=audio_bus, picture_bus=picture_bus)
        keep = []            # anchor weak emit chains
        decoders = []

        # --- ingest server: decode each publisher onto the picture bus ---
        async def on_ingest(pub, sub):
            if sub is not None:
                name = sub.play_path()           # "cam1" / "cam2"
                dec = VideoDecoder()
                decoders.append(dec)

                def to_bus(pict, name=name):
                    picture_bus.append(EventBox.just(
                        pict.with_(asset_id=name)))
                    return EventBox.nothing(None)

                keep.append(sub >> flat(dec) >> flat(Tx(to_bus)))
            return True

        ingest = Rtmp(clock, on_connection=on_ingest)
        await ingest.serve("127.0.0.1", port_in)

        # --- egress server: collect the mixed program stream --------------
        async def on_egress(pub, sub):
            if sub is not None:
                keep.append(sub >> Tx(
                    lambda s: (received.append(s),
                               EventBox.nothing(None))[1]))
            return True

        egress = Rtmp(clock, on_connection=on_egress)
        await egress.serve("127.0.0.1", port_out)

        # --- program output: composited frames -> encoder -> publisher ----
        out_client = Rtmp(clock)
        out_pub, _ = await out_client.connect(
            f"rtmp://127.0.0.1:{port_out}/live/program",
            publish_to_peer=True, max_attempts=3, retry_delay=0.2)
        out_enc = VideoEncoder(MediaFormat.avc)

        def to_egress(sample):
            out_pub.apply(EventBox.just(sample))
            return EventBox.nothing(None)

        from swiftvideo_tpu.core import asset_filter
        keep.append(picture_bus.subscribe(
            asset_filter(comp.name) >> flat(out_enc) >> flat(Tx(to_egress))))

        composer.bind("cam1", "left")
        composer.bind("cam2", "right")

        # --- publishers: feed the pre-encoded cams into ingest ------------
        pubs = []
        for name, coded in (("cam1", cam1), ("cam2", cam2)):
            client = Rtmp(clock)
            pub, _ = await client.connect(
                f"rtmp://127.0.0.1:{port_in}/live/{name}",
                publish_to_peer=True, max_attempts=3, retry_delay=0.2)
            pubs.append((pub, coded))

        # publishers drop media until their 200 ms (clock-time) metadata
        # grace timer fires (live semantics) — step past it first
        for _ in range(24):
            clock.step()
            await asyncio.sleep(0)

        for i in range(40):
            for pub, coded in pubs:
                pub.apply(EventBox.just(coded[i]))
            # ~3.3 clock ticks per 33 ms frame
            for _ in range(3):
                clock.step()
                await asyncio.sleep(0.002)

        # drain: decoder reader threads + mixer ticks + egress delivery
        deadline = asyncio.get_event_loop().time() + 20.0
        while (len(received) < 20
               and asyncio.get_event_loop().time() < deadline):
            clock.step()
            await asyncio.sleep(0.01)

        out_pub.close()
        for pub, _ in pubs:
            pub.close()
        await ingest.close()
        await egress.close()
        composer.close()
        for d in decoders:
            d.close()
        out_enc.close()

    asyncio.run(run())
    assert len(received) >= 20, f"only {len(received)} mixed frames egressed"

    # decode the LAST mixed frame (both cams live by then) and check the
    # composited regions pixel-exactly (mock codec is lossless)
    dec = VideoDecoder()
    frames = []
    for s in received:
        box = dec(s)
        if box.is_just():
            v = box.value()
            frames.extend(v if isinstance(v, list) else [v])
    frames.extend(dec.flush())
    dec.close()
    assert frames, "egress stream did not decode"
    last = frames[-1]
    y = np.asarray(last.planes()[0])
    assert y.shape == (56, 96)
    # interior probes (away from bilinear borders)
    assert abs(int(y[10, 10]) - 60) <= 1, y[10, 10]      # cam1 in "left"
    assert abs(int(y[42, 70]) - 180) <= 1, y[42, 70]     # cam2 in "right"
    assert int(y[10, 70]) <= 1                           # background clear
    assert int(y[42, 10]) <= 1
