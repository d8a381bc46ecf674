"""VideoMixer + Composer end-to-end tests on virtual time.

The reference had no video-mixer numerical tests (SURVEY.md §4 gap); these
validate composed output pixels against the golden oracle, the
two-generation frame-hold behavior (mix.video.swift:105-114), z-ordering,
and the composer's bind/scene wiring (composer.swift:203-224).
"""

import numpy as np

from swiftvideo_tpu.core import Bus, EventBox, StepClock, TimePoint, Tx
from swiftvideo_tpu.media import PixelFormat, create_picture_sample
from swiftvideo_tpu.mix import VideoMixer
from swiftvideo_tpu.ops import golden, make_compute_context, rect_uniforms
from swiftvideo_tpu.scene import Composition, Element, ElementState, Scene
from swiftvideo_tpu.utils import matrix as m4

FRAME = TimePoint(1000, 30000)


def _source(y_value, size=(32, 32), asset="cam", rev="r1", rect=None,
            canvas=(64, 64), z=0):
    s = create_picture_sample(size, PixelFormat.y420p, asset_id=asset,
                              workspace_id="w")
    s.planes()[0][:] = y_value
    if rect is not None:
        x, y, w, h = rect
        proj = m4.ortho(*canvas)
        model = proj @ m4.translation(x, y, z) @ m4.scale(w, h)
        s = s.with_(matrix=model, revision=rev)
    else:
        s = s.with_(revision=rev)
    return s


def test_mixer_composites_and_repeats():
    clock = StepClock(FRAME)
    ctx = make_compute_context("golden")
    mixer = VideoMixer(clock, workspace_id="w", frame_duration=FRAME,
                       output_size=(64, 64), output_format=PixelFormat.y420p,
                       compute_context=ctx, asset_id="mix")
    frames = []
    pipe = mixer >> Tx(lambda s: (frames.append(s), EventBox.just(s))[1])

    src = _source(200, rect=(0, 0, 32, 32))
    mixer.apply(EventBox.just(src))
    clock.step()  # tick 1: fresh generation
    clock.step()  # tick 2: held generation (no new frame)
    clock.step()  # tick 3: sample aged out of both generations
    assert len(frames) == 3
    y0 = np.asarray(frames[0].planes()[0])
    assert y0.shape == (64, 64)
    assert abs(int(y0[16, 16]) - 200) <= 1   # source visible
    assert y0[48, 48] == 0                   # cleared area
    y1 = np.asarray(frames[1].planes()[0])
    assert abs(int(y1[16, 16]) - 200) <= 1   # held frame repeated
    y2 = np.asarray(frames[2].planes()[0])
    assert y2[16, 16] == 0                   # gone after two generations
    # pts cadence: tick - epoch
    assert frames[0].pts() == TimePoint(1000, 30000)
    assert frames[1].pts() == TimePoint(2000, 30000)
    mixer.close()


def test_mixer_z_order_matches_golden():
    clock = StepClock(FRAME)
    ctx = make_compute_context("golden")
    mixer = VideoMixer(clock, workspace_id="w", frame_duration=FRAME,
                       output_size=(64, 64), output_format=PixelFormat.y420p,
                       compute_context=ctx, asset_id="mix")
    frames = []
    pipe = mixer >> Tx(lambda s: (frames.append(s), EventBox.just(s))[1])
    a = _source(60, asset="a", rev="ra", rect=(0, 0, 48, 48), z=0)
    b = _source(180, asset="b", rev="rb", rect=(16, 16, 48, 48), z=1)
    mixer.apply(EventBox.just(b))  # arrival order != z order
    mixer.apply(EventBox.just(a))
    clock.step()
    y = np.asarray(frames[0].planes()[0])
    # golden reference: clear + a then b (z-sorted)
    expect = golden.composite_stack(
        PixelFormat.y420p, (64, 64),
        [(list(a.planes()), PixelFormat.y420p,
          rect_uniforms((32, 32), (64, 64), x=0, y=0, w=48, h=48)),
         (list(b.planes()), PixelFormat.y420p,
          rect_uniforms((32, 32), (64, 64), x=16, y=16, w=48, h=48))])
    assert np.array_equal(y, expect[0])
    mixer.close()


def test_mixer_device_backend():
    """Same composite through the jitted XLA path."""
    clock = StepClock(FRAME)
    ctx = make_compute_context("jax")
    mixer = VideoMixer(clock, workspace_id="w", frame_duration=FRAME,
                       output_size=(32, 32), output_format=PixelFormat.y420p,
                       compute_context=ctx, asset_id="mix")
    frames = []
    pipe = mixer >> Tx(lambda s: (frames.append(s), EventBox.just(s))[1])
    mixer.apply(EventBox.just(_source(120, size=(16, 16),
                                      rect=(0, 0, 32, 32), canvas=(32, 32))))
    clock.step()
    y = np.asarray(frames[0].planes()[0])
    assert abs(int(y[16, 16]) - 120) <= 1
    from swiftvideo_tpu.media import BufferType
    assert frames[0].buffer_type() == BufferType.gpu
    mixer.close()


def test_composer_end_to_end():
    """Composer wires buses -> animators -> mixers; a bound asset's frames
    appear composited in the configured element rect."""
    clock = StepClock(TimePoint(480, 48000))
    audio_bus = Bus(clock)
    picture_bus = Bus(clock)
    comp = Composition(
        name="comp", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        sample_rate=48000, channel_count=2,
        scenes=(Scene(name="main", elements=(
            Element(name="left", initial_state=ElementState(
                pic_pos=(0, 0), size=(32, 64))),
            Element(name="right", initial_state=ElementState(
                pic_pos=(32, 0), size=(32, 64)), z_index=1),
        )),),
        initial_scene="main")
    from swiftvideo_tpu.compose import Composer
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=audio_bus, picture_bus=picture_bus,
                        compute_context=make_compute_context("golden"))
    got = []
    sub = picture_bus.subscribe(Tx(
        lambda s: (got.append(s), EventBox.just(s))[1]
        if s.asset_id() == "comp" else EventBox.nothing(None)))
    composer.bind("camA", "left")
    src = _source(220, asset="camA", rev="ignored")
    picture_bus.append(EventBox.just(src))
    for _ in range(100):  # let video ticks fire (audio clock steps 10 ms)
        clock.step()
    mixed = [s for s in got if s.asset_id() == "comp"]
    assert mixed
    y = np.asarray(mixed[-1].planes()[0])
    assert abs(int(y[32, 8]) - 220) <= 1   # left element shows camA
    assert y[32, 48] == 0                  # right element empty
    composer.close()


def test_composer_run_command_tree():
    """Recursive command trees with after-continuations
    (composer.swift:141-183)."""
    from swiftvideo_tpu.compose import (BindCommand, Composer, ComposerCommand,
                                        SetSceneCommand, SetStateCommand)
    clock = StepClock(TimePoint(480, 48000))
    comp = Composition(
        name="c", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        scenes=(Scene(name="a", elements=(
            Element(name="e1", initial_state=ElementState(size=(32, 32))),)),
            Scene(name="b", elements=(
                Element(name="e2", initial_state=ElementState(size=(16, 16))),))),
        initial_scene="a")
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=Bus(clock), picture_bus=Bus(clock),
                        compute_context=make_compute_context("golden"))
    cmd = ComposerCommand(
        set_scene=SetSceneCommand(scene="b"),
        after=(ComposerCommand(bind=BindCommand(asset_id="cam", element="e2"),
                               after=(ComposerCommand(set_state=SetStateCommand(
                                   element="e2",
                                   state=ElementState(size=(20, 20)))),)),))
    fut = composer.run_command(cmd)
    assert fut.done() and fut.result() is True
    assert composer.get_element_state("e2").size == (20, 20)
    assert any(a == "cam" for a, _e in composer._bindings)
    composer.close()


def test_composer_scene_change_keeps_bound_animators():
    """A scene switch must not sever live bindings: the reference remaps the
    element table in place (composer.swift:111-135), so an element present in
    both scenes keeps its animator objects and a bound asset keeps flowing;
    elements parked out of the new scene get their parents detached."""
    from swiftvideo_tpu.compose import Composer
    clock = StepClock(TimePoint(480, 48000))
    audio_bus, picture_bus = Bus(clock), Bus(clock)
    comp = Composition(
        name="comp", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        sample_rate=48000, channel_count=2,
        scenes=(
            Scene(name="a", elements=(
                Element(name="stay", initial_state=ElementState(
                    pic_pos=(0, 0), size=(32, 64))),
                Element(name="park", parent="stay",
                        initial_state=ElementState(size=(8, 8))),
            )),
            Scene(name="b", elements=(
                Element(name="stay", initial_state=ElementState(
                    pic_pos=(32, 0), size=(32, 64)), z_index=2),
            )),
        ),
        initial_scene="a")
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=audio_bus, picture_bus=picture_bus,
                        compute_context=make_compute_context("golden"))
    composer.bind("camA", "stay")
    pic_before = composer._elements["stay"][1]
    park_pic = composer._elements["park"][1]
    assert park_pic.parent is pic_before

    composer.set_scene("b")
    # same animator object => the bound chain is still wired into the mixer
    assert composer._elements["stay"][1] is pic_before
    assert pic_before.z_index == 2
    # the parked element survives with its parent detached
    assert composer._elements["park"][1] is park_pic
    assert park_pic.parent is None

    got = []
    sub = picture_bus.subscribe(Tx(
        lambda s: (got.append(s), EventBox.just(s))[1]
        if s.asset_id() == "comp" else EventBox.nothing(None)))
    picture_bus.append(EventBox.just(_source(220, asset="camA", rev="r1")))
    for _ in range(100):
        clock.step()
    mixed = [s for s in got if s.asset_id() == "comp"]
    assert mixed
    y = np.asarray(mixed[-1].planes()[0])
    assert abs(int(y[32, 48]) - 220) <= 1   # element moved right in scene b
    assert y[32, 8] == 0
    composer.close()


def test_bus_digest_receives_stats():
    """Digest receivers collect per-dispatch results (bus.swift:156-158),
    the hook apps use to harvest StatsReport metrics."""
    from swiftvideo_tpu.core import StatsReport
    clock = StepClock(TimePoint(480, 48000))
    bus = Bus(clock)
    digests = []
    bus.set_digest_receiver(lambda results: digests.append(results))
    sub = bus.subscribe(Tx(lambda s: EventBox.just(s)))  # keep alive
    src = _source(100)
    bus.append(EventBox.just(src))
    assert digests and len(digests[0]) == 1
    assert digests[0][0].is_just()


def test_composer_snapshot_restore():
    """Scene + binding state survives a composer restart (checkpoint/resume
    beyond the reference's epoch-only story, SURVEY.md §5.4)."""
    import json
    from swiftvideo_tpu.compose import Composer
    comp = Composition(
        name="c", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        scenes=(Scene(name="main", elements=(
            Element(name="e1", initial_state=ElementState(size=(32, 32))),)),),
        initial_scene="main")

    clock1 = StepClock(TimePoint(480, 48000))
    c1 = Composer(clock1, workspace_id="w", composition=comp,
                  audio_bus=Bus(clock1), picture_bus=Bus(clock1),
                  compute_context=make_compute_context("golden"))
    c1.bind("cam", "e1")
    c1.set_state("e1", ElementState(size=(48, 20), pic_pos=(4, 6),
                                    transparency=0.25))
    blob = json.dumps(c1.snapshot())
    c1.close()

    clock2 = StepClock(TimePoint(480, 48000))
    c2 = Composer(clock2, workspace_id="w", composition=comp,
                  audio_bus=Bus(clock2), picture_bus=Bus(clock2),
                  compute_context=make_compute_context("golden"))
    c2.restore(json.loads(blob))
    st = c2.get_element_state("e1")
    assert st.size == (48, 20) and st.pic_pos == (4, 6)
    assert abs(st.transparency - 0.25) < 1e-6
    assert any(a == "cam" for a, _e in c2._bindings)
    c2.close()


def test_composer_audio_leg():
    """Audio flows bus -> SRC -> SoundAnimator -> AudioMixer and appears in
    the composer's mixed output with the element's gain applied."""
    from swiftvideo_tpu.compose import Composer
    from swiftvideo_tpu.media import AudioFormat, AudioSample
    clock = StepClock(TimePoint(480, 48000))
    audio_bus = Bus(clock)
    picture_bus = Bus(clock)
    comp = Composition(
        name="comp", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        sample_rate=48000, channel_count=2,
        scenes=(Scene(name="main", elements=(
            Element(name="e1", initial_state=ElementState(
                size=(64, 64), audio_gain=1.0)),)),),
        initial_scene="main")
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=audio_bus, picture_bus=picture_bus,
                        compute_context=make_compute_context("golden"))
    mixed = []
    sub = audio_bus.subscribe(Tx(
        lambda s: (mixed.append(s), EventBox.just(s))[1]
        if s.asset_id() == "comp" else EventBox.nothing(None)))
    composer.bind("micA", "e1")
    pts = TimePoint(0, 48000)
    for i in range(30):
        buf = np.full(480 * 2, 1000, np.int16)
        audio_bus.append(EventBox.just(AudioSample(
            buffers=(buf,), frequency=48000, channels=2,
            format=AudioFormat.s16i, sample_count=480,
            pts_value=pts, id_asset="micA", id_workspace="w")))
        pts = pts + TimePoint(480, 48000)
        clock.step()
    assert mixed
    # after warm-up frames, output carries the source signal
    tail = np.asarray(mixed[-1].data()[0])
    assert tail.shape == (480 * 2,)
    assert tail.max() >= 900  # gain ~1 applied to the 1000-level source
    assert any(c.id_asset == "micA" for c in mixed[-1].constituents())
    composer.close()


def test_stats_report_merging():
    """StatsReport.merging combines sample buckets (stats.swift:103-109,
    the EventInfo merge that rides event lists)."""
    from swiftvideo_tpu.core import StatsReport
    clock = StepClock(TimePoint(1000, 1000))
    a = StatsReport(asset_id="a", period=TimePoint(5000, 1000), clock=clock)
    b = StatsReport(asset_id="b", period=TimePoint(5000, 1000), clock=clock)
    while clock.current() <= TimePoint(10000, 1000):
        a.add_sample("m", 1)
        b.add_sample("m", 2)
        clock.step()
    merged = a.merging(b)
    assert merged.asset_id() == "b"


def test_mixer_skips_degenerate_source():
    """A zero-size (singular-matrix) source must not kill the frame."""
    clock = StepClock(FRAME)
    mixer = VideoMixer(clock, workspace_id="w", frame_duration=FRAME,
                       output_size=(32, 32), output_format=PixelFormat.y420p,
                       compute_context=make_compute_context("golden"),
                       asset_id="mix")
    frames = []
    pipe = mixer >> Tx(lambda s: (frames.append(s), EventBox.just(s))[1])
    good = _source(150, size=(16, 16), rect=(0, 0, 32, 32), canvas=(32, 32))
    bad = _source(99, size=(16, 16), asset="b", rev="rb",
                  rect=(0, 0, 0, 0), canvas=(32, 32))  # zero-size -> singular
    mixer.apply(EventBox.just(good))
    mixer.apply(EventBox.just(bad))
    clock.step()
    assert len(frames) == 1
    y = np.asarray(frames[0].planes()[0])
    assert abs(int(y[16, 16]) - 150) <= 1  # good source rendered
    mixer.close()


def test_mixer_rotated_source_takes_warp_path():
    """A rotated element routes through the gather-free warp fold
    (ops/composite.composite_stack_warp) and composites with the
    documented smooth-content tolerance."""
    from unittest import mock

    from swiftvideo_tpu.ops import composite as comp

    clock = StepClock(FRAME)
    ctx = make_compute_context("jax")
    mixer = VideoMixer(clock, workspace_id="w", frame_duration=FRAME,
                       output_size=(64, 64), output_format=PixelFormat.y420p,
                       compute_context=ctx, asset_id="mix")
    frames = []
    pipe = mixer >> Tx(lambda s: (frames.append(s), EventBox.just(s))[1])  # noqa: F841 (weak emit chain)

    s = create_picture_sample((32, 32), PixelFormat.y420p, asset_id="cam",
                              workspace_id="w")
    yy, xx = np.mgrid[0:32, 0:32]
    s.planes()[0][:] = (128 + 60 * np.sin(xx / 5.0)).astype(np.uint8)
    proj = m4.ortho(64, 64)
    model = (proj @ m4.translation(16, 16, 0) @ m4.rotation_z(0.4)
             @ m4.scale(32, 32))
    s = s.with_(matrix=model, revision="r1")

    with mock.patch.object(comp, "composite_stack_warp",
                           wraps=comp.composite_stack_warp) as spy:
        mixer.apply(EventBox.just(s))
        clock.step()
    assert spy.call_count == 1
    assert frames, "no frame emitted"
    y = np.asarray(frames[0].planes()[0])
    assert y.shape == (64, 64) and y.max() > 0   # something composited
    mixer.close()


def test_composer_same_asset_two_elements():
    """One asset bound to TWO elements (picture-in-picture of the same
    camera): bindings are keyed per (asset, element) like the
    reference's per-element connectElement, so the second bind must not
    silently drop the first element's chains."""
    clock = StepClock(TimePoint(480, 48000))
    audio_bus = Bus(clock)
    picture_bus = Bus(clock)
    comp = Composition(
        name="comp", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        sample_rate=48000, channel_count=2,
        scenes=(Scene(name="main", elements=(
            Element(name="main", initial_state=ElementState(
                pic_pos=(0, 0), size=(32, 64))),
            Element(name="pip", initial_state=ElementState(
                pic_pos=(32, 0), size=(32, 64)), z_index=1),
        )),),
        initial_scene="main")
    from swiftvideo_tpu.compose import Composer
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=audio_bus, picture_bus=picture_bus,
                        compute_context=make_compute_context("golden"))
    got = []
    sub = picture_bus.subscribe(Tx(
        lambda s: (got.append(s), EventBox.just(s))[1]
        if s.asset_id() == "comp" else EventBox.nothing(None)))
    composer.bind("cam", "main")
    composer.bind("cam", "pip")
    assert len(composer._bindings) == 2
    picture_bus.append(EventBox.just(_source(200, asset="cam")))
    for _ in range(100):
        clock.step()
    mixed = [s for s in got if s.asset_id() == "comp"]
    assert mixed
    y = np.asarray(mixed[-1].planes()[0])
    assert abs(int(y[32, 8]) - 200) <= 1    # first element still live
    assert abs(int(y[32, 48]) - 200) <= 1   # second element live too
    # narrow unbind removes one element; the asset stays mixed elsewhere
    composer.unbind("cam", "pip")
    assert list(composer._bindings) == [("cam", "main")]
    composer.unbind("cam")
    assert not composer._bindings
    composer.close()
    del sub


def test_composer_run_command_set_state_failure():
    """A failed set_state fails the command future and skips the after
    continuations instead of silently resolving True."""
    clock = StepClock(TimePoint(480, 48000))
    comp = Composition(
        name="comp", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        sample_rate=48000, channel_count=2,
        scenes=(Scene(name="main", elements=(
            Element(name="e1", initial_state=ElementState(
                pic_pos=(0, 0), size=(32, 32))),
        )),),
        initial_scene="main")
    from swiftvideo_tpu.compose import Composer, ComposerError
    from swiftvideo_tpu.scene import ComposerCommand, SetStateCommand
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=Bus(clock), picture_bus=Bus(clock),
                        compute_context=make_compute_context("golden"))
    ran_after = []
    cmd = ComposerCommand(
        set_state=SetStateCommand(element="no-such-element",
                                  state=ElementState(size=(1, 1))),
        after=(ComposerCommand(
            set_state=SetStateCommand(element="e1",
                                      state=ElementState(size=(9, 9)))),))
    fut = composer.run_command(cmd)
    assert fut.done()
    import pytest as _pytest
    with _pytest.raises(ComposerError):
        fut.result()
    # the after-command did NOT run
    assert composer.get_element_state("e1").size == (32, 32)
    composer.close()


def test_scene_change_disconnects_bindings_to_absent_elements():
    """The reference's setScene rebuilds every ElementAnimator WITHOUT its
    picTx/audioTx and reconnects only the new scene's elements
    (composer.swift:117-131): a binding to an element absent from the new
    scene must disconnect — otherwise its Repeater keeps feeding the last
    frame into the mixer as a ghost overlay and its audio keeps mixing."""
    from swiftvideo_tpu.compose import Composer
    clock = StepClock(TimePoint(480, 48000))
    audio_bus, picture_bus = Bus(clock), Bus(clock)
    comp = Composition(
        name="comp", canvas_size=(64, 64),
        frame_duration=TimePoint(1000, 30000),
        audio_frame_duration=TimePoint(480, 48000),
        sample_rate=48000, channel_count=2,
        scenes=(
            Scene(name="a", elements=(
                Element(name="bg", initial_state=ElementState(
                    pic_pos=(0, 0), size=(64, 64))),
                Element(name="pip", initial_state=ElementState(
                    pic_pos=(0, 0), size=(16, 16)), z_index=1),
            )),
            Scene(name="b", elements=(
                Element(name="bg", initial_state=ElementState(
                    pic_pos=(0, 0), size=(64, 64))),
            )),
        ),
        initial_scene="a")
    composer = Composer(clock, workspace_id="w", composition=comp,
                        audio_bus=audio_bus, picture_bus=picture_bus,
                        compute_context=make_compute_context("golden"))
    composer.bind("camBG", "bg")
    composer.bind("camPIP", "pip")
    assert ("camPIP", "pip") in composer._bindings

    got = []
    sub = picture_bus.subscribe(Tx(
        lambda s: (got.append(s), EventBox.just(s))[1]
        if s.asset_id() == "comp" else EventBox.nothing(None)))
    picture_bus.append(EventBox.just(_source(40, asset="camBG", rev="r1")))
    picture_bus.append(EventBox.just(_source(250, asset="camPIP", rev="r1")))
    for _ in range(100):
        clock.step()
    y = np.asarray([s for s in got if s.asset_id() == "comp"][-1].planes()[0])
    assert abs(int(y[4, 4]) - 250) <= 1     # pip composited in scene a

    composer.set_scene("b")
    assert ("camPIP", "pip") not in composer._bindings   # binding dropped
    assert ("camBG", "bg") in composer._bindings         # kept: bg in scene b
    got.clear()
    # keep the background flowing; the pip asset keeps publishing too —
    # its samples must no longer reach the mixer
    for rev in ("r2", "r3", "r4", "r5"):
        picture_bus.append(EventBox.just(_source(40, asset="camBG", rev=rev)))
        picture_bus.append(EventBox.just(_source(250, asset="camPIP",
                                                 rev=rev)))
        for _ in range(40):
            clock.step()
    y = np.asarray([s for s in got if s.asset_id() == "comp"][-1].planes()[0])
    assert abs(int(y[4, 4]) - 40) <= 1      # no ghost pip in scene b
    composer.close()
