"""Graph algebra tests, ported from the reference busTests
(/root/reference/Tests/swiftVideoTests/busTests.swift:71-117): dispatch
ordering, heterogeneous filtering, plus gone-propagation / each() semantics.
"""

import gc
from dataclasses import dataclass
from typing import Optional

from swiftvideo_tpu.core import (Bus, EventBox, ResultEvent, StepClock,
                                 TimePoint, Tx, asset_filter, mix, type_filter)


@dataclass
class TEvent:
    idx: int = 0

    def type(self) -> str:
        return "test"

    def time(self) -> TimePoint:
        return TimePoint(0, 1000)

    def asset_id(self) -> str:
        return "assetId"

    def workspace_id(self) -> str:
        return "workspaceId"

    def workspace_token(self) -> Optional[str]:
        return "workspaceToken"

    def info(self):
        return None


@dataclass
class TEvent2(TEvent):
    def type(self) -> str:
        return "test2"

    def asset_id(self) -> str:
        return "assetId2"


def test_bus_dispatch_ordering():
    bus = Bus(StepClock(TimePoint(1, 1000)))
    seen = []
    txn = Tx(lambda e: (seen.append(e.idx), EventBox.just(e))[1])
    tx2 = Tx(lambda e: EventBox.nothing(None))
    bus.subscribe(txn)
    bus.subscribe(tx2)
    for idx in range(100):
        bus.append(EventBox.just(TEvent(idx)))
    assert seen == list(range(100))


def test_bus_type_filter():
    bus = Bus(StepClock(TimePoint(1, 1000)))
    count = [0]

    def check(e):
        assert e.idx == count[0]
        count[0] += 1
        return EventBox.just(e)

    pipe = mix() >> bus
    pipe2 = mix() >> bus
    rcv = bus.subscribe(type_filter(TEvent2) >> Tx(lambda e: EventBox.nothing(None)))
    # TEvent2 subclasses TEvent, so filter TEvent2 first and exclude in check
    seen2 = []
    rcv2 = bus.subscribe(
        Tx(lambda e: EventBox.just(e) if type(e) is TEvent else EventBox.nothing(None))
        >> Tx(check))
    for idx in range(100):
        pipe(TEvent(idx))
        pipe2(TEvent2())
    assert count[0] == 100
    del rcv, rcv2


def test_asset_filter():
    tx = asset_filter("assetId")
    assert tx(TEvent(1)).is_just()
    assert tx(TEvent2()).is_nothing()


def test_gone_unsubscribes():
    bus = Bus(StepClock(TimePoint(1, 1000)))
    calls = [0]

    def obs(e):
        calls[0] += 1
        return EventBox.gone()

    bus.add_observer(obs)
    bus.append(EventBox.just(TEvent(0)))
    bus.append(EventBox.just(TEvent(1)))
    assert calls[0] == 1  # observer removed after returning gone


def test_weak_subscription_auto_drops():
    bus = Bus(StepClock(TimePoint(1, 1000)))
    calls = [0]
    tx = Tx(lambda e: (calls.__setitem__(0, calls[0] + 1), EventBox.just(e))[1])
    bus.subscribe(tx)
    bus.append(EventBox.just(TEvent(0)))
    assert calls[0] == 1
    del tx
    gc.collect()
    bus.append(EventBox.just(TEvent(1)))
    bus.append(EventBox.just(TEvent(2)))
    assert calls[0] == 1  # dead tx produced gone, observer dropped


def test_each_maps_list_output():
    splitter = Tx(lambda v: EventBox.just([v, v + 1, v + 2]))
    doubler = Tx(lambda v: EventBox.just(v * 2))
    pipe = splitter.each(doubler)
    out = pipe(10)
    assert out.value() == [20, 22, 24]


def test_error_and_nothing_pass_through():
    from swiftvideo_tpu.core import EventError
    t1 = Tx(lambda v: EventBox.error(EventError("t1", -1)))
    t2 = Tx(lambda v: EventBox.just(v))
    pipe = t1 >> t2
    assert pipe(5).is_error()


def test_async_emit_chain_survives_left_assoc_composition():
    """Regression: src >> mix() >> bus must install the full emit chain into
    the bus even though Python's >> is left-associative (the reference's >>>
    was right-associative, bus.swift:289-302)."""
    bus = Bus(StepClock(TimePoint(1, 1000)))
    src = Tx.__new__(Tx)  # placeholder to appease linters; real source below
    from swiftvideo_tpu.core import Source
    src = Source()
    seen = []
    pipeline = src >> mix() >> bus
    sub = bus.subscribe(Tx(lambda e: (seen.append(e.idx), EventBox.just(e))[1]))
    src.emit(TEvent(7))
    assert seen == [7]
    # three-stage chain through an intermediate transform
    src2 = Source()
    bump = Tx(lambda e: EventBox.just(TEvent(e.idx + 1)))
    pipeline2 = src2 >> bump >> mix() >> bus
    src2.emit(TEvent(10))
    assert seen == [7, 11]


def test_each_all_gone_propagates():
    """Beyond reference (bus.swift:326-333 compactMaps non-just away):
    mapping a burst into a fully-dead downstream returns gone so the
    producer disconnects; mixed results keep drop-the-failures."""
    burst = Tx(lambda v: EventBox.just([v, v + 1, v + 2]))
    dead = burst.each(Tx(lambda v: EventBox.gone()))
    assert dead(5).is_gone()
    half = burst.each(
        Tx(lambda v: EventBox.just(v) if v % 2 == 0 else EventBox.gone()))
    out = half(4)
    assert out.is_just() and out.value() == [4, 6]
    empty = burst.each(Tx(lambda v: EventBox.gone()))
    src_nothing = Tx(lambda v: EventBox.just([]))
    assert src_nothing.each(Tx(lambda v: EventBox.gone()))(1).is_just()


def test_events_out_counts_dequeued_batch():
    """events_out counts every dequeued event (bus.swift:120), including
    batches flushed with zero observers."""
    clock = StepClock(TimePoint(1, 1000))
    bus = Bus(clock)
    for i in range(3):
        bus.append(EventBox.just(TEvent(i)))
    assert bus.events_in == 3
    assert bus.events_out == 3
