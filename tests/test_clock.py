"""Clock tests: StepClock determinism and WallClock scheduling."""

import time

from swiftvideo_tpu.core import StepClock, TimePoint, WallClock


def test_stepclock_advances():
    clock = StepClock(TimePoint(1000, 30000))
    assert clock.current() == TimePoint(0, 100000)
    clock.step()
    assert clock.current() == TimePoint(1000, 30000)


def test_stepclock_schedule_future_and_past():
    clock = StepClock(TimePoint(1, 10))
    fired = []
    clock.schedule(TimePoint(3, 10), lambda e: fired.append(e.time()))
    clock.step()  # t=1/10
    assert fired == []
    clock.step()  # t=2/10
    assert fired == []
    clock.step()  # t=3/10
    assert fired == [TimePoint(3, 10)]
    # past deadline fires synchronously
    clock.schedule(TimePoint(1, 10), lambda e: fired.append(e.time()))
    assert len(fired) == 2


def test_stepclock_reschedule_from_callback():
    """The mixer pattern: callbacks re-schedule themselves each tick."""
    clock = StepClock(TimePoint(1, 10))
    ticks = []

    def cb(e):
        ticks.append(e.time())
        clock.schedule(e.time() + TimePoint(1, 10), cb)

    clock.schedule(TimePoint(1, 10), cb)
    for _ in range(5):
        clock.step()
    assert len(ticks) == 5


def test_wallclock_schedule():
    clock = WallClock()
    fired = []
    clock.schedule(clock.current() + TimePoint(20, 1000), lambda e: fired.append(1))
    clock.schedule(clock.current(), lambda e: fired.append(0))
    deadline = time.time() + 2.0
    while len(fired) < 2 and time.time() < deadline:
        time.sleep(0.005)
    assert sorted(fired) == [0, 1]
    clock.close()


def test_wallclock_unix_roundtrip():
    clock = WallClock(epoch=1000.0)
    tp = clock.from_unix_time(100100000)  # 1001.0s unix at scale 100000
    assert abs(tp.value / tp.scale - 1.0) < 1e-6
    assert clock.to_unix_time(tp) == 100100000


def test_stepclock_fires_in_deadline_order():
    """Due callbacks run in deadline order like WallClock's heap, not
    insertion order — StepClock-driven tests must not observe A/V
    interleavings the production clock never produces."""
    clock = StepClock(TimePoint(100, 1000))
    order = []
    clock.schedule(clock.current() + TimePoint(10, 1000),
                   lambda e: order.append(("late", e.time())))
    clock.schedule(clock.current() + TimePoint(5, 1000),
                   lambda e: order.append(("early", e.time())))
    clock.step()
    assert [n for n, _ in order] == ["early", "late"]
    assert order[0][1] < order[1][1]
