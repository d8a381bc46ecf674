"""Rational-time arithmetic identities.

Ported test strategy from the reference's timePointTests
(/root/reference/Tests/swiftVideoTests/timePointTests.swift:25-84), plus
wrap-around and truncation edge cases specific to int64 semantics.
"""

from swiftvideo_tpu.core import TimePoint, maximum, minimum, rescale, seconds, simplify
from swiftvideo_tpu.core.time import _tdiv, _wrap64


def test_rescale():
    a = TimePoint(2987595, 30000)
    b = TimePoint(9958650, 100000)
    assert rescale(a, b.scale).value == b.value


def test_comparisons():
    a = TimePoint(2987595, 30000)
    b = TimePoint(9955317, 100000)
    assert (a > b) is True
    assert (b > a) is False
    assert (b < a) is True
    assert (a < b) is False
    assert (a >= b) is True
    assert (b >= a) is False
    assert (b <= a) is True
    assert (a <= b) is False


def test_add():
    a = TimePoint(2987595, 30000)
    b = TimePoint(9955317, 100000)
    c = b + TimePoint(1000, 30000)
    assert a <= c and a >= c


def test_sub():
    a = TimePoint(2957595, 30000)
    b = TimePoint(9855316, 100000)
    c = a - TimePoint(1000, 30000)
    assert c >= b and c <= b


def test_min_max():
    a = TimePoint(2957595, 30000)
    b = TimePoint(9855316, 100000)
    assert minimum(a, b) == b
    assert maximum(a, b) == a


def test_mod_and_div():
    a = TimePoint(1001, 1000)
    assert (a % TimePoint(1000, 1000)).value == 1
    assert (a / 2).value == 500
    # C-style truncation toward zero on negatives
    assert (TimePoint(-3, 1000) / 2).value == -1
    assert _tdiv(-7, 2) == -3
    assert _tdiv(7, -2) == -3


def test_wraparound():
    near_max = TimePoint((1 << 63) - 1, 1000)
    wrapped = near_max + TimePoint(1, 1000)
    assert wrapped.value == -(1 << 63)
    assert _wrap64(1 << 63) == -(1 << 63)


def test_simplify_seconds():
    assert simplify(TimePoint(1000, 30000)) == TimePoint(1, 30)
    assert abs(seconds(TimePoint(1, 2)) - 0.5) < 1e-12


def test_negative_pts_window_math():
    # the audio mixer relies on exact negative-delta rescaling
    frame = TimePoint(480, 48000)
    pts = TimePoint(-100, 48000)
    delta = pts - TimePoint(0, 48000)
    assert rescale(delta, 48000).value == -100
    assert (frame * 2).value == 960
