"""Pins for bench.py's host-disturbance machinery: the pure
window-attribution function (suspect flags) — the evidence layer the
recorded BENCH numbers rest on (r8: a tail-localized host steal passed
the whole-run test and manufactured a false 2x violation)."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "benchmod",
    os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
)
benchmod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(benchmod)
attribute_suspects = benchmod.attribute_suspects

#: 12 idle samples at ~0.24 with one lucky-low and one spike: the p25
#: floor must sit on the idle plateau, not the lucky low.
IDLE = [
    (0.0, 0.17), (10.0, 0.24), (20.0, 0.25), (30.0, 0.23),
    (40.0, 0.26), (50.0, 0.24), (60.0, 0.25), (70.0, 0.23),
    (80.0, 0.24), (90.0, 0.26), (100.0, 0.58), (110.0, 0.25),
]


def test_idle_run_flags_nothing():
    floor, suspect = attribute_suspects(
        IDLE, {"q1": [(12.0, 14.0)], "q2": [(95.0, 99.0)]},
        sample_thresh=1.4,
    )
    assert floor >= 0.23  # p25 on the plateau, not the 0.17 lucky low
    assert suspect == {"q1": False, "q2": False}


def test_tail_localized_steal_flags_only_shadowed_queries():
    # the r8 shape: idle body, elevated tail (samples 80..110 doubled)
    samples = IDLE[:8] + [
        (80.0, 0.52), (90.0, 0.55), (100.0, 0.51), (110.0, 0.5),
    ]
    windows = {
        "body_q": [(12.0, 14.0), (42.0, 44.0)],        # clean windows
        "tail_q": [(82.0, 84.0), (92.0, 95.0)],        # every rep shadowed
        "mixed_q": [(82.0, 84.0), (12.0, 14.0)],       # one clean rep
    }
    _, suspect = attribute_suspects(samples, windows, sample_thresh=1.4)
    assert suspect == {"body_q": False, "tail_q": True, "mixed_q": False}


def test_unsorted_samples_give_same_verdict():
    # ADVICE r9: the before/after nearest-sample lookup indexed [-1]/[0]
    # assuming offset order — a shuffled sample list must not change the
    # verdict (sorted at function entry now).
    import random

    windows = {
        "body_q": [(12.0, 14.0), (42.0, 44.0)],
        "tail_q": [(102.0, 104.0), (103.0, 105.0)],
    }
    samples = IDLE[:10] + [(100.0, 0.52), (110.0, 0.55)]
    want = attribute_suspects(samples, windows, sample_thresh=1.4)
    shuffled = list(samples)
    random.Random(7).shuffle(shuffled)
    assert attribute_suspects(shuffled, windows, sample_thresh=1.4) == want


def test_short_run_floor_does_not_degenerate_to_min():
    # ADVICE r9: with <8 samples, durs[len//4] lands on index 0 or 1 —
    # a budget-stopped short run with one lucky-low sample must not
    # false-flag off a min-based floor. Floor is now at least the
    # second-smallest sample.
    samples = [(0.0, 0.17), (30.0, 0.24), (60.0, 0.25), (90.0, 0.24)]
    floor, suspect = attribute_suspects(
        samples, {"q": [(32.0, 34.0)]}, sample_thresh=1.4,
    )
    assert floor >= 0.24  # not the 0.17 lucky low (len//4 == index 1)
    assert suspect == {"q": False}


def test_open_ended_windows_use_single_bounding_sample():
    samples = [(10.0, 0.5), (20.0, 0.24), (30.0, 0.24), (40.0, 0.24),
               (50.0, 0.24), (60.0, 0.5)]
    windows = {
        "before_first": [(2.0, 5.0)],   # only the hot sample at 10 bounds it
        "after_last": [(62.0, 65.0)],   # only the hot sample at 60 bounds it
        "inside_clean": [(22.0, 28.0)],
    }
    _, suspect = attribute_suspects(samples, windows, sample_thresh=1.4)
    assert suspect == {
        "before_first": True, "after_last": True, "inside_clean": False,
    }
