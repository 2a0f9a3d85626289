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
