"""Unit tests for the bench/scale tooling rules — no Spark session.

These pin the r10-advisory/VERDICT fixes at the rule level: the bless
gate's dual-average requirement and scale_smoke's argv contract. The
tools themselves are exercised end-to-end by the per-round runs; these
tests keep the RULES from silently regressing.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.bless_bench import is_blessable  # noqa: E402
from tools.scale_smoke import parse_args  # noqa: E402


def _prov(**over):
    base = {
        "reference_grade": True,
        "quiet_load_max": 4.0,
        "loadavg_start_1m": 1.0,
        "loadavg_start_5m": 2.0,
    }
    base.update(over)
    return base


class TestBlessGate:
    def test_quiet_run_blesses(self):
        assert is_blessable(_prov())

    def test_stamp_says_loaded_refuses(self):
        assert not is_blessable(_prov(reference_grade=False))

    def test_loaded_1m_refuses_even_with_true_stamp(self):
        # a hand-edited or buggy stamp can't override the raw averages
        assert not is_blessable(_prov(loadavg_start_1m=9.0))

    def test_loaded_5m_refuses(self):
        # the r10 hole: 1m quiet (1.67) while 5m read 9.24 — must refuse
        assert not is_blessable(_prov(loadavg_start_5m=9.24))

    def test_5m_allowance_is_2x(self):
        assert is_blessable(_prov(loadavg_start_5m=8.0))
        assert not is_blessable(_prov(loadavg_start_5m=8.01))

    def test_old_stamp_format_without_5m_refuses(self):
        # pre-r11 sidecars have no loadavg_start_5m — must not bless
        # under the old single-average rule
        prov = _prov()
        del prov["loadavg_start_5m"]
        assert not is_blessable(prov)

    def test_unreadable_gauges_refuse(self):
        assert not is_blessable(_prov(loadavg_start_1m=-1.0))


class TestScaleSmokeArgs:
    def test_defaults(self):
        assert parse_args([]) == ("/tmp/prajna_scale/sf1.0", [], [])

    def test_leading_skip_not_eaten_as_sf_dir(self):
        # the r10 advisory: `scale_smoke.py --skip foo` used to sweep
        # directory '--skip' with 'foo' as an include filter
        assert parse_args(["--skip", "foo"]) == (
            "/tmp/prajna_scale/sf1.0",
            [],
            ["foo"],
        )

    def test_full_form(self):
        assert parse_args(["/tmp/d", "a", "b", "--skip", "c", "d"]) == (
            "/tmp/d",
            ["a", "b"],
            ["c", "d"],
        )

    def test_unknown_flag_rejected(self):
        with pytest.raises(SystemExit):
            parse_args(["--bogus"])
