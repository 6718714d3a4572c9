"""Calibration tests for tools/check_strict.py's driver-shaped
canonicalizer — pure pandas, no Spark session needed.

Round-4 lesson: the checker reported `rows-only (3 rows)` for
agg_approx_quantile while the real driver crashed on its array<double>
columns. The checker now runs canon() on rows-only queries too; these
tests pin that canon() itself rejects exactly what the driver rejects.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_strict import _cell, canon, compare  # noqa: E402


def test_canon_crashes_on_array_cells_like_the_driver():
    """The unfixed agg_approx_quantile shape: object column of ndarrays.
    pandas sort_values → factorize → `unhashable type: numpy.ndarray`."""
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A", "N", "R"],
            "approx_p": [np.array([1.0, 2.0])] * 3,
        }
    )
    with pytest.raises(TypeError):
        canon(pdf)


def test_canon_accepts_the_fixed_scalar_shape():
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["R", "A", "N"],
            "p50_approx": [2.0, 1.0, 3.0],
            "p50_exact": [2.0, 1.0, 3.0],
        }
    )
    out = canon(pdf)
    assert list(out["l_returnflag"]) == ["A", "N", "R"]


def test_compare_reports_array_crash_not_silent_pass():
    bad = pd.DataFrame({"x": [np.array([1])], "k": [1]})
    ok = pd.DataFrame({"x": [1.0], "k": [1]})
    problems = compare(bad, ok)
    assert problems and "canonicalizer" in problems[0]


def test_cell_is_type_strict():
    """No cross-type normalization: int 3 vs float 3.0 must differ (the
    round-1 fn_math / cast_types driver-red class)."""
    assert _cell(3) != _cell(3.0)
    assert _cell(None) == _cell(float("nan"))  # both NULL-ish in pandas
