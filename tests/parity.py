"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's t2 check: column names (sorted), row count, and
values compared order-insensitively. Floats are compared with a small
absolute tolerance *after* the queries' own round(…, 4); timestamps
are normalized to µs; arrays become tuples so rows sort.
"""

from __future__ import annotations

import math
from datetime import datetime

import numpy as np
import pandas as pd


def _canon_cell(v):
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.floor("us").to_pydatetime()
    return v


def _sort_key(row):
    out = []
    for v in row:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append((0, ""))
        elif isinstance(v, datetime):
            out.append((1, v.isoformat()))
        elif isinstance(v, (int, float)):
            out.append((2, f"{float(v):+.10e}"))
        elif isinstance(v, tuple):
            out.append((3, str(v)))
        else:
            out.append((4, str(v)))
    return out


def canon_rows(df: pd.DataFrame) -> tuple[list[str], list[list]]:
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    rows = [
        [_canon_cell(v) for v in row] for row in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=_sort_key)
    return cols, rows


def _cells_equal(a, b) -> bool:
    # EXACT equality, including floats: the driver's t2 gate hashes raw
    # values, so any numeric slop that needs tolerance here would fail
    # there. The engine's float policy (computed doubles → float32 on
    # both sides) is what makes exactness achievable.
    if a is None and b is None:
        return True
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if a_nan or b_nan:
        return a_nan and b_nan
    if (a is None) != (b is None):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        # Numeric KIND must match too: the driver's t2 gate hashes raw
        # values, so Spark int64 `1` vs DuckDB float64 `1.0` (e.g. a
        # HUGEINT windowed sum round-tripped through pandas) is a hash
        # mismatch there even though float(a)==float(b). Reproduce that
        # strictness here so dtype drift fails locally, not at the gate.
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        if isinstance(a, float) != isinstance(b, float):
            return False
        return float(a) == float(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, datetime) and isinstance(b, datetime):
        return a.replace(tzinfo=None) == b.replace(tzinfo=None)
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    s_cols, s_rows = canon_rows(spark_pdf)
    d_cols, d_rows = canon_rows(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in zip(s_cols, zip(sr, dr)):
            assert _cells_equal(sv, dv), (
                f"{name}: value mismatch row {i} col {c}: spark={sv!r} duck={dv!r}"
            )
