"""Cross-engine result comparison mirroring the driver's correctness
gate: row-count + column names + order-insensitive exact values.

Stricter than a tolerance check on purpose: queries are *designed*
(exact-integer aggregation, deterministic tie-breaks — see compat.py)
so that Spark and DuckDB produce bit-identical values; any drift is a
query-design bug we want to see locally before the driver does.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _canon_cell(v) -> str:
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)  # shortest round-trip: captures any bit difference
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return "true" if v else "false"
    return repr(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort RAW cells first (exactly like the driver's harness), THEN
    stringify for the exact-value comparison. Sorting raw on purpose:
    a non-scalar cell (list/ndarray) is unhashable in pandas' lexsort
    and must fail HERE, locally, the same way it fails in the driver —
    stringify-before-sort hid exactly that crash class in round 5."""
    out = df[sorted(df.columns)].copy()
    out = out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].map(_canon_cell)
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    if len(spark_pdf) == 0:
        # equal columns + both empty = match; pandas' sort_values
        # raises "argmax of an empty sequence" on some empty frames
        # (hit by q_bucket_series_30m at sf0.001, where the trailing
        # 30-minute window holds no rows)
        return
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if not a.equals(b):
        diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
        examples = []
        for c in diff_cols[:3]:
            mask = a[c] != b[c]
            i = mask.idxmax()
            examples.append(f"col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r}")
        raise AssertionError(f"{name}: value mismatch in {diff_cols}; " + "; ".join(examples))
