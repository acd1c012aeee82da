"""Date-math kernels — the reference's tolerant ``createdAt`` construction
(T3, M/ElasticSearchIndexHandler.java:440-457): build a date from (year,
month, day) with clamp-by-addition semantics — ``LocalDate.ofYearDay(y, 1)
.withMonth(m).plusDays(d - 1)`` — and format as the reference's fixed ISO
pattern ``yyyy-MM-dd'T00:00:00.000Z'`` (:78). Missing month/day default 1.

Vectorized with numpy datetime64 arithmetic (Y → M → D unit promotion plus
timedelta addition reproduces the add-days-to-month-start behavior exactly).
"""

from __future__ import annotations

import numpy as np


def created_at(
    year: np.ndarray, month: np.ndarray | None, day: np.ndarray | None
) -> np.ndarray:
    """(y, m, d) int arrays → array of 'yyyy-MM-ddT00:00:00.000Z' strings."""
    y = np.asarray(year, dtype=np.int64)
    m = np.ones_like(y) if month is None else np.asarray(month, dtype=np.int64)
    d = np.ones_like(y) if day is None else np.asarray(day, dtype=np.int64)
    m = np.where(m <= 0, 1, m)
    d = np.where(d <= 0, 1, d)
    months = (y - 1970) * 12 + (m - 1)
    dates = months.astype("datetime64[M]").astype("datetime64[D]") + (d - 1).astype(
        "timedelta64[D]"
    )
    return np.char.add(np.datetime_as_string(dates, unit="D"), "T00:00:00.000Z")
