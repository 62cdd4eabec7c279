"""Date/time column functions — Jalali string handling (F1, F4).

Reference semantics (mabna_tables_create.py:149-152): ``date_time`` is a
Jalali 14-digit string ``YYYYMMDDhhmmss``; the staging layer derives
``j_date = date_time[:4] + '/' + date_time[4:6] + '/' + date_time[6:8]``.
Zero-padded fixed-width Jalali strings sort lexicographically ==
chronologically (mabna_tables_create.py:244 relies on this with
``BETWEEN``), so the engine keeps them as strings and NEVER parses them
into Spark TimestampType (Spark's calendar is Gregorian —
SURVEY.md §7.4.1).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def jalali_compact_to_slashed(col: Column | str) -> Column:
    """``'14011225093000'`` → ``'1401/12/25'``.

    Mirrors the pandas slice-and-concat at mabna_tables_create.py:149-152
    as a single codegen'd expression: substring + concat_ws. Works on any
    14-digit (or ≥8-digit) compact date string, Jalali or Gregorian —
    the function is calendar-agnostic string surgery by design.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        "/", F.substring(c, 1, 4), F.substring(c, 5, 2), F.substring(c, 7, 2)
    )


# The reference inserts j_date at a fixed position (C:151 `df.insert(loc=2 …)`);
# in Spark, column order is set by the final select — callers use
# `with_j_date` then project in contract order.
jalali_reformat = jalali_compact_to_slashed


def fa_today(today: _dt.date | None = None) -> str:
    """Current date as a Jalali ``YYYY/MM/DD`` string (driver-side — F4).

    The reference computes this once at DAG-parse time with
    ``jdatetime.date.today().strftime('%Y/%m/%d')``
    (mabna_tables_create.py:18). ``jdatetime`` is not a hard dependency:
    this is a self-contained civil Jalali conversion (the standard
    33-year arithmetic algorithm, public domain), accurate for
    1178–1633 AP which covers the reference's dim_date span
    (1320-1429 — full-dimdate-pb.xlsx).

    Driver-side only: the value enters query plans as a literal, so no
    distributed Jalali computation exists anywhere in the engine
    (SURVEY.md §2.8).
    """
    today = today or _dt.date.today()
    jy, jm, jd = gregorian_to_jalali(today.year, today.month, today.day)
    return f"{jy:04d}/{jm:02d}/{jd:02d}"


def gregorian_to_jalali(gy: int, gm: int, gd: int) -> tuple[int, int, int]:
    """Civil Gregorian→Jalali conversion (33-year cycle arithmetic).

    Public-domain algorithm (jalaali-js lineage); used only on the
    driver for ``fa_today`` and the dim_date generator.
    """
    g_d_m = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]
    gy2 = gy - 1600
    days = (
        365 * gy2
        + (gy2 + 3) // 4
        - (gy2 + 99) // 100
        + (gy2 + 399) // 400
        + gd
        - 1
        + g_d_m[gm - 1]
    )
    if gm > 2 and ((gy % 4 == 0 and gy % 100 != 0) or gy % 400 == 0):
        days += 1
    # days since Gregorian 1600-01-01; Jalali epoch offset:
    j_days = days - 79
    j_np = j_days // 12053  # 33-year super-cycles of 12053 days
    j_days %= 12053
    jy = 979 + 33 * j_np + 4 * (j_days // 1461)
    j_days %= 1461
    if j_days >= 366:
        jy += (j_days - 1) // 365
        j_days = (j_days - 1) % 365
    if j_days < 186:
        jm = 1 + j_days // 31
        jd = 1 + j_days % 31
    else:
        jm = 7 + (j_days - 186) // 30
        jd = 1 + (j_days - 186) % 30
    return jy, jm, jd


def jalali_to_gregorian(jy: int, jm: int, jd: int) -> tuple[int, int, int]:
    """Civil Jalali→Gregorian conversion (inverse of the above)."""
    jy2 = jy - 979
    j_days = 365 * jy2 + (jy2 // 33) * 8 + ((jy2 % 33) + 3) // 4 + jd - 1
    j_days += (jm - 1) * 31 if jm <= 7 else ((jm - 7) * 30 + 186)
    g_days = j_days + 79
    gy = 1600 + 400 * (g_days // 146097)
    g_days %= 146097
    leap = True
    if g_days >= 36525:
        g_days -= 1
        gy += 100 * (g_days // 36524)
        g_days %= 36524
        if g_days >= 365:
            g_days += 1
        else:
            leap = False
    gy += 4 * (g_days // 1461)
    g_days %= 1461
    if g_days >= 366:
        leap = False
        g_days -= 1
        gy += g_days // 365
        g_days %= 365
    sal_a = [
        0, 31,
        29 if leap else 28,
        31, 30, 31, 30, 31, 31, 30, 31, 30, 31,
    ]
    gm = 0
    while gm < 13 and g_days >= sal_a[gm]:
        g_days -= sal_a[gm]
        gm += 1
    return gy, gm, g_days + 1


def gregorian_ts_to_compact(col: Column | str) -> Column:
    """Timestamp → 14-digit compact string ``yyyyMMddHHmmss``.

    Testdata adapter: the driver's synthetic tables carry Gregorian
    timestamps; this produces the reference's compact wire format so F1
    (`jalali_compact_to_slashed`) can be exercised end-to-end on them.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMddHHmmss")
