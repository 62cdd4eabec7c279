"""S8 — Jalali ``dim_date`` dimension generator.

The reference ships a 40,151-row xlsx (full-dimdate-pb.xlsx, Jalali
1320/01/01–1429/12/03) consumed by Power BI; per-row calendar
attributes are replaced by a join against this dimension. Here the
table is *generated* (driver-side loop over the civil Jalali calendar,
functions.dates conversion — no jdatetime dependency) and written as
parquet; ~40k rows, broadcast-join-size forever.

Column contract mirrors FIXTURES.md §2 dim_date.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.dates import jalali_to_gregorian

J_MONTH_NAMES_EN = [
    "Farvardin", "Ordibehesht", "Khordad", "Tir", "Mordad", "Shahrivar",
    "Mehr", "Aban", "Azar", "Dey", "Bahman", "Esfand",
]
J_MONTH_NAMES_FA = [
    "فروردین", "اردیبهشت", "خرداد", "تیر", "مرداد", "شهریور",
    "مهر", "آبان", "آذر", "دی", "بهمن", "اسفند",
]
# spellings exactly as the reference artifact writes them
# (full-dimdate-pb.xlsx 'DATES'!JWeekDay: space-separated سه شنبه /
# پنج شنبه, not ZWNJ-joined)
WEEKDAY_FA = ["دوشنبه", "سه شنبه", "چهارشنبه", "پنج شنبه", "جمعه", "شنبه", "یکشنبه"]
WEEKDAY_EN = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"]
SEASON_FA = ["بهار", "تابستان", "پاییز", "زمستان"]

SCHEMA = T.StructType(
    [
        T.StructField("j_date", T.StringType(), False),
        T.StructField("j_date_short", T.StringType(), False),
        T.StructField("j_year", T.IntegerType(), False),
        T.StructField("g_date", T.DateType(), False),
        T.StructField("g_month_num", T.IntegerType(), False),
        T.StructField("j_month_num", T.IntegerType(), False),
        T.StructField("g_month_name", T.StringType(), False),
        T.StructField("j_month_name", T.StringType(), False),
        T.StructField("half_year_en", T.StringType(), False),
        T.StructField("half_year_fa", T.StringType(), False),
        T.StructField("season_num", T.IntegerType(), False),
        T.StructField("season_name_fa", T.StringType(), False),
        T.StructField("weekday_name_fa", T.StringType(), False),
        T.StructField("weekday_name_en", T.StringType(), False),
        T.StructField("j_week_num", T.IntegerType(), False),
        T.StructField("j_day_num", T.IntegerType(), False),
    ]
)


def _jalali_month_len(jy: int, jm: int) -> int:
    if jm <= 6:
        return 31
    if jm <= 11:
        return 30
    # Esfand: 30 in leap years. Leap iff the year spans 366 Gregorian
    # days (1 Farvardin jy → 1 Farvardin jy+1); months 1-11 hold 336.
    g1 = _dt.date(*jalali_to_gregorian(jy, 1, 1))
    g2 = _dt.date(*jalali_to_gregorian(jy + 1, 1, 1))
    return (g2 - g1).days - 336


def generate_dim_date(
    spark: SparkSession, start_jy: int = 1320, end_jy: int = 1429
) -> DataFrame:
    """Build the dim_date rows driver-side (≈365×years rows) and
    parallelize — the dimension is tiny; generation cost is irrelevant
    and correctness is testable against the civil calendar."""
    rows = []
    for jy in range(start_jy, end_jy + 1):
        day_of_year = 0
        for jm in range(1, 13):
            mlen = _jalali_month_len(jy, jm)
            for jd in range(1, mlen + 1):
                day_of_year += 1
                gy, gm, gd = jalali_to_gregorian(jy, jm, jd)
                g = _dt.date(gy, gm, gd)
                wd = g.weekday()  # Monday=0
                # Jalali week starts Saturday (index 5 in Monday-based);
                # day_of_year is 1-based, so subtract 1 before the //7
                # bucketing or the 7th day of a Saturday-started week
                # spills into week 2
                j_week = (day_of_year - 1 + _first_weekday_offset(jy)) // 7 + 1
                rows.append(
                    (
                        f"{jy:04d}/{jm:02d}/{jd:02d}",
                        f"{jy}/{jm}/{jd}",
                        jy,
                        g,
                        g.month,
                        jm,
                        g.strftime("%B"),
                        J_MONTH_NAMES_FA[jm - 1],
                        "H1" if jm <= 6 else "H2",
                        "نیمه اول" if jm <= 6 else "نیمه دوم",
                        (jm - 1) // 3 + 1,
                        SEASON_FA[(jm - 1) // 3],
                        WEEKDAY_FA[wd],
                        WEEKDAY_EN[wd],
                        j_week,
                        day_of_year,
                    )
                )
    return spark.createDataFrame(rows, schema=SCHEMA)


def _first_weekday_offset(jy: int) -> int:
    gy, gm, gd = jalali_to_gregorian(jy, 1, 1)
    wd = _dt.date(gy, gm, gd).weekday()  # Monday=0
    # days since the week's Saturday for 1 Farvardin
    return (wd - 5) % 7
