"""S8 artifact parity: the GENERATED dim_date must equal the
reference's shipped xlsx (full-dimdate-pb.xlsx sheet 'DATES',
40,151 rows, 1320/01/01–1429/12/03) cell-for-cell on every column both
sides define. This closes the loop the per-row SQL oracle can't: the
oracle re-derives the calendar, the artifact IS the reference's
ground truth."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from web_api_postgres_etl_spark.sources.dim_date import generate_dim_date
from web_api_postgres_etl_spark.sources.xlsx import read_xlsx_rows

ARTIFACT = "/root/reference/full-dimdate-pb.xlsx"
EXCEL_EPOCH = dt.date(1899, 12, 30)  # Excel 1900 date system serial 0


@pytest.mark.skipif(not os.path.exists(ARTIFACT), reason="artifact absent")
def test_generated_dim_date_matches_reference_artifact(spark):
    headers, rows = read_xlsx_rows(ARTIFACT, sheet="DATES")
    col = {h: i for i, h in enumerate(headers)}
    assert len(rows) == 40151

    ref = {}
    for r in rows:
        j_date = r[col["Jalali_1"]]
        ref[j_date] = {
            "g_date": EXCEL_EPOCH + dt.timedelta(days=int(r[col["Miladi"]])),
            "j_year": int(r[col["jyear"]]),
            "j_month_num": int(r[col["jmonthN"]]),
            "g_month_num": int(r[col["mmonthN"]]),
            "g_month_name": r[col["mmonthT"]],
            "j_month_name": r[col["jmonthT"]],
            "half_fa": r[col["jnime"]],
            "season_num": int(r[col["JquarterN"]]),
            "season_fa": r[col["JQuarterT"]],
            "weekday_fa": r[col["JWeekDay"]],
            "weekday_en": r[col["MWeekDay"]],
            "j_week_num": int(r[col["JWeekNum"]]),
        }

    gen = generate_dim_date(spark, start_jy=1320, end_jy=1429).collect()
    checked = 0
    mismatches = []
    for g in gen:
        exp = ref.get(g["j_date"])
        if exp is None:
            continue  # generated span runs past the artifact's last row
        checked += 1
        got = {
            "g_date": g["g_date"],
            "j_year": g["j_year"],
            "j_month_num": g["j_month_num"],
            "g_month_num": g["g_month_num"],
            "g_month_name": g["g_month_name"],
            "j_month_name": g["j_month_name"],
            "half_fa": g["half_year_fa"] + " سال",
            "season_num": g["season_num"],
            "season_fa": g["season_name_fa"],
            "weekday_fa": g["weekday_name_fa"],
            "weekday_en": g["weekday_name_en"],
            "j_week_num": g["j_week_num"],
        }
        if got != exp:
            mismatches.append((g["j_date"], got, exp))
    assert checked == 40151
    assert not mismatches, f"{len(mismatches)} differing days; first: {mismatches[0]}"
