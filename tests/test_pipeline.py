"""End-to-end medallion pipeline on reference-shaped fixtures
(FIXTURES.md §1-2): full refresh, then an incremental run with
late/duplicate versions repaired by compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.plans.pipeline import MedallionPipeline
from web_api_postgres_etl_spark.plans.watermark import WatermarkManager
from web_api_postgres_etl_spark.sources.writers import table_path

TRADES_SCHEMA = (
    "id long, date_time string, open_price double, high_price double, "
    "low_price double, close_price double, close_price_change double, "
    "trade_count long, volume long, value double, `instrument.id` string, "
    "`meta.version` long"
)


def _trades_rows():
    return [
        (1, "14010101093000", 10.0, 12.0, 9.0, 11.0, 1.0, 5, 100, 1100.0, "i1", 1),
        (2, "14010102093000", 11.0, 13.0, 10.0, 12.0, 1.0, 6, 110, 1320.0, "i1", 2),
        (3, "14010102100000", None, 13.0, 10.0, 12.0, 1.0, 6, 110, 1320.0, "i1", 3),  # null → dropped
        (4, "14010103093000", 12.0, 14.0, 11.0, 13.0, 13.0, 7, 120, 1560.0, "i2", 4),  # pct denom 0 → null
    ]


@pytest.fixture()
def fixtures(spark):
    trades = spark.createDataFrame(_trades_rows(), TRADES_SCHEMA)
    instruments = spark.createDataFrame(
        [("i1", "C1", "IR1", "Inst One", "co1", "a1", "e1"),
         ("i2", "C2", "IR2", "Inst Two", "co2", "a2", "e1")],
        "id string, code string, isin string, name string, "
        "`stock.company.id` string, `asset.id` string, `exchange.id` string",
    )
    assets = spark.createDataFrame(
        [("a1", "cat1"), ("a2", "cat2")], "id string, `category.id` string"
    )
    categories = spark.createDataFrame(
        [("cat1", "Equity"), ("cat2", "Bond")], "id string, short_name string"
    )
    exchanges = spark.createDataFrame(
        [("e1", "TSE")], "id string, title string"
    )
    return trades, instruments, assets, categories, exchanges


def test_stage_trades_contract(spark, fixtures, tmp_path):
    trades, *_ = fixtures
    p = MedallionPipeline(spark, str(tmp_path), range_start="1400/01/01", range_end="1402/01/01")
    stg = p.stage_trades(trades)
    # contract: j_date at position 2, pct at position 8 (C:151, C:153)
    assert stg.columns[2] == "j_date"
    assert stg.columns[8] == "close_price_change_percent"
    rows = {r["id"]: r for r in stg.collect()}
    assert 3 not in rows  # required-null row dropped
    assert rows[1]["j_date"] == "1401/01/01"
    assert abs(rows[1]["close_price_change_percent"] - 0.1) < 1e-12
    assert rows[4]["close_price_change_percent"] is None  # zero denom → null


def test_full_refresh_star_join(spark, fixtures, tmp_path):
    trades, instruments, assets, categories, exchanges = fixtures
    wh = str(tmp_path / "wh")
    p = MedallionPipeline(spark, wh, range_start="1400/01/01", range_end="1402/01/01")
    extractors = {
        "trades_share": lambda: trades,
        "instruments": lambda: instruments,
        "assets": lambda: assets,
        "categories": lambda: categories,
        "exchanges": lambda: exchanges,
    }
    results = p.run_full_refresh(extractors)
    errors = [r for r in results if r.error]
    assert not errors, errors
    prd = spark.read.parquet(table_path(wh, "prd", "trades_share"))
    rows = {r["id"]: r for r in prd.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["category"] == "Equity"
    assert rows[1]["market"] == "TSE"
    assert rows[4]["category"] == "Bond"
    assert rows[1]["company.id"] == "co1"


def test_incremental_append_and_compaction(spark, fixtures, tmp_path):
    """T1-T3: second run delivers a NEW version of an existing
    (j_date, name) key plus a fresh row; compaction keeps last-wins."""
    trades, instruments, assets, categories, exchanges = fixtures
    wh = str(tmp_path / "wh")
    p = MedallionPipeline(spark, wh, range_start="1400/01/01", range_end="1402/01/01")
    dims = {
        "instruments": instruments, "assets": assets,
        "categories": categories, "exchanges": exchanges,
    }
    extractors = {"trades_share": (lambda: trades)}
    extractors.update({k: (lambda d=d: d) for k, d in dims.items()})
    p.run_full_refresh(extractors)

    # delta: re-delivery of day 1401/01/01 for i1 at version 5 (update),
    # plus a brand-new row at version 6
    delta_rows = [
        (10, "14010101120000", 10.5, 12.5, 9.5, 11.5, 0.5, 9, 130, 1495.0, "i1", 5),
        (11, "14010104093000", 13.0, 15.0, 12.0, 14.0, 1.0, 8, 140, 1960.0, "i2", 6),
    ]
    delta = spark.createDataFrame(delta_rows, TRADES_SCHEMA)

    def extract_trades(wm):
        assert wm == 4  # probe found max version of the full refresh
        return delta.filter(F.col("`meta.version`") > wm)

    results = p.run_incremental({"trades_share": extract_trades}, dims)
    assert not [r for r in results if r.error], results

    prd = spark.read.parquet(table_path(wh, "prd", "trades_share"))
    rows = {(r["j_date"], r["name"]): r for r in prd.collect()}
    # 1401/01/01+Inst One must now be version 5 (the re-delivery won)
    assert rows[("1401/01/01", "Inst One")]["meta.version"] == 5
    assert rows[("1401/01/01", "Inst One")]["close_price"] == 11.5
    # new day row appended
    assert ("1401/01/04", "Inst Two") in rows
    # no duplicate keys survived compaction
    assert prd.count() == prd.select("j_date", "name").distinct().count()


def test_watermark_probe_missing_table(spark, tmp_path):
    mgr = WatermarkManager(spark, str(tmp_path))
    out = mgr.probe({"absent": str(tmp_path / "nope")})
    assert out == {"absent": None}


def test_partition_scoped_compaction(spark, tmp_path):
    """compact_partitioned rewrites ONLY touched partitions: untouched
    partition files must remain byte-identical on disk, and the touched
    partition must collapse to last-wins."""
    import glob
    import os

    from web_api_postgres_etl_spark.plans.pipeline import MedallionPipeline

    path = str(tmp_path / "prd_partitioned")
    schema = "id long, j_month string, name string, `meta.version` long, price double"
    base = spark.createDataFrame(
        [
            (1, "140101", "a", 1, 10.0),
            (2, "140101", "b", 2, 20.0),
            (3, "140102", "a", 3, 30.0),
        ],
        schema,
    )
    base.write.partitionBy("j_month").parquet(path)
    untouched_before = sorted(
        (os.path.basename(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/j_month=140102/*.parquet")
    )

    # delta append: new version for (140101, a) — only 140101 is touched
    delta = spark.createDataFrame([(4, "140101", "a", 9, 11.0)], schema)
    delta.write.mode("append").partitionBy("j_month").parquet(path)

    p = MedallionPipeline(spark, str(tmp_path))
    p.compact_partitioned(
        path, keys=["name"], partition_col="j_month", touched=["140101"]
    )

    out = spark.read.parquet(path)
    # partition values come back type-inferred from dir names (int here)
    rows = {(str(r["j_month"]), r["name"]): r["meta.version"] for r in out.collect()}
    assert rows == {("140101", "a"): 9, ("140101", "b"): 2, ("140102", "a"): 3}
    # untouched partition files were not rewritten
    untouched_after = sorted(
        (os.path.basename(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/j_month=140102/*.parquet")
    )
    assert untouched_before == untouched_after


def test_retry_succeeds_on_second_attempt_and_records_it(spark, fixtures, tmp_path):
    """G5 retry (reference: retries=1, retry_delay=2 min): a flaky
    extractor that fails once succeeds on attempt 2; a hard failure
    exhausts retries and records the error with the attempt count."""
    trades, *_ = fixtures
    wh = str(tmp_path / "wh")
    pipe = MedallionPipeline(spark, wh, retries=1, retry_delay_s=0.0)
    calls = {"flaky": 0}

    def flaky():
        calls["flaky"] += 1
        if calls["flaky"] == 1:
            raise RuntimeError("transient API 503")
        return trades

    def hard():
        raise RuntimeError("permanent failure")

    results = pipe.run_full_refresh({"trades_share": flaky, "news_bad": hard})
    by_table = {r.table: r for r in results}
    ok = by_table["src_trades_share"]
    assert ok.error is None and ok.attempts == 2 and ok.rows == 4
    bad = by_table["src_news_bad"]
    assert bad.error is not None and bad.attempts == 2
    assert calls["flaky"] == 2


def test_on_failure_alerting(spark, fixtures, tmp_path):
    """r13 (reference C:21-30 email_on_failure): the pipeline invokes
    the on_failure hook once per FAILED table with its RunResult —
    retried-then-successful tables do NOT alert; the file alerter
    appends one JSON line per failure; the email alerter builds the
    reference-shaped message through an injected transport (no SMTP
    egress in this sandbox); a raising alerter never breaks the run;
    the CLI wires --alert-log to the file sink."""
    import json as _json

    from web_api_postgres_etl_spark.plans.alerts import (
        compose_alerters,
        email_alerter,
        file_alerter,
        format_failure_email,
    )

    trades, *_ = fixtures
    wh = str(tmp_path / "wh")
    log = str(tmp_path / "alerts.jsonl")
    sent: list = []
    boom_calls = {"n": 0}

    def boom(_result):
        boom_calls["n"] += 1
        raise RuntimeError("alerter down")

    alerter = compose_alerters(
        boom,  # a broken sink must not stop the others or the run
        file_alerter(log),
        email_alerter(
            "smtp.example.com", "etl@example.com", ["ops@example.com"],
            transport=lambda *a: sent.append(a),
        ),
    )
    calls = {"flaky": 0}

    def flaky():
        calls["flaky"] += 1
        if calls["flaky"] == 1:
            raise RuntimeError("transient API 503")
        return trades

    def hard():
        raise RuntimeError("permanent failure")

    pipe = MedallionPipeline(
        spark, wh, retries=1, retry_delay_s=0.0, on_failure=alerter
    )
    results = pipe.run_full_refresh(
        {"trades_share": flaky, "news_bad": hard}
    )
    by_table = {r.table: r for r in results}
    assert by_table["src_trades_share"].error is None  # retried, no alert
    news = by_table["src_news_bad"]
    assert news.error is not None and news.attempts == 2
    # one alert per FAILED RunResult, in order (the full refresh also
    # runs downstream stages — e.g. prd_trades_share fails here for
    # lack of dimension tables — and each failure alerts exactly once);
    # every sink saw every failure despite the broken first sink
    failed = [r for r in results if r.error]
    assert "src_news_bad" in {r.table for r in failed}
    assert boom_calls["n"] == len(failed)
    lines = [
        _json.loads(x)
        for x in open(log, encoding="utf-8").read().splitlines()
    ]
    assert [x["table"] for x in lines] == [r.table for r in failed]
    news_line = next(x for x in lines if x["table"] == "src_news_bad")
    assert "permanent failure" in news_line["error"]
    assert news_line["attempts"] == 2
    assert len(sent) == len(failed)
    host, port, sender, rcpt, msg = next(
        m for m in sent if "src_news_bad" in m[4]
    )
    assert (host, port, sender, rcpt) == (
        "smtp.example.com", 25, "etl@example.com", ["ops@example.com"]
    )
    assert "Subject: [pipeline] FAILED: src_news_bad" in msg
    assert "permanent failure" in msg
    # the message build is the shared format function verbatim
    assert msg == format_failure_email(
        news, "etl@example.com", ["ops@example.com"]
    )
    # a pipeline whose ONLY alerter raises still completes and records
    before = boom_calls["n"]
    pipe2 = MedallionPipeline(
        spark, str(tmp_path / "wh2"), retries=0, on_failure=boom
    )
    res2 = pipe2.run_full_refresh({"news_bad": hard})
    assert any(r.error for r in res2) and boom_calls["n"] > before
    import pytest as pt

    with pt.raises(ValueError, match="recipients"):
        email_alerter("h", "s@example.com", [])


def test_watermark_probe_raises_on_corrupt_sink(spark, tmp_path):
    """r13: the watermark probe returns None for a MISSING table or a
    pre-versioned one (no version column yet), but a corrupt sink
    RAISES — silently probing None would schedule a full re-ingest."""
    import os

    import pytest as pt

    from web_api_postgres_etl_spark.plans.watermark import WatermarkManager

    ok = str(tmp_path / "ok")
    spark.createDataFrame(
        [(1, 7), (2, 9)], "id long, `meta.version` long"
    ).write.parquet(ok)
    nover = str(tmp_path / "nover")
    spark.createDataFrame([(1,)], "id long").write.parquet(nover)
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "part-0.parquet"), "w") as fh:
        fh.write("garbage")
    wm = WatermarkManager(spark, str(tmp_path))
    assert wm.probe({"t": ok}) == {"t": 9}
    assert wm.probe({"t": str(tmp_path / "missing")}) == {"t": None}
    assert wm.probe({"t": nover}) == {"t": None}
    with pt.raises(Exception):
        wm.probe({"t": bad})


def test_corrupt_stg_surfaces_as_table_failure(spark, fixtures, tmp_path):
    """r13 (the _read_index_meta rule applied to the prd refresh): an
    ABSENT stg trades table skips its prd silently (type not ingested
    this run — the intent), but a CORRUPT one must surface as that
    table's failure instead of leaving a stale prd behind a green
    run."""
    import os

    _, instruments, assets, categories, exchanges = fixtures
    wh = str(tmp_path / "wh")
    # corrupt stg for one type: the stg_trades_share dir holding a
    # garbage part file (table_path layout: {wh}/stg_{name})
    stg_dir = os.path.join(wh, "stg_trades_share")
    os.makedirs(stg_dir)
    with open(os.path.join(stg_dir, "part-00000.parquet"), "w") as fh:
        fh.write("not parquet at all")
    pipe = MedallionPipeline(spark, wh, retries=0)
    pipe.run_full_refresh(
        {
            "instruments": lambda: instruments,
            "assets": lambda: assets,
            "categories": lambda: categories,
            "exchanges": lambda: exchanges,
        }
    )
    errs = {r.table: r.error for r in pipe.results if r.error}
    # the corrupt type failed loudly; the 7 absent types skipped
    assert "prd_trades_share" in errs, pipe.results
    assert not any(
        t.startswith("prd_trades_") and t != "prd_trades_share"
        for t in errs
    )


def test_connected_components_raises_when_unconverged(spark):
    from web_api_postgres_etl_spark.operators.graph import connected_components

    # chain of 6 nodes has diameter 5 — max_iter=2 cannot converge
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=2)


def test_salted_join_rejects_dim_preserving_how(spark, fixtures):
    from web_api_postgres_etl_spark.operators.joins import salted_join

    trades, instruments, *_ = fixtures
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(trades, instruments, "instrument.id", "id", how="full")


def test_incremental_rewrites_only_touched_month_partitions(spark, fixtures, tmp_path):
    """T3 at scale: prd sinks are partitioned by Jalali month; an
    incremental delta touching only month 1401-02 must leave the
    1401-01 partition's files byte-for-byte alone."""
    import glob
    import os

    _, instruments, assets, categories, exchanges = fixtures
    wh = str(tmp_path / "wh")
    month1 = [
        (1, "14010101093000", 10.0, 12.0, 9.0, 11.0, 1.0, 5, 100, 1100.0, "i1", 1),
        (2, "14010115093000", 11.0, 13.0, 10.0, 12.0, 1.0, 6, 110, 1320.0, "i1", 2),
    ]
    month2 = [
        (3, "14010201093000", 12.0, 14.0, 11.0, 13.0, 1.0, 7, 120, 1560.0, "i2", 3),
    ]
    delta2 = [
        (4, "14010202093000", 13.0, 15.0, 12.0, 14.0, 1.0, 8, 130, 1820.0, "i2", 4),
        # re-delivery of version 3's row with a newer version → compaction
        (5, "14010201093000", 12.5, 14.0, 11.0, 13.0, 1.0, 7, 120, 1560.0, "i2", 5),
    ]
    dims = {
        "instruments": instruments, "assets": assets,
        "categories": categories, "exchanges": exchanges,
    }
    pipe = MedallionPipeline(
        spark, wh, range_start="1400/01/01", range_end="1402/12/29"
    )
    initial = spark.createDataFrame(month1 + month2, TRADES_SCHEMA)
    pipe.run_full_refresh({"trades_share": lambda: initial, **{
        k: (lambda v=v: v) for k, v in dims.items()
    }})
    prd = table_path(wh, "prd", "trades_share")

    def snapshot(month):
        return {
            p: os.stat(p).st_mtime_ns
            for p in sorted(glob.glob(f"{prd}/j_month={month}/*.parquet"))
        }

    before_m1 = snapshot("1401-01")
    assert before_m1, "month 1401-01 partition must exist"

    delta = spark.createDataFrame(delta2, TRADES_SCHEMA)
    pipe.run_incremental(
        {"trades_share": lambda wm: delta.filter(
            F.col("`meta.version`") > F.lit(wm if wm is not None else -1)
        )},
        dims=dims,
    )
    assert snapshot("1401-01") == before_m1          # untouched, unrewritten
    out = spark.read.parquet(prd)
    # month2: version-5 re-delivery replaced version 3 (same j_date+name)
    m2 = out.filter(F.col("j_month") == "1401-02")
    assert m2.count() == 2
    assert m2.agg(F.max("`meta.version`")).first()[0] == 5
    assert out.filter(F.col("j_month") == "1401-01").count() == 2


def test_fan_out_reproduces_reference_table_inventory():
    """G3: the default config must fan out to the reference's full
    source-table inventory (constants.yaml:21-105): 71 collection items
    across 7 groups, with `trades` expanding ×8 instrument types →
    71 - 1 + 8 = 78 specs; exchange holds 32 items, stock 28."""
    from web_api_postgres_etl_spark.config import DEFAULT_CONFIG, fan_out

    specs = list(fan_out())
    names = [s.name for s in specs]
    assert len(names) == len(set(names))
    n_items = sum(len(v) for v in DEFAULT_CONFIG["collections"].values())
    assert n_items == 71
    assert len(DEFAULT_CONFIG["collections"]["exchange"]) == 32
    assert len(DEFAULT_CONFIG["collections"]["stock"]) == 28
    assert len(specs) == n_items - 1 + 8
    assert "exchange_trades_share" in names
    assert "exchange_trades_crypto" in names
    assert "stock_cashflows" in names
    assert "bond_interestpayments" in names


def test_stage_assets_aligns_category_ids_after_null_drop(spark, tmp_path):
    """The reference extracts categories[0]['id'] positionally AFTER
    dropping null-categories rows, mis-aligning ids; the engine's
    per-row extraction must keep each id with its own row."""
    rows = [
        (1, "a1", [{"id": "c10"}, {"id": "c11"}]),
        (2, "a2", None),                       # dropped
        (3, "a3", [{"id": "c30"}]),
    ]
    src = spark.createDataFrame(
        rows,
        "id long, name string, categories array<struct<id:string>>",
    )
    pipe = MedallionPipeline(spark, str(tmp_path / "wh"))
    out = pipe.stage_assets(src)
    got = {r["id"]: r["category.id"] for r in out.collect()}
    assert got == {1: "c10", 3: "c30"}
    assert "categories" not in out.columns
    assert out.columns.index("category.id") == min(8, len(out.columns) - 1)


def test_retry_self_heals_double_append(spark, fixtures, tmp_path, monkeypatch):
    """A post-append compaction failure triggers a full retry, which
    re-appends the delta; the retry's closing compaction must collapse
    the duplicates (last-wins on j_date+name) so the sink converges."""
    trades, instruments, assets, categories, exchanges = fixtures
    dims = {
        "instruments": instruments, "assets": assets,
        "categories": categories, "exchanges": exchanges,
    }
    wh = str(tmp_path / "wh")
    pipe = MedallionPipeline(
        spark, wh, range_start="1400/01/01", range_end="1402/12/29", retries=1
    )
    pipe.run_full_refresh({"trades_share": lambda: trades, **{
        k: (lambda v=v: v) for k, v in dims.items()
    }})
    delta = spark.createDataFrame(
        [(9, "14010104093000", 14.0, 15.0, 13.0, 14.5, 1.0, 8, 130, 1885.0, "i1", 9)],
        TRADES_SCHEMA,
    )
    calls = {"n": 0}
    orig = MedallionPipeline.compact_partitioned

    def flaky_compact(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient FS error")
        return orig(self, *a, **k)

    monkeypatch.setattr(MedallionPipeline, "compact_partitioned", flaky_compact)
    results = pipe.run_incremental(
        {"trades_share": lambda wm: delta.filter(
            F.col("`meta.version`") > F.lit(wm if wm is not None else -1)
        )},
        dims=dims,
    )
    r = next(x for x in results if x.table == "prd_trades_share")
    assert r.error is None and r.attempts == 2
    out = spark.read.parquet(table_path(wh, "prd", "trades_share"))
    dupes = out.groupBy("j_date", "name").count().filter("count > 1").count()
    assert dupes == 0
    assert out.filter(F.col("`meta.version`") == 9).count() == 1


def test_full_refresh_reports_missing_dims_instead_of_crashing(spark, fixtures, tmp_path):
    trades, instruments, _, categories, exchanges = fixtures
    pipe = MedallionPipeline(spark, str(tmp_path / "wh"))
    results = pipe.run_full_refresh({
        "trades_share": lambda: trades,
        "instruments": lambda: instruments,
        "categories": lambda: categories,
        "exchanges": lambda: exchanges,
        # assets extractor absent
    })
    errs = [r for r in results if r.table == "prd_trades_share"]
    assert errs and "assets" in errs[0].error


def test_full_refresh_reports_missing_indexes_dim(spark, tmp_path):
    """prd_indexvalues gets the same missing-dimension error surfacing
    as the trades tables (ADVICE r2) instead of a silent skip."""
    iv = spark.createDataFrame(
        [(1, "14010101093000", 10.0, 9.0, 11.0, 10.5, 0.5, "x1", 1)],
        "id long, date_time string, open_value double, low_value double, "
        "high_value double, close_value double, close_value_change double, "
        "`index.id` string, `meta.version` long",
    )
    pipe = MedallionPipeline(spark, str(tmp_path / "wh"))
    results = pipe.run_full_refresh({"indexvalues": lambda: iv})
    errs = [r for r in results if r.table == "prd_indexvalues"]
    assert errs and "indexes" in errs[0].error


def test_compact_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the two swap renames leaves the sink stranded in
    .old; the next compact restores it and completes (ADVICE r2)."""
    import shutil

    path = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2)], "id long, k string, `meta.version` long"
    )
    df.write.parquet(path)
    # simulate the crash window: path moved to .old, new data still in .tmp
    shutil.move(path, path + ".old")
    df.limit(1).write.parquet(path + ".tmp")
    pipe = MedallionPipeline(spark, str(tmp_path / "wh"))
    pipe.compact(path, keys=["k"])
    out = spark.read.parquet(path)
    assert out.count() == 1 and out.first()["meta.version"] == 2
    import os

    assert not os.path.exists(path + ".old") and not os.path.exists(path + ".tmp")


# ------------------------------------------------------------ CLI face
def test_cli_create_update_dimdate(spark, fixtures, tmp_path):
    """python -m web_api_postgres_etl_spark: create (full refresh from a
    parquet landing zone) → update (watermark delta + compaction) →
    dimdate — the reference's two runnable scripts plus its calendar
    artifact, end-to-end."""
    from web_api_postgres_etl_spark.__main__ import main

    trades, instruments, assets, categories, exchanges = fixtures
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    trades.write.parquet(f"{landing}/trades_share.parquet")
    instruments.write.parquet(f"{landing}/instruments.parquet")
    assets.write.parquet(f"{landing}/assets.parquet")
    categories.write.parquet(f"{landing}/categories.parquet")
    exchanges.write.parquet(f"{landing}/exchanges.parquet")

    rc = main(
        ["create", "--warehouse", wh, "--landing", landing,
         "--range-start", "1400/01/01", "--range-end", "1402/01/01"],
        spark=spark,
    )
    assert rc == 0
    prd = spark.read.parquet(f"{wh}/prd_trades_share")
    n_initial = prd.count()
    assert n_initial > 0

    # update: one new version lands, one old version is re-delivered
    delta = spark.createDataFrame(
        [
            (2, "14010102093000", 11.0, 13.0, 10.0, 12.5, 1.5, 6, 110, 1375.0, "i1", 5),
        ],
        TRADES_SCHEMA,
    )
    trades.unionByName(delta).write.mode("overwrite").parquet(
        f"{landing}/trades_share.parquet"
    )
    rc = main(
        ["update", "--warehouse", wh, "--landing", landing,
         "--range-start", "1400/01/01", "--range-end", "1402/01/01"],
        spark=spark,
    )
    assert rc == 0
    after = spark.read.parquet(f"{wh}/prd_trades_share")
    assert after.count() == n_initial  # compaction collapsed the upsert
    assert after.filter("id = 2").first()["close_price"] == 12.5

    rc = main(
        ["dimdate", "--warehouse", wh, "--start-jyear", "1400", "--end-jyear", "1401"],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(f"{wh}/prd_dim_date").count() == 365 + 365


def test_cli_update_skips_unsupported_tables_loudly(spark, fixtures, tmp_path, capsys):
    """Review regression: a landing table with no incremental path must
    be reported as skipped (never silently ignored), and dims include
    'indexes' so indexvalues updates can resolve their dimension."""
    import json as _json

    from web_api_postgres_etl_spark.__main__ import _DIMS, main

    assert "indexes" in _DIMS
    trades, instruments, assets, categories, exchanges = fixtures
    landing = str(tmp_path / "landing")
    wh = str(tmp_path / "wh")
    for name, df in [
        ("trades_share", trades), ("instruments", instruments),
        ("assets", assets), ("categories", categories),
        ("exchanges", exchanges),
    ]:
        df.write.parquet(f"{landing}/{name}.parquet")
    # a table the runner has no path for at all
    spark.createDataFrame(
        [(1, 1)], "id long, `meta.version` long"
    ).write.parquet(f"{landing}/mystery_feed.parquet")
    args = ["--warehouse", wh, "--landing", landing,
            "--range-start", "1400/01/01", "--range-end", "1402/01/01"]
    assert main(["create", *args], spark=spark) == 0
    capsys.readouterr()
    assert main(["update", *args], spark=spark) == 0
    out = [_json.loads(line) for line in capsys.readouterr().out.splitlines() if line.strip()]
    skipped = [o for o in out if o.get("skipped")]
    assert [o["table"] for o in skipped] == ["mystery_feed"]
    assert any(o.get("table") == "prd_trades_share" and not o.get("error") for o in out)


def test_cli_alert_log_records_failures(spark, fixtures, tmp_path, capsys):
    """r13: `create --alert-log` wires the file alerter — a landing
    table whose parquet is unreadable fails its load (retries
    exhausted) and lands one JSON alert line; healthy tables load and
    do not alert; the run still exits non-zero (failures present)."""
    import json as _json

    from web_api_postgres_etl_spark.__main__ import main

    trades, instruments, assets, categories, exchanges = fixtures
    landing = str(tmp_path / "landing")
    for name, df in [
        ("trades_share", trades), ("instruments", instruments),
        ("assets", assets), ("categories", categories),
        ("exchanges", exchanges),
    ]:
        df.write.parquet(f"{landing}/{name}.parquet")
    # a .parquet path that is not parquet — the read fails per-table
    with open(f"{landing}/broken_feed.parquet", "w") as fh:
        fh.write("not parquet")
    log = str(tmp_path / "alerts.jsonl")
    rc = main(
        ["create", "--warehouse", str(tmp_path / "wh"),
         "--landing", landing, "--range-start", "1400/01/01",
         "--range-end", "1402/01/01", "--alert-log", log],
        spark=spark,
    )
    assert rc != 0  # failures present
    capsys.readouterr()
    lines = [
        _json.loads(x)
        for x in open(log, encoding="utf-8").read().splitlines()
    ]
    assert [x["table"] for x in lines] == ["src_broken_feed"]
    assert lines[0]["attempts"] == 2  # default retries=1 exhausted


def test_news_full_and_incremental(spark, tmp_path):
    """The reference's news lifecycle (create_prd_news + update append
    and (j_date, title) last-wins dedup — mabna_tables_create.py:259,
    mabna_tables_update.py:290-330): full refresh publishes prd_news;
    the incremental run appends the delta and compaction keeps the
    newest version per (j_date, title)."""
    NEWS_SCHEMA = (
        "id long, date_time string, title string, text string, `meta.version` long"
    )
    wh = str(tmp_path / "wh")
    initial = spark.createDataFrame(
        [
            (1, "14010101093000", "Budget passes", "v1 body", 1),
            (2, "14010102093000", "Markets open", "body", 2),
        ],
        NEWS_SCHEMA,
    )
    pipe = MedallionPipeline(spark, wh, range_start="1400/01/01", range_end="1402/01/01")
    pipe.run_full_refresh({"news": lambda: initial})
    prd = table_path(wh, "prd", "news")
    assert spark.read.parquet(prd).count() == 2
    assert any(r.table == "prd_news" and not r.error for r in pipe.results)

    # delta: re-issue of article 1 (same j_date+title, newer version)
    # plus one new article
    delta = spark.createDataFrame(
        [
            (3, "14010101110000", "Budget passes", "v2 body", 3),
            (4, "14010103093000", "Rates decision", "body", 4),
        ],
        NEWS_SCHEMA,
    )
    pipe.run_incremental(
        {"news": lambda wm: delta.filter(F.col("`meta.version`") > F.lit(wm or 0))},
        dims={},
    )
    rows = {(r.j_date, r.title): r for r in spark.read.parquet(prd).collect()}
    assert len(rows) == 3  # upsert collapsed, new article landed
    assert rows[("1401/01/01", "Budget passes")].text == "v2 body"
    # the watermark PROBE is really wired for news: the rerun's
    # extractor must receive the post-delta max version (compaction
    # would mask a broken probe if we only asserted the row count)
    seen_wm: list = []

    def probe_extract(wm):
        seen_wm.append(wm)
        return delta.filter(F.col("`meta.version`") > F.lit(wm or 0))

    pipe.run_incremental({"news": probe_extract}, dims={})
    assert seen_wm == [4]
    assert spark.read.parquet(prd).count() == 3
    # the runner's DEFENSIVE filter holds even when the extractor
    # ignores its watermark: nothing new lands
    pipe.run_incremental({"news": lambda wm: delta}, dims={})
    final = spark.read.parquet(prd)
    assert final.count() == 3
    assert {r.text for r in final.collect()} == {"v2 body", "body"}


def test_cli_profile(spark, tmp_path, capsys):
    """The profile subcommand prints skew rows for one table and the
    join price + hot keys for two."""
    import json as _json

    from web_api_postgres_etl_spark.__main__ import main

    t1 = str(tmp_path / "t1.parquet")
    t2 = str(tmp_path / "t2.parquet")
    spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, "k string").write.parquet(t1)
    spark.createDataFrame([("a",)] * 3 + [("c",)], "k string").write.parquet(t2)

    assert main(["profile", "--table", t1, "--keys", "k"], spark=spark) == 0
    rows = [_json.loads(x) for x in capsys.readouterr().out.splitlines() if x.strip()]
    assert rows[0]["k"] == "a" and rows[0]["n_rows"] == 6

    assert main(["profile", "--table", t1, "--keys", "k", "--join", t2], spark=spark) == 0
    out = [_json.loads(x) for x in capsys.readouterr().out.splitlines() if x.strip()]
    # decimal counters serialize via str (json has no Decimal)
    assert int(out[0]["est_join_rows"]) == 18  # 6x3 on 'a'
    assert (out[1]["k"], int(out[1]["join_rows"]), out[1]["n_left"], out[1]["n_right"]) == ("a", 18, 6, 3)


def test_cli_profile_quantiles(spark, tmp_path, capsys):
    """profile --quantiles prints per-key sampled percentiles (exact
    here — the table is smaller than the sample cap) and demands the
    unique-id column."""
    import json as _json

    import pytest as _pt

    from web_api_postgres_etl_spark.__main__ import main

    t = str(tmp_path / "q.parquet")
    spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(100)],
        "id long, g string, v double",
    ).write.parquet(t)
    assert main(
        ["profile", "--table", t, "--quantiles", "v", "--id-col", "id",
         "--keys", "g", "--probs", "0.5"],
        spark=spark,
    ) == 0
    rows = {
        r["g"]: r
        for r in (
            _json.loads(x)
            for x in capsys.readouterr().out.splitlines() if x.strip()
        )
    }
    # 50 even values 0..98: exact PERCENTILE_CONT p50 = 49.0; odds = 50.0
    assert rows["a"]["n_rows"] == 50 and rows["a"]["p0.5"] == 49.0
    assert rows["b"]["p0.5"] == 50.0
    with _pt.raises(SystemExit, match="id-col"):
        main(["profile", "--table", t, "--quantiles", "v"], spark=spark)


def test_cli_compact(spark, tmp_path, capsys):
    """The compact subcommand collapses duplicate versions — whole
    table and partition-scoped forms."""
    import json as _json

    from web_api_postgres_etl_spark.__main__ import main

    schema = "id long, j_month string, name string, `meta.version` long, v double"
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [
            (1, "140101", "a", 1, 1.0),
            (2, "140101", "a", 2, 2.0),  # newer version of the same key
            (3, "140102", "b", 3, 3.0),
        ],
        schema,
    ).write.partitionBy("j_month").parquet(path)
    rc = main(
        ["compact", "--table", path, "--keys", "name",
         "--partition-col", "j_month", "--touched", "140101"],
        spark=spark,
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (out["rows_before"], out["rows_after"], out["collapsed"]) == (3, 2, 1)
    rows = {r.name: r["meta.version"] for r in spark.read.parquet(path).collect()}
    assert rows == {"a": 2, "b": 3}

    # whole-table form (rename swap)
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, "x", 1, 1.0), (2, "x", 5, 9.0)],
        "id long, name string, `meta.version` long, v double",
    ).write.parquet(flat)
    assert main(["compact", "--table", flat, "--keys", "name"], spark=spark) == 0
    assert [r["meta.version"] for r in spark.read.parquet(flat).collect()] == [5]


def test_cli_compact_guards(spark, tmp_path):
    """Review regressions: empty --keys refuses (would collapse the
    table to one row); --touched without --partition-col refuses;
    a partitioned table without --partition-col refuses (flattening);
    a crashed swap is healed before the pre-count."""
    import shutil

    import pytest

    from web_api_postgres_etl_spark.__main__ import main

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "140101", "a", 1, 1.0), (2, "140101", "a", 2, 2.0)],
        "id long, j_month string, name string, `meta.version` long, v double",
    ).write.partitionBy("j_month").parquet(path)
    with pytest.raises(SystemExit, match="at least one column"):
        main(["compact", "--table", path, "--keys", " , "], spark=spark)
    with pytest.raises(SystemExit, match="requires --partition-col"):
        main(["compact", "--table", path, "--keys", "name", "--touched", "140101"], spark=spark)
    with pytest.raises(SystemExit, match="hive-partitioned"):
        main(["compact", "--table", path, "--keys", "name"], spark=spark)
    # crashed swap: live data in .old, path missing — compact heals it
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, "x", 1, 1.0), (2, "x", 5, 9.0)],
        "id long, name string, `meta.version` long, v double",
    ).write.parquet(flat)
    shutil.move(flat, flat + ".old")
    assert main(["compact", "--table", flat, "--keys", "name"], spark=spark) == 0
    assert [r["meta.version"] for r in spark.read.parquet(flat).collect()] == [5]


def test_cli_fingerprint(spark, tmp_path, capsys):
    """The fingerprint subcommand prints (n_rows, fingerprint) JSON; the
    --vs comparison exits 0 on a content match (repartitioned rewrite)
    and 3 on a mismatch, with both sides in the payload."""
    import json

    from web_api_postgres_etl_spark.__main__ import main

    t1 = str(tmp_path / "a")
    t2 = str(tmp_path / "b")
    t3 = str(tmp_path / "c")
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], "id long, s string"
    )
    df.write.parquet(t1)
    df.repartition(5).write.parquet(t2)           # same content, new layout
    df.filter("id != 2").write.parquet(t3)        # different content

    assert main(["fingerprint", "--table", t1], spark=spark) == 0
    solo = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert solo["n_rows"] == 3 and int(solo["fingerprint"]) > 0

    assert main(
        ["fingerprint", "--table", t1, "--vs", t2], spark=spark
    ) == 0
    match = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert match["match"] is True
    assert match["fingerprint"] == match["vs"]["fingerprint"]

    assert main(
        ["fingerprint", "--table", t1, "--vs", t3, "--cols", "id,s"],
        spark=spark,
    ) == 3
    diff = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert diff["match"] is False and diff["vs"]["n_rows"] == 2


def test_cli_annindex_lifecycle(spark, tmp_path, capsys):
    """The annindex subcommand drives the whole IVF-PQ lifecycle from
    the shell: build reports sidecar shapes, probe's top-k equals the
    operator API's bit-for-bit, append lands only fresh ids, and
    compact shrinks the post-append small files with the probe result
    unchanged."""
    import json

    from web_api_postgres_etl_spark.__main__ import main
    from web_api_postgres_etl_spark.operators.similarity import ivf_pq_probe

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = str(tmp_path / "corpus")
    batch = str(tmp_path / "batch")
    idx = str(tmp_path / "idx")
    n_corpus = emb.filter("vec_id <= 400").count()
    n_fresh = emb.filter("vec_id > 400").count()
    emb.filter("vec_id <= 400").write.parquet(corpus)
    emb.filter("vec_id > 350").write.parquet(batch)  # overlap + fresh
    qvec = [
        float(x) for x in emb.filter("vec_id = 7").first()["embedding"]
    ]
    qjson = json.dumps(qvec)

    common = ["annindex", "--index", idx, "--every", "11",
              "--centroids", "4", "--pq-k", "8"]
    assert main(common + ["build", "--corpus", corpus], spark=spark) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["rows"] == n_corpus and built["clusters"] == 4
    assert built["m"] == 4 and built["codes_per_subspace"] == [8] * 4

    assert main(common + ["probe", "--query-json", qjson, "--k", "5"],
                spark=spark) == 0
    probed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = [
        {"id": r[0], "adc_dist": r[1]}
        for r in ivf_pq_probe(spark, idx, qvec, k=5, nprobe=2).collect()
    ]
    assert probed["topk"] == want

    assert main(common + ["append", "--batch", batch], spark=spark) == 0
    appended = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert appended["appended"] == n_fresh  # replayed ids skipped

    assert main(common + ["compact"], spark=spark) == 0
    compacted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert compacted["files_after"] < compacted["files_before"]
    assert main(common + ["probe", "--query-json", qjson, "--k", "5"],
                spark=spark) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # vec_ids 401-500 are now probeable; the original 5 survive compaction
    assert {t["id"] for t in probed["topk"]} <= {
        t["id"] for t in again["topk"]
    } | {t["id"] for t in probed["topk"]}
    assert main(common + ["probe", "--query-json", qjson, "--k", "5"],
                spark=spark) == 0
    capsys.readouterr()

    # nnjoin: a query TABLE against the same index from the shell —
    # the written per-query top-k equals the operator API bit-for-bit
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_pq_nn_join,
    )

    qtab = str(tmp_path / "queries")
    nnout = str(tmp_path / "nnout")
    emb.filter("vec_id % 151 = 7").select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).write.parquet(qtab)
    assert main(
        common + ["nnjoin", "--queries", qtab, "--out", nnout,
                  "--k", "5"],
        spark=spark,
    ) == 0
    nn = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want_nn = sorted(
        tuple(r)
        for r in ivf_pq_nn_join(
            spark.read.parquet(qtab), idx, k=5, nprobe=2
        ).collect()
    )
    got_nn = sorted(
        tuple(r) for r in spark.read.parquet(nnout).collect()
    )
    assert got_nn == want_nn
    assert nn["rows"] == len(want_nn)
    assert nn["queries"] == len({t[0] for t in want_nn})

    # rerank (r13): the three-stage read from the shell — shortlist +
    # exact re-rank over the full float table ≡ the operator API
    from web_api_postgres_etl_spark.operators.similarity import (
        nn_rerank_exact,
    )

    alltab = str(tmp_path / "allvecs")
    emb.write.parquet(alltab)
    rrout = str(tmp_path / "rrout")
    assert main(
        common + ["rerank", "--queries", qtab, "--corpus", alltab,
                  "--out", rrout, "--k", "5", "--rerank-k", "3"],
        spark=spark,
    ) == 0
    rr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want_rr = sorted(
        tuple(r)
        for r in nn_rerank_exact(
            ivf_pq_nn_join(spark.read.parquet(qtab), idx, k=5, nprobe=2),
            spark.read.parquet(alltab), spark.read.parquet(qtab),
            k=3, metric="cosine",
        ).collect()
    )
    got_rr = sorted(tuple(r) for r in spark.read.parquet(rrout).collect())
    assert got_rr == want_rr
    assert rr["rows"] == len(want_rr) and rr["metric"] == "cosine"

    # dedup (r13): a replayed batch (rows already in the index, same
    # ids) fully survives in exact mode (self-match-exempt); exact
    # copies under NEW ids are dropped
    replay = str(tmp_path / "replay")
    emb.filter("vec_id % 97 = 11").write.parquet(replay)
    dd1 = str(tmp_path / "dd1")
    assert main(
        common + ["dedup", "--batch", replay, "--corpus", alltab,
                  "--out", dd1, "--min-cosine", "0.999999"],
        spark=spark,
    ) == 0
    d1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d1["dropped"] == 0 and d1["survivors"] == d1["batch_rows"]
    copies = str(tmp_path / "copies")
    emb.filter("vec_id % 97 = 11").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    ).write.parquet(copies)
    dd2 = str(tmp_path / "dd2")
    assert main(
        common + ["dedup", "--batch", copies, "--corpus", alltab,
                  "--out", dd2, "--min-cosine", "0.999999"],
        spark=spark,
    ) == 0
    d2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d2["dropped"] == d2["batch_rows"] and d2["survivors"] == 0
    # guard: dedup without a threshold mode raises through the
    # operator's own ValueError
    import pytest as _pt2
    with _pt2.raises(ValueError, match="exactly one"):
        main(
            common + ["dedup", "--batch", replay, "--out", dd2],
            spark=spark,
        )

    # stats: per-cluster totals agree with the code table; the corpus
    # form adds the reconstruction-error columns
    assert main(common + ["stats"], spark=spark) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["total_rows"] == spark.read.parquet(idx).count()
    assert all("n_files" in c for c in st["clusters"])
    assert main(common + ["stats", "--corpus", corpus], spark=spark) == 0
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(
        c["avg_sq_err"] is None or c["avg_sq_err"] >= 0.0
        for c in st2["clusters"]
    )

    # recall: the CLI face of ann_recall_at_k over the same query
    # table — mean recall well-defined, per-query hits in [0, k]
    assert main(
        common + ["recall", "--queries", qtab, "--corpus", corpus,
                  "--k", "5"],
        spark=spark,
    ) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["queries"] == spark.read.parquet(qtab).count()
    assert 0.0 <= rec["mean_recall"] <= 1.0
    assert all(0 <= p["n_hits"] <= 5 for p in rec["per_query"])
    # r13: the recall JSON reports the index mode so residual-vs-plain
    # comparisons are attributable (this index was built plain)
    assert rec["residual"] is False

    # guards: missing required operand exits via SystemExit
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["annindex", "build", "--index", idx], spark=spark)
    with _pt.raises(SystemExit):
        main(["annindex", "nnjoin", "--index", idx], spark=spark)
    with _pt.raises(SystemExit):
        main(["annindex", "recall", "--index", idx], spark=spark)


def test_fs_probes_and_empty_partitioned_sink(spark, tmp_path):
    """r14 (ADVICE): warehouse existence checks go through the Hadoop
    FileSystem API (scheme-aware — an HDFS/S3 warehouse would read as
    universally absent to os.path.exists), and the watermark probe
    distinguishes the two faces Spark reports identically as
    UNABLE_TO_INFER_SCHEMA: a zero-row partitioned write (only
    _SUCCESS on disk) legitimately probes None; a dir with present
    data files is has_data_files=True and any read failure there
    propagates."""
    from web_api_postgres_etl_spark.plans.fs import (
        has_data_files,
        path_exists,
    )
    from web_api_postgres_etl_spark.plans.watermark import WatermarkManager

    ok = str(tmp_path / "ok")
    spark.createDataFrame([(1, 7)], "id long, `meta.version` long").write.parquet(ok)
    assert path_exists(spark, ok) and has_data_files(spark, ok)
    # file:// URIs resolve the same way
    assert path_exists(spark, "file://" + ok)
    assert not path_exists(spark, str(tmp_path / "nope"))
    assert not has_data_files(spark, str(tmp_path / "nope"))

    # zero-row partitioned write → only _SUCCESS in the dir
    empty = str(tmp_path / "empty")
    spark.createDataFrame([], "id long, p long, `meta.version` long").write.partitionBy(
        "p"
    ).parquet(empty)
    assert path_exists(spark, empty) and not has_data_files(spark, empty)
    wm = WatermarkManager(spark, str(tmp_path))
    assert wm.probe({"t": empty}) == {"t": None}


def test_entry_session_key_and_memo_eviction():
    """r14 (ADVICE): the entry-file memo caches key on a stable
    session identifier, not id(spark) — a recycled id must never hand
    a new session a dead session's DataFrames — and a miss under a new
    session evicts the dead session's entries instead of growing
    forever."""
    import __spark_entry__ as entrymod

    class FakeSession:
        pass

    cache: dict = {}
    s1 = FakeSession()
    v1 = entrymod._memo(cache, s1, ("t",), lambda: "one")
    assert v1 == "one" and len(cache) == 1
    # hit: no rebuild
    assert entrymod._memo(cache, s1, ("t",), lambda: "BOOM") == "one"
    k1 = entrymod._session_key(s1)
    # the key is stamped on the object: same key, no recompute drift
    assert entrymod._session_key(s1) == k1
    # a NEW session (the fallback key embeds id(); force distinctness
    # by keeping s1 alive) misses and evicts s1's entries
    s2 = FakeSession()
    assert entrymod._session_key(s2) != k1
    v2 = entrymod._memo(cache, s2, ("t",), lambda: "two")
    assert v2 == "two"
    assert len(cache) == 1 and list(cache)[0][0] == entrymod._session_key(s2)
