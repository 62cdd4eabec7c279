"""G1/G2 — medallion pipeline runners (full refresh / incremental).

The reference's two Airflow DAGs (mabna_tables_create.py:303-322 —
manual full refresh; mabna_tables_update.py:383-410 — 15-min cron
incremental) become two methods over the same operator library. The
config fan-out (G3: for title → for item → for instrument type,
mabna_tables_create.py:80-90) drives which tables exist; cross-task
state (G4: the XCom watermark dict) is a plain dict returned by
``WatermarkManager.probe``; fault tolerance (G5) is per-table
try/except with structured results instead of swallowed prints.

Layering contract (reference's Postgres schemas → path prefixes):
``src_*`` raw flattened ingest → ``stg_*`` cleaned/derived →
``prd_*`` joined/filtered, partitioned for scale.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_last_wins
from ..operators.filters import drop_required_nulls, in_range, newer_than
from ..operators.joins import star_join
from ..operators.project import project, qcol
from ..functions.dates import fa_today, jalali_compact_to_slashed
from ..functions.math import pct_change
from ..sources.writers import (
    recover_swap,
    swap_compacted,
    table_path,
    write_append,
    write_overwrite,
)
from .watermark import WatermarkManager

TRADES_PROJECTION = [
    "id", "date_time", "open_price", "high_price", "low_price",
    "close_price", "close_price_change", "trade_count", "volume", "value",
    "instrument.id", "meta.version",
]  # mabna_tables_create.py:145-146
TRADES_REQUIRED = [
    "date_time", "open_price", "high_price", "low_price", "close_price",
    "close_price_change", "trade_count", "volume", "value", "instrument.id",
]  # mabna_tables_create.py:147-148
NEWS_PROJECTION = ["id", "date_time", "title", "text", "meta.version"]
NEWS_REQUIRED = ["date_time", "title", "text"]
INDEXVALUES_PROJECTION = [
    "id", "date_time", "open_value", "low_value", "high_value",
    "close_value", "close_value_change", "index.id", "meta.version",
]
INDEXVALUES_REQUIRED = [
    "date_time", "open_value", "low_value", "high_value", "close_value",
    "close_value_change", "index.id",
]

INSTRUMENT_TYPES = [
    "share", "bond", "future", "intellectual_property", "energy",
    "commodity", "currency", "crypto",
]  # constants.yaml:11-19
NO_DETAIL_TYPES = {"commodity", "currency"}  # mabna_tables_update.py:250-251


def with_jalali_month(df: DataFrame) -> DataFrame:
    """Derive the prd partition column ``j_month`` ("1401-01") from the
    slashed ``j_date`` ("1401/01/01"). Dash separator: a '/' in a
    partition VALUE would be path-escaped into unreadable dirs."""
    return df.withColumn(
        "j_month",
        F.concat(
            F.col("j_date").substr(1, 4), F.lit("-"), F.col("j_date").substr(6, 2)
        ),
    )


@dataclass
class RunResult:
    table: str
    rows: int | None
    error: str | None = None
    attempts: int = 1


@dataclass
class MedallionPipeline:
    """Source-agnostic runner: ``extract`` callables supply raw frames
    (REST in production, parquet fixtures in tests), the runner owns
    transform+load ordering."""

    spark: SparkSession
    warehouse: str
    range_start: str = "1399/01/01"
    range_end: str = field(default_factory=fa_today)
    results: list[RunResult] = field(default_factory=list)
    # G5 retry policy (reference: retries=1, retry_delay=2 min, email
    # on failure — mabna_tables_create.py:21-30; the "email" is the
    # structured RunResult here). retry_delay_s defaults small so tests
    # stay fast; production mirrors the reference with 120.
    retries: int = 1
    retry_delay_s: float = 0.0
    # r13: the reference's email_on_failure as a pluggable hook —
    # invoked once per FAILED table with its RunResult, after retries.
    # See plans/alerts.py (file_alerter / email_alerter /
    # compose_alerters). Best-effort: a raising alerter is swallowed
    # (alerting must never break the run it reports on).
    on_failure: Callable[["RunResult"], None] | None = None

    def _attempt(self, fn: Callable[[], object]):
        """Run ``fn`` up to retries+1 times with linear backoff.
        Returns (attempts, result, error) — error is None on success."""
        import time

        err: Exception | None = None
        for attempt in range(1, self.retries + 2):
            try:
                return attempt, fn(), None
            except Exception as exc:  # noqa: BLE001 — G5 isolates any failure
                err = exc
                if attempt <= self.retries and self.retry_delay_s:
                    time.sleep(self.retry_delay_s * attempt)
        return self.retries + 1, None, err

    # ---------------------------------------------------------- staging
    def stage_trades(self, src: DataFrame) -> DataFrame:
        """Entry point 2 (mabna_tables_create.py:132-162) as one lazy
        chain: project → null-drop → derive j_date → derive pct —
        Catalyst fuses into a single scan→filter→project stage."""
        df = project(src, TRADES_PROJECTION)
        df = drop_required_nulls(df, TRADES_REQUIRED)
        df = df.withColumn("j_date", jalali_compact_to_slashed("date_time"))
        df = df.withColumn(
            "close_price_change_percent",
            pct_change("close_price_change", "close_price"),
        )
        # contract column order: j_date at position 2, pct at 8
        cols = TRADES_PROJECTION.copy()
        cols.insert(2, "j_date")
        cols.insert(8, "close_price_change_percent")
        return project(df, cols)

    def stage_assets(self, src: DataFrame) -> DataFrame:
        """src_exchange_assets (mabna_tables_create.py:92-127): drop
        rows with NULL ``categories``, extract ``categories[0].id`` into
        a ``category.id`` column at the reference's position 8, drop the
        array. The reference extracts positionally AFTER the dropna and
        re-attaches the series by position — silently mis-aligning ids
        whenever rows were dropped; here extraction is per-row
        (functions.arrays.first_element_field), so ids stay with their
        rows (the mis-alignment bug is intentionally NOT reproduced —
        SURVEY §7.4)."""
        from ..functions.arrays import first_element_field

        df = src.filter(F.col("categories").isNotNull())
        df = df.withColumn("category.id", first_element_field("categories", "id"))
        cols = [c for c in df.columns if c not in ("categories", "category.id")]
        pos = min(8, len(cols))
        cols = cols[:pos] + ["category.id"] + cols[pos:]
        return df.select(*[qcol(c).alias(c) for c in cols])

    def stage_news(self, src: DataFrame) -> DataFrame:
        df = project(src, NEWS_PROJECTION)
        df = drop_required_nulls(df, NEWS_REQUIRED)
        df = df.withColumn("j_date", jalali_compact_to_slashed("date_time"))
        cols = NEWS_PROJECTION.copy()
        cols.insert(2, "j_date")
        return project(df, cols)

    def stage_indexvalues(self, src: DataFrame) -> DataFrame:
        df = project(src, INDEXVALUES_PROJECTION)
        df = drop_required_nulls(df, INDEXVALUES_REQUIRED)
        df = df.withColumn("j_date", jalali_compact_to_slashed("date_time"))
        df = df.withColumn(
            "close_value_change_percent",
            pct_change("close_value_change", "close_value"),
        )
        cols = INDEXVALUES_PROJECTION.copy()
        cols.insert(2, "j_date")
        cols.insert(8, "close_value_change_percent")
        return project(df, cols)

    # ------------------------------------------------------- production
    def produce_trades(
        self,
        stg_trades: DataFrame,
        instruments: DataFrame,
        assets: DataFrame,
        categories: DataFrame,
        exchanges: DataFrame,
        instrument_type: str = "share",
        watermark: int | None = None,
    ) -> DataFrame:
        """J1 star join + P2 aliases + P5 range (+P6 watermark) —
        mabna_tables_create.py:226-248 / mabna_tables_update.py:229-251.
        All dims broadcast: fact never shuffles."""
        fact = stg_trades
        if watermark is not None:
            fact = newer_than(fact, "meta.version", watermark)
        joined = star_join(
            fact,
            [
                (instruments, "instrument.id", "id"),
                (assets, "asset.id", "id"),
                (categories, "category.id", "id"),
                (exchanges, "exchange.id", "id"),
            ],
        )
        out = joined.select(
            fact["id"].alias("id"),
            fact["j_date"],
            fact["date_time"],
            instruments["code"],
            instruments["isin"],
            instruments["name"],
            qcol("stock.company.id").alias("company.id"),
            categories["short_name"].alias("category"),
            exchanges["title"].alias("market"),
            fact["open_price"],
            fact["high_price"],
            fact["low_price"],
            fact["close_price"],
            fact["close_price_change"],
            fact["close_price_change_percent"],
            fact["trade_count"],
            fact["volume"],
            fact["value"],
            qcol("meta.version").alias("meta.version"),
        )
        out = in_range(out, "j_date", self.range_start, self.range_end)
        if instrument_type in NO_DETAIL_TYPES:
            out = out.drop("code", "isin", "trade_count", "volume", "value")
        return out

    def produce_indexvalues(
        self, stg_iv: DataFrame, indexes: DataFrame, watermark: int | None = None
    ) -> DataFrame:
        """J2 (mabna_tables_create.py:282-291)."""
        fact = stg_iv
        if watermark is not None:
            fact = newer_than(fact, "meta.version", watermark)
        joined = fact.join(
            F.broadcast(indexes), qcol("index.id") == indexes["id"], "inner"
        )
        out = joined.select(
            fact["id"].alias("id"),
            fact["j_date"],
            fact["date_time"],
            indexes["name"],
            fact["open_value"],
            fact["low_value"],
            fact["high_value"],
            fact["close_value"],
            fact["close_value_change"],
            fact["close_value_change_percent"],
            qcol("meta.version").alias("meta.version"),
        )
        return in_range(out, "j_date", self.range_start, self.range_end)

    # ------------------------------------------------------ orchestration
    def run_full_refresh(
        self, extractors: Mapping[str, Callable[[], DataFrame]]
    ) -> list[RunResult]:
        """G1: extract → stage → produce, overwrite everything.

        ``extractors`` maps logical table name → callable returning the
        raw (already flattened) frame; the REST fan-out or test fixtures
        plug in here."""
        self.results = []
        frames: dict[str, DataFrame] = {}
        for name, fn in extractors.items():
            def _ingest(fn=fn, name=name):
                df = fn()
                write_overwrite(df, table_path(self.warehouse, "src", name))
                return self.spark.read.parquet(
                    table_path(self.warehouse, "src", name)
                )

            # G5: isolate per-table failures; one retry with backoff
            attempts, frame, err = self._attempt(_ingest)
            if err is None:
                frames[name] = frame
                self._ok(f"src_{name}", frame.count(), attempts)
            else:
                self._err(f"src_{name}", err, attempts)
        for t in INSTRUMENT_TYPES:
            key = f"trades_{t}"
            if key in frames:
                stg = self.stage_trades(frames[key])
                write_overwrite(stg, table_path(self.warehouse, "stg", key))
        if "news" in frames:
            write_overwrite(
                self.stage_news(frames["news"]), table_path(self.warehouse, "stg", "news")
            )
            # prd news is the staged frame published as-is (the
            # reference's create_prd_news is a straight SELECT from
            # staging — mabna_tables_create.py:259-271), partitioned by
            # Jalali month so the incremental compactor can repair
            # per touched month
            write_overwrite(
                with_jalali_month(
                    self.spark.read.parquet(table_path(self.warehouse, "stg", "news"))
                ),
                table_path(self.warehouse, "prd", "news"),
                partition_by=["j_month"],
            )
            self._ok("prd_news", None)
        if "indexvalues" in frames:
            write_overwrite(
                self.stage_indexvalues(frames["indexvalues"]),
                table_path(self.warehouse, "stg", "indexvalues"),
            )
        dims = {
            d: frames[d]
            for d in ("instruments", "assets", "categories", "exchanges", "indexes")
            if d in frames
        }
        trade_dims = {"instruments", "assets", "categories", "exchanges"}
        for t in INSTRUMENT_TYPES:
            key = f"trades_{t}"
            stg_path = table_path(self.warehouse, "stg", key)
            # absent stg table (type not ingested this run) → skip is
            # the intent — checked explicitly (the watermark.probe
            # pattern; Spark 4.1's resolver reports a missing path as
            # UNABLE_TO_INFER_SCHEMA or PATH_NOT_FOUND depending on
            # context, so exception classification is unreliable).
            # Scheme-aware probe (plans.fs): a local os.path.exists
            # would read every stg path on an HDFS/S3 warehouse as
            # absent and skip ALL prd trades behind a green run.
            # Any failure reading an EXISTING table (corrupt footer,
            # permissions) surfaces as the table's failure — silently
            # skipping would leave a stale prd behind a green run
            # (r13, the _read_index_meta rule).
            from .fs import path_exists

            if not path_exists(self.spark, stg_path):
                continue
            try:
                stg = self.spark.read.parquet(stg_path)
            except Exception as exc:
                self._err(f"prd_{key}", exc)
                continue
            # require the four specific trade dims (a count-based gate
            # would pass with e.g. {instruments, categories, exchanges,
            # indexes} and then KeyError mid-refresh)
            missing = trade_dims - dims.keys()
            if missing:
                self._err(
                    f"prd_{key}",
                    RuntimeError(f"missing dimension extracts: {sorted(missing)}"),
                )
            else:
                prd = self.produce_trades(
                    stg,
                    dims["instruments"],
                    dims["assets"],
                    dims["categories"],
                    dims["exchanges"],
                    instrument_type=t,
                )
                # prd sinks partition by Jalali month so the incremental
                # compactor can rewrite only touched months (T3 at scale)
                write_overwrite(
                    with_jalali_month(prd),
                    table_path(self.warehouse, "prd", key),
                    partition_by=["j_month"],
                )
                self._ok(f"prd_{key}", None)
        if "indexvalues" in frames:
            # same missing-dimension gate as the trades tables: report
            # the failure instead of silently skipping the prd build
            if "indexes" not in dims:
                self._err(
                    "prd_indexvalues",
                    RuntimeError("missing dimension extracts: ['indexes']"),
                )
            else:
                stg = self.spark.read.parquet(
                    table_path(self.warehouse, "stg", "indexvalues")
                )
                prd = self.produce_indexvalues(stg, dims["indexes"])
                write_overwrite(
                    with_jalali_month(prd),
                    table_path(self.warehouse, "prd", "indexvalues"),
                    partition_by=["j_month"],
                )
                self._ok("prd_indexvalues", None)
        return self.results

    def _append_and_compact(
        self, prd: DataFrame, path: str, keys: list[str]
    ) -> None:
        """The shared incremental tail: persist the delta (the
        touched-months collect and the append must see the SAME frame,
        paying one upstream evaluation — the extract may be remote),
        append month-partitioned, then compact ONLY touched months.
        Compaction last: the (keys) last-wins dedup also collapses the
        double-append a retried attempt leaves behind, so a post-append
        failure self-heals on retry."""
        prd = with_jalali_month(prd).persist()
        try:
            touched = [
                r[0] for r in prd.select("j_month").distinct().collect()
            ]
            write_append(prd, path, partition_by=["j_month"])
        finally:
            prd.unpersist()
        self.compact_partitioned(
            path, keys=keys, partition_col="j_month", touched=touched,
        )

    def run_incremental(
        self,
        extractors: Mapping[str, Callable[[int | None], DataFrame]],
        dims: Mapping[str, DataFrame],
    ) -> list[RunResult]:
        """G2/T1-T3: probe watermarks → delta extract (pushdown) →
        stage → append to prd → last-wins compaction, per table.

        Mirrors mabna_tables_update.py:383-410 ordering: every append is
        chained with its compaction so re-delivered versions collapse
        before readers see them.
        """
        self.results = []
        wm_mgr = WatermarkManager(self.spark, self.warehouse)
        prd_paths = {
            f"trades_{t}": table_path(self.warehouse, "prd", f"trades_{t}")
            for t in INSTRUMENT_TYPES
            if f"trades_{t}" in extractors
        }
        if "indexvalues" in extractors:
            prd_paths["indexvalues"] = table_path(self.warehouse, "prd", "indexvalues")
        if "news" in extractors:
            prd_paths["news"] = table_path(self.warehouse, "prd", "news")
        watermarks = wm_mgr.probe(prd_paths)

        for t in INSTRUMENT_TYPES:
            key = f"trades_{t}"
            if key not in extractors:
                continue

            def _run_trades(t=t, key=key):
                wm = watermarks.get(key)
                delta = extractors[key](wm)  # S1 pushdown: server filters > wm
                stg = self.stage_trades(delta)
                prd = self.produce_trades(
                    stg,
                    dims["instruments"],
                    dims["assets"],
                    dims["categories"],
                    dims["exchanges"],
                    instrument_type=t,
                    watermark=wm,
                )
                self._append_and_compact(
                    prd, prd_paths[key], keys=["j_date", "name"]
                )

            attempts, _, err = self._attempt(_run_trades)
            if err is None:
                self._ok(f"prd_{key}", None, attempts)
            else:
                self._err(f"prd_{key}", err, attempts)
        if "indexvalues" in extractors:

            def _run_idx():
                wm = watermarks.get("indexvalues")
                delta = extractors["indexvalues"](wm)
                stg = self.stage_indexvalues(delta)
                prd = self.produce_indexvalues(stg, dims["indexes"], watermark=wm)
                self._append_and_compact(
                    prd, prd_paths["indexvalues"], keys=["j_date", "name"]
                )

            attempts, _, err = self._attempt(_run_idx)
            if err is None:
                self._ok("prd_indexvalues", None, attempts)
            else:
                self._err("prd_indexvalues", err, attempts)
        if "news" in extractors:
            # mabna_tables_update.py:290-330: delta by meta.version →
            # append → drop_duplicates (j_date, title) keep last; here
            # the dedup is the window compactor scoped to touched months
            def _run_news():
                wm = watermarks.get("news")
                delta = extractors["news"](wm)
                stg = self.stage_news(delta)
                # defensive watermark filter, like trades/indexvalues'
                # produce_*: an extractor that ignores its wm argument
                # must not re-append the whole corpus every tick
                if wm is not None:
                    stg = newer_than(stg, "meta.version", wm)
                self._append_and_compact(
                    stg, prd_paths["news"], keys=["j_date", "title"]
                )

            attempts, _, err = self._attempt(_run_news)
            if err is None:
                self._ok("prd_news", None, attempts)
            else:
                self._err("prd_news", err, attempts)
        return self.results

    def compact(self, path: str, keys: list[str]) -> None:
        """T3 repair: append-then-compact, last version wins (O2).

        The reference rewrites the whole table
        (mabna_tables_update.py:271-280). Here the rewrite is still
        table-scoped at test scale, but routed through dedup_last_wins
        (window, not dropDuplicates); ``compact_partitioned`` below is
        the 100 TB form (only freshly-touched partitions rewritten).
        """
        recover_swap(path)  # heal a crashed prior swap (stale .old/.tmp)
        df = self.spark.read.parquet(path)
        compacted = dedup_last_wins(df, keys, version_col="meta.version", tiebreaker="id")
        compacted.cache().count()  # materialize before overwriting the source dir
        write_overwrite(compacted, path + ".tmp")
        # release ONLY this frame (clearCache would drop every cached
        # DataFrame session-wide), then swap (see writers.swap_compacted)
        compacted.unpersist()
        swap_compacted(path)
        self._maybe_refresh_zone_map(path)

    def compact_partitioned(
        self,
        path: str,
        keys: list[str],
        partition_col: str,
        touched: list[str] | None = None,
    ) -> None:
        """Partition-scoped last-wins compaction — the 100 TB path.

        The sink is parquet partitioned by ``partition_col`` (for prd
        tables: a Jalali-month column, e.g. ``substr(j_date,1,7)``
        written via ``write_append(..., partition_by=[col])``). Only
        ``touched`` partitions (those present in the delta — known to
        the incremental runner for free) are window-deduped and
        rewritten via DYNAMIC partition overwrite; untouched history is
        never read or written. A 15-minute micro-batch then costs
        O(delta + touched partitions), not O(table) like the
        reference's whole-table rewrite (mabna_tables_update.py:
        271-280).
        """
        recover_swap(path)  # drop a stale .tmp (and heal a crashed swap)
        df = self.spark.read.parquet(path)
        if touched is None:
            # derive from sink-side freshness if the caller didn't track it
            touched = [
                r[0]
                for r in df.select(qcol(partition_col)).distinct().collect()
            ]
        scoped = df.filter(qcol(partition_col).isin(touched))
        compacted = dedup_last_wins(
            scoped, keys, version_col="meta.version", tiebreaker="id"
        )
        # Rewrite ONLY the touched partition dirs, via tmp + atomic-ish
        # swap (never overwrite a path still referenced by the read plan;
        # same discipline as compact()). On a cluster this maps to
        # dynamic partition overwrite / MERGE on a transactional table.
        import glob
        import os
        import shutil

        tmp = path + ".tmp"
        (
            compacted.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp)
        )
        for pdir in glob.glob(f"{tmp}/{partition_col}=*"):
            dst = os.path.join(path, os.path.basename(pdir))
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.move(pdir, dst)
        shutil.rmtree(tmp)
        self._maybe_refresh_zone_map(path)

    def _maybe_refresh_zone_map(self, path: str) -> None:
        """Keep a persisted zone-map sidecar consistent with the table
        it indexes: every compaction rewrites files, and a stale map
        would make pruned reads open nonexistent paths (or miss new
        ones). No sidecar → no cost; with one, the refresh drops
        dead entries and scans ONLY files the rewrite added — the
        indexed columns come from the map's own schema. The refreshed
        frame is released immediately (the sidecar write already
        materialized it)."""
        from ..caching import release_frame
        from ..operators.layout import has_zone_map, zone_map_refresh

        if not has_zone_map(path):
            return
        pins: list = []
        zone_map_refresh(self.spark, path, pins=pins)
        for fr in pins:
            release_frame(fr)

    def _ok(self, table: str, rows: int | None, attempts: int = 1) -> None:
        self.results.append(RunResult(table, rows, attempts=attempts))

    def _err(self, table: str, exc: Exception, attempts: int = 1) -> None:
        result = RunResult(
            table, None, f"{type(exc).__name__}: {exc}", attempts
        )
        self.results.append(result)
        if self.on_failure is not None:
            import contextlib

            # alerting is observability — it must never break the run
            with contextlib.suppress(Exception):
                self.on_failure(result)
