"""Real-Postgres semantics parity (VERDICT r4 #7).

The reference's sink is Postgres 13 (docker-compose.yaml:79); our JDBC
writers are validated against embedded Derby (test_jdbc.py) because
this container ships NO Postgres JDBC driver jar — Spark's
``format("jdbc")`` physically cannot reach Postgres here, and that
remains the documented seam (SURVEY §8). What the sandbox DOES have is
the Postgres 15 server binaries, so this module closes the semantics
half of the gap: boot a throwaway real Postgres, load the same
testdata, and assert our operators' results equal real Postgres SQL —
the upsert/last-wins compaction semantics the reference implements in
Postgres, and a star-join aggregate.

Everything is skipped cleanly when the server cannot be booted (no
binaries, no su-able unprivileged user)."""

from __future__ import annotations

import csv
import io
import os
import shutil
import subprocess
import tempfile
import time

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

_BINS = all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql"))

pytestmark = pytest.mark.skipif(
    not _BINS, reason="postgres server binaries not available"
)


def _as_pg_user(cmd: str) -> list[str]:
    """Postgres refuses to run as root; wrap through `su nobody` when
    the test process is root, run directly otherwise."""
    if os.geteuid() == 0:
        return ["su", "nobody", "-s", "/bin/sh", "-c", cmd]
    return ["/bin/sh", "-c", cmd]


@pytest.fixture(scope="module")
def pg():
    work = tempfile.mkdtemp(prefix="pgparity_")
    data = os.path.join(work, "data")
    sock = os.path.join(work, "sock")
    os.makedirs(sock)
    os.chmod(work, 0o777)
    os.chmod(sock, 0o777)
    if os.geteuid() == 0:
        subprocess.run(["chown", "-R", "nobody", work], check=True)
    r = subprocess.run(
        _as_pg_user(f"initdb -D {data} -U postgres -A trust"),
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        shutil.rmtree(work, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    start = (
        f"pg_ctl -D {data} -o \"-c listen_addresses='' "
        f"-c unix_socket_directories={sock}\" -l {data}/pg.log start"
    )
    r = subprocess.run(_as_pg_user(start), capture_output=True, text=True)
    if r.returncode != 0:
        shutil.rmtree(work, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {r.stderr[-200:]}")

    def q(sql: str) -> list[tuple[str, ...]]:
        out = subprocess.run(
            ["psql", "-h", sock, "-U", "postgres", "-d", "postgres",
             "--csv", "-v", "ON_ERROR_STOP=1", "-c", sql],
            capture_output=True, text=True, check=True,
        ).stdout
        rows = list(csv.reader(io.StringIO(out)))
        return [tuple(r) for r in rows[1:]]  # drop header

    def _teardown():
        subprocess.run(
            _as_pg_user(f"pg_ctl -D {data} stop -m immediate"),
            capture_output=True, text=True,
        )
        shutil.rmtree(work, ignore_errors=True)

    # everything after the server is up must stop it on failure, or a
    # setup error leaks a running postgres into later rounds
    try:
        for _ in range(20):  # socket may lag the ctl return
            try:
                q("SELECT 1")
                break
            except subprocess.CalledProcessError:
                time.sleep(0.25)
        else:
            _teardown()
            pytest.skip("postgres socket never came up")

        # load the shared testdata (columns the two parity queries touch)
        con = duckdb.connect()
        exports = {
            "orders": ("o_orderkey BIGINT, o_custkey BIGINT, "
                       "o_totalprice DOUBLE PRECISION, o_orderdate TIMESTAMP",
                       "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate"),
            "customer": ("c_custkey BIGINT, c_nationkey INT",
                         "SELECT c_custkey, c_nationkey"),
            "nation": ("n_nationkey INT, n_name TEXT",
                       "SELECT n_nationkey, n_name"),
        }
        for t, (ddl, proj) in exports.items():
            path = os.path.join(work, f"{t}.csv")
            con.execute(
                f"COPY ({proj} FROM '{SF}/{t}.parquet') TO '{path}' (HEADER)"
            )
            os.chmod(path, 0o644)
            q(f"CREATE TABLE {t} ({ddl})")
            q(f"COPY {t} FROM '{path}' CSV HEADER")
        con.close()
    except BaseException:
        _teardown()
        raise

    yield q
    _teardown()


def test_last_wins_compaction_matches_postgres(spark, pg):
    """The reference's upsert semantics (newest version per key wins,
    deterministic tiebreak) — our window compaction vs real Postgres
    row_number. Latest order per customer, ties broken by orderkey."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.dedup import dedup_last_wins

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    got = sorted(
        (str(r["o_custkey"]), str(r["o_orderkey"]))
        for r in dedup_last_wins(
            orders, keys=["o_custkey"], version_col="o_orderdate",
            tiebreaker="o_orderkey",
        ).select("o_custkey", "o_orderkey").collect()
    )
    want = sorted(pg(
        """
        SELECT o_custkey::text, o_orderkey::text FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) t
        WHERE rn = 1
        """
    ))
    assert got == want and got


def test_star_join_agg_matches_postgres(spark, pg):
    """Orders ⋈ customer ⋈ nation, per-nation count + max price in
    exact integer cents (floor(x*100) on identical doubles — no
    float-format or rounding-mode ambiguity between engines)."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    got = sorted(
        (r["n_name"], str(r["n_orders"]), str(r["max_cents"]))
        for r in (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(
                F.count("*").alias("n_orders"),
                F.max(
                    F.floor(F.col("o_totalprice") * 100).cast("long")
                ).alias("max_cents"),
            )
            .collect()
        )
    )
    want = sorted(pg(
        """
        SELECT n_name, count(*)::text,
               max(floor(o_totalprice * 100)::bigint)::text
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    ))
    assert got == want and got
