"""Property-based and exhaustive-model tests for the engine's pure
kernels: the Jalali calendar arithmetic, shingle construction, the fake
media feature kernel, and last-wins dedup vs a pandas model."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from web_api_postgres_etl_spark.functions.dates import (
    gregorian_to_jalali,
    jalali_to_gregorian,
)
from web_api_postgres_etl_spark.operators.multimodal import fake_image_features
from web_api_postgres_etl_spark.sources.rest import build_url, watermark_params


def test_jalali_gregorian_roundtrip_exhaustive():
    """Every Gregorian day across the dim_date span must round-trip
    through the Jalali conversion, and consecutive days must map to
    consecutive Jalali dates (no gaps/overlaps in the calendar)."""
    d = dt.date(1941, 3, 21)  # 1320/01/01
    end = dt.date(2051, 3, 20)
    prev_j = None
    n = 0
    while d <= end:
        jy, jm, jd = gregorian_to_jalali(d.year, d.month, d.day)
        assert jalali_to_gregorian(jy, jm, jd) == (d.year, d.month, d.day)
        j = (jy, jm, jd)
        if prev_j is not None:
            assert j > prev_j, f"calendar went backwards at {d}: {prev_j} -> {j}"
        prev_j = j
        d += dt.timedelta(days=1)
        n += 1
    assert n > 40000


@given(
    st.integers(min_value=1178, max_value=1633),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=29),
)
def test_jalali_to_gregorian_roundtrip_random(jy, jm, jd):
    """jalali→gregorian→jalali is identity for any valid civil date
    (day ≤ 29 is valid in every Jalali month)."""
    gy, gm, gd = jalali_to_gregorian(jy, jm, jd)
    assert gregorian_to_jalali(gy, gm, gd) == (jy, jm, jd)
    # the produced Gregorian date must be constructible
    dt.date(gy, gm, gd)


@given(st.binary(max_size=256), st.integers(min_value=1, max_value=32))
def test_fake_features_deterministic_and_bounded(content, dim):
    a = fake_image_features(content, dim)
    b = fake_image_features(content, dim)
    assert a == b
    assert len(a) == dim
    assert all(0.0 <= x < 1.0 for x in a)


@given(st.integers(min_value=0, max_value=2**62), st.sampled_from(
    ["share", "bond", "crypto", None]))
def test_watermark_param_pushdown_shape(wm, itype):
    """The REST pushdown params always carry the version predicate when
    a watermark exists, and the URL encodes them deterministically."""
    params = watermark_params(wm, itype)
    assert params["meta.version"] == wm
    assert params["meta.version_op"] == "gt"
    url = build_url("https://example.invalid/api", "exchange", "trades", params)
    assert url.startswith("https://example.invalid/api/exchange/trades?")
    assert f"meta.version={wm}" in url
    assert "meta.version_op=gt" in url
    if itype:
        assert f"instrument.type={itype}" in url


def _pandas_last_wins(rows, keys, version):
    pdf = pd.DataFrame(rows)
    pdf = pdf.sort_values(version, kind="stable")
    return pdf.drop_duplicates(subset=keys, keep="last")


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=50),  # version
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dedup_last_wins_matches_pandas_model(spark, rows):
    """dedup_last_wins == pandas sort+drop_duplicates(keep='last') —
    the reference's exact semantics (mabna_tables_update.py:271-277) —
    whenever versions are unique per key (the reference's own
    assumption; ties are pinned separately in test_operators)."""
    recs = [
        {"k": k, "meta.version": k * 1000 + i, "v": float(v)}
        for i, (k, _, v) in enumerate(rows)
    ]
    from web_api_postgres_etl_spark.operators.dedup import dedup_last_wins

    df = spark.createDataFrame(recs, "k long, `meta.version` long, v double")
    got = {
        (r["k"],): (r["meta.version"], r["v"])
        for r in dedup_last_wins(df, ["k"], tiebreaker=None).collect()
    }
    want = {
        (r["k"],): (r["meta.version"], r["v"])
        for r in _pandas_last_wins(recs, ["k"], "meta.version").to_dict("records")
    }
    assert got == want


def _model_asof_keyless(left_rows, right_rows):
    """Brute-force keyless backward as-of: for each left t, the single
    right row with the greatest rt <= t (unique rts by construction)."""
    out = {}
    for lid, t in left_rows:
        cands = [(rt, tag) for rt, tag in right_rows if rt <= t]
        if cands:
            out[lid] = max(cands)
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=25),
    st.sets(st.integers(min_value=0, max_value=1000), min_size=0, max_size=12),
    st.integers(min_value=1, max_value=9),
)
def test_asof_keyless_matches_bruteforce_model(spark, lts, rts, buckets):
    """asof_join_keyless == the brute-force latest-at-or-before model
    for ANY bucket count (carry correctness is independent of where the
    quantile cuts land)."""
    from web_api_postgres_etl_spark.operators.joins import asof_join_keyless

    left_rows = [(i, t) for i, t in enumerate(lts)]
    right_rows = [(rt, f"tag{rt}") for rt in sorted(rts)]
    left = spark.createDataFrame(left_rows, "lid long, t long")
    right = (
        spark.createDataFrame(right_rows, "rt long, tag string")
        if right_rows
        else spark.createDataFrame([], "rt long, tag string")
    )
    out = asof_join_keyless(left, right, "t", "rt", num_buckets=buckets)
    got = {r["lid"]: (r["rt"], r["tag"]) for r in out.collect()}
    assert got == _model_asof_keyless(left_rows, right_rows)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=20),
    st.sets(st.integers(min_value=0, max_value=120), min_size=0, max_size=10),
)
def test_asof_keyless_discrete_matches_bruteforce_model(spark, lds, rds):
    """The DATE-typed fast path (densified days + broadcast equi-join)
    must agree with the same brute-force latest-at-or-before model the
    generic bucketed path is pinned to — arbitrary gaps, spans, and
    out-of-span left rows included."""
    from datetime import date, timedelta

    from web_api_postgres_etl_spark.operators.joins import asof_join_keyless

    base = date(2021, 1, 1)
    left_rows = [(i, d) for i, d in enumerate(lds)]
    right_rows = [(d, f"tag{d}") for d in sorted(rds)]
    left = spark.createDataFrame(
        [(i, base + timedelta(days=d)) for i, d in left_rows], "lid long, t date"
    )
    right = (
        spark.createDataFrame(
            [(base + timedelta(days=d), tag) for d, tag in right_rows],
            "rt date, tag string",
        )
        if right_rows
        else spark.createDataFrame([], "rt date, tag string")
    )
    out = asof_join_keyless(left, right, "t", "rt")
    got = {
        r["lid"]: ((r["rt"] - base).days, r["tag"]) for r in out.collect()
    }
    assert got == _model_asof_keyless(left_rows, right_rows)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # group
            st.integers(min_value=1, max_value=500),    # tokens
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=800),
)
def test_token_budget_matches_sequential_model(spark, rows, budget):
    """token_budget_by_group == the sequential model: per group, walk
    rows in (md5 draw, id) order, keep while the inclusive running sum
    fits, with individually-oversized rows removed up front."""
    from web_api_postgres_etl_spark.operators.sampling import (
        hash_unit,
        token_budget_by_group,
    )

    data = [(i, f"g{g}", t) for i, (g, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, grp string, tokens int")
    # materialize the engine's own draw so the model sorts identically
    draws = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", hash_unit("doc_id", "budget").alias("u")
        ).collect()
    }
    expected = {}
    by_group: dict[str, list[tuple]] = {}
    for i, g, t in data:
        if t <= budget:
            by_group.setdefault(g, []).append((draws[i], i, t))
    for g, items in by_group.items():
        run = 0
        for _, i, t in sorted(items):
            if run + t > budget:
                break
            run += t
            expected[i] = run
    got = {
        r["doc_id"]: r["tokens_running"]
        for r in token_budget_by_group(
            df, "grp", "doc_id", "tokens", budget
        ).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=6),
)
def test_quota_by_group_never_exceeds_and_is_stable(spark, groups, quota):
    from web_api_postgres_etl_spark.operators.sampling import quota_by_group

    data = [(i, f"g{g}") for i, g in enumerate(groups)]
    df = spark.createDataFrame(data, "doc_id long, grp string")
    out = quota_by_group(df, "grp", "doc_id", quota)
    rows_out = [(r["doc_id"], r["grp"]) for r in out.collect()]
    per_group: dict[str, int] = {}
    for _, g in rows_out:
        per_group[g] = per_group.get(g, 0) + 1
    want = {g: min(groups.count(int(g[1:])), quota) for g in per_group}
    assert per_group == want
    again = sorted(
        (r["doc_id"], r["grp"])
        for r in quota_by_group(df.repartition(5), "grp", "doc_id", quota).collect()
    )
    assert sorted(rows_out) == again


# ------------------------------------------------------- gopher gate
import re  # noqa: E402

from web_api_postgres_etl_spark.functions.text import (  # noqa: E402
    GOPHER_REQUIRED_WORDS,
    gopher_flags,
)

_GOPHER_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \n#.-*•…"
)


def _gopher_model(text):
    """Pure-Python mirror of functions.text.gopher_flags (restricted to
    the test alphabet, where Java trim == Python strip(' '))."""
    if text is None:
        return dict(
            r_word_count=False, r_mean_word_len=False, r_symbol_ratio=False,
            r_bullet_lines=True, r_ellipsis_lines=True, r_alpha_words=False,
            r_required_words=False,
        )
    words = [w for w in re.split(r"\s+", text) if w != ""]
    nw = len(words)
    mean = sum(len(w) for w in words) / nw if nw else None
    n_sym = text.count("#") + len(re.findall(r"\.\.\.|…", text))
    sym = n_sym / nw if nw else None
    lines = [l for l in text.split("\n") if l.strip(" ") != ""]
    nl = len(lines)
    bullet = (
        sum(1 for l in lines if re.match(r"[•\-\*]", l.strip(" "))) / nl
        if nl else None
    )
    ell = (
        sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l.rstrip(" "))) / nl
        if nl else None
    )
    alpha = (
        sum(1 for w in words if re.search(r"[A-Za-z]", w)) / nw if nw else None
    )
    low = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()
    toks = [t for t in low.split(" ") if t != ""]
    req = len(set(toks) & set(GOPHER_REQUIRED_WORDS))
    return dict(
        r_word_count=bool(nw and 50 <= nw <= 100_000),
        r_mean_word_len=bool(mean is not None and 3 <= mean <= 10),
        r_symbol_ratio=bool(sym is not None and sym < 0.1),
        r_bullet_lines=True if bullet is None else bullet < 0.9,
        r_ellipsis_lines=True if ell is None else ell < 0.3,
        r_alpha_words=bool(alpha is not None and alpha >= 0.8),
        r_required_words=req >= 2,
    )


@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet=_GOPHER_ALPHABET, max_size=400)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None)
def test_gopher_flags_match_python_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["g"].asDict()
        for r in df.select("id", gopher_flags("text").alias("g")).collect()
    }
    for i, t in enumerate(texts):
        want = _gopher_model(t)
        spark_flags = {k: v for k, v in got[i].items() if k != "keep"}
        assert spark_flags == want, (t, spark_flags, want)
        assert got[i]["keep"] == all(want.values())


# ------------------------------------------------- chunking / intervals
from web_api_postgres_etl_spark.operators.joins import interval_join  # noqa: E402
from web_api_postgres_etl_spark.operators.sampling import chunk_documents  # noqa: E402


@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=12),
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=0, max_value=8),
)
@settings(max_examples=8, deadline=None)
def test_chunk_documents_model(spark, word_counts, chunk_words, overlap):
    """Chunks must follow the start-arithmetic model exactly for any
    (doc length, chunk, overlap) combination."""
    if overlap >= chunk_words:
        overlap = chunk_words - 1
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)) if n else "")
        for i, n in enumerate(word_counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in chunk_documents(
        df, "doc_id", "text", chunk_words, overlap
    ).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["n_chunk_words"])
        )
    step = chunk_words - overlap
    for i, n in enumerate(word_counts):
        words = [f"w{i}_{j}" for j in range(n)]
        if n == 0:
            assert i not in out
            continue
        import math
        # floor at 1: a non-empty doc with n <= overlap still yields
        # one (short) chunk
        want_chunks = max(math.ceil((n - overlap) / step), 1)
        got = sorted(out.get(i, []))
        assert len(got) == want_chunks, (n, chunk_words, overlap, got)
        for idx, text, nw in got:
            start = idx * step
            expect = words[start:start + chunk_words]
            assert text == " ".join(expect)
            assert nw == len(expect)


@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=30),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=280),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=8, deadline=None)
def test_interval_join_model(spark, points, spans, bucket):
    """Bucketed range join equals the brute-force containment set for
    any points/intervals/bucket width."""
    p_df = spark.createDataFrame(
        [(i, float(t)) for i, t in enumerate(points)], "pid long, ts double"
    )
    iv_df = spark.createDataFrame(
        [(i, float(s), float(s + w)) for i, (s, w) in enumerate(spans)],
        "iid long, s double, e double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            p_df, iv_df, "ts", "s", "e", bucket_seconds=bucket
        ).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, t in enumerate(points)
        for ii, (s, w) in enumerate(spans)
        if s <= t <= s + w
    )
    assert got == want


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=15, deadline=None)  # r12 audit: each example is
# a full multi-doc corpus over a 3-letter alphabet (duplicates dense,
# every interval-boundary case hit within a handful of draws) and each
# costs a Spark job — 25 was over-sampling the same saturated space
def test_exact_substring_matches_python_model(spark, corpora, k):
    """The interval-merge + gap-slice masking must equal a brute-force
    Python model of ExactSubstr (cut every position covered by a
    k-window occurring >= 2 times corpus-wide) on tiny random corpora
    over a 3-letter alphabet — duplicates are dense, so the interval
    boundary logic (merging, adjacency, doc edges) is exercised hard."""
    from web_api_postgres_etl_spark.operators.dedup import (
        exact_substring_dedup,
    )

    texts = [" ".join(words) for words in corpora]
    # python reference
    from collections import Counter

    wins = Counter()
    for words in corpora:
        for i in range(len(words) - k + 1):
            wins[tuple(words[i:i + k])] += 1
    expected = {}
    for d, words in enumerate(corpora):
        cut = [False] * len(words)
        for i in range(len(words) - k + 1):
            if wins[tuple(words[i:i + k])] >= 2:
                for j in range(i, i + k):
                    cut[j] = True
        kept = [w for w, c in zip(words, cut) if not c]
        expected[d] = (" ".join(kept), sum(cut))

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_words_removed"])
        for r in exact_substring_dedup(df, "doc_id", "text", k=k).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.one_of(
                st.none(),
                st.text(
                    alphabet=["a", "#", "%", "N", "5", "2"],
                    min_size=0, max_size=6,
                ),
            ),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=20, deadline=None)
def test_pack_key_injective_property(spark, rows):
    """pack_key must be injective over (group, shard, pack_id) for ANY
    group strings — including NULLs and values built from the escape
    alphabet itself ('#', '%', '%N', '%23'-shaped strings)."""
    from web_api_postgres_etl_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, g, 1) for i, (_, g) in enumerate(rows)],
        "id long, grp string, toks long",
    )
    out = pack_sequences(
        df, "id", "toks", window=3, num_shards=2, group_col="grp"
    ).select("grp", "shard", "pack_id", "pack_key").collect()
    seen = {}
    for r in out:
        trip = (r["grp"], r["shard"], r["pack_id"])
        key = r["pack_key"]
        if key in seen:
            assert seen[key] == trip, (
                f"pack_key {key!r} maps to both {seen[key]} and {trip}"
            )
        seen[key] = trip


# ------------------------------------------------------------------ zorder
def _zmodel(v: int, mn: int, mx: int, bits: int) -> int:
    import math

    levels = (1 << bits) - 1
    span = max(mx - mn, 1)
    c = min(max(v, mn), mx)
    # same long-multiply-then-IEEE-divide the column expression does
    return math.floor(((c - mn) * levels) / span)


def _interleave_model(scaled: tuple[int, ...], bits: int) -> int:
    out = 0
    k = len(scaled)
    for i in range(bits):
        for j, s in enumerate(scaled):
            out |= ((s >> i) & 1) << (i * k + j)
    return out


@given(
    st.lists(
        st.tuples(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6)),
        min_size=1, max_size=40,
    ),
    st.integers(2, 10),
)
@settings(max_examples=8, deadline=None)
def test_zorder_key_matches_python_model(spark, pts, bits):
    """The full scale+interleave pipeline vs a pure-Python model on
    arbitrary signed inputs (bounds derived from the data, as the
    operator derives them)."""
    from web_api_postgres_etl_spark.operators.layout import add_zorder_key

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )
    got = {
        r["id"]: r["z_key"]
        for r in add_zorder_key(df, ["x", "y"], bits=bits).collect()
    }
    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    bx = (min(xs), max(xs))
    by = (min(ys), max(ys))
    for i, (x, y) in enumerate(pts):
        want = _interleave_model(
            (_zmodel(x, *bx, bits), _zmodel(y, *by, bits)), bits
        )
        assert got[i] == want, (i, x, y, bx, by, bits)


def test_zorder_key_bijective_on_aligned_grid(spark):
    """With bounds exactly spanning the 2^bits levels, scaling is the
    identity and the Morton key is a bijection onto [0, 4^bits)."""
    from web_api_postgres_etl_spark.operators.layout import add_zorder_key

    bits = 3
    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )
    keys = [
        r["z_key"]
        for r in add_zorder_key(
            df, ["x", "y"], bits=bits, bounds={"x": (0, 7), "y": (0, 7)}
        ).collect()
    ]
    assert sorted(keys) == list(range(64))


# ------------------------------------------------------------------ funnel
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # user
            st.sampled_from("abcd"),      # step type
            st.integers(0, 30),           # ts (small range forces ties)
        ),
        min_size=1, max_size=60,
    ),
    st.lists(st.sampled_from("abcd"), min_size=1, max_size=3, unique=True),
)
@settings(max_examples=8, deadline=None)
def test_funnel_matches_python_model(spark, events, steps):
    """funnel/funnel_users vs a pure-Python greedy-subsequence model
    under dense timestamp collisions and repeated events."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        funnel,
        funnel_users,
    )

    df = spark.createDataFrame(events, "u long, s string, t long")

    # model: per user, greedily advance through steps taking the
    # EARLIEST event strictly after the previous match
    def deepest(user_events):
        matched, prev_t = 0, None
        for _ in steps:
            cand = [
                t for (s, t) in user_events
                if s == steps[matched] and (prev_t is None or t > prev_t)
            ]
            if not cand:
                break
            prev_t = min(cand)
            matched += 1
        return matched, prev_t

    per_user = {}
    for u, s, t in events:
        per_user.setdefault(u, []).append((s, t))
    model = {u: deepest(evs) for u, evs in per_user.items()}

    got_counts = {
        r["step_idx"]: r["n_users"]
        for r in funnel(df, "u", "t", "s", steps).collect()
    }
    for i in range(len(steps)):
        want = sum(1 for m, _ in model.values() if m > i)
        assert got_counts[i] == want, (i, steps, model)

    got_users = {
        r["u"]: (r["max_step_idx"], r["completed_at"])
        for r in funnel_users(df, "u", "t", "s", steps).collect()
    }
    want_users = {
        u: (m - 1, t) for u, (m, t) in model.items() if m > 0
    }
    assert got_users == want_users


# --- winnowing fingerprints vs a direct Python model ------------------

def _winnow_model(text: str, k: int = 8, w: int = 4) -> set[int]:
    """Literal transcription of Schleimer et al.: normalized char
    k-grams, first-13-hex md5 hashes, window-of-w minima."""
    import hashlib
    import re

    s = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(s) < k:
        return set()
    hs = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:13], 16)
        for i in range(len(s) - k + 1)
    ]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


_TXT = st.text(
    alphabet="abcXYZ 019.,-!", min_size=0, max_size=64
)


@settings(max_examples=6, deadline=None)
@given(st.lists(_TXT, min_size=1, max_size=10))
def test_winnow_matches_python_model(spark, texts):
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.winnow import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _winnow_model(t), (i, t)


@settings(max_examples=6, deadline=None)
@given(
    st.text(alphabet="abc012", min_size=11, max_size=40),  # >= k+w-1 chars
    st.text(alphabet="xyz789", max_size=30),
    st.text(alphabet="xyz789", max_size=30),
    st.text(alphabet="mnp345", max_size=30),
    st.text(alphabet="mnp345", max_size=30),
)
def test_winnow_locality_guarantee_random(shared, a1, a2, b1, b2):
    """The winnowing theorem: two documents sharing a substring of
    normalized length >= k + w - 1 share >= 1 fingerprint — for ANY
    surrounding context."""
    d1, d2 = f"{a1}{shared}{a2}", f"{b1}{shared}{b2}"
    assert _winnow_model(d1) & _winnow_model(d2)


def _model_scd2(rows):
    """Literal SCD2 model: per key, sort by ts, collapse consecutive
    identical states (None-safe), emit half-open intervals."""
    out = []
    bykey: dict = {}
    for k, ts, attr in rows:
        bykey.setdefault(k, []).append((ts, attr))
    for k, obs in bykey.items():
        obs.sort(key=lambda o: o[0])
        versions = []
        prev = object()  # sentinel != anything incl. None
        for ts, attr in obs:
            if attr != prev or (attr is None) != (prev is None):
                versions.append((ts, attr))
            prev = attr
        for i, (ts, attr) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            out.append((k, attr, ts, nxt, nxt is None))
    return sorted(out, key=repr)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # key
            st.integers(min_value=0, max_value=40),   # distinct ts ordinal
            st.sampled_from(["x", "y", "z", None]),   # state (None is real)
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),  # (key, ts) unique: no seq ties
    )
)
def test_scd2_history_matches_model(spark, rows):
    """scd2_history == the literal per-key collapse/interval model for
    arbitrary (key, ts, state) logs, NULL states included."""
    import datetime as dt

    from web_api_postgres_etl_spark.operators.history import scd2_history

    t0 = dt.datetime(2024, 1, 1)
    recs = [(k, t0 + dt.timedelta(hours=t), a) for k, t, a in rows]
    df = spark.createDataFrame(recs, "k long, ts timestamp, attr string")
    got = sorted(
        (
            (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(df, ["k"], "ts", ["attr"]).collect()
        ),
        key=repr,
    )
    want = _model_scd2(recs)
    assert got == want


def _model_agg(rows):
    """Literal model of the incremental-agg family over (k, v) rows."""
    out: dict = {}
    for k, v in rows:
        st = out.setdefault(k, {"n_rows": 0, "sum_v": None, "cnt_v": 0,
                                "min_v": None, "max_v": None})
        st["n_rows"] += 1
        if v is not None:
            st["cnt_v"] += 1
            st["sum_v"] = v if st["sum_v"] is None else st["sum_v"] + v
            st["min_v"] = v if st["min_v"] is None else min(st["min_v"], v)
            st["max_v"] = v if st["max_v"] is None else max(st["max_v"], v)
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=5),  # split point driver
)
def test_incremental_agg_matches_model_any_split(spark, rows, nsplit):
    """state(batch_1) ⊕ … ⊕ state(batch_n) == the literal model for ANY
    batching of the rows (associativity over random splits; integer
    values so sums are exact)."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        incremental_agg_state,
        merge_agg_state,
    )

    recs = [(k, float(v) if v is not None else None) for k, v in rows]
    batches = [recs[i::nsplit] for i in range(nsplit)]
    spec = dict(keys=["k"], sum_cols=["v"], min_cols=["v"], max_cols=["v"])
    state = None
    for b in batches:
        if not b:
            continue
        df = spark.createDataFrame(b, "k long, v double")
        s = incremental_agg_state(df, **spec)
        state = s if state is None else merge_agg_state(state, s, ["k"])
    got = {
        r.k: {
            "n_rows": r.n_rows, "sum_v": r.sum_v, "cnt_v": r.cnt_v,
            "min_v": r.min_v, "max_v": r.max_v,
        }
        for r in state.collect()
    }
    assert got == _model_agg(recs)


# ---------------------------------------------- round-8 graph/sample ops
@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0, max_size=40,
    )
)
def test_triangle_counts_matches_bruteforce_model(spark, edges):
    """Degree-oriented wedge enumeration ≡ the O(n³) literal model on
    random small multigraphs (duplicates/self-loops/direction noise
    included by construction of the strategy)."""
    from itertools import combinations

    from web_api_postgres_etl_spark.operators.graph import triangle_counts

    nodes = list(range(12))
    adj = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    want = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= adj:
            want[a] += 1
            want[b] += 1
            want[c] += 1

    ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(ndf, edf).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(1, 60),
    k=st.integers(1, 8),
    cut=st.integers(0, 59),
)
def test_quantile_state_closure_under_arbitrary_splits(spark, n, k, cut):
    """bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B)) for ANY
    split point, any k, any n — the exact-merge guarantee the state
    advertises, checked beyond the one even/odd split the unit test
    uses."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        merge_quantile_states,
        quantile_sample_state,
    )

    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.col("id"), (F.pmod(F.hash("id"), F.lit(1000))).cast("double").alias("v")
    )
    cut = cut % n
    a = df.filter(F.col("id") < cut)
    b = df.filter(F.col("id") >= cut)
    sa = quantile_sample_state(a, [], "v", "id", k=k)
    sb = quantile_sample_state(b, [], "v", "id", k=k)
    merged = merge_quantile_states(sa.unionByName(sb), [], k=k).first()
    oneshot = quantile_sample_state(df, [], "v", "id", k=k).first()
    assert merged["n_rows"] == oneshot["n_rows"] == n
    assert [tuple(x) for x in merged["qsample"]] == [
        tuple(x) for x in oneshot["qsample"]
    ]


@settings(max_examples=6, deadline=None)
@given(
    keys=st.sets(st.integers(-1000, 1000), min_size=1, max_size=40),
    probes=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
)
def test_bloom_gate_property_no_false_negatives(spark, keys, probes):
    """∀ key sets, ∀ probe sets: every probe that IS a key survives the
    gate — the one guarantee a bloom must never break."""
    from web_api_postgres_etl_spark.operators.joins import (
        bloom_build,
        bloom_filter_gate,
    )

    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = bloom_build(kdf, "k", m_bits=256, k_hashes=3)  # tiny, dense
    fact = spark.createDataFrame([(p,) for p in probes], "k long")
    kept = {
        r["k"] for r in bloom_filter_gate(fact, bloom, "k", 256, 3).collect()
    }
    assert (set(probes) & keys) <= kept


# --- BPE segmentation invariants (property-based, one Spark job each) --


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab1", min_size=1, max_size=6),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=0, max_value=5),
)
def test_bpe_apply_lossless_and_monotone(spark, words, rounds):
    """Two BPE invariants on a tight random alphabet (merges actually
    fire): (1) LOSSLESS — concatenating a document's segmentation
    reproduces exactly its tokenized words' characters (no symbol is
    dropped, duplicated, or reordered by the bracket machinery); (2)
    MONOTONE — each applied rule can only shrink or preserve the token
    count, never grow it. Rules are mined from the same corpus, so the
    pair covers training→application end to end."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_apply,
        bpe_merge_rules,
    )

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rules = (
        [
            (r["lhs"], r["rhs"])
            for r in bpe_merge_rules(docs, "text", rounds=rounds).collect()
        ]
        if rounds
        else []
    )
    prev = None
    # three rule-prefix checkpoints (0, half, all) keep the invariant
    # sweep to ≤3 Spark jobs per example
    for upto in sorted({0, len(rules) // 2, len(rules)}):
        out = bpe_apply(docs, "text", rules[:upto]).select(
            F.col("bpe_tokens").alias("t"),
            F.concat_ws("", "bpe_tokens").alias("joined"),
        ).first()
        assert out["joined"] == "".join(words)  # lossless at every prefix
        n = len(out["t"])
        if prev is not None:
            assert n <= prev, f"rule prefix {upto} grew the token count"
        prev = n
