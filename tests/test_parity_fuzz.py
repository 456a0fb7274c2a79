"""Property-based cross-engine parity for the portable rounding primitive.

The whole oracle strategy rests on floor(x·10^s + 0.5)/10^s being
bit-identical across engines. Fuzz it: Spark vs DuckDB vs plain-Python
IEEE arithmetic must agree on arbitrary finite doubles.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_round2(x: float) -> Decimal:
    return Decimal(str(math.floor(x * 100 + 0.5) / 100)).quantize(Decimal("0.01"))


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=200,
    )
)
def test_pround2_matches_duckdb_and_python(spark, values):
    from data_warehouse_punta_fina_spark.functions.money import pround2

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, x double")
    got = {
        r["i"]: r["r"]
        for r in df.select("i", pround2("x").alias("r")).collect()
    }
    duck = duckdb.connect()
    for i, v in enumerate(values):
        d = duck.execute(
            "SELECT CAST(FLOOR(CAST(? AS DOUBLE) * 100 + 0.5) / 100 AS DECIMAL(15,2))", [v]
        ).fetchone()[0]
        assert got[i] == d, f"spark={got[i]} duck={d} x={v!r}"
        assert got[i] == _py_round2(v), f"spark={got[i]} py={_py_round2(v)} x={v!r}"


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.decimals(
            min_value=Decimal("-9999999999999.99"),
            max_value=Decimal("9999999999999.99"),
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=200,
    )
)
def test_decimal_to_double_boundary_bit_identical(spark, values):
    """The round-2 output contract rests on decimal→double being correctly
    rounded everywhere: Spark's cast, DuckDB's cast, and Python's
    float(Decimal) must produce the same bits for any DECIMAL(15,2)."""
    import struct

    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, d decimal(15,2)")
    spark_bits = {
        r["i"]: struct.pack("<d", r["x"])
        for r in df.selectExpr("i", "CAST(d AS DOUBLE) AS x").collect()
    }
    con = duckdb.connect()
    duck_bits = {}
    for i, v in rows:
        (x,) = con.execute(f"SELECT CAST(CAST('{v}' AS DECIMAL(15,2)) AS DOUBLE)").fetchone()
        duck_bits[i] = struct.pack("<d", x)
    py_bits = {i: struct.pack("<d", float(v)) for i, v in rows}
    assert spark_bits == duck_bits == py_bits


_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " .,;:!?-_/\\'\"()[]{}@#$%&*+=<>|~`\t\néÉñÑ"
)

_DUCK_TOKENS = "list_filter(string_split_regex(lower(t), '[^a-z0-9]+'), x -> x <> '')"
_DUCK_PUNCT = (
    "CAST(length(regexp_replace(t, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length(t), 1)"
)
_DUCK_ALPHA = (
    "CAST(length(regexp_replace(t, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / greatest(length(t), 1)"
)
_DUCK_QUALITY = (
    f"(least(CAST(len({_DUCK_TOKENS}) AS DOUBLE) / 64.0, 1.0) "
    f"+ (1.0 - least(({_DUCK_PUNCT}) * 5.0, 1.0)) "
    f"+ ({_DUCK_ALPHA})) / 3.0"
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet=_ALPHABET, min_size=0, max_size=300),
        min_size=1,
        max_size=50,
    )
)
def test_tokenizer_and_quality_parity_fuzz(spark, texts):
    """Every text oracle rests on tokens() and quality_score() matching
    the DuckDB expressions character-for-character; fuzz arbitrary
    punctuation/whitespace/accent soup through both engines."""
    from data_warehouse_punta_fina_spark.functions.text import quality_score, tokens

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: (r["toks"], r["q"])
        for r in df.select(
            "i", tokens("t").alias("toks"), quality_score("t").alias("q")
        ).collect()
    }
    duck = duckdb.connect()
    for i, t in enumerate(texts):
        toks, q = duck.execute(
            f"SELECT {_DUCK_TOKENS}, "
            f"CAST(FLOOR(({_DUCK_QUALITY}) * 1000000 + 0.5) / 1000000 AS DECIMAL(12,6)) "
            "FROM (SELECT ? AS t)",
            [t],
        ).fetchone()
        assert got[i][0] == toks, f"tokens diverge on {t!r}: {got[i][0]} vs {toks}"
        assert got[i][1] == q, f"quality diverges on {t!r}: {got[i][1]} vs {q}"


def _naive_spans(docs: dict[int, list[str]], n: int, min_count: int = 2):
    """Pure-Python reference for repeated_span_stats: count every n-gram
    occurrence corpus-wide, mark duplicated positions, merge intervals."""
    from collections import Counter

    grams = Counter()
    for toks in docs.values():
        for j in range(len(toks) - n + 1):
            grams[tuple(toks[j : j + n])] += 1
    out = {}
    for did, toks in docs.items():
        ivals = [
            (j, j + n - 1)
            for j in range(len(toks) - n + 1)
            if grams[tuple(toks[j : j + n])] >= min_count
        ]
        merged = []
        for lo, hi in ivals:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        covered = sum(hi - lo + 1 for lo, hi in merged)
        longest = max((hi - lo + 1 for lo, hi in merged), default=0)
        out[did] = (len(toks), len(merged), covered, longest)
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("a b c d".split()), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_repeated_span_stats_matches_naive_reference(spark, token_lists):
    """Fuzz the interval-merge dedup profile against a brute-force
    Python reference on tiny random corpora (4-token alphabet forces
    heavy collisions — the hard case for merge logic)."""
    from data_warehouse_punta_fina_spark.operators.dedup import repeated_span_stats

    docs = {i: toks for i, toks in enumerate(token_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"], r["longest_span"])
        for r in repeated_span_stats(df, n=2).collect()
    }
    assert got == _naive_spans(docs, n=2)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["s1", "s2", "s3", "s4", "s5"]), min_size=0, max_size=6),
        min_size=1,
        max_size=6,
    )
)
def test_dedup_segments_matches_naive_reference(spark, seg_lists):
    """Fuzz keep-first segment dedup + reassembly against a sequential
    Python reference (global first-occurrence order is (doc, pos))."""
    from pyspark.sql import functions as F

    from data_warehouse_punta_fina_spark.operators.dedup import dedup_segments

    seen = set()
    want = {}
    for did, segs in enumerate(seg_lists):
        kept = []
        for seg in segs:
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        want[did] = (len(segs), len(kept), " ".join(kept))
    df = spark.createDataFrame(
        list(enumerate(seg_lists)), "doc_id int, segs array<string>"
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["cleaned_text"])
        for r in dedup_segments(df, F.col("segs"), "doc_id").collect()
    }
    assert got == want


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(  # per list label: (query_id, doc_id, rank-ordering seed)
        st.lists(
            st.tuples(st.integers(1, 3), st.integers(10, 25)),
            min_size=0,
            max_size=12,
            unique=True,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_rrf_fuse_matches_python_reference(spark, lists):
    """Fuzz reciprocal-rank fusion against a sequential Python reference:
    contributions round6(1/(60+rank)), exact sums, ties by doc id — the
    fused top-k must match for any number of lists, overlaps, and
    per-query coverage gaps."""
    import math

    from data_warehouse_punta_fina_spark.operators.retrieval import rrf_fuse

    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    k = 4
    # build rank-1..n lists per (label, query) deterministically: order by
    # the doc id sequence as generated (unique pairs), rank = position
    ranked = {}
    for li, pairs in enumerate(lists):
        per_q: dict = {}
        for q, d in pairs:
            per_q.setdefault(q, [])
            if d not in per_q[q]:
                per_q[q].append(d)
        ranked[f"l{li}"] = [
            (q, d, i + 1) for q, ds in per_q.items() for i, d in enumerate(ds)
        ]

    # python reference
    agg: dict = {}
    for label, rows in ranked.items():
        for q, d, rk in rows:
            e = agg.setdefault((q, d), [0.0, set()])
            e[0] = round(e[0] + r6(1.0 / (60 + rk)), 6)
            e[1].add(label)
    want = {}
    by_q: dict = {}
    for (q, d), (s, labels) in agg.items():
        by_q.setdefault(q, []).append((-s, d, labels))
    for q, items in by_q.items():
        items.sort()
        for i, (negs, d, labels) in enumerate(items[:k]):
            want[(q, d)] = (-negs, labels, i + 1)

    dfs = {}
    for label, rows in ranked.items():
        dfs[label] = spark.createDataFrame(
            rows or [(None, None, None)], "query_id int, doc_id int, rank int"
        ).filter("query_id is not null")
    got = {}
    for r in rrf_fuse(dfs, k=k).collect():
        labels = {lb for lb in dfs if r[f"in_{lb}"]}
        got[(r["query_id"], r["doc_id"])] = (
            round(r["rrf_score"], 6),
            labels,
            r["rank"],
        )
    assert got == want
