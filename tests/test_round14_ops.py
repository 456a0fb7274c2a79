"""Round-14 gates: index-directory retirement after compaction
(VERDICT r13 #4 — the superseded fragmented layout + its epoch history
previously had no owner; at 100 TB dead layouts are real money), and the
diagnose-first drift remediation that composes the recall probe with the
capacity advisor (VERDICT r13 #5 — code_tied must recover WITHOUT a
retrain, assignment_miss via probes)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark, lo: int, hi: int):
    return spark.createDataFrame(
        [(i, f"term{i % 5} data merge value row {i}") for i in range(lo, hi)],
        "doc_id long, text string",
    )


# ---------------------------------------------------------------------------
# VERDICT r13 #4 — retire_index_dir: compact → retire → dst unaffected,
# src gone, replayed stream refuses loudly
# ---------------------------------------------------------------------------


def test_retire_bm25_maintained_lifecycle(spark, tmp_path):
    """The full graduation: stream-maintain → compact → path-swap →
    retire. Afterward the compacted index searches bit-identically, the
    fragmented layout AND its epoch history are gone, and a replayed
    maintenance batch (resumed checkpoint pointed at the retired path)
    raises the ownership guard instead of silently re-bootstrapping a
    fork next to live readers."""
    from data_warehouse_punta_fina_spark.operators.index_admin import (
        read_tombstone,
        retire_index_dir,
    )
    from data_warehouse_punta_fina_spark.operators.retrieval import (
        bm25_compact_index,
        bm25_search_index,
    )
    from data_warehouse_punta_fina_spark.streaming.bm25_stream import (
        bm25_maintenance_batch,
    )
    from data_warehouse_punta_fina_spark.streaming.epochs import (
        RetiredArtifactError,
    )

    src = str(tmp_path / "maint")
    for i in range(2):
        bm25_maintenance_batch(_docs(spark, i * 20, (i + 1) * 20), i, src, n_buckets=4)
    assert os.path.isdir(os.path.join(src, "stats_epochs"))

    dst = str(tmp_path / "compacted")
    bm25_compact_index(spark, src, dst)
    qdf = spark.createDataFrame(
        [(1, "term1"), (1, "data"), (2, "merge")], "query_id int, term string"
    )
    before = sorted(map(tuple, bm25_search_index(qdf, dst, k=5).collect()))
    assert before

    res = retire_index_dir(spark, src, dst, "bm25", min_age_seconds=0)
    assert res["n_deleted"] >= 3  # postings + dfstats(+epochs) + stats(+epochs)

    # dst searches unaffected
    after = sorted(map(tuple, bm25_search_index(qdf, dst, k=5).collect()))
    assert after == before
    # src data gone — only the tombstone remains; the epoch history died
    # with the fragmented layout (the prune_epochs keep-≥2 tail closed)
    assert [f for f in sorted(os.listdir(src)) if not f.startswith(".")] == ["_RETIRED.json"]
    ts = read_tombstone(spark, src)
    assert ts["superseded_by"] == dst and ts["family"] == "bm25"
    # a reader pointed at the retired path fails (no silent empty read)
    with pytest.raises(Exception):
        spark.read.parquet(f"{src}/postings").collect()
    # the replayed/resumed stream raises the ownership guard, with the
    # superseding path in the message
    with pytest.raises(RetiredArtifactError, match="compacted"):
        bm25_maintenance_batch(_docs(spark, 20, 40), 1, src, n_buckets=4)
    # and so does a "fresh checkpoint" first batch — absent-dir state
    # must NOT look like a legitimate bootstrap
    with pytest.raises(RetiredArtifactError):
        bm25_maintenance_batch(_docs(spark, 0, 20), 0, src, n_buckets=4)


def test_retire_refusals(spark, tmp_path):
    """Every refusal lane: same path, missing src, invalid dst, corpus
    mismatch, age horizon, double retirement, retired dst."""
    from data_warehouse_punta_fina_spark.operators.index_admin import (
        retire_index_dir,
    )
    from data_warehouse_punta_fina_spark.operators.retrieval import (
        bm25_build_index,
    )

    a = str(tmp_path / "a")
    bm25_build_index(_docs(spark, 0, 30), a, n_buckets=4)

    with pytest.raises(ValueError, match="same path"):
        retire_index_dir(spark, a, a, "bm25", min_age_seconds=0)
    with pytest.raises(FileNotFoundError):
        retire_index_dir(spark, str(tmp_path / "nope"), a, "bm25", min_age_seconds=0)
    with pytest.raises(ValueError, match="family"):
        retire_index_dir(spark, a, str(tmp_path / "b"), "tfidf", min_age_seconds=0)
    # dst over a DIFFERENT corpus: refuse — retiring src would delete
    # the only index over its documents
    b = str(tmp_path / "b")
    bm25_build_index(_docs(spark, 100, 140), b, n_buckets=4)
    with pytest.raises(ValueError, match="same corpus"):
        retire_index_dir(spark, a, b, "bm25", min_age_seconds=0)
    # age horizon: both were written seconds ago
    c = str(tmp_path / "c")
    bm25_build_index(_docs(spark, 0, 30), c, n_buckets=4)
    with pytest.raises(ValueError, match="horizon"):
        retire_index_dir(spark, a, c, "bm25", min_age_seconds=3600)
    # a valid retirement, then both double-retire lanes
    retire_index_dir(spark, a, c, "bm25", min_age_seconds=0)
    with pytest.raises(ValueError, match="already retired"):
        retire_index_dir(spark, a, c, "bm25", min_age_seconds=0)
    d = str(tmp_path / "d")
    bm25_build_index(_docs(spark, 0, 30), d, n_buckets=4)
    with pytest.raises(ValueError, match="itself retired"):
        retire_index_dir(spark, d, a, "bm25", min_age_seconds=0)


def test_retire_ivfpq_maintained_lifecycle(spark, tmp_path):
    """The vector twin: stream-init + maintenance batches → compact →
    retire; searches on dst bit-identical, replay into src refused."""
    from data_warehouse_punta_fina_spark.operators.index_admin import (
        retire_index_dir,
    )
    from data_warehouse_punta_fina_spark.operators.similarity import (
        ivfpq_compact_index,
        ivfpq_search_index,
    )
    from data_warehouse_punta_fina_spark.sources.readers import load_table
    from data_warehouse_punta_fina_spark.streaming.ann_stream import (
        ivfpq_maintenance_batch,
        ivfpq_stream_init,
    )
    from data_warehouse_punta_fina_spark.streaming.epochs import (
        RetiredArtifactError,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    params = dict(n_cells=8, m=4, n_centroids=8, iters=1)
    src = str(tmp_path / "ivfpq_maint")
    ivfpq_stream_init(emb, src, **params)
    ivfpq_maintenance_batch(emb.filter(F.col("vec_id") % 2 == 0), 0, src)
    ivfpq_maintenance_batch(emb.filter(F.col("vec_id") % 2 == 1), 1, src)

    dst = str(tmp_path / "ivfpq_compacted")
    ivfpq_compact_index(spark, src, dst)
    q = emb.filter(F.col("vec_id") < 4)
    before = sorted(
        map(tuple, ivfpq_search_index(q, emb, dst, k=3, **params).collect())
    )
    assert before

    retire_index_dir(spark, src, dst, "ivfpq", min_age_seconds=0)
    after = sorted(
        map(tuple, ivfpq_search_index(q, emb, dst, k=3, **params).collect())
    )
    assert after == before
    assert [f for f in sorted(os.listdir(src)) if not f.startswith(".")] == ["_RETIRED.json"]
    with pytest.raises(RetiredArtifactError):
        ivfpq_maintenance_batch(emb.limit(5), 1, src)


def test_retire_positional_stream_doc_count_crosscheck(spark, tmp_path):
    """A stream-built positional src writes no stats/, so the supersede
    check falls back to distinct doc counts — and still refuses a dst
    over a different corpus."""
    from data_warehouse_punta_fina_spark.operators.index_admin import (
        retire_index_dir,
    )
    from data_warehouse_punta_fina_spark.operators.retrieval import (
        phrase_search_index,
        positional_compact_index,
    )
    from data_warehouse_punta_fina_spark.streaming.epochs import (
        RetiredArtifactError,
    )
    from data_warehouse_punta_fina_spark.streaming.positional_stream import (
        positional_ingest_batch,
    )

    docs = _docs(spark, 0, 30)
    src = str(tmp_path / "pos_stream")
    positional_ingest_batch(docs.filter(F.col("doc_id") < 15), 0, src, n_buckets=4)
    positional_ingest_batch(docs.filter(F.col("doc_id") >= 15), 1, src, n_buckets=4)

    dst = str(tmp_path / "pos_compacted")
    positional_compact_index(spark, src, dst, corpus=docs)
    before = sorted(
        map(tuple, phrase_search_index(spark, dst, "data merge").collect())
    )
    assert before

    # wrong-corpus dst refuses on the doc-count fallback
    wrong = str(tmp_path / "pos_wrong")
    positional_compact_index(
        spark, src, wrong, corpus=None, validate_index=True
    )
    # drop a doc from 'wrong' by rebuilding from a smaller stream
    smaller = str(tmp_path / "pos_smaller_stream")
    positional_ingest_batch(docs.filter(F.col("doc_id") < 10), 0, smaller, n_buckets=4)
    wrong2 = str(tmp_path / "pos_wrong2")
    positional_compact_index(spark, smaller, wrong2)
    with pytest.raises(ValueError, match="same corpus"):
        retire_index_dir(spark, src, wrong2, "positional", min_age_seconds=0)

    retire_index_dir(spark, src, dst, "positional", min_age_seconds=0)
    after = sorted(
        map(tuple, phrase_search_index(spark, dst, "data merge").collect())
    )
    assert after == before
    assert [f for f in sorted(os.listdir(src)) if not f.startswith(".")] == ["_RETIRED.json"]
    with pytest.raises(RetiredArtifactError):
        positional_ingest_batch(docs.limit(5), 1, src, n_buckets=4)


# ---------------------------------------------------------------------------
# VERDICT r13 #5 — diagnose-first remediation: capacity probe wired into
# the drift-refresh decision
# ---------------------------------------------------------------------------


def _emb(spark):
    from data_warehouse_punta_fina_spark.sources.readers import load_table

    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


def test_remediate_code_tied_recovers_without_retrain(spark, tmp_path):
    """The drifted-append fixture (a tight shifted cluster whose PQ
    codes tie under the frozen quantizers): the capacity probe reads
    code_tied, and the remedy is a RERANK BUMP — the index is never
    rewritten, no training job runs, and the post reading under the
    recommended depth clears the floor."""
    from data_warehouse_punta_fina_spark.operators.similarity import (
        ivfpq_append_index,
        ivfpq_build_index,
        ivfpq_remediate_drift,
    )

    emb = _emb(spark)
    n = emb.count()
    params = dict(n_cells=16, m=8, n_centroids=8, iters=2)
    idx = str(tmp_path / "tied")
    ivfpq_build_index(emb, idx, **params)
    codes_before = sorted(
        map(tuple, spark.read.parquet(f"{idx}/codes").collect())
    )

    shifted = emb.select(
        (F.col("vec_id") + F.lit(n)).alias("vec_id"),
        F.transform("embedding", lambda x: (F.lit(10.0) + x).cast("float")).alias(
            "embedding"
        ),
    )
    ivfpq_append_index(shifted, idx)
    union = emb.unionByName(shifted)
    drift_q = shifted.filter(F.col("vec_id") < n + 16)
    codes_appended = sorted(
        map(tuple, spark.read.parquet(f"{idx}/codes").collect())
    )

    res = ivfpq_remediate_drift(
        union, idx, drift_q, recall_floor=0.7, probes=4, **params
    )
    assert res["diagnosis"] == "code_tied", res
    assert res["action"].startswith("rerank="), res
    assert res["pre"] < 0.7 <= res["post"], res
    assert res["params"]["probes"] == 4
    assert res["params"]["rerank"] >= 120
    # NO retrain: the stored codes are bit-identical to pre-remediation
    codes_after = sorted(map(tuple, spark.read.parquet(f"{idx}/codes").collect()))
    assert codes_after == codes_appended
    assert codes_appended != codes_before  # the append really landed


def test_remediate_assignment_miss_recovers_via_probes(spark, tmp_path):
    """The probe-starved fixture (probes=1 misses the ~14% of true
    neighbors living in unprobed cells — no rerank depth can recover
    what was never a candidate): diagnosis assignment_miss, remedy is a
    PROBES bump up the doubling ladder, still no retrain."""
    from data_warehouse_punta_fina_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_remediate_drift,
    )

    emb = _emb(spark)
    params = dict(n_cells=16, m=8, n_centroids=8, iters=2)
    idx = str(tmp_path / "starved")
    ivfpq_build_index(emb, idx, **params)
    codes_before = sorted(map(tuple, spark.read.parquet(f"{idx}/codes").collect()))
    base_q = emb.filter(F.col("vec_id") < 16)

    res = ivfpq_remediate_drift(
        emb, idx, base_q, recall_floor=0.9, probes=1, **params
    )
    assert res["diagnosis"] == "assignment_miss", res
    assert res["action"].startswith("probes="), res
    assert res["pre"] < 0.9 <= res["post"], res
    assert res["params"]["probes"] > 1
    codes_after = sorted(map(tuple, spark.read.parquet(f"{idx}/codes").collect()))
    assert codes_after == codes_before


def test_remediate_healthy_and_retrain_escalation(spark, tmp_path):
    """Healthy short-circuits with zero ladder work; and when even the
    widest probes cannot clear the floor (quantizers no longer describe
    the data AND the rerank ladder is capped), remediation escalates to
    the retrain cycle and re-probes."""
    from data_warehouse_punta_fina_spark.operators.similarity import (
        ivfpq_append_index,
        ivfpq_build_index,
        ivfpq_remediate_drift,
    )

    emb = _emb(spark)
    n = emb.count()
    params = dict(n_cells=16, m=8, n_centroids=8, iters=2)
    idx = str(tmp_path / "healthy")
    ivfpq_build_index(emb, idx, **params)
    base_q = emb.filter(F.col("vec_id") < 16)
    res = ivfpq_remediate_drift(
        emb, idx, base_q, recall_floor=0.7, probes=4, **params
    )
    assert res["diagnosis"] == "healthy" and res["action"] == "none", res
    assert res["post"] == res["pre"] >= 0.7

    # escalation: drifted append + a rerank ladder too shallow for the
    # tie depth -> plateau at every depth reads assignment_miss ->
    # probes widen (rerank scaled) and still miss -> retrain runs ->
    # the tight cluster stays code-tied under the fresh quantizers too
    # (the r13-documented capacity residual; measured 0.075 at rerank=50
    # retrained) and the capped ladder cannot reach the untie depth ->
    # the honest terminal verdict is REPARAMETERIZE (m/n_centroids/
    # n_cells), with every reading reported
    idx2 = str(tmp_path / "escalate")
    ivfpq_build_index(emb, idx2, **params)
    shifted = emb.select(
        (F.col("vec_id") + F.lit(n)).alias("vec_id"),
        F.transform("embedding", lambda x: (F.lit(10.0) + x).cast("float")).alias(
            "embedding"
        ),
    )
    ivfpq_append_index(shifted, idx2)
    codes_appended = sorted(
        map(tuple, spark.read.parquet(f"{idx2}/codes").collect())
    )
    union = emb.unionByName(shifted)
    drift_q = shifted.filter(F.col("vec_id") < n + 16)
    res2 = ivfpq_remediate_drift(
        union, idx2, drift_q, recall_floor=0.7, probes=4,
        rerank_ladder=(30, 60), **params
    )
    assert res2["diagnosis"] == "assignment_miss", res2
    assert res2["action"] == "reparameterize", res2
    assert res2["pre"] < 0.7 and res2["post"] < 0.7, res2
    # the retrain DID run (codes rewritten from the union)...
    codes_after = sorted(map(tuple, spark.read.parquet(f"{idx2}/codes").collect()))
    assert codes_after != codes_appended
    # ...and its post-retrain readings are in the report
    assert any(k.startswith("retrained:") for k in res2["readings"]), res2


# ---------------------------------------------------------------------------
# VERDICT r13 missing #3 — PNG palette + Adam7 interlace lanes go real
# ---------------------------------------------------------------------------


def test_png_palette_and_interlaced_decode():
    """The two PNG variants that stayed stub seams after round 11 are
    feasible with the same stdlib-zlib + numpy machinery: palette
    (color type 3, PLTE lookup) and Adam7 interlace (seven
    independently-filtered passes scattered onto the full raster).
    Every lane must reconstruct the identical raster under every filter
    type; JPEG/MP3 remain honestly stubbed (no stdlib codec)."""
    import numpy as np

    from data_warehouse_punta_fina_spark.operators.multimodal import (
        decode_png,
        png_encode,
    )

    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    for filters in ([0], [1, 2, 3, 4]):
        assert np.array_equal(
            decode_png(png_encode(g, row_filters=filters, interlaced=True)),
            g.astype(float),
        )
    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    want = rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
    assert np.allclose(
        decode_png(png_encode(rgb, row_filters=[4, 3, 1], interlaced=True)), want
    )
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (10, 14), dtype=np.uint8)
    prgb = pal[idx]
    pwant = prgb[:, :, 0] * 0.299 + prgb[:, :, 1] * 0.587 + prgb[:, :, 2] * 0.114
    assert np.allclose(decode_png(png_encode(idx, palette=pal)), pwant)
    assert np.allclose(
        decode_png(png_encode(idx, palette=pal, row_filters=[2, 4], interlaced=True)),
        pwant,
    )
    # tiny rasters where several Adam7 passes are EMPTY
    for shape in ((1, 1), (3, 2), (2, 9)):
        t = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(png_encode(t, interlaced=True)), t.astype(float))
    # refusals stay loud: palette index beyond PLTE, missing PLTE
    import pytest as _pytest

    with _pytest.raises(ValueError, match="palette index"):
        decode_png(png_encode(np.full((4, 4), 99, dtype=np.uint8), palette=pal[:5]))
    b = bytearray(png_encode(idx, palette=pal))
    # color type 4 (gray+alpha) refuses
    with _pytest.raises(ValueError, match="palette"):
        raw = png_encode(idx, palette=pal)
        # strip the PLTE chunk: IHDR ends at 8+25; PLTE chunk follows
        ihdr_end = 8 + 12 + 13
        plte_len = int.from_bytes(raw[ihdr_end : ihdr_end + 4], "big")
        decode_png(raw[:ihdr_end] + raw[ihdr_end + 12 + plte_len :])


# ---------------------------------------------------------------------------
# Round-14 extension: the reparameterize probe behind the remediation's
# terminal verdict — richer codes measured, not guessed
# ---------------------------------------------------------------------------


def test_reparameterize_probe_recommends_richer_codes(spark, tmp_path):
    """On the base corpus at fixed (probes=16, rerank=50) the m=8/nc=8
    index reads ~0.70; the cost-ascending candidate ladder measures
    nc=32 (~0.85), m=16 (~0.78), then m=16+nc=32 (1.00) — the first to
    clear the 0.95 floor wins, and apply=True rebuilds the index at the
    winning parameters with the metadata re-stamped."""
    from data_warehouse_punta_fina_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_reparameterize_probe,
        ivfpq_search_index,
    )

    emb = _emb(spark)
    base = dict(n_cells=16, m=8, n_centroids=8, iters=2)
    idx = str(tmp_path / "base")
    ivfpq_build_index(emb, idx, **base)
    q = emb.filter(F.col("vec_id") < 16)

    res = ivfpq_reparameterize_probe(
        emb, idx, q, recall_floor=0.95, scratch_dir=str(tmp_path / "scratch"),
        probes=16, rerank=50, apply=True,
    )
    assert res["baseline"] < 0.95, res
    assert res["recommended"] == dict(base, m=16, n_centroids=32), res
    assert res["applied"] is True
    # the cheaper rungs were measured and recorded (miss), the winner
    # clears the floor
    assert len(res["readings"]) == 3, res
    assert res["readings"]["n_cells=16,m=16,n_centroids=32"] >= 0.95
    assert all(
        v < 0.95 for k_, v in res["readings"].items() if "m=16,n_centroids=32" not in k_
    ), res
    # applied: the index now validates (and searches) under the NEW
    # parameters, and refuses the old ones
    got = ivfpq_search_index(q, emb, idx, k=5, probes=16, rerank=50,
                             **res["recommended"])
    assert got.count() > 0
    with pytest.raises(ValueError, match="different parameters"):
        ivfpq_search_index(q, emb, idx, k=5, **base).collect()


def test_reparameterize_probe_honest_none_on_near_ties(spark, tmp_path):
    """The adversarial near-tie fixture (+10-shifted cluster: true
    cosine neighbors differ at the 4th decimal) defeats EVERY
    parameterization — the probe must say so (recommended None, nothing
    applied) instead of recommending a rebuild that cannot help; the
    remedy there is rerank depth (ivfpq_remediate_drift's code_tied
    lane)."""
    from data_warehouse_punta_fina_spark.operators.similarity import (
        ivfpq_append_index,
        ivfpq_build_index,
        ivfpq_reparameterize_probe,
    )

    emb = _emb(spark)
    n = emb.count()
    base = dict(n_cells=16, m=8, n_centroids=8, iters=2)
    idx = str(tmp_path / "ties")
    ivfpq_build_index(emb, idx, **base)
    shifted = emb.select(
        (F.col("vec_id") + F.lit(n)).alias("vec_id"),
        F.transform("embedding", lambda x: (F.lit(10.0) + x).cast("float")).alias(
            "embedding"
        ),
    )
    ivfpq_append_index(shifted, idx)
    union = emb.unionByName(shifted)
    drift_q = shifted.filter(F.col("vec_id") < n + 16)

    res = ivfpq_reparameterize_probe(
        union, idx, drift_q, recall_floor=0.7, scratch_dir=str(tmp_path / "scratch"),
        probes=4, rerank=50, apply=True,
        candidates=(dict(base, n_centroids=32),),
    )
    assert res["recommended"] is None and res["applied"] is False, res
    assert res["baseline"] < 0.2, res
    assert all(v < 0.2 for v in res["readings"].values()), res
