"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
detailed JSON line ({"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., per-query oracle ratios, ...}) and
then a compact summary JSON line LAST. Round-16 (VERDICT r15 #2): the
final line carries the "queries": {name: sec} map again — the driver's
PERF per-query/scaling comparison reads the FINAL one-line JSON, and
two rounds of totals-only final lines left PERF.per_query empty
(n_common: 0), making per-query regressions invisible. The headline
scalars lead the line; the map is the last key. The r05-era concern
(a >2000-char line outgrowing a tail capture, BENCH_r05 parsed=null)
is covered by the BENCH_SUMMARY*.json artifact twins, persisted since
round 7 precisely so no stdout tail window is load-bearing. Full
detail also lands in BENCH_DETAIL*.json (plus cpu-suffixed
*_driver_c{N}.json twins, so the driver's 8-core scaling run can no
longer overwrite the 32-core run's per-query detail).

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Session startup is excluded — the reference baseline
(BASELINE.md: 71-81 s for ~1.13M DW rows, pandas) measures transform
time, not interpreter boot.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "fact_ventas",
    "star_revenue_by_pais_trimestre",
    "ventas_daily_summary",
    "fact_inventario",
    "fact_transacciones",
    "fact_balance",
    "fact_estado_resultados",
    "lineitem_pricing_summary",
    "top_discount_line_per_order",
    "dedup_lineitem",
    "events_tumbling_window",
    "doc_text_stats",
    "doc_exact_dedup",
    "doc_minhash_lsh",
    "doc_ngram_jaccard",
    "doc_simhash",
    "ann_brute_topk",
    "ann_ivf_topk",
    "emb_near_dup",
    "sql_revenue_by_nation",
    "asof_last_order",
    "events_sessionized",
    "corpus_term_freq",
    # round-4 additions (no r1 floor — tracked from their first round)
    "doc_repetition",
    "doc_bm25_topk",
    "doc_surprisal",
    "doc_incremental_dedup",
    "scd2_pit_lookup",
    # round-5 additions: the trained-IVF recall/cost trade (nprobe=1 vs 3)
    "ann_ivf_trained_topk",
    "ann_ivf_trained_probe3",
    # round-5 session-2 additions (sf-proportional; doc_tfidf_pairs stays
    # out — its demo query fixes the corpus at doc_id<200, sf-invariant)
    "source_quality_report",
    "emb_random_projection",
    # round-5 session-3 additions (all sf-proportional)
    "doc_repeated_spans",
    "doc_segment_dedup",
    "doc_collocations",
    "events_drift_psi",
    "customer_rfm",
    "basket_part_affinity",
    "part_pagerank",
    "revenue_anomaly_weeks",
    "doc_phrase_search",
    "doc_heavy_terms",
    # round-5 session-5 additions (all sf-proportional)
    "lineitem_ols_trend",
    "events_chi2_daypart",
    "doc_bpe_merges",
    "customer_supplier_link",
    "part_triangles",
    "events_key_skew",
    "events_value_buckets",
    "events_asof_nearest",
    "ann_sq8_topk",
    "lineitem_corr_matrix",
    # round-5 session-6 additions (all sf-proportional)
    "ann_pq_topk",
    "emb_mmr_diverse",
    "events_type_hour_mi",
    "events_ks_value_drift",
    "nation_revenue_concentration",
    "trade_kcore",
    "doc_curation_report",
    "doc_contrastive_pairs",
    "emb_hard_negatives",
    "emb_cluster_quality",
    "fact_order_lifecycle",
    "weekly_revenue_decompose",
    "basket_frequent_triples",
    "events_linear_attribution",
    "order_sample_allocation",
    # round-6 additions (all sf-proportional)
    "events_ewma_daily",
    "revenue_cusum_changepoint",
    "urgent_lineitems_bloom",
    "lineitem_fd_violations",
    "doc_quality_auc",
    "orders_systematic_sample",
    "events_trimmed_mean",
    "doc_feature_hashing",
    "doc_quality_avg_precision",
    # doc_prefix_jaccard_pairs stays OUT of the headline (the
    # doc_tfidf_pairs precedent): an EXACT all-pairs similarity join is
    # deliberately the expensive lossless tier (69 s at sf0.1 — the cost
    # the LSH tier exists to avoid); it stays oracle-checked in the
    # correctness gates
    "events_purchase_path_match",
    "weekly_revenue_theilsen",
    "events_trailing_dau",
    "doc_quality_calibration",
    "doc_quality_brier",
    "doc_kfold_assignment",
    "revenue_pareto_parts",
    "top_discount_lines_with_ties",
    "events_multiplicative_means",
    # round-7 addition: the IVF-PQ composed ANN search (sf-proportional)
    "ann_ivfpq_topk",
    # round-8 addition: search of the PERSISTED IVF-PQ index. The first
    # call after a testdata refresh trains + writes the index (eager,
    # one-off — the deployment shape); steady-state bench runs measure
    # the pure stored-index search path.
    "ann_ivfpq_persisted_topk",
    # round-8 addition: the end-to-end curated-corpus -> packed-bins
    # manifest (curation verdict + keep-filter + shard packing composed)
    "corpus_training_batches",
    # round-8 additions: the persisted-band-index ingestion twin (read
    # next to doc_incremental_dedup for the steady-state vs
    # index-build-in-query comparison) and quality-aware cluster
    # canonical selection
    "doc_incremental_dedup_persisted",
    "doc_cluster_quality_canonicals",
    # round-8 addition: distributed classifier training (multinomial NB
    # language model — train split aggregations + broadcast-model scoring)
    "doc_nb_lang_classifier",
    # round-8 additions: winnowing fingerprint overlap (MOSS local
    # evidence, fingerprint-blocked pair join) and DSIR importance
    # resampling (hashed-n-gram models + Gumbel-top-k selection)
    "doc_winnow_overlap",
    "doc_dsir_sample",
    # round-8 additions: τ-smoothed multilingual resampling and the
    # per-source quantile quality gate
    "doc_temperature_resample",
    "doc_source_quality_gate",
    # round-8 addition: the filter-model deployment twin (scores the
    # PERSISTED NB model — steady-state cost of the classifier tier)
    "doc_nb_persisted_classifier",
    # round-8 addition: active-learning uncertainty selection
    "doc_uncertainty_sample",
    # round-9 additions: hybrid BM25+cosine RRF retrieval (query-by-
    # example over the shared tokenize exchange) and cluster-balanced
    # diversity selection (k-means quota sampling, SemDeDup/DataComp)
    "doc_hybrid_rrf_search",
    "emb_cluster_balanced_sample",
    # round-9 addition: near-dup-cluster-cohesive train/eval splitting
    "doc_leakage_safe_split",
    # round-9 addition: the hybrid's scale path (trained-IVF semantic side)
    "doc_hybrid_rrf_search_ivf",
    # round-10 additions: the deployment-shape hybrids (persisted IVF-PQ
    # semantic side; then BOTH sides persisted incl. the BM25 inverted
    # index), the persisted lexical index itself, and the split
    # contamination measurement
    "doc_hybrid_rrf_search_pq",
    "doc_bm25_persisted_topk",
    "doc_hybrid_rrf_search_persisted",
    "doc_contamination_safe_split",
    # round-11 additions: the wave-16 promotions enter the headline with
    # their driver debut (the r10 note's promise) — the inverted-index
    # append path, sharded federated ANN + hybrid, both PRF variants —
    # plus the r11 debuts (exact federated BM25; nDCG/MRR evaluation)
    "doc_bm25_incremental_topk",
    "ann_ivfpq_federated_topk",
    "doc_bm25_prf_search",
    "doc_hybrid_rrf_search_federated",
    "doc_bm25_prf_search_persisted",
    "doc_bm25_federated_topk",
    "doc_retrieval_rank_metrics",
    "doc_phrase_search_persisted",
    "doc_proximity_search",
    # round-12 additions: sloppy phrase over the v2 array-postings
    # positional layout; search over the STREAM-MAINTAINED inverted index
    "doc_phrase_slop_search",
    "doc_bm25_maintained_topk",
    "doc_cooccurrence_search",
    # round-13 additions: the compaction triptych searched through the
    # driver gate (build→append→compact→search, bit-equal by layout-only
    # rewrite) and the NB maintenance stream's scoring twin
    "doc_bm25_compacted_topk",
    "doc_phrase_search_compacted",
    "ann_ivfpq_compacted_topk",
    "doc_nb_maintained_classifier",
    "ann_ivfpq_maintained_topk",
]

# Entries that lazily build persisted artifacts (index caches) on first
# call. They run ONCE, untimed, before the timed section (round-12,
# VERDICT r11 #3a): a cold cache otherwise charges index construction to
# the query — the r11 driver run read ann_ivfpq_federated_topk at 13.2 s
# vs 2.3 s idle purely from first-build cost, splitting the driver and
# idle series by 18%. Pre-warming gives every persisted entry the same
# steady-state amortization, so both series measure the SEARCH path.
PREWARM = [
    # one entry per DISTINCT cache family — entries that reuse an
    # artifact built here (hybrids, PRF, proximity/slop over the same
    # positional index) inherit the warm cache without their own pass,
    # keeping the prewarm's wall cost at builds + 9 warm searches
    "ann_ivfpq_persisted_topk",      # ivfpq/
    "ann_ivfpq_federated_topk",      # ivfpq_fed/ shards (also the hybrid's)
    "doc_bm25_persisted_topk",       # bm25/ (also PRF's + hybrids')
    "doc_bm25_incremental_topk",     # bm25_inc/
    "doc_bm25_federated_topk",       # bm25_fed/ shards
    "doc_bm25_maintained_topk",      # bm25_maint/ (stream drain)
    "doc_phrase_search_persisted",   # positional/ (also proximity + slop)
    "doc_nb_persisted_classifier",   # nb_model/
    "doc_incremental_dedup_persisted",  # lsh_bands/
    # round-13 compaction/maintenance cache families (each entry builds
    # src index + compacts, or drains a stream, on first call)
    "doc_bm25_compacted_topk",       # bm25_comp/
    "doc_phrase_search_compacted",   # positional_comp/
    "ann_ivfpq_compacted_topk",      # ivfpq_comp/
    "doc_nb_maintained_classifier",  # nb_maint/ (stream drain)
    "ann_ivfpq_maintained_topk",     # ivfpq_maint/ (stream drain)
]

# oracle readings that must NEVER rotate out (round-14, VERDICT r13 #2):
# the three heaviest Spark queries sort last under cheapest-first and
# starved twice before the r13 expensive-first flip; the verdict calls
# their vs_oracle readings the most informative in the artifact, so they
# are pinned FIRST in every round's oracle pass (~30 s of the budget).
PINNED_ORACLES = ["fact_ventas", "part_triangles", "ann_ivfpq_topk"]

# the round-4 headline (BENCH_r04.json) — kept verbatim so every later
# bench can report a like-for-like subtotal next to the growing total
R4_HEADLINE = [
    "fact_ventas", "star_revenue_by_pais_trimestre", "ventas_daily_summary",
    "fact_inventario", "fact_transacciones", "fact_balance",
    "fact_estado_resultados", "lineitem_pricing_summary",
    "top_discount_line_per_order", "dedup_lineitem", "events_tumbling_window",
    "doc_text_stats", "doc_exact_dedup", "doc_minhash_lsh", "doc_ngram_jaccard",
    "doc_simhash", "ann_brute_topk", "ann_ivf_topk", "emb_near_dup",
    "sql_revenue_by_nation", "asof_last_order", "events_sessionized",
    "corpus_term_freq", "doc_repetition", "doc_bm25_topk", "doc_surprisal",
    "doc_incremental_dedup", "scd2_pit_lookup",
]


def _oracle_costs_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ORACLE_COSTS.json")


def _load_oracle_costs() -> dict:
    """The accumulated per-oracle DuckDB wall-time ledger (round-14):
    every bench run merges its oracle_sec readings in, so ordering and
    budget decisions can use KNOWN costs instead of Spark-time proxies —
    the r14 dry run showed why: basket_frequent_triples runs 2.5 s in
    Spark but its recursive DuckDB oracle took 217 s and single-handedly
    ate the 200 s budget, starving 100+ cheap readings."""
    try:
        with open(_oracle_costs_path()) as fh:
            return {k: float(v) for k, v in json.load(fh).items()}
    except Exception:  # noqa: BLE001 — first run has no ledger
        return {}


def _oracle_times(
    entrymod, sf_dir: str, names: list[str], known: dict | None = None
) -> tuple[dict[str, float], list[str]]:
    """Per-query DuckDB oracle wall times over the same parquet tables —
    the engine-relative floor that catches single-query regressions the
    wall total hides. Disable with SPARK_GRAFT_BENCH_ORACLE=0.

    Fairness: the Spark side is JVM-warmed, so fast oracles (< 5 s) run
    twice and record the min — the first run pays first-touch parquet IO
    and buffer-pool population that would otherwise inflate vs_oracle in
    Spark's favor. Slow oracles run once (the cold fraction is small and
    a second run would double the bench's oracle wall)."""
    import duckdb

    # single source of truth for the table list / view registration
    from tools.check_oracle import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    out: dict[str, float] = {}
    # wall budget for the WHOLE oracle pass (round 6): at 80 queries the
    # min-of-2 pass alone ran ~275 s — a driver-side bench timeout would
    # lose the Spark timings too, which are the primary artifact. On
    # budget exhaustion the remaining oracles are SKIPPED AND NAMED
    # (no silent caps).
    # raised 240 -> 270 in round 9, back to 240 in round 10, 240 -> 200
    # in round 11: the headline grew again (105 -> 114 queries; idle wall
    # hit 590 s at budget 240) — the Spark timings are the primary
    # artifact and must land inside the driver's bench window, so the
    # oracle tail funds the new queries (skips are still named, never
    # silent)
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_ORACLE_BUDGET", "200"))
    started = time.time()
    skipped: list[str] = []
    known = known or {}
    for name in names:
        sql = oracles.get(name)
        if not sql:
            continue
        elapsed = time.time() - started
        if elapsed > budget:
            skipped.append(name)
            continue
        # known-cost guard (round-14): an oracle whose LEDGER cost
        # exceeds the remaining budget is skipped up front instead of
        # overrunning the whole pass (an unknown monster overruns once,
        # lands in the ledger, and sorts/skips correctly forever after)
        if known.get(name, 0.0) > budget - elapsed:
            skipped.append(name)
            continue
        try:
            t0 = time.time()
            con.execute(sql).fetchall()
            t = time.time() - t0
            # min-of-2 for fast oracles (first-touch IO fairness); the
            # threshold dropped 5.0 -> 2.0 s in round 6 to keep the pass
            # inside the budget at 80 queries
            if t < 2.0:
                t1 = time.time()
                con.execute(sql).fetchall()
                t = min(t, time.time() - t1)
            out[name] = round(t, 3)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            print(f"bench: oracle {name} failed: {exc}", file=sys.stderr)
    if skipped:
        print(
            f"bench: oracle budget ({budget:.0f}s) exhausted — skipped {len(skipped)}: {skipped}",
            file=sys.stderr,
        )
    return out, skipped


def main() -> None:
    wall0 = time.time()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from data_warehouse_punta_fina_spark import get_spark

    spark = get_spark("bench")
    # headline set spans both registries (driver window + extras) so the
    # per-query series stays comparable across rounds
    qs = dict(entrymod.queries())
    qs.update(entrymod.extra_queries())

    # warm the JVM outside the measured window: file listing + codegen
    # compilation + shuffle machinery (join/window/agg/explode on tiny data)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # page-cache + file-listing warm for every table the anchor touches —
    # anchor-first ordering (round 9) makes fact_ventas the first timed
    # query, so cold parquet IO would otherwise land entirely on it (the
    # baseline measures transform time, not first-touch disk reads)
    for t in ("lineitem", "orders", "part", "customer", "supplier",
              "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    warm = spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.md5(F.col("id").cast("string")).alias("h")
    )
    (
        warm.join(warm.groupBy("k").agg(F.count("*").alias("n")), "k")
        .withColumn("rn", F.row_number().over(Window.partitionBy("k").orderBy("id")))
        .withColumn("e", F.explode(F.array(F.lit(1), F.lit(2))))
        .write.format("noop").mode("overwrite").save()
    )
    # compile the actual query code paths once at the smallest SF
    for name in ("fact_ventas", "doc_minhash_lsh"):
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — warm-up must not kill the bench
            print(f"bench: warm-up {name} failed: {exc}", file=sys.stderr)

    # host calibration probe (round-14, VERDICT r13 #3): a fixed
    # CPU-bound job (80M xxhash64∘md5 rows, zero IO, zero shuffle beyond
    # the final 1-row exchange) timed 3× AFTER the JVM warm. Its reading
    # is a pure host-contention gauge — the r13 committed run read +12%
    # uniformly vs the idle run of identical code, and without this
    # field a consumer cannot separate plan regressions from the
    # afternoon host band. Idle-host reference on the build machine:
    # median ≈ 2.7 s (docs/BENCH_NOTES.md round-14); normalize any
    # cross-round per-query diff by (host_cal_median / 2.7) before
    # reading it as a regression. Median (not min) on purpose: the
    # MEDIAN tracks the contention the timed readings actually suffer,
    # while a min would hide exactly what the probe exists to expose.
    cal_runs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(80_000_000).select(
            F.expr("bit_xor(xxhash64(md5(cast(id as string))))")
        ).collect()
        cal_runs.append(round(time.time() - t0, 3))
    host_cal = {"runs": cal_runs, "median": sorted(cal_runs)[1], "min": min(cal_runs)}
    print(f"bench: host_cal {host_cal}", file=sys.stderr)

    # pre-build the persisted-index caches OUTSIDE the timed window
    # (VERDICT r11 #3a): first call after a testdata refresh trains/
    # writes the artifact; the timed pass below then measures the pure
    # stored-index search for every persisted entry — driver (cold
    # container) and idle (warm cache) runs measure the same thing.
    prewarm0 = time.time()
    for name in PREWARM:
        if name not in qs:
            continue
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — warm-up must not kill the bench
            print(f"bench: prewarm {name} failed: {exc}", file=sys.stderr)
    prewarm_sec = round(time.time() - prewarm0, 1)

    # per-query fault isolation: one broken query must never zero the whole
    # artifact — record its error, keep timing the rest, always print JSON.
    # Noise control (round-9, VERDICT r8 #2 — the driver's r8 run read
    # ~10% slower than the committed idle run of identical code, the
    # inflation concentrated on sub-5 s queries): (a) the 28-query r4
    # ANCHOR runs FIRST, before the heavy ANN/graph block heats the JVM
    # and page cache, so the cross-round anchor series stops absorbing
    # late-run context noise; (b) min-of-2 covers the sub-2.5 s tier
    # repo-wide (as since round 5) and widens to sub-5 s for the ANCHOR
    # queries specifically — host scheduling noise swings short queries
    # up to 3× run-to-run (docs/BENCH_NOTES.md) and the min is the
    # stable statistic, but rerunning EVERY sub-5 s query added ~2-4 min
    # of wall on a noisy host, which risks the driver's bench timeout;
    # the anchor is the series that must stay clean. fact_ventas (≥ 5 s,
    # session-memoized) re-times via a memo reset so its second run is a
    # true rebuild, not a cache read.
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    # per-query run count (ADVICE r11): 2 = min-of-2, 1 = single run —
    # machine-visible in BENCH_DETAIL so cross-round diffs can weight
    # the single-run band's ~10-20% extra noise instead of guessing
    min_of: dict[str, int] = {}
    # spike re-runs (round-15 measurement fix): this sandbox's host shows
    # intermittent steal-time spikes (host_cal probe read 10.3 s / 2.7 s /
    # 2.7 s across three back-to-back runs of an identical CPU-bound job;
    # single-run queries absorbed spikes of up to 10× — doc_repetition
    # read 14.2 s in one r15 baseline vs 1.3 s committed, identical code).
    # A single-run query whose first reading lands far above its last
    # COMMITTED reading (>1.5× and >+1 s) gets ONE re-run, min taken —
    # bounded to SPIKE_RERUN_MAX extra runs so the wall stays inside the
    # driver's window. This only ever replaces a reading with a second
    # full computation of the same query (never a cached value), and the
    # re-run is recorded per query in `spike_rerun` + min_of=2.
    SPIKE_RERUN_MAX = 15
    spike_rerun: list[str] = []
    # first-reading record (round-16, VERDICT r15 #3): the spike guard is
    # one-sided (only upward outliers get a retry), so cross-round totals
    # under the old first-reading methodology must stay reconstructible.
    # Every query that gets a second run records its FIRST reading here —
    # old-methodology total = sum(first_run.get(n, times[n])). Zero extra
    # wall; purely additive to the artifact.
    first_run: dict[str, float] = {}
    ref_times: dict[str, float] = {}
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
        ) as fh:
            ref_times = {
                k: float(v) for k, v in json.load(fh).get("queries", {}).items()
            }
    except Exception:  # noqa: BLE001 — first round has no committed artifact
        pass
    anchor = set(R4_HEADLINE)
    ordered = R4_HEADLINE + [n for n in HEADLINE if n not in R4_HEADLINE]
    for name in ordered:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            first = time.time() - t0
            min_of[name] = 1
            if name == "fact_ventas":
                # the flagship is session-memoized, so ANY second timing
                # must reset the memo first or it reads the persisted
                # cache instead of rebuilding (ADVICE r9: this branch
                # must win over the generic threshold branch, else a
                # sub-5s fact_ventas would min-of-2 against a cache
                # read and corrupt the cross-round anchor series). The
                # rerun also repopulates the memo for the star queries.
                entrymod.reset_session_memo()
                first_run[name] = round(first, 3)
                t1 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                first = min(first, time.time() - t1)
                min_of[name] = 2
            elif first < (5.0 if name in anchor else 1.5):
                first_run[name] = round(first, 3)
                t1 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                first = min(first, time.time() - t1)
                min_of[name] = 2
            elif (
                len(spike_rerun) < SPIKE_RERUN_MAX
                and name in ref_times
                and first > max(1.5 * ref_times[name], ref_times[name] + 1.0)
            ):
                # steal-spike suspect (see SPIKE_RERUN_MAX note above)
                spike_rerun.append(name)
                first_run[name] = round(first, 3)
                t1 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                first = min(first, time.time() - t1)
                min_of[name] = 2
            times[name] = round(first, 3)
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # methodology flags: sub-1.5s queries record min-of-2 repo-wide
        # (2.5 -> 1.5 in round 11: the headline reached 114 queries and
        # the 1.5-2.5 s band's reruns cost ~41 s of wall the driver
        # window can't spare; the anchor keeps its 5.0 s rerun cover —
        # it is the series that must stay clean), sub-5s min-of-2 for
        # the 28-query anchor, and the anchor block runs first —
        # cross-round per-query comparisons on the 1.5-2.5 s tier should
        # expect ~10-20% HIGHER readings than the r10 min-of-2 series
        "fast_query_min_of_2": True,
        "min_of_2_threshold_sec": 1.5,
        "anchor_min_of_2_threshold_sec": 5.0,
        "anchor_first": True,
        # per-query run counts (ADVICE r11: the 1.5-2.5 s band went
        # single-run in the r11 surgery; this makes the tier change
        # machine-visible per query instead of comment-only) + the
        # untimed persisted-artifact prewarm (VERDICT r11 #3a)
        "min_of": min_of,
        # queries re-run once after a steal-spike-suspect first reading
        # (round-15 measurement fix; every entry here is min-of-2)
        "spike_rerun": spike_rerun,
        # FIRST reading of every min-of-2 query (round-16, VERDICT r15
        # #3): the spike guard only retries upward outliers, so this
        # keeps the old first-reading methodology reconstructible —
        # old_total = sum(first_run.get(n, queries[n]) for n) — making
        # the one-sided-retry bias measurable instead of invisible
        "first_run": first_run,
        "first_run_total": round(
            sum(first_run.get(n, t) for n, t in times.items()), 3
        ),
        "prewarm_sec": prewarm_sec,
        "prewarmed": [n for n in PREWARM if n in qs],
        # cross-round comparability: the headline GROWS as operator
        # families land (28 queries in r4 → 50 now), so the wall total is
        # NOT a like-for-like series. This is the sum over exactly the
        # 28-query r4 headline — compare THIS against BENCH_r04's 47.94 s
        # (and the r4 value against BASELINE.md's 71.17 s reference).
        "value_r4_subset_28q": round(
            sum(times[n] for n in R4_HEADLINE if n in times), 3
        ),
        "r4_subset_queries": sorted(n for n in R4_HEADLINE if n in times),
        # the host-contention gauge (see the probe comment above)
        "host_cal": host_cal,
    }
    if errors:
        out["errors"] = errors
    # engine-relative floor: DuckDB runs the SAME oracle SQL on the SAME
    # parquet; vs_oracle = spark_sec / duckdb_sec per query (>1 = Spark
    # slower than the single-node columnar floor at this SF)
    if os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0":
        try:
            # ordering (round-14 rework): by KNOWN oracle cost from the
            # accumulated ledger, ascending — the Spark-time proxy used
            # through r13 misorders badly (a 2.5 s Spark query can carry
            # a 217 s recursive DuckDB oracle, and r14's dry run watched
            # exactly that one eat the whole budget). Unknown-cost
            # oracles assume ~1 s so they get explored early and enter
            # the ledger; a monster overruns once, then sorts last and
            # is budget-guard-skipped forever after.
            known = _load_oracle_costs()
            est = lambda n: known.get(n, 1.0)  # noqa: E731
            order = sorted((n for n in HEADLINE if n in times), key=est)
            # round-robin the skip list (round-13, VERDICT r12 #4): any
            # query skipped in the last committed run goes FIRST (cheap
            # est-cost first among themselves), so every query gets an
            # oracle reading at least every other round; the alternation
            # is recorded in the artifact as oracle_rotation.
            prev_skipped: set[str] = set()
            try:
                with open(
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAIL.json",
                    )
                ) as fh:
                    prev_skipped = set(json.load(fh).get("oracle_skipped") or [])
            except Exception:  # noqa: BLE001 — first round has no artifact
                pass
            if prev_skipped:
                pri = [n for n in order if n in prev_skipped]
                order = pri + [n for n in order if n not in prev_skipped]
                out["oracle_rotation"] = {"prioritized_prev_skipped": pri}
            # the three heaviest Spark readings never rotate out
            # (round-14, VERDICT r13 #2): pinned ahead of the make-up set
            pinned = [n for n in PINNED_ORACLES if n in times]
            order = pinned + [n for n in order if n not in pinned]
            out.setdefault("oracle_rotation", {})["pinned_first"] = pinned
            osec, oskipped = _oracle_times(entrymod, sf_dir, order, known)
            # merge this run's readings into the cost ledger — COMMIT
            # runs only (the ledger is a committed artifact; a driver/
            # ad-hoc run writing it would dirty the working tree, the
            # exact provenance leak the *_driver.json split exists to
            # prevent). Driver runs still READ the committed ledger for
            # ordering, which is what coverage depends on.
            if os.environ.get("SPARK_GRAFT_BENCH_COMMIT") == "1":
                try:
                    known.update(osec)
                    with open(_oracle_costs_path(), "w") as fh:
                        json.dump({k: known[k] for k in sorted(known)}, fh, indent=1)
                except OSError as exc:
                    print(f"bench: could not persist oracle cost ledger: {exc}", file=sys.stderr)
            # budget-skipped oracles go in the ARTIFACT, not just stderr
            # (VERDICT r6 #6 — the driver doesn't keep stderr)
            if oskipped:
                out["oracle_skipped"] = oskipped
            if osec:
                out["oracle_sec"] = osec
                ratios = {n: round(times[n] / osec[n], 2) for n in osec if osec[n] > 0}
                out["vs_oracle"] = ratios
                rs = sorted(ratios.values())
                out["vs_oracle_median"] = rs[len(rs) // 2]
                # the rotation (r13) changes WHICH queries get oracle
                # readings each round, so the median's population swings
                # (heavy-oracle rounds read higher) — record the
                # population size so cross-round comparisons can weight it
                out["vs_oracle_n"] = len(rs)
                # per-population medians (round-14, VERDICT r13 #2): the
                # single median swung 8.0 → 11.6 r12→r13 purely because
                # the rotation changed WHICH population got readings —
                # heavy queries (Spark > 2 s) amortize fixed job overhead
                # and read ~1-2×; sub-2 s queries carry a ~4 s Spark
                # floor against millisecond DuckDB runs and read 5-100×
                # regardless of plan quality (docs/BENCH_NOTES.md).
                # Compare medians only within a population.
                heavy = sorted(r for n, r in ratios.items() if times[n] > 2.0)
                cheap = sorted(r for n, r in ratios.items() if times[n] <= 2.0)
                if heavy:
                    out["vs_oracle_heavy_max"] = max(heavy)
                    out["vs_oracle_median_heavy"] = heavy[len(heavy) // 2]
                    out["vs_oracle_n_heavy"] = len(heavy)
                if cheap:
                    out["vs_oracle_median_cheap"] = cheap[len(cheap) // 2]
                    out["vs_oracle_n_cheap"] = len(cheap)
        except Exception as exc:  # noqa: BLE001 — oracle floor is advisory
            print(f"bench: oracle comparison skipped: {exc}", file=sys.stderr)
    # per-query regression tracking: ratio vs the round-1 floor (>1 slower)
    floor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
    if os.path.exists(floor_path):
        with open(floor_path) as fh:
            raw = json.load(fh)
        floor = (raw.get("parsed") or raw).get("queries", {})
        out["vs_r01"] = {
            name: round(t / floor[name], 2) for name, t in times.items() if floor.get(name)
        }
    # driver contract (round-6 fix, VERDICT r5 #5): the detailed line grew
    # past the driver's 2000-char tail capture in round 5, so BENCH_r05
    # recorded parsed=null. Emit the full detail FIRST (and persist it to
    # BENCH_DETAIL.json for humans/judges), then print a compact summary
    # as the LAST line so the tail window always contains one complete,
    # parseable JSON object with the headline numbers.
    # Artifact provenance (VERDICT r9 #4): the committed BENCH_DETAIL /
    # BENCH_SUMMARY artifacts represent deliberate idle-machine runs;
    # any other invocation (the driver's per-round run, ad-hoc SF
    # sweeps) writes the *_driver.json twins (gitignored) so the
    # working tree stays clean and the committed artifacts' provenance
    # is unambiguous. Set SPARK_GRAFT_BENCH_COMMIT=1 to write the
    # committed filenames.
    _commit_run = os.environ.get("SPARK_GRAFT_BENCH_COMMIT") == "1"
    _suffix = "" if _commit_run else "_driver"
    detail_name = f"BENCH_DETAIL{_suffix}.json"
    summary_name = f"BENCH_SUMMARY{_suffix}.json"
    # cpu-count provenance (round-16, VERDICT r15 #2): the driver runs the
    # bench at TWO core counts and both wrote the same *_driver.json
    # filenames, so the 8-core run overwrote the 32-core run's per-query
    # detail and the scaling comparison lost its data. Non-commit runs
    # additionally write cpu-suffixed twins that can never collide.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra_details = [] if _commit_run else [f"BENCH_DETAIL_driver_c{cpus}.json"]
    extra_summaries = [] if _commit_run else [f"BENCH_SUMMARY_driver_c{cpus}.json"]
    print(json.dumps(out))
    for dn in [detail_name] + extra_details:
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), dn), "w"
            ) as fh:
                json.dump(out, fh, indent=1)
        except OSError as exc:
            print(f"bench: could not persist {dn}: {exc}", file=sys.stderr)
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "sf": out["sf"],
        "n_queries": len(times),
        "n_errors": len(errors),
        "value_r4_subset_28q": out["value_r4_subset_28q"],
        "vs_oracle_median": out.get("vs_oracle_median"),
        "vs_oracle_n": out.get("vs_oracle_n"),
        # split medians (round-14): compare ONLY within a population
        "vs_oracle_median_heavy": out.get("vs_oracle_median_heavy"),
        "vs_oracle_n_heavy": out.get("vs_oracle_n_heavy"),
        "vs_oracle_median_cheap": out.get("vs_oracle_median_cheap"),
        "vs_oracle_n_cheap": out.get("vs_oracle_n_cheap"),
        # host-contention gauge: idle reference ≈ 2.7 s on the build
        # machine; normalize cross-round diffs by (this / 2.7)
        "host_cal_median": host_cal["median"],
        "n_oracle_skipped": len(out.get("oracle_skipped", [])),
        # how many previously-skipped oracles ran first this round
        # (VERDICT r12 #4 round-robin; 0 = no prior skip list)
        "n_oracle_rotated": len(
            out.get("oracle_rotation", {}).get("prioritized_prev_skipped", [])
        ),
        # total process wall (warmup + timed passes + reruns + oracle):
        # `value` is the min-of-runs SUM, so a driver-context slowdown
        # shows up here first — round-9 diagnostic for the bench-timeout
        # and run-context questions
        "wall_sec": round(time.time() - wall0, 1),
        "prewarm_sec": prewarm_sec,
        # how many timed readings are single-run (no min-of-2 cover) —
        # the noise-weighting signal for cross-round per-query diffs
        "n_single_run": sum(1 for v in min_of.values() if v == 1),
        "detail": (extra_details or [detail_name])[0],
        # the per-query map IN the final line (round-16, VERDICT r15 #2
        # + the original driver contract): PERF per-query/scaling
        # comparisons read the final one-line JSON, which carried only
        # totals for two rounds (n_common: 0) — per-query regressions
        # were invisible to the driver. Placed LAST in the object so the
        # headline scalars stay at the front of the line for humans.
        "queries": times,
    }
    # also persist the compact object (VERDICT r7 #7) so the driver's
    # stdout tail capture is not load-bearing at all — it can parse
    # either the last stdout line or this artifact
    for sn in [summary_name] + extra_summaries:
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), sn),
                "w",
            ) as fh:
                json.dump(compact, fh, indent=1)
        except OSError as exc:
            print(f"bench: could not persist {sn}: {exc}", file=sys.stderr)
    print(json.dumps(compact))
    spark.stop()
    # exit 0 iff at least one query produced a timing; the JSON lines above
    # are printed regardless
    sys.exit(0 if times else 1)


if __name__ == "__main__":
    main()
