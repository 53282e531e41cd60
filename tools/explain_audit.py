"""Physical-plan audit — the ".explain until it's the plan you want" loop.

For every registry query (or the names given on argv) this prints a
one-line health summary of the executed plan at $SPARK_GRAFT_SF_DIR:

- pushed:   parquet scans carry PushedFilters (when the query filters)
- pruned:   no scan reads more columns than the query needs (ReadSchema
            column count vs a full-table scan)
- bhj/smj:  join strategies chosen
- codegen:  WholeStageCodegen spans present
- WARN:     CartesianProduct / BroadcastNestedLoopJoin outside the
            queries that intend one (brute-force cosine), or a
            row-at-a-time PythonUDF in the plan (Arrow-batched
            ArrowEvalPython / MapInPandas are the sanctioned forms)

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ONLY = set(sys.argv[1:])

# queries whose algorithm is intentionally all-pairs over a broadcast side
# (brute-force cosine; zip) or that attach a 1-row corpus-scalar aggregate
# (N, avgdl) via a single-row broadcast BNLJ (tfidf/bm25)
CROSS_OK = {"ann_cosine_topk", "zip_streams", "text_tfidf_topk",
            "bm25_search", "text_unigram_logprob",
            "quality_decile_buckets", "hybrid_search_rrf",
            "sample_temperature_weights", "corpus_source_kl",
            "mine_contrastive_pairs", "embedding_norm_outliers",
            # in-plan witness queries: the recall/quality assertion is a
            # 1-row aggregate attached by a broadcast BNLJ by design,
            # and the exact-head side is the intentional brute force
            "ann_ivf_topk", "ann_ivfpq_topk", "embedding_pq_codes",
            "ann_ivf_partitioned", "ann_ivf_append_probe",
            "ann_ivf_filtered", "stream_ann_probe",
            # MMR's candidate fetch is the intentional brute top-pool
            "retrieval_mmr_diversified",
            # fk_rule stitches two 1-row aggregates (n_rows x
            # n_violations) — the standard 1-row-scalar BNLJ
            "data_quality_report",
            # PMI attaches the two corpus totals via 1-row broadcasts
            "text_collocations_pmi",
            # bigram LM attaches V (vocab size) via a 1-row broadcast
            "text_bigram_logprob",
            # Q22 attaches the 1-row scalar-average threshold via a
            # broadcast BNLJ (the standard scalar-subquery shape);
            # the anti join itself is hash
            "tpch_q22_dormant_balance",
            # Q11's grand-total threshold is the same 1-row scalar
            # attach (HAVING vs a fraction of the total)
            "tpch_q11_important_stock",
            # NB classifier attaches class totals via a 1-row broadcast
            "text_nb_quality_llr",
            # __ALL__ row stitches two 1-row aggregates (exact total x
            # merged-sketch estimate)
            "sketch_vocab_cardinality",
            # the data card stitches two 1-row aggregates (doc-level x
            # vocabulary)
            "corpus_data_card",
            # r10 sketch-witness queries: each attaches a 1-row (or
            # G-row) broadcast sketch/estimate frame to the exact
            # truth — the scalar-attach BNLJ by design, never a pair
            # space (the raw stream is scanned a bounded number of
            # times regardless of group/pair count)
            "sketch_price_quantiles", "sketch_user_overlap_theta",
            "sketch_token_heavy_hitters", "sketch_cohort_matrix",
            "stream_sketch_quantiles",
            # PSI attaches the 1-row cutpoint/total frames by design;
            # the by-group form also crosses the G-row group list
            # with the 10-row bucket list (metadata-sized grid)
            "drift_psi_value", "drift_psi_by_source",
            "drift_psi_standing",
            # BM25 corpus scalars (N, avgdl) attach via the
            # standard 1-row broadcast; the cosine truth side is
            # the intentional brute-force ground truth over a
            # 10-query broadcast (ann_cosine_topk precedent)
            "retrieval_eval_metrics",
            # same shape: 1-row BM25 corpus scalars + the
            # intentional brute-force cosine positive set over a
            # 10-query broadcast
            "retrieval_hard_negatives",
            # acceptance sampler attaches the 1-row corpus max
            "sample_weighted_acceptance"}
# streaming queries materialize through a memory sink — no batch plan to audit
SKIP = {"stream_windowed_counts", "stream_dedup_keys",
        "stream_sessionize_stateful", "stream_static_enrich",
        "stream_interval_join",
        "stream_quality_filter", "stream_decontaminate",
        "stream_incremental_dedup"}

# Queries allowed to carry an UNPARTITIONED window (WindowExec moves
# its whole input to one task) — each with the asserted reason the
# frame is BOUNDED (metadata-sized, never row-proportional).  Any
# query with an unpartitioned window NOT listed here is a WARN: a
# genuinely global single-task window over data rows is the
# 100 TB-killer this audit exists to catch (r11 VERDICT lead #4 —
# previously these ~15 sites were bounded only by docstring claim).
WINDOW_OK = {
    # two-pass dense-index offsets table: one row PER INPUT PARTITION
    # (HashAggregate keys=__pid feeds the window), bounded by cluster
    # parallelism, never by row count (combinators._with_pos;
    # export_shards.py; SCALING probe r39 pins the shape)
    "export_shard_assignment": "partitions-sized offsets table",
    "export_shard_token_balanced": "partitions-sized offsets table",
    "pipeline_materialize_training": "partitions-sized offsets table",
    "sample_global_shuffle": "partitions-sized offsets table",
    "sample_interleave_sources": "partitions-sized offsets table",
    "zip_streams": "2x partitions-sized offsets tables",
    # row_number over a TakeOrderedAndProject head: frame <= limit
    "hybrid_search_rrf": "two top-1000 ranking heads",
    "sketch_source_heavy_hitters": "top-5 per-source head",
    "sketch_token_heavy_hitters": "top-k head",
    "token_zipf_fit": "top-1000 token head",
    # lead() over the per-component eigenvalue table: <= dims rows
    "embedding_pca_witness": "dims-sized (64) eigenvalue table",
}


def unpartitioned_windows(plan: str) -> int:
    """Count Window NODES whose spec has no PARTITION BY clause.

    The plan line format is ambiguous on bracket groups alone (a
    partitioned-but-unordered window also prints two groups), so this
    parses the node's first ``windowspecdefinition(...)``: its
    arguments are partition expressions, then ordering expressions
    (suffixed ASC/DESC), then the frame.  No partition clause ⟺ the
    FIRST top-level argument is an ordering or the frame itself.
    """
    n = 0
    for line in plan.splitlines():
        s = line.strip()
        if not re.match(r"^[:+\-\s]*Window \[", s):
            continue
        m = re.search(r"windowspecdefinition\(", s)
        if not m:
            continue
        i, depth, arg = m.end(), 1, []
        while i < len(s) and depth:
            ch = s[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth == 1 and ch == ",":
                break
            if depth:
                arg.append(ch)
            i += 1
        first = "".join(arg).strip().rstrip(")")
        if first.startswith("specifiedwindowframe") or re.search(
                r" (ASC|DESC)( NULLS (FIRST|LAST))?$", first):
            n += 1
    return n


def main() -> None:
    from nosql_join_stream_spark.session import get_session
    from nosql_join_stream_spark.queries import REGISTRY

    spark = get_session("explain-audit")
    bad = 0
    for name, qd in REGISTRY.items():
        if ONLY and name not in ONLY:
            continue
        if name in SKIP:
            print(f"{name:28s} (streaming — skipped)")
            continue
        df = qd.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        marks = []
        if "PushedFilters: [" in plan and not re.search(
                r"PushedFilters: \[\]", plan.split("PushedFilters: [", 1)[1][:0]):
            n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
            if n_pushed:
                marks.append(f"pushed×{n_pushed}")
        if "WholeStageCodegen" in plan:
            marks.append("codegen")
        for j, tag in (("BroadcastHashJoin", "bhj"), ("SortMergeJoin", "smj"),
                       ("ShuffledHashJoin", "shj"), ("MapInPandas", "mapInPandas"),
                       ("FlatMapGroupsInPandas", "groupedPandas")):
            c = plan.count(j)
            if c:
                marks.append(f"{tag}×{c}")
        warn = []
        for j in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if j in plan and name not in CROSS_OK:
                warn.append(j)
        if re.search(r"BatchEvalPython", plan):
            warn.append("row-at-a-time PythonUDF")
        n_unpart = unpartitioned_windows(plan)
        if n_unpart:
            if name in WINDOW_OK:
                marks.append(f"1task-win×{n_unpart} ({WINDOW_OK[name]})")
            else:
                warn.append(f"unpartitioned Window×{n_unpart} "
                            f"(single-task; not in WINDOW_OK)")
        status = "WARN " + ",".join(warn) if warn else "ok"
        if warn:
            bad += 1
        print(f"{name:28s} {status:34s} {' '.join(marks)}")
    print(f"\n{bad} plan warnings")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
