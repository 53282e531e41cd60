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
            "drift_psi_standing"}
# streaming queries materialize through a memory sink — no batch plan to audit
SKIP = {"stream_windowed_counts", "stream_dedup_keys",
        "stream_sessionize_stateful", "stream_static_enrich",
        "stream_interval_join",
        "stream_quality_filter", "stream_decontaminate",
        "stream_incremental_dedup"}


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
        status = "WARN " + ",".join(warn) if warn else "ok"
        if warn:
            bad += 1
        print(f"{name:28s} {status:34s} {' '.join(marks)}")
    print(f"\n{bad} plan warnings")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
