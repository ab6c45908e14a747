"""Degenerate-input robustness: empty tables, single rows, all-null columns.

Operators must degrade to empty/identity results — not throw — because a
100 TB pipeline always contains an empty partition, date-hole, or
filtered-to-nothing branch somewhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from bigdata_electricity_spark.operators import cleaning as C
from bigdata_electricity_spark.operators import dataframe_ops as O
from bigdata_electricity_spark.operators import dedup as D
from bigdata_electricity_spark.operators.reduction import aggregate_hourly
from bigdata_electricity_spark.operators.transformation import min_max_scale

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


def _empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_dedup_ops_on_empty(spark):
    empty = _empty_docs(spark)
    assert D.exact_dup_groups(empty).count() == 0
    assert D.dedup_exact(empty).count() == 0
    assert D.minhash_lsh_candidates(empty).count() == 0
    assert D.ngram_jaccard_pairs(empty).count() == 0


def test_dedup_single_doc(spark):
    one = spark.createDataFrame([(1, "just one document here")], DOC_SCHEMA)
    assert D.exact_dup_groups(one).count() == 1
    assert D.minhash_lsh_candidates(one).count() == 0  # no pair with itself


def test_cleaning_counts_on_empty(spark):
    schema = StructType(
        [StructField("DateTime", StringType())]
        + [StructField(c, StringType()) for c in C.NUM_COLS]
    )
    empty = spark.createDataFrame([], schema)
    stats = C.compute_before_stats(empty)
    assert stats.total_rows == 0
    assert stats.duplicate_timestamps == 0
    assert C.count_full_row_dups(empty) == 0


def test_hourly_agg_on_empty(spark):
    schema = StructType([
        StructField("DateTime", StringType()),
        StructField("Global_active_power", DoubleType()),
    ])
    empty = spark.createDataFrame([], schema).withColumn(
        "DateTime", F.col("DateTime").cast("timestamp")
    )
    out = aggregate_hourly(empty, num_cols=["Global_active_power"])
    assert out.count() == 0


def test_min_max_scale_on_empty_and_all_null(spark):
    schema = StructType([StructField("x", DoubleType())])
    empty = spark.createDataFrame([], schema)
    assert min_max_scale(empty, ["x"]).count() == 0  # min/max None → guard
    nulls = spark.createDataFrame([(None,), (None,)], schema)
    vals = [r["x_scaled"] for r in min_max_scale(nulls, ["x"]).collect()]
    assert vals == [0.0, 0.0]


def test_topk_and_argmax_on_empty(spark):
    schema = StructType([
        StructField("k", StringType()), StructField("v", DoubleType()),
    ])
    empty = spark.createDataFrame([], schema)
    assert O.top_k(empty, "v", 5).count() == 0
    row = O.argmax(empty, "k", "v").first()
    assert row["k"] is None and row["v"] is None  # max_by of nothing → null row


def test_insight_entries_survive_tiny_tables(spark, tmp_path_factory):
    """Run every entry added in the lifecycle/corpus-science round
    against a minimal synthetic sf_dir (2 users x 3 events, 2 orders,
    2 docs, 3 embeddings, 4 lineitems): none may throw — a 100 TB
    pipeline always has a filtered-to-nothing branch somewhere."""
    import numpy as np
    import pandas as pd

    from bigdata_electricity_spark.plans import REGISTRY

    d = tmp_path_factory.mktemp("tiny_sf")
    ts = pd.to_datetime(
        ["2024-01-01 00:00:01", "2024-01-01 00:10:00", "2024-01-02 05:00:00"]
    )
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": ts,
            "user_id": [1, 1, 2],
            "event_type": ["view", "purchase", "click"],
            "value": [1.0, 2.0, 3.0],
            "props": ['{"k": 1}'] * 3,
        }
    ).to_parquet(d / "events.parquet", coerce_timestamps="us")
    pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [10, 11],
            "o_orderstatus": ["F", "O"],
            "o_totalprice": [100.0, 200.0],
            "o_orderdate": pd.to_datetime(["1995-01-01", "1995-06-01"]),
            "o_orderpriority": ["1-URGENT", "2-HIGH"],
        }
    ).to_parquet(d / "orders.parquet", coerce_timestamps="us")
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b a b", "c"],
            "lang": ["en", "en"],
            "source": ["src0", "src1"],
            "n_chars": [7, 1],
        }
    ).to_parquet(d / "documents.parquet")
    pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [np.ones(4, dtype=np.float32) * (i + 1) for i in range(3)],
            "label": [3, 3, 1],
        }
    ).to_parquet(d / "embeddings.parquet")
    pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2],
            "l_partkey": [7, 8, 7, 8],
            "l_suppkey": [1, 1, 2, 2],
            "l_linenumber": [1, 2, 1, 2],
            "l_quantity": [1.0, 2.0, 1.0, 2.0],
            "l_extendedprice": [10.0, 20.0, 10.0, 20.0],
            "l_discount": [0.0, 0.1, 0.0, 0.1],
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": pd.to_datetime(["1995-02-01"] * 4),
        }
    ).to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    new_entries = [
        "survival_session_km", "intervals_user_active_runs",
        "skyline_customer_frontier", "anomaly_seasonal_residual",
        "dedup_segment_exact", "vocab_bpe_merges",
        "embedding_pca_top_component", "graph_kcore_peel",
        "stats_bootstrap_ci_mean", "stats_mutual_information",
        "ml_gd_linreg_rounds", "ml_isotonic_fit", "events_periodogram",
        "privacy_l_diversity", "abtest_sprt_sequential",
        "events_markov_stationary", "text_bigram_perplexity",
        "sim_filtered_topk", "featurestore_pit_features",
        "sample_kcenter_greedy", "events_haar_multiscale",
        "funnel_absorbing_conversion", "forecast_snaive_backtest",
        "events_trending_rank_wow", "ingest_quarantine_bad_csv",
        "warehouse_backlog_aging", "asof_join_click_next_purchase",
        "maintain_incremental_join", "sim_pq_adc_topk",
        "graph_label_propagation", "vocab_bpe_encode_stats",
        "stats_spearman_rank_corr", "corpus_heaps_law_fit",
        "export_xml_roundtrip", "sql_collation_groupby",
        # r6 additions
        "dedup_containment_best",
        "corpus_zipf_slope", "events_anomaly_mad",
        "events_drift_cusum_chart",
        "forecast_theilsen_daily_trend",
        "maintain_incremental_sessions", "privacy_t_closeness",
        # (profile_data_card_all_tables reads all ten tables — the tiny
        # fixture ships five, so it is exercised at the real SFs instead)
        "text_kneser_ney_bigrams", "ml_naive_bayes_lang",
        "ingest_binary_files", "map_function_zoo",
        "events_rolling_regression_slope",
        "events_session_window_dynamic_gap", "observe_export_metrics",
        "mining_association_rules", "normalize_quantile_match_by_source",
        "maintain_vacuum_orphan_audit", "corpus_source_overlap_matrix",
        "transpose_priority_metrics",
        # (sim_sorted_neighborhood_pairs reads part — tiny fixture has no
        # part table, so it is exercised at the real SFs instead)
    ]
    for name in new_entries:
        rows = REGISTRY[name].fn(spark, str(d)).collect()
        assert isinstance(rows, list), name

    # a few semantic spot checks on the tiny world
    sky = REGISTRY["skyline_customer_frontier"].fn(spark, str(d)).collect()
    assert [r["custkey"] for r in sky] == [11]  # dominates on both axes
    seg = {r["doc_id"]: r for r in REGISTRY["dedup_segment_exact"].fn(spark, str(d)).collect()}
    assert seg[1]["n_kept"] == 1 and seg[2]["n_kept"] == 1
    kc = REGISTRY["graph_kcore_peel"].fn(spark, str(d)).collect()
    assert all(r["n_edges_after"] == 0 for r in kc)  # 1 edge can't be a 3-core
