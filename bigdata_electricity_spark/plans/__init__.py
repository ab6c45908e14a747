"""Named-query registry: every driver-checkable query + its DuckDB oracle.

Importing this package populates :data:`REGISTRY` from the query modules.
"""

from .registry import REGISTRY, QuerySpec, query

# Import for registration side effects — order defines registry order.
from . import reference_queries  # noqa: E402,F401
from . import cleaning_queries  # noqa: E402,F401
from . import join_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import special_queries  # noqa: E402,F401
from . import advanced_queries  # noqa: E402,F401
from . import sql_text_queries  # noqa: E402,F401
from . import tpch_queries  # noqa: E402,F401
from . import training_queries  # noqa: E402,F401
from . import quality_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import warehouse_queries  # noqa: E402,F401
from . import insight_queries  # noqa: E402,F401
from . import corpus_queries  # noqa: E402,F401
from . import learning_queries  # noqa: E402,F401
from . import household_queries  # noqa: E402,F401

# Exact-variant → scale-safe twin. Some entries deliberately keep the
# reference's (or the textbook's) EXACT small-data semantics even though
# the plan does not survive a 100× scale-up — each one ships with a
# scale-safe twin computing the production variant of the same insight.
# The catalog (docs/QUERIES.md, via tools/catalog.py) surfaces the
# pairing so a user picking an entry sees the alternative without
# reading docstrings; tests/test_registry_parity.py asserts both sides
# of every pair exist.
SCALE_TWINS: dict[str, str] = {
    # global NTILE = single-partition sort of all orders ↔ broadcast
    # quantile cut points (no window, no global sort)
    "binning_equal_frequency": "binning_equal_frequency_approx",
    # reference-parity whole-table 1-minute cadence lag (global-order
    # window) ↔ user-partitioned gap windows
    "clean_gap_detection": "events_user_gaps",
    # exact rolling 7-day distinct users (7× row fan-out) ↔ the SAME
    # rolling relation from per-day HLL sketches fanned out |days|×7
    # and union-merged per window (bounded state, exact n_events;
    # r12 VERDICT task 3 — was previously anchored to the generic
    # sketch_shard_merge pattern rather than a true output twin)
    "events_rolling_7d_distinct_users": "events_rolling_7d_distinct_users_sketch",
    # exact brute-force cosine top-k (full-corpus scan per query) ↔
    # learned IVF coarse quantizer probing a fraction of the corpus
    "sim_topk_bruteforce": "sim_ivf_probe_topk",
    # r8 sf1-audit pairings (docs/SCALING_SF1.md): fixed-cardinality
    # block keys (source / label) make per-block pairs quadratic in the
    # corpus. Text side: prefix-filtered twins produce the IDENTICAL
    # result (same oracle) with candidate mass bounded by content —
    # measured 430s→55s / 301s→57s at sf1.
    "dedup_ngram_jaccard": "dedup_ngram_jaccard_prefix",
    "dedup_containment_best": "dedup_containment_best_prefix",
    # Embedding side: the production variants already existed and the
    # same audit measured them linear (2.6× / 6.1× / 17.7× for 10×
    # rows) — label-bucket all-pairs ↔ IVF with nlist ∝ √n (bucket
    # count scales with the corpus, serve cost O(√n)/query); label-
    # blocked near-dup pairs ↔ banded hyperplane LSH; pair-graph
    # closure clusters ↔ centroid clustering / banded candidates + CC.
    "sim_bucketed_nn": "sim_ivf_scaled_nlist",
    "sim_near_dup_pairs": "sim_lsh_hyperplane",
    "sim_semantic_clusters": "kmeans_dataframe_lloyd",
    "dedup_cc_clusters": "dedup_cc_clusters_prefix",
    # same exact triangle algorithm over the ⌈√n⌉-bucket near-dup
    # graph — the baseline's cost was its label-blocked edge generation
    "graph_triangle_stats": "graph_triangle_stats_scaled",
    # r10: the √n-bucket EXACT profile is honestly n^1.5 (31.8× for the
    # sf1f→sf10f decade — the optimal exact algorithm, SCALING_SF10
    # row 1); past that, estimate: DOULION hash-deterministic edge
    # sampling with p ∝ √n — sampled verify mass ∝ n, triangle count
    # scaled by p³, raw sampled support reported beside the estimates.
    "graph_triangle_stats_scaled": "graph_triangle_doulion",
    # r9 density-controlled sweep: the 16-bit/4-band signature gives 16
    # buckets per band FOREVER (occupancy ∝ n ⇒ candidates ∝ n²) — the
    # r8 "output-mass inherent" diagnosis was wrong; bits must scale
    # with the corpus (occupancy pinned, bucket count ∝ n).
    "sim_lsh_hyperplane": "sim_lsh_hyperplane_scaled",
    # r9 density-controlled sweep: identical fingerprints collide in
    # all four quarter-blocks (4·C(k,2) candidates for a k-member fp
    # group — exact dups / near-empty docs). The twin joins DISTINCT
    # fps (Hamming-0 groups collapse to a representative + count).
    "dedup_simhash": "dedup_simhash_grouped",
}

# Every SCALE_TWINS key is by definition an exact-baseline: it keeps
# deliberately exact small-data semantics and names the production twin
# above. Assigned centrally (not at definition sites) so the dict stays
# the single source of truth; an entry that is BOTH a twin and a key
# (e.g. sim_lsh_hyperplane) classifies as exact-baseline — it has a
# better twin of its own. tests/test_registry_parity.py asserts the
# classification is total and consistent.
for _exact in SCALE_TWINS:
    if REGISTRY[_exact].scale_class != "production":
        # A definition-site classification on a SCALE_TWINS key would be
        # silently discarded here — fail loudly instead (r11 ADVICE).
        raise ValueError(
            f"{_exact} is a SCALE_TWINS key (classified exact-baseline "
            f"centrally) but was registered as "
            f"{REGISTRY[_exact].scale_class!r} at its definition site — "
            "remove one of the two classifications"
        )
    REGISTRY[_exact].scale_class = "exact-baseline"

__all__ = ["REGISTRY", "QuerySpec", "query", "SCALE_TWINS"]
