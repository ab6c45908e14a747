"""Live second-decade certification of the composed dedup path at
sf100f — 5M docs, 1000× the bench SF (r12 VERDICT task 1).

Until r13 every claim above sf10f (500k docs) was an extrapolation:
the signature law's next operating point (r=5, b=10 — what
``lsh_signature_for`` emits past 10⁷ distinct docs) was unit-tested
and mass-projected but never executed, and the substring triad's
~linear decade was measured only to sf10f. This script converts those
to measurements on a synthesized fresh-content corpus
(.localdata/sf100f, `make_sf.py --mult 1000 --fresh-content
--tables documents,embeddings`):

  A. EXACT closure via the synthesis invariant: fresh-content
     replicas have pairwise-DISJOINT token sets (every token carries
     a per-replica suffix) and the per-token bijection preserves
     within-replica token-set sizes and intersections EXACTLY, so the
     true Jaccard-closure of the full corpus is the replica-0 closure
     repeated with ids shifted by replica·stride — no cross-replica
     true pair exists and component min-ids shift with their members.
     Phase A computes the prefix-filtered exact closure (recall 1 by
     the prefix-filter theorem) on REPLICA 0 ONLY (doc_id < stride)
     and expands labels arithmetically; a direct 5M-doc closure would
     cost hours for information the synthesis already pins. The
     invariant itself is VALIDATED at sf1f: tools/ ran the direct
     50k-doc closure and the expansion produces the identical
     partition (recorded under "invariant_check" in the JSON).
     --full-exact forces the direct closure for such validations.
  B. `lsh_dedup_clusters` at the law's sf100f signature ((32, 8):
     5M < 10⁷ keeps r=4 — the law's decade boundary is 10⁷, so the
     100× corpus certifies the CURRENT point at 10× the previously
     measured scale) — wall + shuffle bytes from the status store.
  C. `lsh_dedup_clusters` at the law's NEXT point (r=5 → (50, 10) from
     the recall bound at J=0.8 ≥ 0.98) — the first live execution of
     the second-decade signature. Per-pair recall is corpus-size
     independent (the S-curve), so certifying r=5 here is exactly the
     certification a >10⁷-doc corpus would get.
  D. label-aggregated pair recall/precision for B and C against A
     (sum-of-C(k,2) over label groups — no pair relation
     materialized; the recall_density.py method).
  E. substring-triad scale point: `dedup_substring_rolling` registry
     entry wall + shuffle bytes at sf100f.

Writes docs/CERTIFY_SF100F.json. Each phase runs in its own
SparkSession so the status-store stage set is unambiguous
(shuffle_bytes.py discipline); phases hand off through parquet, so a
crashed phase can be rerun alone with --phase.

    python tools/certify_sf100f.py [--sf-dir .localdata/sf100f]
                                   [--phase A|B|C|D|E ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "CERTIFY_SF100F.json")
SHUFFLE_PARTITIONS = "256"  # 5M docs; the bench default 32 would spill


def _session(name: str):
    from bigdata_electricity_spark.session import get_spark

    spark = get_spark(name)
    spark.conf.set("spark.sql.shuffle.partitions", SHUFFLE_PARTITIONS)
    return spark


def _stage_bytes(spark) -> dict:
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0}
    for i in range(stages.size()):
        s = stages.apply(i)
        tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
        tot["shuffle_read_bytes"] += s.shuffleReadBytes()
    return tot


def _load(path: str) -> dict:
    if os.path.exists(OUT):
        with open(OUT) as fh:
            return json.load(fh)
    return {}


def _save(res: dict) -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)


def _replica0_closure(spark, docs, stride: int):
    from bigdata_electricity_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )
    from bigdata_electricity_spark.operators.graph import connected_components

    r0 = docs.filter(F.col("doc_id") < stride)
    pairs = prefix_filtered_jaccard_pairs(r0, threshold=0.6).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    return connected_components(
        r0.select(F.col("doc_id").alias("id")), pairs
    ).select(F.col("id").alias("orig"), F.col("component").alias("e0"))


def _expand_labels(docs, labels0, stride: int):
    # doc_id = i*stride + orig; its component = i*stride + e0(orig),
    # because the token bijection preserves the component's membership
    # and min-id labeling shifts with its members.
    ids = docs.select("doc_id", (F.col("doc_id") % stride).alias("orig"))
    return ids.join(F.broadcast(labels0), "orig").select(
        "doc_id", (F.col("doc_id") - F.col("orig") + F.col("e0")).alias("e")
    )


def phase_a(sf_dir: str, res: dict, full: bool = False,
            stride: int = 5000) -> None:
    from bigdata_electricity_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )
    from bigdata_electricity_spark.operators.graph import connected_components

    spark = _session("certify-sf100f-exact")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.perf_counter()
        if full:
            pairs = prefix_filtered_jaccard_pairs(docs, threshold=0.6).select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            )
            exact = connected_components(
                docs.select(F.col("doc_id").alias("id")), pairs
            ).select(F.col("id").alias("doc_id"), F.col("component").alias("e"))
        else:
            labels0 = _replica0_closure(spark, docs, stride)
            exact = _expand_labels(docs, labels0, stride)
        exact.write.mode("overwrite").parquet(f"{sf_dir}/__exact_labels")
        wall = time.perf_counter() - t0
        n = spark.read.parquet(f"{sf_dir}/__exact_labels").count()
        res["exact"] = {"wall_sec": round(wall, 1), "docs": n, "full": full,
                        "stride": None if full else stride,
                        **_stage_bytes(spark)}
        print(f"A exact: {res['exact']}", flush=True)
    finally:
        spark.stop()


def phase_v(sf_dir: str, res: dict, stride: int = 5000) -> None:
    """Validate the replica-expansion invariant against a DIRECT
    closure previously persisted by `--full-exact` at this sf_dir:
    the expanded labeling must be IDENTICAL row-for-row (min-id
    labels shift with their members, so not just partition-equal)."""
    spark = _session("certify-invariant-check")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        direct = spark.read.parquet(f"{sf_dir}/__exact_labels")
        labels0 = _replica0_closure(spark, docs, stride)
        expanded = _expand_labels(docs, labels0, stride)
        n = direct.count()
        agree = direct.join(expanded, ["doc_id", "e"]).count()
        res["invariant_check"] = {"sf_dir": sf_dir, "docs": n,
                                  "labels_identical": agree == n,
                                  "agree": agree}
        print(f"V invariant: {res['invariant_check']}", flush=True)
        if agree != n:
            raise SystemExit("replica-expansion invariant VIOLATED")
    finally:
        spark.stop()


def _phase_lsh(sf_dir: str, res: dict, key: str, num_hashes, bands) -> None:
    from bigdata_electricity_spark.operators.dedup import (
        lsh_dedup_clusters,
        lsh_signature_for,
    )
    from bigdata_electricity_spark.sources.loaders import parquet_row_count

    spark = _session(f"certify-sf100f-{key}")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = parquet_row_count(f"{sf_dir}/documents.parquet")
        if num_hashes is None:
            num_hashes, bands = lsh_signature_for(n)
        t0 = time.perf_counter()
        lsh = lsh_dedup_clusters(
            docs, threshold=0.6, num_hashes=num_hashes, bands=bands
        ).select("doc_id", F.col("cluster_id").alias("l"))
        lsh.write.mode("overwrite").parquet(f"{sf_dir}/__lsh_labels_{key}")
        wall = time.perf_counter() - t0
        res[key] = {"wall_sec": round(wall, 1), "num_hashes": num_hashes,
                    "bands": bands, "n_docs": n, **_stage_bytes(spark)}
        print(f"{key}: {res[key]}", flush=True)
    finally:
        spark.stop()


def phase_d(sf_dir: str, res: dict) -> None:
    spark = _session("certify-sf100f-metrics")
    try:
        exact = spark.read.parquet(f"{sf_dir}/__exact_labels")
        pairs = F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long")
        for key in ("lsh_law", "lsh_r5"):
            if not os.path.exists(f"{sf_dir}/__lsh_labels_{key}"):
                continue
            lsh = spark.read.parquet(f"{sf_dir}/__lsh_labels_{key}")
            lab = exact.join(lsh, "doc_id")
            tp = (lab.groupBy("e").agg(F.count(F.lit(1)).alias("k"))
                  .agg(pairs.alias("p")).first()["p"]) or 0
            hit = (lab.groupBy("e", "l").agg(F.count(F.lit(1)).alias("k"))
                   .agg(pairs.alias("p")).first()["p"]) or 0
            lp = (lab.groupBy("l").agg(F.count(F.lit(1)).alias("k"))
                  .agg(pairs.alias("p")).first()["p"]) or 0
            res.setdefault(key, {}).update({
                "true_pairs": tp, "hit_pairs": hit, "lsh_pairs": lp,
                "recall": round(hit / tp, 4) if tp else 1.0,
                "precision": round(hit / lp, 4) if lp else 1.0,
            })
            print(f"D {key}: recall={res[key]['recall']} "
                  f"precision={res[key]['precision']}", flush=True)
    finally:
        spark.stop()


def phase_e(sf_dir: str, res: dict) -> None:
    from bigdata_electricity_spark.plans import REGISTRY

    spark = _session("certify-sf100f-substring")
    try:
        t0 = time.perf_counter()
        df = REGISTRY["dedup_substring_rolling"].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        res["substring_rolling"] = {"wall_sec": round(wall, 1),
                                    **_stage_bytes(spark)}
        print(f"E substring: {res['substring_rolling']}", flush=True)
    finally:
        spark.stop()


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = os.path.join(REPO, ".localdata", "sf100f")
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    full = "--full-exact" in args
    if full:
        args.remove("--full-exact")
    stride = 5000
    if "--stride" in args:
        i = args.index("--stride")
        stride = int(args[i + 1])
        del args[i : i + 2]
    phases = [a.upper() for a in args if a.upper() in "ABCDEV"] or list("ABCDE")
    res = _load(OUT)
    res["sf_dir"] = sf_dir
    for ph in phases:
        if ph == "A":
            phase_a(sf_dir, res, full=full, stride=stride)
        elif ph == "V":
            phase_v(sf_dir, res, stride=stride)
        elif ph == "B":
            _phase_lsh(sf_dir, res, "lsh_law", None, None)
        elif ph == "C":
            _phase_lsh(sf_dir, res, "lsh_r5", 50, 10)
        elif ph == "D":
            phase_d(sf_dir, res)
        elif ph == "E":
            phase_e(sf_dir, res)
        _save(res)
    print(json.dumps(res, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
