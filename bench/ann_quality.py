"""ANN quality benchmark (round-6): recall@10 and scan fraction for the
lsh / ivf / ivf-pq paths vs brute_force_topk on the sf embeddings table.

Usage: python bench/ann_quality.py [sf_dir] [n_queries]
Prints a markdown table (recorded in BENCH/BASELINE.md §ANN quality).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_Q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
K = 10


def main() -> None:
    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from orc_haskell_spark.pipeline import pq, similarity

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.warehouse.dir",
                     "/tmp/ohs_ann_quality_wh")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_rows = emb.count()
    dim = emb.select(F.size("embedding")).first()[0]
    qrows = (emb.orderBy("vec_id").limit(N_Q)
             .select("vec_id", "embedding").collect())
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]])
               for r in qrows]
    print(f"corpus rows={n_rows} dim={dim} queries={N_Q} k={K}\n")

    truth = {}
    t0 = time.time()
    for qid, qv in queries:
        truth[qid] = [r[0] for r in similarity.brute_force_topk(
            emb, "vec_id", "embedding", qv, K).collect()]
    brute_wall = (time.time() - t0) / N_Q

    rows_out = []

    def measure(label, topk_fn, scanned_fn):
        t0 = time.time()
        rec = 0.0
        for qid, qv in queries:
            got = [r[0] for r in topk_fn(qv).collect()]
            rec += len(set(got) & set(truth[qid])) / K
        wall = (time.time() - t0) / N_Q
        frac = sum(scanned_fn(qv) for _, qv in queries) / N_Q / n_rows
        rows_out.append((label, rec / N_Q, frac, wall))
        print(f"  {label:28s} recall@10={rec / N_Q:.3f} "
              f"scan_frac={frac:.3f} wall/query={wall:.2f}s")

    # LSH (signature recomputed per query — the one-shot shape)
    for bits in (6, 8, 10):
        planes = similarity.hyperplanes(dim, bits)

        def scanned(qv, planes=planes, bits=bits):
            qsig = int(sum((1 << i) for i, p in enumerate(planes)
                           if similarity.sum_l2r(p, qv) > 0))
            ws = emb.withColumn(
                "_sig", similarity._signature("embedding", planes))
            return ws.filter(F.bit_count(
                F.col("_sig").bitwiseXOR(F.lit(qsig))) <= 1).count()

        measure(f"lsh bits={bits} radius=1",
                lambda qv, b=bits: similarity.lsh_topk(
                    emb, "vec_id", "embedding", qv, K, bits=b),
                scanned)

    # IVF (first_rows quantizer, the oracle-checkable config)
    cent = similarity.ivf_first_rows_centroids(emb, "vec_id",
                                               "embedding", 16)
    for n_probe in (1, 4, 8):
        def scanned(qv, n_probe=n_probe):
            qn = pq._normalize_l2r(qv)
            dots = np.array([similarity.sum_l2r(c, qn) for c in cent])
            probe = np.argsort(-dots, kind="stable")[:n_probe].tolist()
            a = emb.withColumn(
                "_list", similarity._list_assignment("embedding", cent))
            return a.filter(F.col("_list").isin(probe)).count()

        measure(f"ivf lists=16 probe={n_probe}",
                lambda qv, p=n_probe: similarity.ivf_topk(
                    emb, "vec_id", "embedding", qv, K, n_lists=16,
                    n_probe=p, centroid_mode="first_rows"),
                scanned)

    # IVF-PQ persisted index (serving shape; scan reads codes only)
    pq.write_ivfpq_index(emb, "ohs_annq_ivfpq", "vec_id", "embedding",
                         n_lists=16, m=4, ksub=16)
    for n_probe in (1, 4, 8):
        def scanned(qv, n_probe=n_probe):
            rows = spark.table("ohs_annq_ivfpq_centroids") \
                .orderBy("list_id").collect()
            qn = pq._normalize_l2r(qv)
            dots = np.array([similarity.sum_l2r(r["centroid"], qn)
                             for r in rows])
            probe = [int(x) for x in
                     np.argsort(-dots, kind="stable")[:n_probe]]
            return spark.table("ohs_annq_ivfpq") \
                .filter(F.col("_list").isin(probe)).count()

        measure(f"ivfpq lists=16 m=4 probe={n_probe}",
                lambda qv, p=n_probe: pq.query_ivfpq_index(
                    spark, "ohs_annq_ivfpq", qv, K, n_probe=p),
                scanned)

    print(f"\nbrute force wall/query: {brute_wall:.2f}s (recall 1.0, "
          f"scan_frac 1.0)")
    print("\n| method | recall@10 | rows scanned | wall/query |")
    print("|---|---|---|---|")
    print(f"| brute force | 1.000 | 1.000 | {brute_wall:.2f}s |")
    for label, rec, frac, wall in rows_out:
        print(f"| {label} | {rec:.3f} | {frac:.3f} | {wall:.2f}s |")
    spark.stop()


if __name__ == "__main__":
    main()
