"""Adversarial hot-bucket benchmark for minhash_lsh_pairs.

Reproduces the round-1 scale-killer from SCALE_NOTES.md: a corpus whose
in-family near-copies sit at Jaccard ≈ 0.40-0.51 — *below* the 0.8
output threshold but *above* the fixed r=3 S-curve midpoint (≈ 0.40) —
so the legacy geometry floods the candidate stage and the exact-verify
join dominates. The hardened defaults (threshold-derived r=4 +
signature prefilter + exact pre-collapse) must keep the run in the
linear regime.

Two corpus modes:

* ``near`` — F families × C perturbed copies; every same-family pair is
  a sub-threshold near-copy. Tests the derived-r + prefilter guards
  (pre-collapse cannot help: no two texts are byte-identical).
* ``exact`` — F families × C byte-identical copies. Tests pre-collapse:
  the output is the full F·C·(C-1)/2 pair set at Jaccard 1.0, but the
  hardened path produces it by expansion, never sketching more than F
  distinct docs.

Usage::

    python scripts/adversarial_lsh_bench.py --families 5000 --copies 100
    python scripts/adversarial_lsh_bench.py --mode exact --quick

Emits one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from presto_rakam_kafka_spark.operators import dedup  # noqa: E402
from presto_rakam_kafka_spark.session import get_spark  # noqa: E402

BASE_TOKENS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four"
).split()


def build_corpus(spark, families: int, copies: int, mode: str):
    """Deterministic corpus, built distributed (no driver-side loop)."""
    import pyspark.sql.functions as F

    fam = spark.range(families).select(F.col("id").alias("fam"))
    cp = spark.range(copies).select(F.col("id").alias("cp"))
    rows = fam.crossJoin(cp).select(
        (F.col("fam") * copies + F.col("cp")).alias("doc_id"), "fam", "cp"
    )
    if mode == "exact":
        text = F.concat_ws(
            " ", *[F.concat(F.lit(t), F.col("fam")) for t in BASE_TOKENS]
        )
    else:
        # Replace 3 or 4 spaced-out positions (by family parity) with
        # copy-specific junk: same-family pairs share the untouched
        # base shingles -> pairwise J ~= 0.51 (3 repl) / 0.40 (4 repl).
        # EVERY token carries the family id so different families truly
        # share no shingles — the round-2 version suffixed only the
        # LAST token, which left the ~26 untouched base shingles shared
        # ACROSS families: all n²/2 cross-family pairs sat at J ≈ 0.45
        # (measured: 494M distinct candidates, max bucket 17k docs at
        # 50k docs), i.e. one giant near-dup cluster — a corpus no
        # banding geometry can make linear, not the documented
        # "families are the only near-copies" shape.
        positions = {3: (5, 12, 19), 4: (5, 12, 19, 26)}
        nrep = F.when(F.col("fam") % 2 == 0, 3).otherwise(4)
        parts = []
        for i, t in enumerate(BASE_TOKENS):
            is_repl = F.lit(i in positions[4]) & (
                (F.lit(i != 26)) | (nrep == 4)
            )
            parts.append(
                F.when(
                    is_repl,
                    F.concat(F.lit(f"j{i}x"), F.col("fam"), F.lit("c"), F.col("cp")),
                ).otherwise(F.concat(F.lit(t), F.col("fam")))
            )
        text = F.concat_ws(" ", *parts)
    return rows.select("doc_id", text.alias("text"))


def run_one(df, label: str, families: int, copies: int, **kwargs):
    t0 = time.time()
    n = dedup.minhash_lsh_pairs(df, "text", "doc_id", threshold=0.8, **kwargs).count()
    wall = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "config": label,
                "families": families,
                "copies": copies,
                "pairs_out": n,
                "wall_sec": wall,
                "kwargs": {k: v for k, v in kwargs.items()},
            }
        ),
        flush=True,
    )
    return n, wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=int, default=5000)
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--mode", choices=["near", "exact"], default="near")
    ap.add_argument("--quick", action="store_true", help="1/10 size smoke run")
    ap.add_argument(
        "--legacy", action="store_true",
        help="also run the round-1 geometry (r=3, no guards) for comparison",
    )
    args = ap.parse_args()
    families = args.families // 10 if args.quick else args.families
    spark = get_spark(app_name="adversarial_lsh")

    df = build_corpus(spark, families, args.copies, args.mode).cache()
    df.count()  # materialize so corpus build is excluded from timings

    expected = families * args.copies * (args.copies - 1) // 2 if args.mode == "exact" else 0
    n, _ = run_one(df, "hardened-defaults", families, args.copies)
    assert n == expected, f"expected {expected} pairs, got {n}"
    if args.legacy:
        run_one(
            df, "round1-geometry", families, args.copies,
            rows_per_band=3, pre_collapse=False, sig_prefilter=False,
        )
    df.unpersist()


if __name__ == "__main__":
    main()
