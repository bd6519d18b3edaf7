"""Engine-portable hashing + text primitives.

Every sketch operator in :mod:`..operators` (MinHash-LSH, SimHash,
fingerprints) needs hash functions that are **bit-identical across
Spark and the DuckDB oracle**, or the correctness gate can't check
them. Neither engine's native 64-bit hash matches the other
(Spark ``xxhash64`` vs DuckDB murmur ``hash``), but both implement
``md5`` over UTF-8 bytes identically, so the portable base hash is:

    h(s) = int(md5(s)[:15 hex chars], 16)          # 60 bits, fits BIGINT

* Spark : ``cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)``
* DuckDB: ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``

Seeded hash families for MinHash are universal hashes over that base:
``h_i(s) = (a_i * (h(s) mod P) + b_i) mod P`` with ``P = 1e9+7`` —
the multiply stays under 2^62, no BIGINT overflow in either engine.

Each helper returns a **pair** (Spark SQL expression string, DuckDB SQL
expression string) over a named input column, so a query and its oracle
are generated from the same source of truth.

md5 is used as a *deterministic mixer*, not for security.
"""

from __future__ import annotations

import numpy as np

#: Modulus for the universal hash family: largest common prime
#: comfortably under 2^30 so a*h + b stays within int64.
HASH_P = 1_000_000_007

#: Seed for every derived constant in this module. Changing it changes
#: all sketches (and their oracles) consistently.
SEED = 42


def base_hash_spark(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


def base_hash_duckdb(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_coefficients(num_hashes: int, seed: int = SEED) -> tuple[list[int], list[int]]:
    """(a_i, b_i) for the universal hash family, deterministic in seed."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, HASH_P, size=num_hashes).tolist()
    b = rng.integers(0, HASH_P, size=num_hashes).tolist()
    return a, b


def hyperplanes(num_planes: int, dim: int, seed: int = SEED) -> list[list[float]]:
    """Random-hyperplane LSH projections (sign-of-dot bucketing),
    deterministic in seed; values rounded so the literal embedded in
    Spark exprs and DuckDB SQL is the exact same double."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    return [[round(float(v), 6) for v in row] for row in planes]


# ---------------------------------------------------------------------
# Tokenization / shingling (precondition: documents have >= 3 tokens,
# single-space separated — holds for the fixture corpus, min 10 tokens)
# ---------------------------------------------------------------------


def tokens_spark(col: str) -> str:
    return f"split({col}, ' ')"


def tokens_duckdb(col: str) -> str:
    return f"string_split({col}, ' ')"


def shingles_spark(col: str, n: int = 3) -> str:
    """Distinct word n-gram shingles as an array<string>.

    Docs with fewer than ``n`` tokens (or NULL text, where ``size`` is
    -1) yield an empty array: unguarded, ``sequence(1, size-2)`` counts
    *down* to 0 and ``slice`` rejects start=0. DuckDB's ``range(1, x)``
    is already empty for x ≤ 1, so the oracle needs no guard."""
    w = tokens_spark(col)
    return (
        f"if(size({w}) >= {n},"
        f" array_distinct(transform(sequence(1, size({w}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({w}, i, {n})))),"
        f" array())"
    )


def shingles_duckdb(col: str, n: int = 3) -> str:
    w = tokens_duckdb(col)
    return (
        f"list_distinct(list_transform(range(1, len({w}) - {n - 2}),"
        f" i -> array_to_string({w}[i:i+{n - 1}], ' ')))"
    )


def jaccard_spark(a: str, b: str) -> str:
    # cast: Spark `int * 1.0 / int` is DECIMAL while DuckDB's is DOUBLE;
    # the oracle hash compares rendered values, so align the type here.
    return (
        f"cast(size(array_intersect({a}, {b})) * 1.0 /"
        f" (size({a}) + size({b}) - size(array_intersect({a}, {b}))) as double)"
    )


def jaccard_duckdb(a: str, b: str) -> str:
    return (
        f"len(list_intersect({a}, {b})) * 1.0 /"
        f" (len({a}) + len({b}) - len(list_intersect({a}, {b})))"
    )
