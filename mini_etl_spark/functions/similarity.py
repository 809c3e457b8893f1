"""Similarity search over embedding columns.

Two tiers, as a scale story:

- ``cosine_topk`` — exact brute-force top-k: one JVM-side dot-product
  expression per row + ``orderBy(...).limit(k)``, which Catalyst executes as
  TakeOrderedAndProject (per-partition heap, no global sort). Linear scan —
  the correctness baseline and perfectly serviceable for one-off queries
  even at large N (it's a single pass).
- ``lsh_bucket_candidates`` / ``lsh_topk`` — random-hyperplane LSH: sign
  bits of ``num_planes`` fixed random projections form a bucket key; probing
  the query's bucket (plus optional multi-probe neighbors at hamming
  distance 1) reduces the scan to a bucket's worth of vectors. The scale
  path for repeated queries: bucket assignment is a one-time columnar pass,
  and the per-query scan touches ~N/2^planes rows.

Hyperplanes are generated from a seeded NumPy RNG on the driver (tiny:
planes × dim floats) and folded into the plan as literal arrays — no UDF,
no broadcast variable, fully deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(vec_col: Column, literal: Sequence[float]) -> Column:
    """<vec, literal> as a JVM expression: zip_with + aggregate."""
    lit_arr = F.array(*[F.lit(float(x)) for x in literal])
    return F.aggregate(
        F.zip_with(vec_col, lit_arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``. Deterministic
    tie-break on id. Output: (id, cosine) — cosine rounded to 4."""
    q = np.asarray(query, dtype="float64")
    qnorm = float(np.sqrt((q * q).sum()))
    if qnorm == 0:
        raise ValueError("cosine_topk: zero query vector")
    cos = F.round(_dot(F.col(vec_col), q.tolist()) / (_norm(F.col(vec_col)) * F.lit(qnorm)), 4)
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def random_hyperplanes(dim: int, num_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, unit-normalized rows."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    return planes / np.linalg.norm(planes, axis=1, keepdims=True)


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = sign bits of the projections, packed into a long."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        bit = F.when(_dot(vec_col, plane.tolist()) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, j))
    return bucket


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Attach the LSH bucket column (one columnar pass; persist/write the
    result once, query it many times). ``dim`` is read from the first row
    only if not given — pass it explicitly in production."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("with_lsh_buckets: empty DataFrame and no dim given")
        dim = first["d"]
    planes = random_hyperplanes(dim, num_planes, seed)
    return df.withColumn("lsh_bucket", lsh_bucket(F.col(vec_col), planes))


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket (plus, with
    ``multiprobe``, all buckets at hamming distance 1 — recovers most
    near-boundary misses for 1+num_planes× the scan).

    Recall is probabilistic; the differential test compares against
    ``cosine_topk`` for overlap. Precision of returned scores is exact
    (true cosine is computed for scanned rows).
    """
    q = np.asarray(query, dtype="float64")
    planes = random_hyperplanes(len(q), num_planes, seed)
    signs = (planes @ q >= 0).astype("int64")
    qbucket = int(sum(int(s) << j for j, s in enumerate(signs)))
    probe = [qbucket]
    if multiprobe:
        probe += [qbucket ^ (1 << j) for j in range(num_planes)]

    bucketed = with_lsh_buckets(df, vec_col, num_planes, seed, dim=len(q))
    candidates = bucketed.filter(F.col("lsh_bucket").isin(probe))
    return cosine_topk(candidates, query, k, vec_col, id_col)
