"""Blocked all-pairs cosine similarity — the scale path for exact
embedding near-dup detection (SURVEY.md §2.10 dedup_fuzzy / sim_search).

All-pairs distance is inherently O(n²·d); the engine question is only how
to arrange it. The relational form (self-join + per-pair expression) walks
a ~130-node expression tree interpreted per pair — measured 8 µs/pair.
This operator instead uses the blocked-GEMM arrangement every production
ANN/dedup system uses:

- assign each vector to one of ``n_blocks`` blocks;
- replicate each row to its (block_i, block_j) group pairs (i ≤ j) —
  shuffle volume O(n·n_blocks), NOT O(n²);
- per group, compute the block×block cosine matrix vectorized in numpy
  over Arrow-transferred batches (``applyInPandas``);
- emit only pairs above the threshold.

At 100 TB: ``n_blocks`` is sized so a block fits executor memory; groups
are independent shuffle partitions (embarrassingly parallel); the
threshold filter runs inside the kernel so only matches cross back to the
JVM. This is the sanctioned pandas-UDF case — the built-in operators
cannot express a vectorized inner loop.

Cross-engine bit-exactness (required by the DuckDB oracle): products are
computed in float64 and summed with ``np.cumsum`` along the vector axis —
a strict sequential left fold, the same IEEE operation order as Spark's
``F.aggregate`` and DuckDB's ``list_reduce``. Verified exact in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_allpairs_cosine(
    emb: DataFrame,
    *,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered pairs (vec_a < vec_b) with cosine ≥ threshold."""

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        left = pdf[pdf["role"] == 0]
        right = pdf[pdf["role"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        A = np.stack(left["vec"].to_numpy()).astype(np.float64)
        B = np.stack(right["vec"].to_numpy()).astype(np.float64)
        ida = left["vid"].to_numpy()
        idb = right["vid"].to_numpy()
        # norms: sequential left-fold via cumsum — bit-identical to the
        # engines' fold
        na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
        nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
        # Diagonal groups contain every within-block pair twice (once per
        # role orientation) → dedupe with a<b. Cross-block groups hold each
        # pair exactly once in arbitrary id order → keep all, emit as
        # (min, max). cos is bit-symmetric (IEEE multiply is commutative),
        # so orientation never changes the value.
        diag = bool(pdf["bi"].iat[0] == pdf["bj"].iat[0])
        out_a, out_b, out_c = [], [], []
        for i in range(A.shape[0]):
            dots = np.cumsum(A[i] * B, axis=1)[:, -1]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = dots / (na[i] * nb)
            # zero-norm vectors give NaN cosine: excluded explicitly (the
            # matching oracle carries norm>0 guards — engines disagree on
            # NaN ordering, so the semantics must exclude degenerates)
            mask = np.isfinite(cos) & (cos >= threshold)
            if diag:
                mask &= ida[i] < idb
            if mask.any():
                lo = np.minimum(ida[i], idb[mask])
                hi = np.maximum(ida[i], idb[mask])
                out_a.append(lo)
                out_b.append(hi)
                out_c.append(cos[mask])
        if not out_a:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
            )
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_c),
            }
        )

    blk = F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int")
    base = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), blk.alias("blk")
    )
    # role 0 = left side of every group (own_block, q ≥ own_block);
    # role 1 = right side of every group (p ≤ own_block, own_block)
    left = base.select(
        "vid",
        "vec",
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("bj"),
        F.lit(0).alias("role"),
    )
    right = base.select(
        "vid",
        "vec",
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit(1).alias("role"),
    )
    both = left.unionByName(right)
    return both.groupBy("bi", "bj").applyInPandas(
        kernel, schema="vec_a long, vec_b long, cos_sim double"
    )
