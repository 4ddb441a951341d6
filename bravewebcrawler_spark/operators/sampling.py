"""Deterministic stratified sampling — the data-mixing step of a corpus
pipeline (upsample low-resource languages, downsample the dominant one,
hold per-source quotas).

The reference has no sampling stage (it processes every input row once,
SURVEY.md §2.4); at 100 TB the mixing step runs over the whole corpus, so the
two variants here are chosen by their shuffle profile:

  hash-rate  keep row iff u(id) < rate(stratum), u = md5-60bit(id) / 2^60.
             MAP-ONLY: no shuffle, no state, no RNG — the 100-TB path.
             Deterministic (same id ⇒ same draw across runs/retries), which
             also makes re-sampling at a higher rate a SUPERSET of the lower
             rate (u is fixed per row) — the property incremental corpus
             re-mixes rely on.
  exact-quota rank rows inside each stratum by (u, id) and keep the first
             quota(stratum). One shuffle on the stratum key; a dominant
             stratum is a skew key, so this is the small-stratum /
             verification variant (the hash draw above needs no quota
             bookkeeping and is what survives at scale).

Both use the portable md5-60bit hash (functions/text.py) so the DuckDB
oracle computes bit-identical draws: u is an exact integer divided by 2^60
in IEEE double on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bravewebcrawler_spark.functions.text import portable_hash64

_TWO_POW_60 = float(1 << 60)  # exact in double


def _uniform_col(id_col: str) -> Column:
    """Deterministic u(id) ∈ [0, 1): portable hash / 2^60 (exact-int ÷
    power-of-two ⇒ the same double in Spark, DuckDB and Python)."""
    return portable_hash64(F.col(id_col).cast("string")) / F.lit(_TWO_POW_60)


def stratified_sample_hash(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff u(id) < rate(stratum) — map-only Bernoulli mixing.

    ``rates`` becomes a literal CASE/map inside the scan's codegen stage
    (never a join); strata missing from ``rates`` fall back to
    ``default_rate`` (``try_element_at`` — ANSI mode would otherwise throw
    on the missing key).
    """
    rate_map = F.create_map(
        *[F.lit(v) for k in sorted(rates) for v in (k, float(rates[k]))]
    )
    rate = F.coalesce(
        F.try_element_at(rate_map, F.col(stratum_col)), F.lit(float(default_rate))
    )
    return df.where(_uniform_col(id_col) < rate)


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
) -> DataFrame:
    """Exactly quota(stratum) rows per stratum: rank by (u(id), id) inside
    the stratum and keep rank <= quota. The (u, id) order makes the pick a
    deterministic uniform draw AND a superset-chain across growing quotas.

    One shuffle on ``stratum_col``; adds a ``sample_rank`` column (1-based).
    """
    quota_map = F.create_map(
        *[F.lit(v) for k in sorted(quotas) for v in (k, int(quotas[k]))]
    )
    quota = F.coalesce(
        F.try_element_at(quota_map, F.col(stratum_col)), F.lit(int(default_quota))
    )
    w = Window.partitionBy(stratum_col).orderBy(_uniform_col(id_col), F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= quota)
    )
