"""Per-seed merged-facts pipeline — the reference's actual deliverable.

The reference's end product is ONE row per input company: discovery → fetch →
extract → first-non-null merge across source tiers → terminal status
(brave_processor.py:231,316-323 builds the CSV row; google_search.py:72-95
runs the staged gap-driven enrichment; models.py:18-22 is the merge rule).
Spark-first composition of the already-verified pieces:

  seeds ──host──► documents(of that company's domain) ──F7-F11 battery──►
      per-seed first-non-null merge (hash aggregate, ordered by
      (tier/depth, doc_id)) ──► facts(seed_id, 5 fields, n_docs, status)

Everything is column expressions + one hash aggregate per seed — no window
(scales to any number of seeds), no UDF. The status taxonomy mirrors the
reference's terminal statuses (ALL_FIELDS_COMPLETE / PARTIAL_k_MISSING /
NO_FACTS_EXTRACTED / NO_RESULTS_FOUND, brave_parallel_processing.py:287-305).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bravewebcrawler_spark.functions import extract as X
from bravewebcrawler_spark.functions.canon import host_of_col
from bravewebcrawler_spark.operators.merge import first_non_null_per_key

FACT_FIELDS = ("che_id", "phone", "email", "founded", "address")


def battery_cols(text: F.Column) -> dict[str, F.Column]:
    """F7-F11 over a text column, with '' normalized to NULL (the reference
    treats empty extraction results as missing, models.py:14-16)."""
    raw = {
        "che_id": X.che_id_col(text),
        "phone": X.phone_col(text),
        "email": X.email_col(text),
        "founded": X.founded_year_col(text),
        "address": X.address_col(text),
    }
    return {k: F.when(v == "", F.lit(None)).otherwise(v).alias(k) for k, v in raw.items()}


def facts_status_col() -> F.Column:
    """Terminal status from the merged row's missing-field count."""
    missing = sum(F.col(f).isNull().cast("int") for f in FACT_FIELDS)
    return (
        F.when(missing == 0, F.lit("ALL_FIELDS_COMPLETE"))
        .when(missing == len(FACT_FIELDS), F.lit("NO_FACTS_EXTRACTED"))
        .otherwise(F.concat(F.lit("PARTIAL_"), missing.cast("string"), F.lit("_MISSING")))
    )


def merge_facts_per_seed(extracted: DataFrame, order: list) -> DataFrame:
    """Per-seed first-non-null merge of the battery fields in ``order``
    (earlier rows win per field — the set-level ``merge_with`` chain), plus
    the per-seed evidence count. One hash aggregate; no window."""
    merged = first_non_null_per_key(extracted, ["seed_id"], list(FACT_FIELDS), order)
    counts = extracted.groupBy("seed_id").agg(F.count("*").alias("n_docs"))
    return (
        merged.join(counts, "seed_id")
        .select("seed_id", *FACT_FIELDS, "n_docs", facts_status_col().alias("status"))
    )


def facts_per_seed_from_crawl(seeds: DataFrame, documents: DataFrame) -> DataFrame:
    """The end-to-end deliverable over crawl output.

    ``seeds``: (seed_id string, url string) — the input CSV analog; a seed's
    company domain is its URL's host. ``documents``: crawl output
    (doc_id = canonical url, round, spans). A seed's evidence set is every
    fetched page on its host; fields merge in (round, doc_id) order — the
    earliest-crawled page wins, which is the shallowest/highest-priority page
    by the crawl ordering contract. Seeds whose host yielded no documents get
    a NO_RESULTS_FOUND row (never silently dropped — K3).

    The seed side is tiny relative to the document corpus → broadcast join;
    the merge is a hash aggregate on seed_id.
    """
    seed_hosts = seeds.select(
        "seed_id", host_of_col(F.col("url")).alias("host")
    ).dropDuplicates(["seed_id"])
    text = F.concat_ws(
        " ",
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
    )
    docs = documents.select(
        F.col("doc_id"),
        F.col("round"),
        host_of_col(F.col("doc_id")).alias("host"),
        text.alias("text"),
    )
    evidence = docs.join(F.broadcast(seed_hosts), "host").select(
        "seed_id", "round", "doc_id", *battery_cols(F.col("text")).values()
    )
    merged = merge_facts_per_seed(evidence, [F.col("round"), F.col("doc_id")])
    missing = seed_hosts.join(merged.select("seed_id"), "seed_id", "left_anti").select(
        "seed_id",
        *[F.lit(None).cast("string").alias(f) for f in FACT_FIELDS],
        F.lit(0).cast("long").alias("n_docs"),
        F.lit("NO_RESULTS_FOUND").alias("status"),
    )
    return merged.unionByName(missing)
