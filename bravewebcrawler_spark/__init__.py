"""bravewebcrawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of the
reference crawler (ClaudioLutz/BraveWebCrawler, surveyed in SURVEY.md): URL
discovery/canonicalization, candidate ranking, politeness scheduling, dedup
against a URL-seen set, fetch+parse into interleaved text/media span arrays, and
first-non-null fact merging — re-expressed as Spark DataFrame plans with
vectorized Arrow/pandas UDFs only where built-ins can't express the semantics.

Layout:
    functions/   column-level building blocks (canonicalization, regex battery,
                 text analysis, portable hashing)
    sources/     synthetic deterministic web + table IO seam
    operators/   ranking, dedup (exact/minhash/simhash/jaccard), similarity
                 search, merge, politeness, bloom seen-set, multimodal plumbing
    plans/       crawl round micro-batch, driver loop, checkpoint/resume
    streaming/   Structured Streaming variants (windowed event aggregation)
    oracle/      sequential reference-semantics crawler (correctness ground truth)
"""

__version__ = "0.1.0"
