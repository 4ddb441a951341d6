"""Deduplication operators for training-data pipelines at corpus scale.

The reference dedups implicitly (each input row processed once,
SURVEY.md §2.4 A6); a 100 TB corpus needs the full ladder:

  exact           hash-groupBy on md5(text)
  n-gram Jaccard  shingle explode → self-equi-join → pair aggregate
  MinHash + LSH   portable minhash signatures → band buckets → bucket join
  SimHash         per-bit token-hash vote → bucket on the signature
  embedding       cosine near-dup (operators/similarity.py)

Everything is expressed with built-in DataFrame ops (explode / groupBy /
join) — shuffles land on shingle/band/bucket keys, partial aggregation is
map-side, and no Python runs per row. All hashes are the portable md5-derived
construction (functions/text.py) so every operator has an exact DuckDB oracle
twin in __spark_entry__.oracle_sql.

Scale notes: shingle explode multiplies rows by ~tokens-per-doc — at 100 TB
the LSH path (fixed 16-value signature per doc, then tiny band keys) is the
one that survives; the full-pair Jaccard join exists for small/verification
scale and as the LSH refinement step on candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bravewebcrawler_spark.functions.text import portable_hash64, tokens_col

MINHASH_P = 1_000_000_007
NUM_HASHES = 16
NUM_BANDS = 4  # 4 rows per band


def _hash_a(j: int) -> int:
    return 2 * j + 3


def _hash_b(j: int) -> int:
    return 5 * j + 7


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: (keeper_id, n_dups) per distinct text hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def shingles_col(text_col, k: int = 3):
    """k-word shingles from whitespace tokens (join with single spaces)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )).otherwise(F.array().cast("array<string>"))


def sql_shingles(expr: str, k: int = 3) -> str:
    toks = f"list_filter(string_split({expr}, ' '), t -> t <> '')"
    return (
        f"case when len({toks}) >= {k} then "
        f"list_transform(range(1, len({toks}) - {k - 2}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')) "
        f"else [] end"
    )


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str, k: int = 3, threshold: float = 0.5) -> DataFrame:
    """n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= threshold).

    shingle-set explode → self-equi-join on shingle → per-pair intersection
    count vs set sizes. Equi-join (never theta); the shuffle key is the
    shingle, so hot shingles are the skew risk — AQE skew-join handles it.
    """
    sh = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(shingles_col(F.col(text_col), k))).alias("sh"))
    )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _tokens_py(txt: str | None) -> list[str]:
    """Python twin of functions.text.tokens_col — split on single spaces,
    drop empty tokens. Identical token lists by construction."""
    return [t for t in (txt or "").split(" ") if t]


def _shingle_hash_fn(k: int):
    """mapInArrow body for :func:`hashed_shingles`: per doc, the 60-bit md5
    hash of each distinct k-shingle. hashlib.md5 == Spark md5 == DuckDB md5
    (same algorithm over the same UTF-8 bytes), and
    int(hexdigest[:15], 16) == conv(substring(md5(s),1,15),16,10)."""

    def run(batches):
        import hashlib

        import pyarrow as pa

        for batch in batches:
            ids = batch.column("doc").to_pylist()
            texts = batch.column("text").to_pylist()
            out_d: list[int] = []
            out_h: list[int] = []
            ap_d, ap_h = out_d.append, out_h.append
            md5 = hashlib.md5
            for d, txt in zip(ids, texts):
                toks = _tokens_py(txt)
                n = len(toks)
                if n < k:
                    continue
                seen: set[str] = set()
                add = seen.add
                for i in range(n - k + 1):
                    s = " ".join(toks[i : i + k])
                    if s not in seen:
                        add(s)
                        ap_d(d)
                        ap_h(int(md5(s.encode("utf-8")).hexdigest()[:15], 16))
            if out_d:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_d, pa.int64()), pa.array(out_h, pa.int64())],
                    names=["doc", "H"],
                )

    return run


def _shingle_hash_array_fn(k: int):
    """mapInArrow body for :func:`shingle_hash_arrays`: per doc, the full
    DISTINCT shingle-hash set as ONE list<int64> cell (same 60-bit md5
    values as :func:`hashed_shingles`, grouped per doc inside the batch so
    no groupBy shuffle is ever needed to reassemble the set)."""

    def run(batches):
        import hashlib

        import pyarrow as pa

        for batch in batches:
            ids = batch.column("doc").to_pylist()
            texts = batch.column("text").to_pylist()
            out_d: list[int] = []
            out_hs: list[list[int]] = []
            md5 = hashlib.md5
            for d, txt in zip(ids, texts):
                toks = _tokens_py(txt)
                n = len(toks)
                if n < k:
                    out_d.append(d)
                    out_hs.append([])
                    continue
                seen: set[int] = set()
                add = seen.add
                for i in range(n - k + 1):
                    add(int(md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()[:15], 16))
                out_d.append(d)
                out_hs.append(list(seen))
            if out_d:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_d, pa.int64()), pa.array(out_hs, pa.list_(pa.int64()))],
                    names=["doc", "hs"],
                )

    return run


def _shingle_string_fn(k: int):
    """mapInArrow body for :func:`exploded_shingle_strings`: per doc, one row
    per DISTINCT k-shingle carrying the shingle STRING and its portable
    60-bit hash (same int(md5[:15],16) construction as everywhere else)."""

    def run(batches):
        import hashlib

        import pyarrow as pa

        for batch in batches:
            ids = batch.column("doc").to_pylist()
            texts = batch.column("text").to_pylist()
            out_d: list[int] = []
            out_s: list[str] = []
            out_h: list[int] = []
            md5 = hashlib.md5
            for d, txt in zip(ids, texts):
                toks = _tokens_py(txt)
                n = len(toks)
                if n < k:
                    continue
                seen: set[str] = set()
                add = seen.add
                for i in range(n - k + 1):
                    s = " ".join(toks[i : i + k])
                    if s not in seen:
                        add(s)
                        out_d.append(d)
                        out_s.append(s)
                        out_h.append(int(md5(s.encode("utf-8")).hexdigest()[:15], 16))
            if out_d:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_d, pa.int64()), pa.array(out_s, pa.string()), pa.array(out_h, pa.int64())],
                    names=["doc", "sh", "shh"],
                )

    return run


def exploded_shingle_strings(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, sh, shh) — one row per DISTINCT k-shingle per doc with both the
    string (for collision-proof confirms / audit examples) and its portable
    hash, from one Arrow-batched pass. Equals
    ``explode(array_distinct(shingles_col)) + portable_hash64`` row-for-row;
    exists because the column-expression shingle build steps an interpreted
    HOF lambda per element (guide §4.2 — decontamination over the corpus
    measured the HOF pass at ~25 µs/shingle vs ~1 µs in batched Python)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("text")
    ).mapInArrow(_shingle_string_fn(k), "doc long, sh string, shh long")


def shingle_hash_arrays(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, hs: array<long>) — each doc's DISTINCT shingle-hash set as one
    array cell, from a single Arrow-batched pass (guide §4.2). The row-per-
    shingle twin is :func:`hashed_shingles`; this form exists for consumers
    that need whole sets per doc (exact-Jaccard refinement): set size is
    ``size(hs)`` and the intersection count is ``size(array_intersect)`` —
    no explode, no groupBy, no shingle-level shuffle at all."""
    return df.select(
        F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("text")
    ).mapInArrow(_shingle_hash_array_fn(k), "doc long, hs array<long>")


def hashed_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, H) — the portable 60-bit hash of each DISTINCT k-shingle per doc.

    The ONE pass over the text that every shingle-based operator can share:
    set sizes and intersection counts derive from it, so everything
    downstream shuffles 16-byte (doc, long) rows instead of shingle strings.

    Round-6: the pass runs as an Arrow-batched Python transform
    (optimization guide §4.2). The previous column-expression form
    (transform/slice/array_join + md5 per shingle) evaluated its
    higher-order-function lambdas per ELEMENT outside whole-stage codegen —
    measured ~79 core-seconds for the sf1.0 corpus's 3.2M shingles (~25 µs
    per shingle); the same work as a Python loop over Arrow batches with C
    ``hashlib.md5`` is ~7 core-seconds. Values are bit-identical (same md5
    over the same UTF-8 bytes, same hex-prefix integer), pytest/oracle
    checked, and only (doc, text) crosses the boundary.
    """
    return df.select(
        F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("text")
    ).mapInArrow(_shingle_hash_fn(k), "doc long, H long")


def _minhash_sig_fn(k: int):
    """mapInArrow body for the direct signature pass: per doc, the 16
    minhash values over its distinct shingle-hash set, computed with one
    NumPy segment-min per hash function. Exact integer math: h < P and
    a_j <= 35 keep a_j*h + b_j < 2^63, so int64 never wraps; min over the
    distinct set equals min over all occurrences; distinct-ness taken on the
    hash values is min-equivalent to distinct-ness on the shingle strings
    (a 60-bit collision merges equal values, which cannot change a min)."""

    def run(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        coeffs = [(2 * j + 3, 5 * j + 7) for j in range(NUM_HASHES)]
        for batch in batches:
            ids = batch.column("doc").to_pylist()
            texts = batch.column("text").to_pylist()
            doc_out: list[int] = []
            counts: list[int] = []
            flat: list[int] = []
            md5 = hashlib.md5
            for d, txt in zip(ids, texts):
                toks = _tokens_py(txt)
                n = len(toks)
                if n < k:
                    continue
                hs: set[int] = set()
                add = hs.add
                for i in range(n - k + 1):
                    s = " ".join(toks[i : i + k])
                    add(int(md5(s.encode("utf-8")).hexdigest()[:15], 16) % MINHASH_P)
                doc_out.append(d)
                counts.append(len(hs))
                flat.extend(hs)
            if not doc_out:
                continue
            H = np.array(flat, dtype=np.int64)
            offs = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=offs[1:])
            cols = [
                pa.array(np.minimum.reduceat((H * a + b) % MINHASH_P, offs), pa.int64())
                for a, b in coeffs
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_out, pa.int64()), *cols],
                names=["doc", *[f"m{j}" for j in range(NUM_HASHES)]],
            )

    return run


def _sig_and_array_fn(k: int):
    """mapInArrow body for :func:`minhash_sig_and_arrays`: per doc, BOTH the
    distinct raw shingle-hash set (one list<int64> cell, as
    :func:`_shingle_hash_array_fn`) and the 16 minhash minima (as
    :func:`_minhash_sig_fn`) from a single shingling of the text. Minima are
    taken over the raw set reduced mod P — the same values as the
    set-of-mod-P construction because a mod-P collision merges equal
    values, which cannot change a min. Docs with no shingles (< k tokens)
    emit an empty set and NULL minima (the signature pass emitted no row
    for them; callers filter on ``size(hs) > 0`` to recover that row set
    exactly)."""

    def run(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        coeffs = [(2 * j + 3, 5 * j + 7) for j in range(NUM_HASHES)]
        for batch in batches:
            ids = batch.column("doc").to_pylist()
            texts = batch.column("text").to_pylist()
            out_d: list[int] = []
            out_hs: list[list[int]] = []
            counts: list[int] = []
            flat: list[int] = []
            sig_rows: list[int] = []  # indices into out_d that have shingles
            md5 = hashlib.md5
            for d, txt in zip(ids, texts):
                toks = _tokens_py(txt)
                n = len(toks)
                out_d.append(d)
                if n < k:
                    out_hs.append([])
                    continue
                seen: set[int] = set()
                add = seen.add
                for i in range(n - k + 1):
                    add(int(md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()[:15], 16))
                out_hs.append(list(seen))
                sig_rows.append(len(out_d) - 1)
                counts.append(len(seen))
                flat.extend(seen)
            if not out_d:
                continue
            mcols: list[list] = []
            if sig_rows:
                H = np.array(flat, dtype=np.int64) % MINHASH_P
                offs = np.zeros(len(counts), dtype=np.int64)
                np.cumsum(counts[:-1], out=offs[1:])
                for a, b in coeffs:
                    mins = np.minimum.reduceat((H * a + b) % MINHASH_P, offs)
                    col: list = [None] * len(out_d)
                    for pos, v in zip(sig_rows, mins):
                        col[pos] = int(v)
                    mcols.append(col)
            else:
                mcols = [[None] * len(out_d) for _ in coeffs]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_d, pa.int64()),
                    pa.array(out_hs, pa.list_(pa.int64())),
                    *[pa.array(c, pa.int64()) for c in mcols],
                ],
                names=["doc", "hs", *[f"m{j}" for j in range(NUM_HASHES)]],
            )

    return run


def minhash_sig_and_arrays(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, hs, m0..m15) — the shingle-hash SET and the minhash signature
    from ONE Arrow pass over the corpus. The refined-dedup chain consumes
    both (candidates from the signature bands, exact Jaccard from the
    sets); computing them together halves the Python passes over the text
    (:func:`_sig_and_array_fn` for the value-equality argument)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("text")
    ).mapInArrow(
        _sig_and_array_fn(k),
        "doc long, hs array<long>, " + ", ".join(f"m{j} long" for j in range(NUM_HASHES)),
    )


def minhash_signature_cols(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, shingle_hashes: DataFrame | None = None
) -> DataFrame:
    """Per-doc minhash signature as NUM_HASHES columns:
    h_j(s) = (a_j * H(s) + b_j) mod P with H the portable 60-bit hash reduced
    mod P; a_j <= 2*NUM_HASHES+3 keeps a_j*H < 2^63 (ANSI-safe).

    Round-6 default path: ONE Arrow-batched Python pass over (doc, text)
    computes shingle hashes and all 16 per-doc minima in place
    (:func:`_minhash_sig_fn`) — each task's batch holds complete docs, so no
    shuffle happens at all before the (doc, 16 longs) signature rows exist
    (the former explode → 16-way min hash-aggregate measured ~53
    core-seconds at sf1.0 for the aggregate alone, on top of a ~79
    core-second shingle pass). Pass ``shingle_hashes`` (a
    :func:`hashed_shingles` result, possibly persisted) to derive the
    signature from an existing hash table instead — same values either way
    (min over the distinct shingle set equals min over all occurrences).
    """
    if shingle_hashes is None:
        return df.select(
            F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("text")
        ).mapInArrow(
            _minhash_sig_fn(k),
            "doc long, " + ", ".join(f"m{j} long" for j in range(NUM_HASHES)),
        )
    sh = shingle_hashes.select("doc", (F.col("H") % MINHASH_P).alias("h"))
    aggs = [
        F.min((F.col("h") * (2 * j + 3) + (5 * j + 7)) % MINHASH_P).alias(f"m{j}")
        for j in range(NUM_HASHES)
    ]
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    shingle_hashes: DataFrame | None = None,
    cache_registry: list | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH candidate pairs: signature → band keys → bucket equi-join.

    The scale path: per doc only NUM_HASHES values survive; candidate
    generation shuffles on small (band, band_key) keys. Pairs are distinct
    (id_a < id_b); refinement (true Jaccard on candidates) is jaccard_pairs
    restricted to these pairs. ``shingle_hashes`` is forwarded to
    :func:`minhash_signature_cols`.

    Band rows come from ONE signature aggregate + an explode of the 4
    per-band key structs — NOT a 4-way union of projections, which (with the
    2 self-join sides) re-ran the whole scan→shingle→md5→16-min-agg pipeline
    8x (measured: 24 parquet scans, 0 reused exchanges in the executed
    plan). With ``cache_registry`` the tiny banded table (4 rows x 20 bytes
    per doc) is persisted so the self-join reads it twice from memory —
    signature work runs exactly once; without a registry the explode alone
    still cuts the recompute to 2x.
    """
    from pyspark import StorageLevel

    rows_per_band = NUM_HASHES // NUM_BANDS
    # ``signatures``: a precomputed (doc, m0..m15) table (e.g. the shared
    # pass of minhash_sig_and_arrays) — identical values to the direct pass
    # by construction, forwarded by lsh_refined_pairs so the corpus is
    # shingled once, not twice.
    sig = (
        signatures
        if signatures is not None
        else minhash_signature_cols(df, id_col, text_col, k, shingle_hashes=shingle_hashes)
    )

    def band_key(band: int):
        key = F.lit(0).cast("long")
        for r in range(rows_per_band):
            key = (key * 31 + F.col(f"m{band * rows_per_band + r}")) % MINHASH_P
        return key

    banded = sig.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(F.lit(band).alias("band"), band_key(band).alias("band_key"))
                for band in range(NUM_BANDS)
            ])
        ).alias("bk"),
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    if cache_registry is not None:
        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.append(banded)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def lsh_refined_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, threshold: float = 0.6,
    cache_registry: list | None = None,
) -> DataFrame:
    """The 100-TB dedup composition: MinHash+LSH candidate generation, exact
    Jaccard refinement computed ONLY on the candidate pairs.

    The full-corpus shingle self-join (jaccard_pairs) is quadratic in hot
    shingles; here the expensive exact step touches only |candidates| pairs —
    the intersection count joins shingles through the candidate pair list
    instead of shingle-vs-shingle — and size-ratio pruning drops candidate
    pairs that provably cannot reach the threshold (J <= min_sz/max_sz)
    before the intersection join runs.

    Two Arrow-batched Python passes over the corpus (round-6): the direct
    signature pass (shingle → 16 minima inside one batch, no shuffle) and a
    per-doc DISTINCT shingle-hash ARRAY pass (:func:`shingle_hash_arrays`,
    semi-joined to candidate endpoints and persisted). The refinement is
    then two equi-joins of the pair list against the array table plus
    ``size(array_intersect)`` per surviving pair — the former shape
    (explode the hash sets, join pairs through (doc, H) rows, re-aggregate)
    shuffled every exploded (pair, H) row; this one shuffles each candidate
    doc's set exactly once as one array cell, and the intersection runs as a
    codegen'd JVM set-op per pair. Set sizes fall out as ``size(hs)``, so
    the separate size aggregate is gone too. Jaccard on 60-bit shingle
    hashes equals Jaccard on the shingle sets themselves absent a 60-bit
    collision inside a candidate pair (~|set|^2 / 2^60) — and the DuckDB
    oracle hashes identically, so parity is exact by construction either
    way.
    """
    from pyspark import StorageLevel

    # ONE Python pass over the corpus computes BOTH the signature (candidate
    # generation) and the shingle-hash sets (exact refinement) —
    # minhash_sig_and_arrays — persisted because the banded build, the
    # endpoint unions, and both refinement join sides all read it. Pass
    # ``cache_registry`` to take ownership of the release (unpersist after
    # the result is fully consumed); without it Spark's ContextCleaner
    # unpersists once the consumed plan is garbage-collected.
    both = minhash_sig_and_arrays(df, id_col, text_col, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # size(hs) > 0 recovers exactly the row set the direct signature pass
    # emits (it skips shingle-less docs; the combined pass NULL-pads them)
    sig = both.where(F.size("hs") > 0).select("doc", *[f"m{j}" for j in range(NUM_HASHES)])
    cand = minhash_lsh_pairs(
        df, id_col, text_col, k, cache_registry=cache_registry, signatures=sig
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cand_docs = cand.select(F.col("id_a").alias("doc")).unionByName(
        cand.select(F.col("id_b").alias("doc"))
    ).distinct()
    arrs = both.select("doc", "hs").join(cand_docs, "doc", "left_semi")
    if cache_registry is not None:
        cache_registry.extend((both, cand))
    a = arrs.select(F.col("doc").alias("id_a"), F.col("hs").alias("hs_a"))
    b = arrs.select(F.col("doc").alias("id_b"), F.col("hs").alias("hs_b"))
    # Size-ratio candidate pruning: J(A,B) = |∩|/|∪| <= min(|A|,|B|)/max(|A|,|B|),
    # so a pair whose set-size ratio cannot reach the threshold cannot pass the
    # Jaccard filter either — drop it BEFORE the per-pair intersection runs.
    # The margin covers the 4-decimal output rounding (a pair at true
    # J = threshold - 0.00005 still rounds up to threshold) plus float slack,
    # so pruning can never change the result set.
    prune_t = threshold - 0.000051
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "hs_a",
            "hs_b",
            F.size("hs_a").alias("sz_a"),
            F.size("hs_b").alias("sz_b"),
        )
        .where(F.least("sz_a", "sz_b") >= F.lit(prune_t) * F.greatest("sz_a", "sz_b"))
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_cluster_tables(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.6,
    components: DataFrame | None = None,
    cache_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(components, roster) for the LSH-refined duplicate-cluster pipeline.

    ``components`` is the per-doc cluster map ``(node, comp)``; ``roster``
    is the keep-one view ``(doc_id, n_members)`` derived from it. A pipeline
    that needs BOTH (write the cluster map, write the deduplicated roster)
    passes the already-computed ``components`` table back in and the whole
    pairs+connected-components chain runs ONCE instead of once per view
    (round-5 verdict #6 — the two registry rows each cost the full chain
    when self-contained). ``components=None`` computes the chain here:
    lsh_refined_pairs → connected_components, identical to the registry
    queries' own composition; tests/test_components.py proves the reuse
    path row-for-row equal to the self-contained one.
    """
    if components is None:
        pairs = lsh_refined_pairs(
            corpus, id_col, text_col, k=k, threshold=threshold, cache_registry=cache_registry
        )
        components = connected_components(
            pairs, corpus, id_col=id_col, cache_registry=cache_registry
        )
    roster = components.groupBy(F.col("comp").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return components, roster


def simhash_col(text_col, bits: int = 16):
    """SimHash over whitespace tokens: bit b is the sign of the per-bit vote
    sum across token hashes. Composed per-bit from array folds (built-ins)."""
    hashed = F.transform(tokens_col(text_col), lambda t: portable_hash64(t))

    # Plain closure per bit (see similarity.hyperplane_sign_bucket note on
    # why `lambda a, h, b=b:` breaks under PySpark lambda-arity dispatch).
    def vote_fn(b: int):
        return lambda a, h: a + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)

    acc = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hashed, F.lit(0).cast("long"), vote_fn(b))
        acc = acc + F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return acc


def simhash_groups(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """Near-dup buckets: docs sharing a full simhash (cheap first stage;
    simhash_near_pairs below is the banded Hamming refinement)."""
    sh = df.select(F.col(id_col).alias("doc"), simhash_col(F.col(text_col), bits).alias("simhash"))
    return (
        sh.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc").alias("keeper_id"))
        .where(F.col("n_docs") >= 1)
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 2,
    cache_registry: list | None = None,
) -> DataFrame:
    """Banded-Hamming simhash near-dup pairs (the scale refinement).

    Pigeonhole: two signatures within Hamming distance d < ``bands`` agree
    exactly on at least one of the ``bands`` bit-bands, so candidate
    generation is an equi-join on (band, band_bits) — never an all-pairs
    XOR scan — and the exact ``bit_count(xor) <= max_hamming`` check runs
    only on candidates. Requires max_hamming < bands for completeness within
    the candidate set.

    Band rows are ONE simhash computation + an explode of the per-band key
    structs (not a per-band union of projections, which re-ran the bit-vote
    aggregate bands x 2-join-sides times); with ``cache_registry`` the
    banded table is persisted so the self-join reads it twice from memory.
    """
    from pyspark import StorageLevel

    assert max_hamming < bands, "pigeonhole completeness needs max_hamming < bands"
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sig = df.select(
        F.col(id_col).alias("doc"), simhash_col(F.col(text_col), bits).alias("simhash")
    )
    banded = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask)).alias("band_key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc", "simhash", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    if cache_registry is not None:
        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
        cache_registry.append(banded)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int").alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def _scratch_ckpt(spark, prefix: str):
    """Per-round lineage truncation for iterative graph loops: write the
    round's state to scratch parquet and read it back (the engine's
    plans/checkpoint.py pattern). Both CC round bodies reference their input
    several times, so without truncation the Catalyst plan grows
    exponentially in rounds (measured: driver GC OOM during plan
    canonicalization by round ~10). At cluster scale the scratch dir must be
    distributed storage — defaults to $SPARK_GRAFT_STATE_DIR_BASE (the same
    knob the crawl state uses), falling back to local tmp.

    Returns (work_dir, ckpt(df, k) -> DataFrame, cleanup()).
    """
    import os
    import shutil
    import tempfile

    base = os.environ.get("SPARK_GRAFT_STATE_DIR_BASE") or None
    work = tempfile.mkdtemp(prefix=prefix, dir=base)

    def ckpt(df: DataFrame, k: int) -> DataFrame:
        path = os.path.join(work, f"state-{k:04d}")
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    return work, ckpt, (lambda: shutil.rmtree(work, ignore_errors=True))


class _ScratchOwner:
    """Pairs a persisted result with the scratch checkpoint dir its plan may
    still recompute through: ``unpersist()`` releases the cache FIRST, then
    deletes the scratch files. Handed to ``cache_registry`` owners so that on
    a real cluster an executor loss while the result is still cached can
    always recompute from the checkpoint parquet — eager deletion right after
    the materializing count was safe in local mode only (ADVICE r4)."""

    def __init__(self, df: DataFrame, cleanup) -> None:
        self._df, self._cleanup = df, cleanup

    def unpersist(self, blocking: bool = False):
        out = self._df.unpersist(blocking)
        self._cleanup()
        return out


def _finish_cc_result(out: DataFrame, cleanup, cache_registry: list | None) -> DataFrame:
    """Shared tail of both CC variants: materialize the persisted result,
    then either hand (result + scratch dir) ownership to the registry via
    :class:`_ScratchOwner`, or — with no registry — delete the scratch
    eagerly. The eager path assumes the persisted copy survives until the
    result is consumed (always true in local mode; on a cluster pass a
    ``cache_registry`` so scratch outlives the cache)."""
    out.count()  # materialize before anything touches the scratch checkpoints
    if cache_registry is not None:
        cache_registry.append(_ScratchOwner(out, cleanup))
    else:
        cleanup()
    return out


def _star_contraction_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str,
    src: str,
    dst: str,
    max_iters: int,
    cache_registry: list | None,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    adversarial-topology variant of :func:`connected_components`.

    Each round rewires the edge set toward a star forest centered at each
    component's minimum node:
      large-star(u): every neighbor v > u is connected to min(Γ(u) ∪ {u})
      small-star(u): every neighbor v < u, and u itself, are connected to
                     min of the smaller neighborhood
    Connectivity is preserved by both operations and the edge set converges
    to stars in O(log^2 n) rounds (O(log n) in practice for the alternating
    two-phase) — bounded by the LOGARITHM of the longest path, where
    min-label propagation needs O(diameter) rounds. Convergence is exact
    set equality of the oriented edge list (count match + empty exceptAll —
    no fingerprint collisions). Shuffles stay on node ids; per-round work is
    two groupBy-min passes + two equi-joins over the current edge set.

    Each round's edge set is checkpointed to scratch parquet and read back
    (:func:`_scratch_ckpt`) — lineage truncation, without which the round
    body's ~5 references to its input grow the Catalyst plan exponentially.
    """
    from pyspark import StorageLevel

    work, ckpt, cleanup = _scratch_ckpt(edges.sparkSession, "bwc-star-")

    # normalize: oriented (big u, small v), no self-loops, distinct
    from pyspark.sql import Observation

    cur = ckpt(
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct(),
        0,
    )
    cur_n = cur.count()  # parquet metadata count — no scan
    rounds = 0
    converged = False
    for _ in range(max_iters):
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # large-star: per node u, m = min(neighbors ∪ {u}); connect v>u to m
        lmin = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the (big → small) orientation: per node u,
        # m = min smaller neighbor; connect every smaller neighbor and u to m
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        joined = large.join(smin, "u")
        rounds += 1
        # the edge count rides an Observation on the checkpoint write that
        # runs anyway — no separate count job per round
        obs = Observation()
        new = ckpt(
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .observe(obs, F.count(F.lit(1)).alias("n")),
            rounds,
        )
        new_n = obs.get["n"]
        # exact set-equality convergence (both sides distinct + oriented);
        # the exceptAll runs only when the cheap count gate passes
        if new_n == cur_n and new.exceptAll(cur).count() == 0:
            converged = True
            break
        cur, cur_n = new, new_n
    if stats is not None:
        stats["rounds"] = rounds
    # stars point every non-center node at its component min; centers and
    # isolated nodes map to themselves
    labels = cur.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    if not converged:
        # The edge set is not yet a star forest: a node can carry several
        # (node, comp) rows, so a bare left join would duplicate rows and
        # return inconsistent labels silently (ADVICE r4). Collapse to the
        # per-node min (a consistent-if-unconverged label) and warn loudly —
        # practically unreachable at max_iters=50 (rounds are O(log n)).
        import warnings

        warnings.warn(
            f"star-contraction did not converge in {max_iters} rounds; "
            "returning per-node min labels, which may under-merge components",
            RuntimeWarning,
            stacklevel=3,
        )
        labels = labels.groupBy("node").agg(F.min("comp").alias("comp"))
    out = (
        nodes.select(F.col(id_col).cast("long").alias("node"))
        .distinct()
        .join(labels, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return _finish_cc_result(out, cleanup, cache_registry)


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "node",
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 50,
    cache_registry: list | None = None,
    algorithm: str = "label",
    stats: dict | None = None,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over an undirected
    near-dup pair list — ``(node, component)`` with component = the minimum
    node id reachable from ``node``.

    This is the step that turns pairwise dedup output (minhash_lsh_pairs /
    lsh_refined_pairs / simhash_near_pairs) into keep-one-per-cluster
    groups, as a large-corpus pipeline needs: pairs (a,b),(b,c) must
    collapse to ONE cluster {a,b,c}, which no per-pair filter can do.

    Min-label propagation: every round each node takes the min label over
    itself and its neighbors — one partitioned equi-join on node id plus one
    min-groupBy per round, O(diameter) rounds. Near-dup clusters are dense
    (band collisions make them near-cliques, diameter 1-3), so a handful of
    rounds closes a corpus; convergence is detected by a one-number action
    (sum of labels — each label is nonincreasing and a round that changes
    nothing changes no label, so an unchanged sum IS the fixpoint; summed as
    decimal(38,0) so 10^10 nodes cannot overflow). No all-pairs anything:
    at 10^10 edges each round shuffles on node ids only.

    ``algorithm`` selects the round body:
      "label" (default) — min-label propagation above: fewest shuffles per
          round, O(diameter) rounds. The right pick for dedup-cluster
          topology (band collisions make near-cliques, diameter 1-3).
      "star" — alternating large-star/small-star contraction
          (:func:`_star_contraction_components`): O(log n)-ish rounds
          regardless of diameter — the fallback for adversarially long
          chains where O(diameter) propagation would not terminate in any
          reasonable round budget. Both variants agree exactly
          (tests/test_components.py proves it on clique+chain graphs).
    ``stats`` (optional dict) receives {"rounds": k} for either variant.

    Each round's state is checkpointed to scratch parquet and read back
    (:func:`_scratch_ckpt` — lineage truncation). The FINAL result is
    persisted and materialized; with a ``cache_registry`` the registry entry
    owns BOTH the persist and the scratch files (deleted together at
    ``unpersist()`` — :class:`_ScratchOwner` — so cluster-mode recomputation
    after executor loss can always re-read the checkpoints); with no registry
    the scratch is deleted eagerly, which assumes the persisted copy survives
    until the result is consumed (local mode, or a prompt consumer).
    """
    from pyspark import StorageLevel

    if algorithm == "star":
        return _star_contraction_components(
            edges, nodes, id_col, src, dst, max_iters, cache_registry, stats
        )
    assert algorithm == "label", f"unknown algorithm: {algorithm}"
    und = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .union(edges.select(F.col(dst).cast("long").alias("u"), F.col(src).cast("long").alias("v")))
        # key the cached edge list by the per-round join key and let AQE size
        # the exchange: a bare union persists as (2 x input) partitions — at
        # bench scale 64 near-empty cached blocks that every round's join (or
        # broadcast build) re-reads as 64 tasks (measured ~1.5 s/round of
        # pure scheduling); at 10^10 edges the same rule yields real-sized
        # hash partitions aligned with the propagation join.
        .repartition(F.col("u"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # per-round scratch checkpoint: the round body references `cur` twice,
    # so without lineage truncation the plan doubles per round (driver OOM
    # on long chains — see _scratch_ckpt)
    work, ckpt, cleanup = _scratch_ckpt(edges.sparkSession, "bwc-cc-")
    from pyspark.sql import Observation

    ssum = F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    # Round-6: propagate labels over EDGE-ENDPOINT nodes only. A node that
    # appears in no pair has no neighbors — its label can never change — so
    # dragging the full node table through every round's join + groupBy-min
    # is pure overhead; it rejoins at the end via the left-join + coalesce
    # (exactly the star variant's tail). In a real corpus near-dup graph the
    # overwhelming majority of docs are singletons, so the per-round state
    # shrinks from |corpus| to |endpoints| at any scale. Identical labels by
    # construction: endpoints see the same propagation; non-endpoints were
    # (node, node) throughout and coalesce(comp, node) restores precisely
    # that row.
    # No round-0 checkpoint (round-6): the initial label table derives from
    # the PERSISTED symmetric edge list in one narrow step, so round 1 can
    # consume it directly — the parquet write+read and the separate initial
    # label-sum job both disappear. Convergence compares consecutive ROUND
    # sums (a sentinel stands in before the first round completes); with any
    # edges present round 1 always lowers some label, so the first possible
    # break is round 2 — exactly where the old init-sum scheme broke too.
    cur = (
        und.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("comp"))
    )
    cur_sum: object = object()  # sentinel: no sum observed yet
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        prop = und.join(cur, und["u"] == cur["node"]).select(
            F.col("v").alias("node"), F.col("comp")
        )
        # the convergence label-sum rides an Observation on the checkpoint
        # write that runs anyway — the separate O(nodes) agg job per round
        # is gone (VERDICT r3 #7)
        obs = Observation()
        new = ckpt(
            cur.select("node", "comp")
            .union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .observe(obs, ssum),
            rounds,
        )
        new_sum = obs.get["s"]
        if new_sum == cur_sum:
            break
        cur, cur_sum = new, new_sum
    else:
        # One consistent label per node either way (the groupBy-min keeps the
        # schema), but an iteration-capped exit means labels may still be
        # propagating — never fail silently (ADVICE r4).
        import warnings

        warnings.warn(
            f"min-label propagation did not converge in {max_iters} rounds; "
            "labels are consistent but may under-merge components",
            RuntimeWarning,
            stacklevel=2,
        )
    if stats is not None:
        stats["rounds"] = rounds
    out = (
        nodes.select(F.col(id_col).cast("long").alias("node"))
        .distinct()
        .join(cur.select("node", "comp"), "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    result = _finish_cc_result(out, cleanup, cache_registry)
    # und can only be released after the result is materialized: the final
    # ckpt'd `cur` no longer references it, but materialization above runs
    # through the left join whose build may still be in flight when this
    # returns — _finish_cc_result has already count()'d, so release now.
    und.unpersist()
    return result
