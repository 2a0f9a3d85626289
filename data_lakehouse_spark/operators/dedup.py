"""Document deduplication operators for LLM-data pipelines.

Four tiers, all shuffle-conscious:

- exact            MD5 fingerprint groupBy — one shuffle on a uniform
                   128-bit key; at 100 TB use it as the cheap first pass.
- minhash_lsh      shingle → 64 minhash values → b bands of r rows →
                   explode bands → groupBy (band, signature) buckets →
                   candidate pairs only within buckets. Shuffle volume
                   is O(docs × b) small fixed-width rows, never O(n²).
- simhash          64-bit weighted token hash; near-dups share simhash
                   prefix buckets (hamming-adjacent verification).
- ngram_jaccard    exact verification on candidate pairs (post-LSH).

Everything is built-in-function Spark (xxhash64, transform, explode) —
no Python UDFs; hashing is deterministic across runs/executors so
results are reproducible and cluster-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_lakehouse_spark.functions.text import normalized_text

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signature_df",
    "minhash_lsh_candidates",
    "simhash64",
    "simhash_hex_df",
    "simhash_hex_df_arrow",
    "ngram_jaccard_pairs",
    "ngram_jaccard_similar_pairs",
    "winnow_fingerprint_df",
]


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by normalized-text MD5; keep min id as canonical.

    Returns (fingerprint, canonical_id, dup_count).
    """
    return (
        df.withColumn("fingerprint", F.md5(normalized_text(text_col)))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).cast("bigint").alias("canonical_id"),
            F.count("*").cast("bigint").alias("dup_count"),
        )
    )


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column.

    ``toks`` must be a plain column reference (not an inline split
    pipeline): Catalyst expression trees are trees, not DAGs, so every
    reference to an inline expression re-evaluates it — with the
    normalize+split pipeline referenced once per window element that is
    an O(len²) blowup. Bound to an attribute, each reference is a row
    slot read (CollapseProject keeps multiply-referenced non-cheap
    projections materialized).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array from normalized text (distinct).

    Convenience single-expression form; inside operators prefer
    materializing the token array first and calling
    :func:`shingles_of_tokens` (see its note on expression-tree
    duplication).
    """
    return shingles_of_tokens(F.split(normalized_text(text), r"\s+"), n)


def _shingle_df(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(doc_id, _sh) with the token array materialized in its own
    projection step so the shingle window never re-runs the
    normalize+split pipeline."""
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.split(normalized_text(text_col), r"\s+").alias("_toks"),
    ).select(
        "doc_id", shingles_of_tokens(F.col("_toks"), shingle_n).alias("_sh")
    )


def _shingle_explode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    *,
    distinct: bool,
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, shingle) one row per window — explode the window INDEX
    and build each shingle string on the exploded row.

    Everything stays inside one whole-stage-codegen span (generate →
    project), with no per-doc shingle array and no interpreted
    higher-order lambda: the fastest shape for the LSH/Jaccard hot
    path. ``distinct=True`` adds a (doc_id, shingle) shuffle dedup for
    set semantics (Jaccard); MinHash skips it since MIN is multiplicity-
    insensitive. ``hashed=True`` replaces the shingle string with
    ``xxhash64(shingle)`` before any shuffle: every downstream
    distinct/groupBy/join moves fixed 8-byte keys instead of
    variable-length strings (64-bit collisions are ~0 at any realistic
    shingle count; only use where the shingle text itself isn't needed).
    """
    toks_df = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.split(normalized_text(text_col), r"\s+").alias("_toks"),
    )
    shingle = F.concat_ws(" ", F.slice("_toks", F.col("_i") + 1, shingle_n))
    if hashed:
        shingle = F.xxhash64(shingle)
    ex = toks_df.select(
        "doc_id",
        "_toks",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.size("_toks") - shingle_n, F.lit(0))
            )
        ).alias("_i"),
    ).select("doc_id", shingle.alias("shingle"))
    return ex.distinct() if distinct else ex


def minhash_signature_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) minhash signatures.

    Shape: explode shingles → one base xxhash64 per shingle string →
    num_hashes cheap fixed-width re-hashes xxhash64(base, seed) as MIN
    aggregates. Map-side partial aggregation reduces shuffle to ~one row
    per doc per partition; no nested higher-order expressions (those
    re-evaluate the shingle pipeline once per hash function — measured
    16× slower). ANSI-safe: no overflow arithmetic. Deterministic.
    """
    exploded = _shingle_explode(
        df, text_col, id_col, shingle_n, distinct=False
    ).select(F.col("doc_id").alias("_mh_id"), F.xxhash64("shingle").alias("_h"))
    aggs = [
        F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy("_mh_id").agg(*aggs)
    return sig.select(
        F.col("_mh_id").alias(id_col),
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 10_000,
    engine: str = "arrow",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Docs sharing any band signature become candidates. Returns
    (id_a, id_b, band) with id_a < id_b. Verification (exact Jaccard)
    is a separate, cheaper step over candidates only.

    ``engine='arrow'`` (default) computes banded signatures in the
    one-pass numpy kernel (:func:`_minhash_banded_arrow` — measured ~2×
    faster end-to-end at sf0.1, mostly by replacing the ~1500-node
    64-aggregate plan with a single mapInPandas node);
    ``engine='sql'`` keeps the pure-built-in xxhash64 shape
    (:func:`minhash_signature_df`). Both are valid MinHash families;
    candidate sets are statistically equivalent, not row-identical.

    ``max_bucket_size`` drops (band, signature) buckets holding more
    docs than the cap before the self-join: a degenerate signature
    (e.g. masses of near-empty docs hashing identically) otherwise
    turns one bucket into n² candidate pairs. A bucket that hot is a
    trivial-duplicate cluster better handled by :func:`exact_dedup`;
    dropping it bounds the worst case at O(docs × bands × cap) pairs.
    The count is a window over the same (band, band_sig) hash
    partitioning the join needs — no extra shuffle key. ``None``
    disables the guard.
    """
    from pyspark.sql.window import Window

    if engine == "arrow":
        banded = _minhash_banded_arrow(
            df,
            text_col,
            id_col,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
        )
    else:
        rows = num_hashes // bands
        sig = minhash_signature_df(
            df, text_col, id_col, shingle_n=shingle_n, num_hashes=num_hashes
        ).withColumnRenamed(id_col, "doc_id")
        banded = sig.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(b * rows + r).cast("string")
                                    for r in range(rows)
                                ],
                            )
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "band_sig"),
        )
    if max_bucket_size is not None:
        bucket_n = F.count("*").over(Window.partitionBy("band", "band_sig"))
        banded = (
            banded.withColumn("_bn", bucket_n)
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    # Materialize the signatures ONCE before the self-join: the two join
    # sides are the same subplan, but Catalyst's ReuseExchange does not
    # fire across the Python-kernel boundary (verified: the plan holds
    # two MapInPandas nodes without this), so the signing would run
    # twice. The banded table is docs × bands short rows (~40 B each) —
    # exactly what the persistent index materializes at scale anyway.
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.band").alias("band"),
        )
        .distinct()
    )


def _minhash_banded_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(doc_id, band, band_sig) — per-doc banded MinHash signatures in
    one Arrow pass (mapInPandas + numpy), no explode and no 64-buffer
    aggregate.

    The SQL shape (:func:`minhash_signature_df`) is correct and
    scale-safe, but its plan is a ~1500-node expression tree (64 MIN
    aggregates × seeded rehashes + 16 band-digest concats): at bench
    scale, analysis + codegen alone cost more than the execution, and
    per row it drives 64 hash evaluations through the aggregate hash
    map. Here each input partition computes its docs' signatures
    columnar: one md5 per distinct shingle (hashlib, C speed) folded to
    uint64, then a splitmix64-style seeded family min-reduced in numpy
    — a (shingles × num_hashes) broadcast per doc. Narrow plan, trivially
    parallel over input splits.

    Hash family differs from the SQL variant (md5-fold + splitmix64 vs
    xxhash64 chains) — both are valid MinHash families; candidate SETS
    are equivalent in distribution but not row-identical. Deterministic
    across runs/executors/Python versions (md5 + fixed constants).
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    rows = num_hashes // bands
    java_ws = re.compile("[ \t\n\x0b\x0c\r]+")
    # splitmix64 constants; seeds derived per hash index deterministically
    GOLDEN = np.uint64(0x9E3779B97F4A7C15)
    M1 = np.uint64(0xBF58476D1CE4E5B9)
    M2 = np.uint64(0x94D049BB133111EB)
    seeds = (np.arange(1, num_hashes + 1, dtype=np.uint64) * GOLDEN)

    def mix(x: "np.ndarray") -> "np.ndarray":
        x = (x ^ (x >> np.uint64(30))) * M1
        x = (x ^ (x >> np.uint64(27))) * M2
        return x ^ (x >> np.uint64(31))

    def kernel(batches):
        err = np.seterr(over="ignore")
        try:
            for pdf in batches:
                out_ids, out_bands, out_sigs = [], [], []
                for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                    norm = java_ws.sub(" ", ("" if text is None else text).lower())
                    toks = norm.strip(" ").split(" ")
                    n_sh = max(len(toks) - shingle_n, 0) + 1
                    sh = {
                        " ".join(toks[i : i + shingle_n]) for i in range(n_sh)
                    }
                    base = np.frombuffer(
                        b"".join(
                            hashlib.md5(s.encode("utf-8")).digest()[:8]
                            for s in sorted(sh)
                        ),
                        dtype=np.uint64,
                    )
                    # (shingles, num_hashes) seeded mixes → column mins
                    sig = mix(base[:, None] ^ seeds[None, :]).min(axis=0)
                    band_digests = [
                        hashlib.md5(
                            sig[b * rows : (b + 1) * rows].tobytes()
                        ).hexdigest()
                        for b in range(bands)
                    ]
                    out_ids.extend([doc_id] * bands)
                    out_bands.extend(range(bands))
                    out_sigs.extend(band_digests)
                yield pd.DataFrame(
                    {
                        "doc_id": pd.array(out_ids, dtype="int64"),
                        "band": pd.array(out_bands, dtype="int32"),
                        "band_sig": out_sigs,
                    }
                )
        finally:
            np.seterr(**err)

    return df.select(
        F.col(id_col).cast("bigint").alias(id_col), text_col
    ).mapInPandas(kernel, "doc_id long, band int, band_sig string")


def simhash64(text: Column | str, *, token_hashes: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens (unweighted).

    bit_j(simhash) = majority over tokens of bit_j(xxhash64(token)).
    Built from aggregate over the token array — codegen, no UDF.
    """
    toks = F.split(normalized_text(text), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def _bit_count(j: int):
        # factory (see _seeded_rehash note): closes over j safely
        def fn(acc: Column, h: Column) -> Column:
            return acc + F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1))

        return fn

    bits = []
    for j in range(token_hashes):
        # count of tokens with bit j set, vs half the token count
        ones = F.aggregate(hashes, F.lit(0).cast("long"), _bit_count(j))
        bits.append(
            F.when(ones * 2 >= F.size(toks), F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            * F.lit(2 ** j).cast("long")
            if j < 63
            else F.when(ones * 2 >= F.size(toks), F.lit(-(2 ** 63))).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash_hex_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash: 16-char hex, bucket: first 4 hex chars) per doc.

    Portable SimHash: bit ``j`` of a token's hash is bit ``j % 4`` of the
    MD5 hex nibble at position ``j // 4`` — pure ANSI string/arith ops, so
    the DuckDB oracle reproduces it bit-exactly (unlike xxhash64-based
    :func:`simhash64`, the fast production variant).

    Shape is the scalable one: explode tokens → 64 cheap bit columns on
    the token's single MD5 → groupBy doc with map-side partial SUMs →
    majority vote → hex-render. Shuffle is one fixed-width row per doc
    per input partition. ``bucket`` (leading 16 bits) is the candidate
    key for hamming-style near-dup grouping at scale.
    """
    hexchars = "0123456789abcdef"
    toks = F.split(normalized_text(text_col), " ")
    ex = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(toks).alias("_tok"),
    ).withColumn("_hx", F.md5("_tok"))
    # materialize the 16 nibble values once per token (each is referenced
    # by 4 bit columns — inline they'd re-run conv+substring 64×; see the
    # expression-tree note on shingles_of_tokens). 64 plain SUM buffers
    # measured faster than packing 4 counters per long (per-row shift
    # arithmetic costs more than the buffers save).
    ex = ex.select(
        "doc_id",
        *[
            F.conv(F.substring("_hx", g_ + 1, 1), 16, 10)
            .cast("int")
            .alias(f"_nib{g_}")
            for g_ in range(16)
        ],
    )

    def bit(j: int) -> Column:
        return F.shiftright(F.col(f"_nib{j // 4}"), j % 4).bitwiseAND(F.lit(1))

    aggs = [F.sum(bit(j)).alias(f"_b{j}") for j in range(64)] + [
        F.count("*").alias("_n")
    ]
    g = ex.groupBy("doc_id").agg(*aggs)

    def maj(j: int) -> Column:
        return F.when(F.col(f"_b{j}") * 2 >= F.col("_n"), F.lit(1)).otherwise(
            F.lit(0)
        )

    nibbles = [
        sum(
            (maj(4 * g_ + b) * F.lit(1 << b) for b in range(1, 4)),
            maj(4 * g_),
        )
        for g_ in range(16)
    ]
    sim = F.concat(
        *[F.substring(F.lit(hexchars), n + 1, 1) for n in [c.cast("int") for c in nibbles]]
    )
    return g.select(
        "doc_id",
        sim.alias("simhash"),
    ).withColumn("bucket", F.substring("simhash", 1, 4))


def simhash_hex_df_arrow(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bit-identical twin of :func:`simhash_hex_df` as a one-pass Arrow
    kernel (``mapInPandas`` + numpy), no shuffle at all.

    The SQL shape explodes every token into a row and drives 64 SUM
    buffers plus 16 ``conv(substring(md5))`` nibble extractions per
    token through the aggregate — correct and scale-safe, but the
    per-token expression cost dominates. Here each input partition
    computes its docs' signatures in one pass: hashlib.md5 per token
    (same digest as the SQL ``md5``), numpy bit-unpack, columnar
    majority vote. Narrow plan (no explode, no groupBy): at 100 TB this
    is embarrassingly parallel over input splits, where the SQL variant
    still pays the 65-buffer hash aggregate.

    Matching the JVM expressions exactly:
    - ``lower``/trim/collapse mirror ``normalized_text`` with Java's
      ASCII ``\\s`` class (NOT Python's unicode-aware ``\\s``);
    - bit j of a token = bit ``j % 4`` of md5 hex nibble ``j // 4``;
    - majority = ``ones * 2 >= n_tokens`` (ties set the bit).
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    # Java regex \s == [ \t\n\x0B\f\r] (ASCII-only by default).
    java_ws = re.compile("[ \t\n\x0b\x0c\r]+")
    hexchars = "0123456789abcdef"
    bit_weights = 1 << np.arange(4, dtype=np.int64)  # nibble bit b → 2^b

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            sims = []
            for text in pdf[text_col]:
                norm = java_ws.sub(" ", ("" if text is None else text).lower())
                norm = norm.strip(" ")
                toks = norm.split(" ")
                n = len(toks)
                digests = b"".join(
                    hashlib.md5(t.encode("utf-8")).digest() for t in toks
                )
                raw = np.frombuffer(digests, dtype=np.uint8).reshape(n, 16)
                # md5 hex char 2g is the high nibble of byte g, 2g+1 the low
                nibs = np.empty((n, 32), dtype=np.uint8)
                nibs[:, 0::2] = raw >> 4
                nibs[:, 1::2] = raw & 15
                nibs = nibs[:, :16]  # hex positions 0..15 (64 bits)
                ones = ((nibs[:, :, None] >> np.arange(4)) & 1).sum(axis=0)
                maj = (ones * 2 >= n).astype(np.int64)  # (16 nibbles, 4 bits)
                vals = (maj * bit_weights).sum(axis=1)
                sims.append("".join(hexchars[v] for v in vals))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "simhash": sims,
                    "bucket": [s[:4] for s in sims],
                }
            )

    return df.select(F.col(id_col).cast("bigint").alias(id_col), text_col).mapInPandas(
        kernel, "doc_id long, simhash string, bucket string"
    )


def winnow_fingerprint_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(doc_id, fingerprint) — exploded winnowing fingerprints
    (Schleimer et al. 2003): min md5 k-gram hash per sliding window.

    Hot-path form of :func:`text.winnow_fingerprints`: token and k-gram
    arrays are materialized as projection columns between selects, so
    the window scan reads row slots instead of re-evaluating the
    normalize/split/md5 pipeline per window (the expression-tree rule
    at :func:`shingles_of_tokens`). Narrow plan — per-row arrays only,
    the single distinct is on (doc_id, fingerprint). Inverted-index
    joins over the output find near-dup/plagiarism pairs exactly like
    :func:`ngram_jaccard_similar_pairs` does over shingles.
    """
    from data_lakehouse_spark.functions.text import (
        _winnow_from_kgrams,
        normalized_text,
    )

    toks_df = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.split(normalized_text(text_col), " ").alias("_toks"),
    )
    kgram_df = toks_df.select(
        "doc_id",
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size("_toks") - k, F.lit(0))
            ),
            lambda i: F.md5(F.concat_ws(" ", F.slice("_toks", i + 1, k))),
        ).alias("_kg"),
    )
    return kgram_df.select(
        "doc_id",
        F.explode(_winnow_from_kgrams(F.col("_kg"), window)).alias("fingerprint"),
    )


def ngram_jaccard_similar_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT shingle-Jaccard pairs above threshold — inverted-index join,
    no cross product.

    |A∩B| comes from a self-join on individual shingles (docs sharing a
    shingle co-group), |A∪B| = |A|+|B|−|A∩B|. Shuffle is O(total
    shingles + co-occurring pairs): the scalable exact path, unlike the
    O(n²) cross join. ``max_shingle_df`` drops shingles appearing in
    more than that many docs (stopword-shingle skew guard at 100 TB —
    slightly lowers recall, bounds the worst pair blowup).

    The output never exposes shingle text, so the whole index is keyed
    on ``xxhash64(shingle)``: the distinct, the df-guard groupBy, and
    the self-join all shuffle fixed 8-byte longs instead of ~n-word
    strings (oracle hash-match verified unchanged at sf0.01).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to
    6 places half-up.
    """
    from data_lakehouse_spark.functions.scalars import round_half_up

    ex = _shingle_explode(
        df, text_col, id_col, shingle_n, distinct=True, hashed=True
    )
    counts = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if max_shingle_df is not None:
        dfreq = ex.groupBy("shingle").agg(F.count("*").alias("_df"))
        ex = ex.join(
            F.broadcast(dfreq.filter(F.col("_df") <= max_shingle_df).drop("_df")),
            "shingle",
        )
    a = ex.select(F.col("doc_id").alias("id_a"), "shingle")
    b = ex.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    # attach |A| and |B| after the pair agg: joins against the tiny
    # one-row-per-doc counts table instead of carrying set widths
    # through the wide shingle shuffle
    inter = inter.join(
        counts.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na")),
        "id_a",
    ).join(
        counts.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb")),
        "id_b",
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", round_half_up(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard verification over candidate (id_a, id_b)
    pairs — two broadcast-friendly joins back to the shingle sets.

    The shingle side is semi-join-pruned to documents that actually
    appear in a candidate pair BEFORE the shingle arrays are built:
    at corpus scale the candidate set is a sliver of the corpus, and
    without the prune every document would pay the normalize+split+
    shingle cost just to be dropped by the verify join. The token
    array is materialized in its own projection step (see
    :func:`shingles_of_tokens` on inline-pipeline re-evaluation)."""
    cand_ids = (
        candidates.select(F.col("id_a").alias("_cid"))
        .unionByName(candidates.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    sh = (
        df.join(cand_ids, df[id_col] == cand_ids["_cid"], "leftsemi")
        .select(
            F.col(id_col).alias("doc_id"),
            F.split(normalized_text(text_col), r"\s+").alias("_toks"),
        )
        .select(
            "doc_id", shingles_of_tokens(F.col("_toks"), shingle_n).alias("sh")
        )
    )
    j = (
        candidates.select("id_a", "id_b")
        .distinct()
        .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return (
        j.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
