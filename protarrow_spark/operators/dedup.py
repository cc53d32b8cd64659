"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (a conversion library, SURVEY.md §2.2);
these are the north-star LLM-pipeline operators, built Spark-first:

* exact:    hash-groupBy on a canonical text digest — one shuffle.
* n-gram Jaccard: inverted-index self-join on shingles with a
  document-frequency cap so hot shingles can't quadratically blow up
  the join at 100 TB; intersection counts exclude capped shingles, so
  the reported Jaccard is a lower bound once the cap triggers.
* MinHash + LSH: shingle -> k minhashes -> banded keys -> bucket
  equi-join. Turns all-pairs similarity into a shuffle join on band
  keys; estimated Jaccard from signature agreement.
* SimHash: 32-bit signature via per-token md5 bit voting; near-dups
  share signatures (hamming-0 grouping here; banded hamming-k probing
  is the same join pattern on signature chunks).

Everything uses md5 (identical across engines) rather than Spark's
murmur ``hash()`` so results are verifiable against any SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from protarrow_spark.functions.text import text_ngrams, tokens

#: Shared constants — the DuckDB oracle SQL is generated from the same
#: values (queries/dedup.py), so Spark and oracle always agree.
NGRAM_N = 3
MINHASH_K = 8
LSH_BANDS = 4  # 2 rows per band
JACCARD_THRESHOLD = 0.5
#: Shingles appearing in more than this many documents are excluded
#: from candidate generation (not from verification) — bounds the
#: inverted-index join fan-out at scale.
MAX_SHINGLE_DF = 10_000
SIMHASH_BITS = 32
_HEX = "0123456789abcdef"


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = NGRAM_N) -> DataFrame:
    """Distinct (id, shingle) pairs."""
    return (
        df.select(F.col(id_col), F.explode(text_ngrams(F.col(text_col), n)).alias("g"))
        .distinct()
    )


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct text with the
    canonical (minimum) id and the duplicate count.

    Scale: single shuffle on a 128-bit digest — uniformly distributed,
    no skew; the text itself never shuffles.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = JACCARD_THRESHOLD,
    n: int = NGRAM_N,
    max_df: int = MAX_SHINGLE_DF,
    dense_vocab_cap: int | None = None,
    block_size: int = 2048,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity.

    Candidate pairs come from an inverted-index self-join restricted to
    shingles with document frequency <= ``max_df``. The intersection
    count ``n_common`` is computed over those capped shingles while the
    set sizes use the full shingle sets, so once ``max_df`` triggers the
    reported Jaccard is a *lower bound* of the true Jaccard (pairs held
    together only by corpus-wide boilerplate shingles are deliberately
    down-weighted at scale).

    Adaptive physical strategy (same results either way):

    * **Sparse path** (default): inverted-index self-join on 60-bit
      md5-derived shingle keys, one row per (pair, shared shingle). A
      hash collision would merely merge two shingles on BOTH engines
      (the oracle applies the identical hash), so verification is
      unaffected. Right when shared-shingle volume is sparse — the
      normal regime for real text.
    * **Dense path** (opt-in via ``dense_vocab_cap``; probing costs a
      full vocab scan, so the caller asserts density rather than every
      sparse-regime call paying to discover it isn't): when the
      distinct-shingle count fits the cap, the shingle space is
      structurally dense —
      almost every pair overlaps, and the join would emit
      Theta(pairs x shared) rows (224M at sf0.1 on the synthetic
      corpus, 112 s). Instead, docs are hash-blocked and every block
      pair cogroups once; per block pair one float32 matmul over
      dense doc x vocab incidence matrices yields ALL pairwise
      intersection counts (exact: counts <= vocab < 2^24). Data moved
      is n_blocks x corpus rows — the right trade exactly when the
      output itself is near-quadratic. 112 s -> 7 s at sf0.1 (vs
      15.6 s for single-node DuckDB), identical rows.
    """
    grams = doc_shingles(df, id_col, text_col, n).select(
        F.col(id_col),
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("bigint").alias("g"),
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    vocab = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df_g"))
    if dense_vocab_cap:
        # Probe by collecting up to cap+1 vocab rows: if the vocab fits,
        # the collected rows ARE the index — the dense path reuses them
        # instead of rescanning the corpus for the vocabulary.
        probe = vocab.limit(dense_vocab_cap + 1).collect()
        if len(probe) <= dense_vocab_cap:
            return _jaccard_dense_blocked(
                grams, sizes, probe, id_col, threshold, max_df, block_size
            )

    rare_shingles = vocab.filter(F.col("df_g") <= max_df)
    rare = grams.join(rare_shingles.select("g"), "g")
    a = rare.select(F.col(id_col).alias("doc_a"), "g")
    b = rare.select(F.col(id_col).alias("doc_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_grams").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def _jaccard_dense_blocked(
    grams: DataFrame,
    sizes: DataFrame,
    vocab_rows: list,
    id_col: str,
    threshold: float,
    max_df: int,
    block_size: int,
) -> DataFrame:
    """Dense-vocab Jaccard: blocked all-pairs intersection counting.

    Docs are assigned to ``ceil(n / block_size)`` blocks by id hash;
    each unordered block pair (i <= j) cogroups once, and one
    ``A @ B.T`` float32 matmul over doc x vocab 0/1 incidence
    matrices produces every pairwise intersection count in the block
    pair. Shingles over ``max_df`` are excluded from the matrices
    (candidate semantics) while ``n_grams`` sizes keep the full sets
    — identical semantics to the sparse path.
    """
    import numpy as np
    import pandas as pd

    # The caller's bounded probe collect (<= dense_vocab_cap rows) IS
    # the index, exactly like IVF centroids — no second vocab scan.
    rank = {
        g: i
        for i, g in enumerate(sorted(x["g"] for x in vocab_rows if x["df_g"] <= max_df))
    }
    v = len(rank)

    n_docs = sizes.count()
    n_blocks = max(1, -(-n_docs // block_size))

    doc_vecs = (
        grams.groupBy(id_col)
        .agg(F.collect_list("g").alias("gs"))
        .join(sizes, id_col)
        .withColumn("blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)))
    )
    # Replicate each doc row to every block pair it participates in:
    # doc in block b joins groups (min(b,o), max(b,o)) for all o.
    pairs = doc_vecs.select(
        F.col(id_col),
        "gs",
        "n_grams",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("other"),
    ).select(
        F.col(id_col),
        "gs",
        "n_grams",
        "blk",
        F.least("blk", "other").alias("gi"),
        F.greatest("blk", "other").alias("gj"),
    )

    id_type = grams.schema[id_col].dataType.simpleString()

    def block_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = int(key[0]), int(key[1])
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "n_common": [], "jaccard": []})

        def dense(sub: pd.DataFrame) -> tuple:
            sub = sub.sort_values(id_col).reset_index(drop=True)
            m = np.zeros((len(sub), v), dtype=np.float32)
            for r, gs in enumerate(sub["gs"].values):
                idxs = [rank[g] for g in gs if g in rank]
                m[r, idxs] = 1.0
            return sub[id_col].values, sub["n_grams"].to_numpy(), m

        if gi == gj:
            ids, ng, m = dense(pdf)
            if len(ids) < 2:
                return empty
            c = m @ m.T
            ia, ib = np.triu_indices(len(ids), k=1)
            ids_a, ids_b = ids[ia], ids[ib]
            common = c[ia, ib]
            na, nb = ng[ia], ng[ib]
        else:
            a = pdf[pdf["blk"] == gi]
            b = pdf[pdf["blk"] == gj]
            if a.empty or b.empty:
                return empty
            ids_l, ng_l, ml = dense(a)
            ids_r, ng_r, mr = dense(b)
            c = ml @ mr.T
            ii, jj = np.meshgrid(np.arange(len(ids_l)), np.arange(len(ids_r)), indexing="ij")
            ii, jj = ii.ravel(), jj.ravel()
            l_ids, r_ids = ids_l[ii], ids_r[jj]
            swap = l_ids > r_ids
            ids_a = np.where(swap, r_ids, l_ids)
            ids_b = np.where(swap, l_ids, r_ids)
            common = c[ii, jj]
            na, nb = ng_l[ii], ng_r[jj]
        common = common.astype(np.int64)
        jac = common / (na + nb - common)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": ids_a[keep],
                "doc_b": ids_b[keep],
                "n_common": common[keep],
                "jaccard": jac[keep],
            }
        )

    return pairs.groupBy("gi", "gj").applyInPandas(
        block_pair,
        f"doc_a {id_type}, doc_b {id_type}, n_common bigint, jaccard double",
    )


def _minhash_expr(j: int) -> Column:
    return F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("g")))).alias(f"mh{j}")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = MINHASH_K, n: int = NGRAM_N
) -> DataFrame:
    """k-permutation MinHash signature per document.

    Hash family: md5 of ``"{j}|" + shingle`` — the lexicographic min of
    fixed-width hex equals the numeric min, is stable across engines,
    and needs no seed table. One shuffle (groupBy id).
    """
    grams = doc_shingles(df, id_col, text_col, n)
    return grams.groupBy(id_col).agg(*[_minhash_expr(j) for j in range(k)])


def band_key(b: int, rows_per_band: int) -> Column:
    cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
    return F.md5(F.concat_ws("|", *cols))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = NGRAM_N,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH, with the
    signature-agreement Jaccard estimate.

    Scale: the only all-pairs step is an equi-join on (band, band_key)
    — identical band keys are exponentially unlikely for dissimilar
    docs, so bucket sizes stay tiny and the join shuffles, never
    nest-loops.
    """
    rows_per_band = k // bands
    # The signature frame feeds banding AND both sides of the agreement
    # join — eagerly localCheckpoint it so the shingle->minhash pipeline
    # runs once, not three times, and the blocks are released when the
    # DataFrame is garbage-collected (a bare persist() leaks cached
    # blocks for the session lifetime; at real scale you'd materialize
    # signatures to a table).
    sig = minhash_signatures(df, id_col, text_col, k, n).localCheckpoint(eager=True)
    banded = sig.select(
        F.col(id_col),
        F.posexplode(F.array(*[band_key(b, rows_per_band) for b in range(bands)])).alias(
            "band", "bkey"
        ),
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("doc_a"), *[F.col(f"mh{j}").alias(f"a{j}") for j in range(k)])
    sb = sig.select(F.col(id_col).alias("doc_b"), *[F.col(f"mh{j}").alias(f"b{j}") for j in range(k)])
    agree = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(k)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (agree / F.lit(float(k))).alias("est_jaccard"))
    )


def simhash_bit_exprs(digest_expr: str = "d", bits: int = SIMHASH_BITS) -> list[str]:
    """SQL expressions (portable Spark/DuckDB subset) for the ±1 vote of
    each signature bit, given a column holding the token's md5 hex
    digest (computed ONCE per token upstream, not per bit).

    Bit k lives in hex digit k//4 of the digest; extracted with
    ``% / >=`` arithmetic only, so the exact same text runs on both
    engines (no dialect-specific shift operators).
    """
    exprs = []
    for k in range(bits):
        d = k // 4 + 1  # 1-based hex digit position
        m = 2 ** (k % 4)
        v = f"(instr('{_HEX}', substring({digest_expr}, {d}, 1)) - 1)"
        exprs.append(f"CASE WHEN ({v} % {2 * m}) >= {m} THEN 1 ELSE -1 END")
    return exprs


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-document SimHash signature (``bits`` wide) from distinct
    tokens: each token votes ±1 per bit position, the sign of the vote
    sum sets the bit.

    Scale: explode + single groupBy — same shape as a word count. The
    md5 digest is projected once per token; the 32 vote expressions
    read hex digits out of that single digest column.
    """
    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .distinct()
        .select(F.col(id_col), F.md5(F.col("tok")).alias("d"))
    )
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(F.expr(e)).alias(f"s{k}")
            for k, e in enumerate(simhash_bit_exprs("d", bits))
        ]
    )
    sig = sum(
        F.when(F.col(f"s{k}") > 0, F.lit(2**k)).otherwise(F.lit(0)).cast("long")
        for k in range(bits)
    )
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Documents sharing an identical SimHash signature (hamming-0
    near-dups). Banded hamming-k probing reuses the same groupBy on
    signature chunks."""
    return (
        simhash(df, id_col, text_col, bits)
        .groupBy("simhash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
    )


#: Hamming-probe banding: 4 chunks of 8 bits over the 32-bit SimHash.
SIMHASH_CHUNKS = 4


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = SIMHASH_CHUNKS - 1,
    bits: int = SIMHASH_BITS,
    chunks: int = SIMHASH_CHUNKS,
) -> DataFrame:
    """Near-duplicate pairs within ``max_hamming`` SimHash bits, via
    banded chunk probing — the hamming-k generalization of
    :func:`simhash_duplicate_groups`.

    Pigeonhole guarantee: a pair differing in <= ``chunks - 1`` bits
    agrees on at least one of the ``chunks`` signature chunks, so
    chunk-bucket cogrouping finds EVERY such pair (exact recall for
    the default ``max_hamming = chunks - 1``).

    Plan shape: ONE shuffle moves each (id, signature) row to its
    ``chunks`` buckets (rows are 2 integers — there is no payload to
    save by going "skinny"); per bucket, all pairwise hamming
    distances come from one vectorized XOR + byte-LUT popcount. Each
    surviving pair is emitted exactly once — by its FIRST agreeing
    chunk (every bucket holds full signatures, so prior-chunk
    agreement is a local check) — so there is NO pair-dedup shuffle
    at all; the output is a disjoint union over buckets. On
    duplicate-heavy corpora the hot bucket is the dominant cost
    wherever you put it — numpy does b^2 popcounts ~3 orders of
    magnitude faster than a candidate equi-join + distinct + two
    signature fetch joins materializing the same pairs.

    Output: doc_a, doc_b, hamming (bigint).
    """
    import numpy as np
    import pandas as pd

    if max_hamming > chunks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the pigeonhole bound: with "
            f"{chunks} chunks only pairs within {chunks - 1} differing bits are "
            f"guaranteed to collide in some chunk; use chunks >= max_hamming + 1"
        )

    width = bits // chunks
    sigs = simhash(df, id_col, text_col, bits)
    chunk_exprs = [
        ((F.col("simhash") / F.lit(2 ** (width * c))).cast("long") % F.lit(2**width)).alias(
            f"c{c}"
        )
        for c in range(chunks)
    ]
    bands = sigs.select(F.col(id_col), "simhash", *chunk_exprs).select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(F.array(*[F.col(f"c{c}") for c in range(chunks)])).alias(
            "chunk_idx", "chunk_val"
        ),
    )
    id_type = df.schema[id_col].dataType.simpleString()
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        s = pdf["simhash"].to_numpy(dtype=np.uint64).astype(np.uint32)
        # Work on upper-triangle pair vectors, never an n x n matrix.
        ia, ib = np.triu_indices(n, k=1)
        x = s[ia] ^ s[ib]
        ham = lut[x.view(np.uint8).reshape(-1, 4)].sum(axis=-1)
        keep = ham <= max_hamming
        # Emit-once: skip pairs already found by an earlier chunk.
        this_chunk = int(pdf["chunk_idx"].iloc[0])
        mask = np.uint32(2**width - 1)
        for cp in range(this_chunk):
            sh = np.uint32(width * cp)
            keep &= ((s[ia] >> sh) & mask) != ((s[ib] >> sh) & mask)
        ids = pdf[id_col].values
        return pd.DataFrame(
            {
                "doc_a": ids[ia[keep]],
                "doc_b": ids[ib[keep]],
                "hamming": ham[keep].astype("int64"),
            }
        )

    return bands.groupBy("chunk_idx", "chunk_val").applyInPandas(
        bucket_pairs, f"doc_a {id_type}, doc_b {id_type}, hamming long"
    )
