"""Deduplication for training-data pipelines — exact and near-dup.

Beyond-reference (SURVEY.md build plan M6; the reference has no
distinct/dedup at all, §2.6).  Five strategies, all shuffle-aware:

- exact: hash-groupBy on content (or fingerprint) — one shuffle.
- n-gram Jaccard (exact): inverted shingle index self-join — the
  textbook scalable form: |pairs sharing a shingle| not |n²|.
- MinHash + LSH: signature → bands → bucket join → verify; the 100 TB
  path where even the shingle join is too big.
- SimHash: 64-bit signature, banded hamming candidates → verify.
- embedding cosine: see operators/similarity.py (shares the kernel).

Determinism: all hash seeds fixed; every candidate pair is verified
with the EXACT measure before emission, so LSH parameters affect
recall only, never precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed MinHash permutation parameters: (a*x + b) mod PRIME, seeds fixed.
# 31-bit Mersenne prime: a,b,x < 2^31 keeps a*x+b < 2^62 — no long
# overflow under ANSI mode (2^31 hash space is ample for minhash).
_PRIME = (1 << 31) - 1
_N_HASHES = 64
_BANDS = 16  # 16 bands x 4 rows: P(candidate) ≈ 1-(1-j^4)^16 — j=0.6 → .93


def _perm_params(n: int = _N_HASHES) -> list[tuple[int, int]]:
    """Deterministic LCG-derived (a,b) pairs — no RNG dependency."""
    params, state = [], 0x9E3779B97F4A7C15
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (state % (_PRIME - 1)) or 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = state % _PRIME
        params.append((a, b))
    return params


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup keeping the smallest id per distinct content.
    One hash-aggregate shuffle on the content hash; at 100 TB, group
    on a 128-bit content digest rather than the full text so shuffle
    rows stay small (collision odds ~0 at any corpus size)."""
    return (df.groupBy(F.xxhash64(F.col(content_col)).alias("__h"))
              .agg(F.min(id_col).alias(id_col),
                   F.count("*").alias("n_copies"))
              .drop("__h"))


def word_shingles(col, n: int = 3):
    """Distinct word n-gram set of a text column (JVM-side)."""
    toks = F.split(F.trim(col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)) \
            .otherwise(F.array(F.array_join(toks, " ")))


def ngram_jaccard_pairs(df: DataFrame, content_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.6) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (id1 < id2, j >= threshold).

    Inverted-index self-join: explode distinct shingles, join on
    shingle, count common shingles per pair, j = c/(|A|+|B|-c).
    Shuffle cost is Σ|shingles| (linear in corpus), plus the pair
    aggregation — the standard scalable exact form.  At extreme scale
    cap shingle document-frequency (drop stop-shingles) or switch to
    minhash_lsh_pairs; kept exact here because it IS the oracle.
    """
    sh = (df.select(F.col(id_col).alias("id"),
                    word_shingles(F.col(content_col), n).alias("sh"))
            .withColumn("n_sh", F.size("sh")))
    ex = sh.select("id", "n_sh", F.explode("sh").alias("g"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (a.join(b, (F.col("a.g") == F.col("b.g"))
                    & (F.col("a.id") < F.col("b.id")))
              .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
              .agg(F.count("*").alias("common"),
                   F.first("a.n_sh").alias("n1"),
                   F.first("b.n_sh").alias("n2")))
    j = F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (pairs.withColumn("jaccard", F.round(j, 4))
                 .filter(F.col("jaccard") >= threshold)
                 .select("id1", "id2", "jaccard"))


def minhash_signatures(df: DataFrame, content_col: str, id_col: str,
                       n: int = 3) -> DataFrame:
    """64-hash MinHash signature per doc over word-shingle sets.
    Shingles are hashed JVM-side (xxhash64) then each permutation is
    min-reduced with array expressions — no Python, no UDF."""
    params = _perm_params()
    sh = df.select(F.col(id_col).alias("id"),
                   word_shingles(F.col(content_col), n).alias("sh"))
    hashed = sh.withColumn(
        "hv", F.transform("sh", lambda g: F.pmod(F.xxhash64(g), F.lit(_PRIME))))
    sig_cols = [
        F.array_min(F.transform(
            "hv", lambda x: F.pmod(x * F.lit(a) + F.lit(b), F.lit(_PRIME))))
        .alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    return hashed.select("id", F.array(*sig_cols).alias("sig"))


def minhash_lsh_pairs(df: DataFrame, content_col: str, id_col: str,
                      n: int = 3, threshold: float = 0.6,
                      bands: int = _BANDS) -> DataFrame:
    """MinHash-LSH candidate generation + EXACT Jaccard verification.

    banding: signature split into ``bands`` bands of 64/bands rows;
    docs sharing any full band land in one bucket (hash-shuffle on
    the band key — linear, never n²).  Candidates are then verified
    with exact n-gram Jaccard, so output precision is exact and only
    recall depends on (bands, rows): at j=threshold=0.6, recall≈0.93;
    at the planted-dup regime j≥0.9, recall≈1-1e-10.
    """
    rows_per_band = _N_HASHES // bands
    sigs = minhash_signatures(df, content_col, id_col, n)
    band_rows = sigs.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.xxhash64(F.concat_ws(
                         ",", *[F.element_at("sig", bi * rows_per_band + r + 1)
                                for r in range(rows_per_band)])).alias("bh"))
            for bi in range(bands)])).alias("b"))
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (a.join(b, (F.col("a.b.band") == F.col("b.b.band"))
                   & (F.col("a.b.bh") == F.col("b.b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
             .distinct())
    # exact verification — join the shingle sets back in
    sh = (df.select(F.col(id_col).alias("id"),
                    word_shingles(F.col(content_col), n).alias("sh")))
    verified = (cand
                .join(sh.select(F.col("id").alias("id1"), F.col("sh").alias("sh1")), "id1")
                .join(sh.select(F.col("id").alias("id2"), F.col("sh").alias("sh2")), "id2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    return (verified.withColumn("jaccard", F.round(inter / union, 4))
                    .filter(F.col("jaccard") >= threshold)
                    .select("id1", "id2", "jaccard"))


def simhash(col, bits: int = 64):
    """64-bit SimHash over whitespace tokens: per-token xxhash64, sum
    ±1 per bit position weighted by token frequency, sign → bit.
    Pure array expressions."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    th = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_sum(i: int):
        # closure factory: a default-arg lambda would change the lambda
        # arity and make pyspark pass the loop index as a Column
        mask = F.shiftleft(F.lit(1).cast("long"), i)
        return F.aggregate(
            th, F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1))

    out = F.lit(0).cast("long")
    for i in range(bits):
        # bitwiseOR (not +) so bit 63 (sign bit) can't overflow
        bit = F.when(bit_sum(i) > 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(bit)
    return out


def simhash_pairs(df: DataFrame, content_col: str, id_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation: split the 64-bit signature into 4 16-bit
    chunks — any pair within hamming ≤ 3 must agree on ≥1 chunk
    (pigeonhole), so an equi-join per chunk finds all candidates with
    a linear shuffle; then verify with bit_count(xor).
    """
    sigs = df.select(F.col(id_col).alias("id"),
                     simhash(F.col(content_col)).alias("sig"))
    chunks = sigs.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned("sig", c * 16)
                      .bitwiseAND(F.lit(0xFFFF)).alias("ck"))
            for c in range(4)])).alias("c"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, (F.col("a.c.chunk") == F.col("b.c.chunk"))
                   & (F.col("a.c.ck") == F.col("b.c.ck"))
                   & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                     F.col("a.sig").alias("s1"), F.col("b.sig").alias("s2"))
             .distinct())
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id1", "id2", "hamming"))
