"""Corpus curation operators — the selection stages between a cleaned
web corpus and a training run: reproducible subsampling and packing a
token budget by quality.

Both are deterministic by construction (hash-based sampling, total-
order packing): re-running the pipeline on the same input yields the
same corpus byte-for-byte, which is what makes training-data lineage
auditable. No RNG state, no ``rand()`` (nondeterministic across
retries and engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hope_graph_builder_spark.operators.dedup import hash60

_DENOM = 1_000_000


def hash_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    rate: float = 0.1,
    salt: str = "s0",
    by: str | None = None,
    rates: dict | None = None,
) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose salted 60-bit
    key hash lands under ``rate`` of the hash space (million-slot
    resolution). The production sampling idiom — unlike ``rand()`` it
    is reproducible across runs/retries/engines, stable under
    repartitioning, and consistent ACROSS TABLES (the same key samples
    in or out everywhere, so sampled fact/dim tables still join).
    ``salt`` decorrelates independent samples of the same corpus.

    Stratified form: ``by`` + ``rates`` ({stratum: rate}) applies a
    per-stratum rate (e.g. per-language quotas); strata absent from
    ``rates`` fall back to ``rate``.

    Scale: a pure map-stage filter (md5 + compare, codegen) — no
    shuffle, no state; pushes through any downstream plan."""
    h = F.pmod(
        hash60(F.concat(F.col(key_col).cast("string"), F.lit("#" + salt))),
        F.lit(_DENOM),
    )
    if by is not None and rates:
        thr = None
        for v, r in sorted(rates.items()):
            cond = F.col(by) == F.lit(v)
            t = F.lit(int(round(r * _DENOM)))
            thr = F.when(cond, t) if thr is None else thr.when(cond, t)
        thr = thr.otherwise(F.lit(int(round(rate * _DENOM))))
    else:
        thr = F.lit(int(round(rate * _DENOM)))
    return df.filter(h < thr)


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of
    its distinct word ``n``-grams appear anywhere in the evaluation
    benchmark texts (the GPT-3-family rule — documents sharing a
    13-gram with a benchmark are dropped or audited before training;
    publish ``n_hits``/``n_grams`` rather than baking in a threshold
    so the caller picks drop-any vs fraction policies). One row per
    input document: ``(id, n_grams, n_hits, contaminated)`` with
    ``contaminated`` = any overlap, ``n_grams`` = 0 for documents
    shorter than ``n`` tokens (never flagged).

    Scale shape: the benchmark side is tiny by nature (eval suites,
    not corpora) — its distinct-gram table BROADCASTS, so the doc side
    is one explode → broadcast left join → groupBy(id) with map-side
    combine: a single doc-keyed exchange, no shuffle of the gram
    table. Drop the broadcast hint if the "benchmark" is itself a
    corpus (AQE picks the shuffle join)."""
    from hope_graph_builder_spark.operators.text import _lower_tokens, _word_ngrams

    dg = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(_word_ngrams(_lower_tokens(F.col(text_col)), n))
        ).alias("g"),
    )
    bg = (
        bench.select(
            F.explode(
                F.array_distinct(
                    _word_ngrams(_lower_tokens(F.col(bench_text_col)), n)
                )
            ).alias("g")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        dg.join(F.broadcast(bg), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("g")).alias("n_grams"),
            F.count(F.col("_hit")).alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    quality_col: str = "quality",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> DataFrame:
    """Greedy quality-first packing: order documents by (quality desc,
    id) and keep the longest prefix whose running token sum stays
    within ``budget`` (a document that would cross the line — and
    everything after it — is excluded; prefix semantics, not
    knapsack). Output adds ``cum_tokens`` (the inclusive running sum
    at each kept document).

    The naive formulation is one global-order window — a single
    partition pulling the whole corpus through one task. This one is
    the classic two-phase distributed prefix sum, with DETERMINISTIC
    value-based buckets instead of sampled range bounds (quality is
    assumed in [0, 1]):

    1. bucket = floor((1 - quality) · n_buckets), so bucket order IS
       quality order (every doc in bucket i outranks every doc in
       bucket i+1) with no quantile estimation and no RNG;
    2. per-bucket token totals (one tiny groupBy) → exclusive prefix
       offsets via a window over ≤ n_buckets ROWS (trivially small —
       the only unpartitioned window, bounded by the bucket count,
       never by the data);
    3. within-bucket running sums partitioned by bucket (parallel
       across buckets) + broadcast offset join = exact global
       cumulative sum, integer arithmetic throughout."""
    q = F.col(quality_col)
    b = F.least(
        F.floor((F.lit(1.0) - q) * F.lit(n_buckets)), F.lit(n_buckets - 1)
    ).cast("int")
    per = df.withColumn("_b", F.greatest(b, F.lit(0)))
    totals = per.groupBy("_b").agg(F.sum(F.col(tokens_col).cast("long")).alias("_t"))
    offs = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_t").over(
                Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    ).select("_b", "_off")
    w = Window.partitionBy("_b").orderBy(q.desc(), F.col(id_col))
    return (
        per.withColumn("_c", F.sum(F.col(tokens_col).cast("long")).over(w))
        .join(F.broadcast(offs), "_b")
        .withColumn("cum_tokens", F.col("_c") + F.col("_off"))
        .filter(F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("_b", "_c", "_off")
    )


def shard_shuffle(
    df: DataFrame,
    n_shards: int,
    salt: str = "sh0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the last stage before
    a training run: every row gets ``(shard, pos)`` where ``shard`` is
    the salted 60-bit key hash mod ``n_shards`` and ``pos`` is the
    row's rank within its shard ordered by (hash, id). Reading shards
    in order yields a reproducible pseudo-random permutation of the
    corpus — same bytes on every rerun/retry/engine (no ``rand()``,
    no ``shuffle()``), re-shuffleable by changing ``salt``, and
    near-uniform shard sizes regardless of input order or skew.

    Scale shape: the hash is a map stage; the only exchange is the
    hash-partition by ``shard`` that the window requires — which is
    exactly the physical layout a sharded writer needs anyway
    (``.repartition("shard")`` + ``sortWithinPartitions`` falls out of
    the same plan), so position assignment is free relative to the
    write. Each shard sorts independently — no global total order, no
    single-partition window."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = hash60(F.concat(F.col(id_col).cast("string"), F.lit("#" + salt)))
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h")
    )


def chunk_tokens(
    df: DataFrame,
    seq_len: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split every document into training sequences of ``seq_len``
    whitespace tokens with ``overlap`` tokens of context carried
    between consecutive chunks (stride = seq_len − overlap) — the
    fixed-window chunking stage between a cleaned corpus and a
    tokenizer/loader. One output row per chunk: ``(id, chunk_id,
    n_tokens, chunk_text)``, ``chunk_id`` dense from 0 in document
    order; the final chunk is shorter when the document doesn't divide
    evenly, and a tail window that would contain NO unseen tokens is
    not emitted (every token appears in ≥ 1 chunk, the last token's
    chunk is never fully redundant). Empty documents produce no rows.

    Scale shape: pure map stage — tokenize once per row, explode the
    chunk starts, slice the hoisted token array (element references
    only, no re-tokenization per chunk); zero shuffles, pushes through
    any upstream filter."""
    if seq_len < 1 or not 0 <= overlap < seq_len:
        raise ValueError(
            f"need seq_len >= 1 and 0 <= overlap < seq_len "
            f"(got seq_len={seq_len}, overlap={overlap})"
        )
    stride = seq_len - overlap
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    d = df.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n"))
    starts = F.filter(
        F.when(
            F.col("_n") > 0, F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).otherwise(F.array().cast("array<int>")),
        lambda s: (s == 0) | (s + overlap < F.col("_n")),
    )
    return (
        d.select(id_col, "_toks", F.explode(starts).alias("_s"))
        .select(
            id_col,
            (F.col("_s") / stride).cast("long").alias("chunk_id"),
            F.slice(F.col("_toks"), F.col("_s") + 1, seq_len).alias("_c"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_c").cast("long").alias("n_tokens"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )


def quota_cap(
    df: DataFrame,
    quota: int,
    by: str = "source",
    id_col: str = "doc_id",
    salt: str = "q0",
    quality_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group corpus balancing: keep at most ``quota`` rows per
    ``by`` group (host, source, language — the cap that stops one
    domain from dominating a crawl-derived training set). Selection is
    deterministic: with ``quality_col`` (values in [0, 1]) the TOP
    ``quota`` by (quality desc, id) survive; otherwise a reproducible
    pseudo-random ``quota`` — rank by the salted 60-bit key hash
    (hash asc, id asc), the same no-rand() idiom as hash_sample.
    Output = surviving rows + ``grp_rank`` (0-based rank within the
    group under the selection order).

    The naive form is one window over each whole group — a single
    task sorting 10⁸ rows when one host dominates. This is the exact
    two-phase rank (pack_token_budget's bucket decomposition, applied
    per group): bucket by the order value (hash prefix, or quality
    band — bucket order IS selection order), count per (group,
    bucket), per-group exclusive prefix offsets over ≤ ``n_buckets``
    rows, then rank ONLY inside live buckets. Buckets whose offset is
    already ≥ ``quota`` are dropped by the count join BEFORE any
    sort — for a 10⁸-row host at quota 10³, ~1/n_buckets of the group
    reaches the window and the rest is filtered at the exchange, so
    the giant-group sort never materializes. Exchanges: one map-side-
    combining count, one tiny offsets window, one (group, bucket)
    window over survivors."""
    if quota < 1 or n_buckets < 1:
        raise ValueError(f"need quota >= 1 and n_buckets >= 1 "
                         f"(got quota={quota}, n_buckets={n_buckets})")
    if quality_col is not None:
        q = F.col(quality_col)
        b = F.greatest(
            F.least(F.floor((F.lit(1.0) - q) * F.lit(n_buckets)),
                    F.lit(n_buckets - 1)),
            F.lit(0),
        ).cast("int")
        order = [q.desc(), F.col(id_col).asc()]
        d = df.withColumn("_b", b)
    else:
        h = hash60(F.concat(F.col(id_col).cast("string"), F.lit("#" + salt)))
        d = df.withColumn("_h", h).withColumn(
            "_b", F.least(F.floor(F.col("_h") / F.lit((1 << 60) // n_buckets)),
                          F.lit(n_buckets - 1)).cast("int")
        )
        order = [F.col("_h").asc(), F.col(id_col).asc()]
    counts = d.groupBy(by, "_b").agg(F.count(F.lit(1)).alias("_n"))
    offs = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                Window.partitionBy(by).orderBy("_b")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    ).filter(F.col("_off") < quota).select(by, "_b", "_off")
    w = Window.partitionBy(by, "_b").orderBy(*order)
    return (
        d.join(offs, [by, "_b"])
        .withColumn(
            "grp_rank",
            (F.col("_off") + F.row_number().over(w) - 1).cast("long"),
        )
        .filter(F.col("grp_rank") < quota)
        .select(*df.columns, "grp_rank")
    )
