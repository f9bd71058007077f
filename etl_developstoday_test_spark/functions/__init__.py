"""Engine-wide expression helpers.

Two concerns live here:

1. **Cross-engine numeric determinism.** Floating-point SUM/AVG results
   depend on accumulation order, which differs between Spark partitions
   and any single-node oracle. Every aggregate the engine exposes
   therefore sums through an exact DECIMAL(30,10) accumulator and casts
   the final value to double: per-row double arithmetic is IEEE-754
   deterministic, the decimal sum is order-independent, and the final
   cast is deterministic — so Spark output is bit-identical to a DuckDB
   oracle running the same shape. This costs one widening cast per row
   and keeps everything inside WholeStageCodegen (no UDFs).

2. **Portable hashing.** Dedup/LSH operators need hash functions that
   exist verbatim in other engines for verification. ``md5_long`` maps a
   string to a non-negative 60-bit integer via md5 — reproducible in
   DuckDB as ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ACC_DECIMAL = "decimal(30,10)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(ACC_DECIMAL)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(F.lit(1))


def fan_out(df, multiplier: int = 1, cap: int | None = None):
    """Ensure at least default-parallelism partitions before per-row-heavy
    compute (hashing, shingling, vector math, Python batches).

    Small single-file scans arrive as ONE partition, serializing all
    downstream expression work onto one core; a round-robin repartition
    of a small input costs ~nothing and buys full parallelism. At real
    scale the scan already has ≥ parallelism partitions and this is a
    no-op — so it never *adds* a shuffle where data is already wide.

    ``cap`` bounds the target width: Python-batch stages (mapInPandas)
    pay a per-worker interpreter/pandas startup, so tiny inputs should
    not spawn one worker per core.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if cap is not None:
        target = min(target, cap)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_ntile(df, n_tiles: int, order_cols, tile_col: str = "tile"):
    """SQL-standard ``ntile(n) OVER (ORDER BY order_cols)`` with NO
    single-task stage — the scale-safe replacement for a partitionless
    ranking window (which Spark executes as ``Exchange SinglePartition``
    + one task holding the ENTIRE input: an OOM/straggler at 10⁹+ rows).

    Plan shape (three pieces, all distributed):
    1. ``repartitionByRange(P, order_cols)`` — ONE full-data exchange;
       partition i holds strictly smaller keys than partition i+1. P is
       passed explicitly so AQE neither coalesces nor splits the range
       partitions (either would break the pid→offset mapping).
    2. per-partition local rank — ``sortWithinPartitions`` + the
       ``monotonically_increasing_id`` decomposition (pid = id >> 33,
       local row number = low 33 bits + 1): no second exchange. The
       counts branch reads the SAME exchange (ReuseExchange) and
       aggregates P (pid, count) rows.
    3. cumulative offsets over the P-row counts table (a window over P
       rows — bounded by the partition parameter, never by data) are
       broadcast back; global rank = offset(pid) + local rank, and the
       tile falls out of the standard quotient/remainder bucket sizes
       (first N mod n tiles get ceil(N/n) rows) in exact integer
       arithmetic (``div`` — double division could round across a
       bucket boundary).

    ``order_cols`` MUST be a total order (every caller ties by a key
    column) — with ties, tile assignment is engine-ambiguous under any
    implementation, and range partitioning needs the order to be total
    to keep partitions disjoint. Returns ``df`` with ``tile_col``
    (INT, 1-based) appended; row order is not preserved (it never is
    after a shuffle).

    The offsets and data branches MUST read one physical execution of
    the range exchange (divergent re-execution could re-sample range
    boundaries and desync pid↔offset). Spark's ReuseExchange / AQE
    stage cache guarantees that today — pinned by the plan tests and
    the ntile-equivalence property suite — and a defensive ``persist``
    of the exchanged frame is deliberately NOT used: it would
    materialize the ENTIRE input (this operator exists for the
    10⁹+-row case) to insure against an optimizer regression the test
    suite would catch anyway.
    """
    spark = df.sparkSession
    reserved = {"_mid", "_pid", "_lrn", "_off", "_n", tile_col}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"exact_ntile: input column(s) {sorted(clash)} collide with "
            "the operator's reserved working columns (withColumn would "
            "silently REPLACE them) — rename before calling"
        )
    try:
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:  # e.g. set to "auto" on some deployments
        p = spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]

    exchanged = df.repartitionByRange(p, *cols)
    low33 = (1 << 33) - 1
    data = (
        exchanged.sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", 33))
        .withColumn("_lrn", F.col("_mid").bitwiseAND(F.lit(low33)) + 1)
        .drop("_mid")
    )
    counts = exchanged.groupBy(
        F.spark_partition_id().cast("long").alias("_pid")
    ).agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql import Window

    w_prev = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "_pid",
        F.coalesce(F.sum("_c").over(w_prev), F.lit(0)).alias("_off"),
        F.sum("_c").over(Window.partitionBy()).alias("_n"),
    )
    joined = data.join(F.broadcast(offs), "_pid")
    tile = F.expr(
        f"""CAST(CASE
          WHEN (_n div {n_tiles}) = 0 THEN _off + _lrn
          WHEN _off + _lrn <= (_n % {n_tiles}) * ((_n div {n_tiles}) + 1)
            THEN (_off + _lrn + (_n div {n_tiles}))
                 div ((_n div {n_tiles}) + 1)
          ELSE (_n % {n_tiles})
               + ((_off + _lrn - (_n % {n_tiles}) * ((_n div {n_tiles}) + 1)
                   + (_n div {n_tiles}) - 1) div (_n div {n_tiles}))
        END AS INT)"""
    )
    return (
        joined.withColumn(tile_col, tile)
        .drop("_pid", "_lrn", "_off", "_n")
    )


def md5_long(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative hash of a string (md5-based)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (after trim)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def let(value: Column, body) -> Column:
    """Bind ``value`` once per row and reference it many times in
    ``body`` (a lambda Column→Column).

    Catalyst's CollapseProject re-inlines aliased expressions into every
    use site — an expression like ``split()`` referenced N times inside
    an array lambda is otherwise *evaluated* N times per row (measured
    ~10× slowdown on shingling). Wrapping the value in a 1-element array
    and going through ``transform`` binds it as a real lambda variable,
    forcing single evaluation.
    """
    return F.get(F.transform(F.array(value), body), 0)


def word_shingles(tok_col: Column, n: int = 3) -> Column:
    """Contiguous n-word shingles of a token array (order preserved,
    duplicates kept; wrap with array_distinct for set semantics).

    Documents shorter than n tokens yield an empty array — guarded
    explicitly because Spark's ``sequence(0, -1)`` counts *down* rather
    than returning empty.

    ``tok_col`` is ``let``-bound INTERNALLY: the body references the
    token array ~n+2 times (size guard, sequence bound, one F.get per
    offset), so a caller passing a raw ``split()`` expression would
    otherwise re-tokenize the text once per reference PER ELEMENT —
    CollapseProject re-inlines aliased expressions — a measured ~10×
    slowdown on shingling. Binding here makes every call site safe by
    construction (an already-bound lambda variable just double-binds,
    which is free)."""

    def body(toks: Column) -> Column:
        shingles = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.get(toks, i + off) for off in range(n)]
            ),
        )
        empty = F.array().cast("array<string>")
        return F.when(F.size(toks) >= n, shingles).otherwise(empty)

    return let(tok_col, body)


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product of two double arrays.

    The fold order (((0+x1)+x2)+...) is fixed, so the result is
    bit-reproducible by any engine folding the same way (DuckDB:
    ``list_reduce(list_transform(list_zip(a,b), p -> p[1]*p[2]),
    (x,y) -> x+y)``).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays, deterministic fold form:
    dot / sqrt(norm_a * norm_b)."""
    return dot_fold(a, b) / F.sqrt(dot_fold(a, a) * dot_fold(b, b))


def canonicalize_url(col: Column | str) -> Column:
    """URL canonicalization for web-corpus dedup: two raw URLs that
    differ only in scheme, a ``www.`` prefix, tracking query parameters
    (``utm_*``, ``sessionid``, ``ref``), fragment, or a trailing slash
    are the SAME page, and doc-level exact dedup misses that unless the
    key is canonicalized first.

    Pure regexp_replace chain in codegen, deliberately written with
    EMPTY or LITERAL replacements only — no backreferences (Spark's
    Java regex and DuckDB's RE2 spell them differently) and no
    lookarounds (RE2 has none), so the oracle twin uses byte-identical
    patterns (DuckDB side passes the 'g' flag to match Spark's
    replace-all default). Every tracking-param rule consumes its own
    leading ``&``/``?`` anchor, so a param whose NAME merely ends in a
    tracking name (``href``, ``xref``, ``xutm_a``) can never match
    mid-string: lowercase → strip scheme → strip www. → strip fragment
    → strip &-anchored tracking params → strip ?-anchored first
    tracking param → strip separator debris → strip trailing slash.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.lower(c)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")
    # '&'-anchored tracking param anywhere (anchor consumed with it)
    u = F.regexp_replace(u, r"&(utm_[a-z]+|sessionid|ref)=[^&#]*", "")
    # first-position tracking param with params after it: keep the '?'
    u = F.regexp_replace(u, r"\?(utm_[a-z]+|sessionid|ref)=[^&#]*&", "?")
    # first-and-only tracking param: drop it and its '?'
    u = F.regexp_replace(u, r"\?(utm_[a-z]+|sessionid|ref)=[^&#]*$", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    # trailing path slash, both before a query string and at the end
    u = F.regexp_replace(u, r"/\?", "?")
    u = F.regexp_replace(u, r"/$", "")
    return u
