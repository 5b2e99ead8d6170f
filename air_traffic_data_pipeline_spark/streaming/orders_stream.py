"""Streaming incremental mirror over the ORDERS table: RFM segmentation.

Same incremental-materialized-view discipline as documents_stream.py:
micro-batches land mergeable per-key partials; the final answer is one
re-aggregate over the partials plus the shared batch scoring kernel.
Bitwise-equal to the one-shot batch query (its SQL is the oracle), proven
under adversarial arrival order by the pytest.

The RFM-specific design choice (the r7 VERDICT's "interesting" one):
the quintile boundaries are ORDER STATISTICS over the per-customer state,
which no bounded sketch reproduces exactly. Two incremental options:

1. fold a mergeable quantile sketch (KLL / t-digest) over the stream and
   read boundaries off the sketch — O(sketch) state, but the boundaries
   are approximate, so the released segmentation could differ from a
   batch backfill (an audit nightmare for a marketing cut that gates
   spend);
2. maintain EXACT mergeable per-customer state — max(last order date),
   count, exact DECIMAL(18,2) spend sum, all commutative+associative,
   so arrival order provably cannot change the state — and recompute the
   exact boundaries from that state at emission.

This module takes (2): the state table is customer-sized (orders-of-
magnitude smaller than the order stream at 100 TB — it is the thing a
warehouse already materializes as a customer dimension), and one
percentile aggregate over it per emission is the same cost the batch
query pays. A sketch would only win if even the customer dimension were
too large to scan at emission time, at the price of approximate
boundaries; that tradeoff is documented here and deliberately not taken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..session import tune_session
from .events_stream import _STAGE_ROOT, _stage_ordered

def _int_count_guarded(c_big):
    """Cast a bigint multiplicity to int for array_repeat, raising on
    2^31 overflow instead of silently wrapping (r9 ADVICE). The
    when/otherwise keeps raise_error inside the row expression so
    Catalyst cannot prune it away."""
    return F.when(c_big <= F.lit(2147483647), c_big.cast("int")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("net multiset count overflows int32: "),
                c_big.cast("string"),
            )
        ).cast("int")
    )


ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def _stage_order_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three mtime-ordered batches splitting orders by o_orderkey terciles
    — id-ordered arrival; the adversarial-order pytest re-runs the merge
    on shuffled partials instead of restaging."""
    import hashlib

    from ..plans.tables import load

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/orders_{key}"

    def build():
        from pyspark.sql import Window

        o = load(spark, sf_dir, "orders")
        n = o.count()
        lo, hi = n // 3, 2 * n // 3
        ranked = o.withColumn(
            "rn", F.row_number().over(Window.orderBy("o_orderkey"))
        )
        return [
            ranked.filter(F.col("rn") <= lo).drop("rn"),
            ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop("rn"),
            ranked.filter(F.col("rn") > hi).drop("rn"),
        ]

    return _stage_ordered(
        d, ["01_lo.parquet", "02_mid.parquet", "03_hi.parquet"], build
    )


def rfm_partial(batch_df: DataFrame) -> DataFrame:
    """Per-customer mergeable partial for one micro-batch: max order date,
    order count, exact DECIMAL spend sum (kept DECIMAL in the partial so
    the cross-batch merge stays exact; the double cast happens once,
    after the final merge, exactly where the batch query casts)."""
    return (
        batch_df.select(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("o_custkey")
        .agg(
            F.max("d").alias("last_d"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("p").cast("decimal(18,2)").alias("monetary_dec"),
        )
    )


def rfm_merge_partials(partials: DataFrame) -> DataFrame:
    """Merge per-batch partials into the per-customer state the batch
    query computes: every column is distributive (max of maxes, sum of
    counts, sum of exact decimals), so ANY arrival order yields the
    identical table."""
    return partials.groupBy("o_custkey").agg(
        F.max("last_d").alias("last_d"),
        F.sum("freq").cast("bigint").alias("freq"),
        F.sum("monetary_dec").cast("double").alias("monetary"),
    )


def incremental_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental RFM — bitwise equal to
    ``plans.relational.rfm_segments`` (its SQL is the oracle)."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import rfm_from_per_customer

    tune_session(spark)
    d = _stage_order_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_rfm_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        rfm_partial(batch_df).write.mode("overwrite").parquet(
            f"{part_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(ORDERS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        per = rfm_merge_partials(spark.read.parquet(f"{part_dir}/batch=*"))
        out, _ = tracked_local_checkpoint(
            rfm_from_per_customer(per), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def rfm_from_per_customer_partials_check(
    spark: SparkSession, sf_dir: str, order: str
) -> DataFrame:
    """Test-support replay: fold the three tercile partials PAIRWISE in a
    chosen arrival order (``reversed`` / ``odd_even``) — an explicit
    incremental state fold rather than one flat re-aggregate — and score
    the final state. Every partial column is distributive, so any order
    must reproduce the batch segmentation bitwise; the pytest asserts
    exactly that."""
    from pyspark.sql import Window

    from ..plans.relational import rfm_from_per_customer
    from ..plans.tables import load

    o = load(spark, sf_dir, "orders")
    n = o.count()
    lo, hi = n // 3, 2 * n // 3
    ranked = o.withColumn("rn", F.row_number().over(Window.orderBy("o_orderkey")))
    batches = [
        ranked.filter(F.col("rn") <= lo).drop("rn"),
        ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop("rn"),
        ranked.filter(F.col("rn") > hi).drop("rn"),
    ]
    parts = [rfm_partial(b) for b in batches]
    if order == "reversed":
        parts = parts[::-1]
    elif order == "odd_even":
        parts = [parts[2], parts[0], parts[1]]
    state = parts[0]
    for p in parts[1:]:
        state = (
            state.unionByName(p)
            .groupBy("o_custkey")
            .agg(
                F.max("last_d").alias("last_d"),
                F.sum("freq").cast("bigint").alias("freq"),
                F.sum("monetary_dec").cast("decimal(18,2)").alias("monetary_dec"),
            )
        )
    per = state.select(
        "o_custkey",
        "last_d",
        "freq",
        F.col("monetary_dec").cast("double").alias("monetary"),
    )
    return rfm_from_per_customer(per)


LINEITEM_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
    ]
)


def _stage_lineitem_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three mtime-ordered batches splitting the (l_orderkey, l_partkey)
    projection by l_orderkey terciles — ORDER-ATOMIC slicing (an order's
    lineitems never straddle a batch), the transactional unit a lineitem
    source actually emits, and the property that makes per-batch
    co-purchase pair counting exact."""
    import hashlib

    from ..plans.tables import load

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/lineitem_{key}"

    def build():
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        # Tercile cut points via approxQuantile (relativeError=0 → exact,
        # computed distributed): TWO scalars reach the driver instead of
        # every distinct orderkey. The mirrors are arrival-order-free by
        # design, so the cut points may sit anywhere — order-atomicity
        # (an order never straddles a batch) is preserved because both
        # filters compare the full l_orderkey.
        ks = li.select("l_orderkey").distinct()
        lo, hi = ks.approxQuantile("l_orderkey", [1 / 3, 2 / 3], 0.0)
        return [
            li.filter(F.col("l_orderkey") <= lo),
            li.filter((F.col("l_orderkey") > lo) & (F.col("l_orderkey") <= hi)),
            li.filter(F.col("l_orderkey") > hi),
        ]

    return _stage_ordered(
        d, ["01_lo.parquet", "02_mid.parquet", "03_hi.parquet"], build
    )


def _incremental_from_pair_state(spark: SparkSession, sf_dir: str, tag, kernel) -> DataFrame:
    """The shared scaffolding of the graph-family mirrors: stage
    order-atomic lineitem batches, land per-batch (pa, pb, cnt)
    co-purchase pair partials via Structured Streaming (the pair kernel
    is per-ORDER local, so batch partials are exact and MERGE BY INTEGER
    SUM under any arrival order), then run ``kernel`` over the merged
    pairs and checkpoint the small result. One landed state serves every
    graph query — distance reads 1/cnt, cohesion reads the pair support,
    community reads cnt as the vote weight, centrality reads cnt as the
    transition weight — which is exactly the point: at 100 TB you land
    the distinct-pair-sized state once and fan the kernels out over it."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import copurchase_pairs

    tune_session(spark)
    d = _stage_lineitem_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_{tag}_{_uuid.uuid4().hex[:8]}"
    pairs_dir = f"{base}/pairs"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        copurchase_pairs(batch_df).write.mode("overwrite").parquet(
            f"{pairs_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(LINEITEM_PAIR_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{pairs_dir}/batch=*")
            .groupBy("pa", "pb")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        )
        out, _ = tracked_local_checkpoint(kernel(merged), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental co-purchase shortest paths — bitwise equal to
    the one-shot ``plans.relational.shortest_path`` (its SQL is the
    oracle).

    Edge weights (1/cnt) and therefore distances are corpus-global (a
    later batch can SHORTEN an edge by raising its count), so emission
    recomputes weights from the merged exact counts and runs the shared
    K-round relaxation kernel — the corpus-global posture of the LM
    mirrors, with distinct-pair-sized state and lineitems read once."""
    from ..plans.relational import shortest_path_from_pairs

    return _incremental_from_pair_state(spark, sf_dir, "sp", shortest_path_from_pairs)


def incremental_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental histogram quantile sketch — bitwise equal to
    the one-shot ``plans.relational.quantile_sketch`` (its SQL is the
    oracle).

    The discrete-domain incremental design: o_totalprice is 2-dp money,
    so a per-batch (value, count) table is an EXACT compressed multiset
    whose partials merge by integer SUM under any arrival order — state
    is distinct-price-sized, not row-sized. Because the batch query's
    [lo, hi], bin counts AND exact percentile are all functions of the
    multiset, emission reconstructs the value frame from the merged
    partials and runs the shared ``quantile_sketch_from`` tail — nothing
    approximate is frozen, so the mirror matches the data-dependent
    batch binning bitwise. (For continuous domains the production
    variant freezes [lo, hi] up front — the semdedup frozen-quantizer
    posture — and bin partials merge directly.)"""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import quantile_sketch_from

    tune_session(spark)
    d = _stage_order_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_qsk_{_uuid.uuid4().hex[:8]}"
    vals_dir = f"{base}/vals"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.groupBy(F.col("o_totalprice").alias("x")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        ).write.mode("overwrite").parquet(f"{vals_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(ORDERS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{vals_dir}/batch=*")
            .groupBy("x")
            .agg(F.sum("c").alias("c_big"))
        )
        # array_repeat needs an int count; keep the merged sum as bigint
        # and fail loudly on 2^31 overflow instead of silently wrapping.
        xs = merged.select(
            F.explode(
                F.array_repeat(F.col("x"), _int_count_guarded(F.col("c_big")))
            ).alias("x")
        )
        out, _ = tracked_local_checkpoint(
            quantile_sketch_from(xs), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental k-core decomposition — bitwise equal to the
    one-shot ``plans.relational.kcore_decomposition`` (its SQL is the
    oracle).

    Same staged pair state as the shortest-path mirror (order-atomic
    batches make per-batch (pa, pb, cnt) partials exact; they merge by
    integer SUM under any arrival order), but k-core consumes only the
    pair SUPPORT — degree is the number of distinct surviving partners,
    counts are irrelevant — so one landed state serves both the distance
    query (needs the exact counts for 1/cnt weights) and the cohesion
    query (needs only which pairs exist). Core membership is corpus-
    global (a later batch can RESCUE a peeled node by adding partners),
    so emission runs the shared peel kernel over the merged pairs."""
    from ..plans.relational import kcore_from_pairs

    return _incremental_from_pair_state(spark, sf_dir, "kc", kcore_from_pairs)


def incremental_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental LPA communities — bitwise equal to the
    one-shot ``plans.relational.label_propagation_communities`` (its SQL
    is the oracle).

    Vote weights are the corpus-global co-purchase COUNTS — a later batch
    can FLIP a plurality vote by raising one label's total — so emission
    runs the shared synchronous-vote kernel over the merged exact counts;
    the integer vote sums that make the batch query engine-deterministic
    are the same property that makes the merged state exact here."""
    from ..plans.relational import label_propagation_from_pairs

    return _incremental_from_pair_state(
        spark, sf_dir, "lp", label_propagation_from_pairs
    )


def incremental_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental integer PageRank — bitwise equal to the
    one-shot ``plans.relational.pagerank_copurchase`` (its SQL is the
    oracle).

    Transition weights AND the per-node out-weight normalizers are
    corpus-global counts (a later batch shifts every ratio at a touched
    node), so emission runs the shared micro-unit fixed-point kernel over
    the merged counts — the floor-division folds that make the batch
    query engine-bitwise are order-free over the merged state too."""
    from ..plans.relational import pagerank_from_pairs

    return _incremental_from_pair_state(spark, sf_dir, "pg", pagerank_from_pairs)


def incremental_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental per-node core numbers — bitwise equal to the
    one-shot ``plans.relational.core_numbers_copurchase`` (its SQL is the
    oracle).

    Fifth graph mirror off the SAME staged pair state: like k-core it
    consumes only the pair SUPPORT (coreness ignores counts), and like
    core membership, coreness is corpus-global — a later batch can raise
    a node's coreness by adding partners — so emission runs the shared
    peel-sharing decomposition kernel over the merged pairs."""
    from ..plans.relational import core_numbers_from_pairs

    return _incremental_from_pair_state(
        spark, sf_dir, "cn", core_numbers_from_pairs
    )


RETRACT_SCHEMA = T.StructType(
    [
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("sign", T.IntegerType()),
    ]
)


def _stage_retraction_batches(
    spark: SparkSession,
    sf_dir: str,
    cols: tuple[str, ...] = ("o_totalprice",),
    name: str = "orders_retract",
) -> str:
    """Four mtime-ordered batches: the three order terciles as
    (*cols, +1) INSERT rows plus a CANCELLATIONS batch carrying the same
    rows at sign -1 for every order with
    o_orderkey % RETRACT_MOD == RETRACT_RES — staged SECOND, so two
    thirds of the retractions arrive BEFORE the inserts they cancel
    (transient negative net counts mid-stream: the adversarial schedule
    a signed-sum state must shrug off)."""
    import hashlib

    from ..plans.relational import RETRACT_MOD, RETRACT_RES
    from ..plans.tables import load

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/{name}_{key}"

    def build():
        from pyspark.sql import Window

        o = load(spark, sf_dir, "orders").select("o_orderkey", *cols)
        n = o.count()
        lo, hi = n // 3, 2 * n // 3
        ranked = o.withColumn(
            "rn", F.row_number().over(Window.orderBy("o_orderkey"))
        )

        def ins(df: DataFrame) -> DataFrame:
            return df.select(*cols, F.lit(1).alias("sign"))

        cancel = o.filter(
            F.col("o_orderkey") % RETRACT_MOD == RETRACT_RES
        ).select(*cols, F.lit(-1).alias("sign"))
        return [
            ins(ranked.filter(F.col("rn") <= lo)),
            cancel,
            ins(ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi))),
            ins(ranked.filter(F.col("rn") > hi)),
        ]

    return _stage_ordered(
        d,
        [
            "01_lo.parquet",
            "02_cancel.parquet",
            "03_mid.parquet",
            "04_hi.parquet",
        ],
        build,
    )


COMPACT_EVERY = 2  # fold the batch-partial prefix every N epochs


def compact_signed_state(
    spark: SparkSession,
    state_dir: str,
    key_cols: list[str],
    epoch: int,
    val_cols: tuple[str, ...] = ("c",),
) -> None:
    """Watermark-bounded TOMBSTONE COMPACTION for signed-multiset state
    (r9 VERDICT item 5): fold every landed batch partial into ONE net
    partial and drop net-ZERO rows — a value cancelled down to zero (and
    with it a fully-cancelled customer) physically leaves the state at
    the compaction boundary instead of living forever as a (+1, -1)
    tombstone pair.

    Soundness needs no completeness assumption at all — that is the
    signed-merge dividend: merge is a commutative associative integer
    sum, so collapsing any prefix of batches into its net sum can never
    change the final merge, and dropping a net-zero row is adding zero.
    The one rule: drop ONLY net == 0. Net-NEGATIVE rows are retractions
    that arrived before their insert (the staged schedule produces them
    on purpose) and must survive compaction as pending matches; a
    compactor that dropped c < 0 would double-count the insert when it
    lands. The "watermark" here is the processing boundary after epoch
    ``epoch``: everything landed so far is foldable precisely because
    the fold is order-free, so the boundary can sit anywhere.

    Scale: one |state|-sized re-aggregate per compaction, amortized by
    COMPACT_EVERY; after compaction the state is net-multiset-sized (the
    minimum any exact retraction-capable state can be) instead of
    sum-of-batch-partials-sized. The rewrite is write-new → swap → drop,
    so a crash mid-compaction leaves either the old prefix or the new
    fold, both of which merge to the same answer. ``val_cols`` names the
    signed integer columns (default the multiset count ``c``; the daily
    statistics family folds (cents, n_orders) pairs) — a row drops only
    when EVERY net is zero.

    Crash/replay protocol (r12 hardening — the original folded INTO
    ``batch={epoch}``, a replayable integer epoch, so a foreachBatch
    retry of a compaction epoch would overwrite the fold with that
    epoch's lone partial and silently lose every earlier batch; and a
    crash between its delete loop and rename lost the state outright):
    the fold now EXCLUDES the current epoch's partial (so the retry's
    deterministic rewrite of ``batch={epoch}`` never touches folded
    data; signed sums cannot use the set-semantic dedup trick the
    dead-set compactor uses, exclusion is what prevents double-count),
    lands in ``{state_dir}.compact_tmp_e{epoch}`` first, and only then
    are sources deleted and the tmp renamed to ``batch={epoch}m`` (not a
    replayable integer name). Every crash point is recoverable: before
    the tmp's _SUCCESS exists the protocol simply restarts from intact
    sources (incomplete tmp discarded); after _SUCCESS the next call
    FINISHES the protocol (delete non-current dirs, install the fold) —
    the fold was computed before any delete, so it is complete whatever
    the delete loop managed. A replay after a fully successful
    compaction folds the fold (same net) into a fresh ``batch={epoch}m``
    — idempotent."""
    import glob
    import os
    import shutil

    cur = f"{state_dir}/batch={epoch}"
    target = f"{state_dir}/batch={epoch}m"
    tmp = f"{state_dir}.compact_tmp_e{epoch}"

    for t in glob.glob(f"{state_dir}.compact_tmp_e*"):
        if t == tmp and os.path.exists(f"{t}/_SUCCESS"):
            # interrupted between fold-write and install: finish it
            for d_ in glob.glob(f"{state_dir}/batch=*"):
                if d_ != cur:
                    shutil.rmtree(d_, ignore_errors=True)
            os.rename(t, target)
            return
        shutil.rmtree(t, ignore_errors=True)  # incomplete write — discard

    sources = [
        d_ for d_ in sorted(glob.glob(f"{state_dir}/batch=*")) if d_ != cur
    ]
    if not sources:
        return  # nothing to fold
    keep = None  # drop a row only when EVERY signed net is zero
    for v in val_cols:
        cond = F.col(v) != 0
        keep = cond if keep is None else (keep | cond)
    net = (
        spark.read.parquet(*sources)
        .groupBy(*key_cols)
        .agg(*[F.sum(v).cast("bigint").alias(v) for v in val_cols])
        .filter(keep)
    )
    net.write.mode("overwrite").parquet(tmp)
    for d_ in sources:
        shutil.rmtree(d_, ignore_errors=True)
    os.rename(tmp, target)


def incremental_quantile_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-AWARE streaming quantile sketch — bitwise equal to the
    one-shot sketch over the surviving (never-cancelled) orders (that
    batch SQL is the oracle).

    The merge semantics the insert-only incremental-MV family lacks:
    micro-batches carry SIGNED rows (+1 insert, -1 cancellation), so the
    per-batch (value, signed count) partials merge by SIGNED integer sum
    — still commutative and associative, so arrival order provably can't
    move the net state even when a retraction arrives BEFORE the insert
    it cancels (the staged schedule does exactly that: the cancellations
    batch lands second of four, driving transient negative net counts
    that the final merge resolves). Emission expands the net multiset
    through the shared sketch tail — nothing downstream knows deletions
    ever happened, which is the point: retractions are a STATE-layer
    concern, not a kernel concern. State is distinct-price-sized; a
    value cancelled down to zero leaves the state entirely."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import quantile_sketch_from

    tune_session(spark)
    d = _stage_retraction_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_qr_{_uuid.uuid4().hex[:8]}"
    vals_dir = f"{base}/vals"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.groupBy(F.col("o_totalprice").alias("x")).agg(
            F.sum("sign").cast("bigint").alias("c")
        ).write.mode("overwrite").parquet(f"{vals_dir}/batch={epoch_id}")
        if epoch_id % COMPACT_EVERY == 1:
            compact_signed_state(spark, vals_dir, ["x"], epoch_id)

    try:
        src = (
            spark.readStream.schema(RETRACT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        # net multiset: every cancellation matches an insert, so net
        # counts are >= 0 once the stream drains; the filter makes the
        # zero-count drop explicit (array_repeat(x, 0) would also vanish)
        merged = (
            spark.read.parquet(f"{vals_dir}/batch=*")
            .groupBy("x")
            .agg(F.sum("c").alias("c_big"))
            .filter(F.col("c_big") > 0)
        )
        # overflow-guarded int cast: see _int_count_guarded
        xs = merged.select(
            F.explode(
                F.array_repeat(F.col("x"), _int_count_guarded(F.col("c_big")))
            ).alias("x")
        )
        out, _ = tracked_local_checkpoint(quantile_sketch_from(xs), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


RFM_RETRACT_SCHEMA = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("sign", T.IntegerType()),
    ]
)


def incremental_rfm_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-AWARE streaming RFM — bitwise equal to the one-shot RFM
    scoring over the surviving (never-cancelled) orders (that batch SQL
    is the oracle).

    The KEYED generalization of the retraction principle the quantile
    mirror demonstrates on a global multiset: the insert-only RFM mirror
    keeps per-customer (max date, count, decimal sum) — but max() is
    MONOTONE and cannot retract (cancel the latest order and the stored
    max is wrong with no way back). The fix is to keep the state one
    level less aggregated: a per-customer signed multiset of
    (order date, price) rows, merged by SIGNED integer sum — every
    aggregate the scoring needs is then recomputable at emission
    (last_d = max date with net count > 0, freq = net count sum,
    monetary = exact-decimal sum of price x net count). Distributive
    sums retract for free; monotone aggregates need the multiset (or
    tombstones) — that is the design note this mirror exists to pin.
    State is distinct-(customer, date, price)-sized; a customer whose
    every order is cancelled leaves the state (and the answer) entirely,
    exactly as the batch filter drops them."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import rfm_from_per_customer

    tune_session(spark)
    d = _stage_retraction_batches(
        spark,
        sf_dir,
        cols=("o_custkey", "o_orderdate", "o_totalprice"),
        name="orders_rfm_retract",
    )
    base = f"{d.rstrip('/')}_rr_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/partials"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.select(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
            "sign",
        ).groupBy("o_custkey", "d", "p").agg(
            F.sum("sign").cast("bigint").alias("c")
        ).write.mode("overwrite").parquet(f"{part_dir}/batch={epoch_id}")
        if epoch_id % COMPACT_EVERY == 1:
            compact_signed_state(
                spark, part_dir, ["o_custkey", "d", "p"], epoch_id
            )

    try:
        src = (
            spark.readStream.schema(RFM_RETRACT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        net = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("o_custkey", "d", "p")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .filter(F.col("c") > 0)
        )
        per = net.groupBy("o_custkey").agg(
            F.max("d").alias("last_d"),
            F.sum("c").cast("bigint").alias("freq"),
            F.sum(F.col("p") * F.col("c")).cast("double").alias("monetary"),
        )
        out, _ = tracked_local_checkpoint(
            rfm_from_per_customer(per), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


LINEITEM_OLS_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
    ]
)


def _stage_lineitem_ols_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three mtime-ordered batches of the OLS feature projection, split by
    l_orderkey terciles (approxQuantile cuts — two scalars to the driver)."""
    import hashlib

    from ..plans.tables import load

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/lineitem_ols_{key}"

    def build():
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_quantity", "l_discount",
            "l_extendedprice",
        )
        ks = li.select("l_orderkey").distinct()
        lo, hi = ks.approxQuantile("l_orderkey", [1 / 3, 2 / 3], 0.0)
        return [
            li.filter(F.col("l_orderkey") <= lo),
            li.filter((F.col("l_orderkey") > lo) & (F.col("l_orderkey") <= hi)),
            li.filter(F.col("l_orderkey") > hi),
        ]

    return _stage_ordered(
        d, ["01_lo.parquet", "02_mid.parquet", "03_hi.parquet"], build
    )


def incremental_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental OLS — bitwise equal to the one-shot
    ``plans.relational.ols_regression`` (its SQL is the oracle).

    The textbook mergeable-state mirror: the ten normal-equation moments
    are DECIMAL(38,0) sums — distributive, so per-batch partials merge by
    exact addition under any arrival order — and emission runs the shared
    Cramer solve on the merged moments. The model retrains continuously
    with O(groups x moments) state, never a second pass over history."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import ols_solve_from_moments

    tune_session(spark)
    d = _stage_lineitem_ols_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_ols_{_uuid.uuid4().hex[:8]}"
    mom_dir = f"{base}/moments"

    def _moments(df: DataFrame) -> DataFrame:
        li = df.select(
            "l_returnflag",
            F.col("l_quantity").cast("decimal(38,0)").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("decimal(38,0)").alias("x2"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("decimal(38,0)")
            .alias("y"),
        )
        return li.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            *[
                F.sum(expr).cast("decimal(38,0)").alias(name)
                for name, expr in [
                    ("sx1", F.col("x1")),
                    ("sx2", F.col("x2")),
                    ("sx11", F.col("x1") * F.col("x1")),
                    ("sx22", F.col("x2") * F.col("x2")),
                    ("sx12", F.col("x1") * F.col("x2")),
                    ("sy", F.col("y")),
                    ("sx1y", F.col("x1") * F.col("y")),
                    ("sx2y", F.col("x2") * F.col("y")),
                    ("syy", F.col("y") * F.col("y")),
                ]
            ],
        )

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        _moments(batch_df).write.mode("overwrite").parquet(
            f"{mom_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(LINEITEM_OLS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        cols = ["n", "sx1", "sx2", "sx11", "sx22", "sx12", "sy", "sx1y", "sx2y", "syy"]
        merged = (
            spark.read.parquet(f"{mom_dir}/batch=*")
            .groupBy("l_returnflag")
            .agg(*[F.sum(c).cast("decimal(38,0)").alias(c) for c in cols])
        )
        out, _ = tracked_local_checkpoint(
            ols_solve_from_moments(merged), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


LINEITEM_BOOT_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
    ]
)


def _stage_lineitem_boot_batches(spark: SparkSession, sf_dir: str) -> str:
    """Three mtime-ordered batches of the bootstrap projection (the OLS
    feed plus l_linenumber — the pseudo-Poisson draws hash the full row
    identity), split by l_orderkey terciles via approxQuantile."""
    import hashlib

    from ..plans.tables import load

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/lineitem_boot_{key}"

    def build():
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_discount",
            "l_extendedprice",
        )
        ks = li.select("l_orderkey").distinct()
        lo, hi = ks.approxQuantile("l_orderkey", [1 / 3, 2 / 3], 0.0)
        return [
            li.filter(F.col("l_orderkey") <= lo),
            li.filter((F.col("l_orderkey") > lo) & (F.col("l_orderkey") <= hi)),
            li.filter(F.col("l_orderkey") > hi),
        ]

    return _stage_ordered(
        d, ["01_lo.parquet", "02_mid.parquet", "03_hi.parquet"], build
    )


def incremental_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Poisson bootstrap — bitwise equal to the
    one-shot ``plans.relational.poisson_bootstrap_ci`` (its SQL is the
    oracle).

    Why the Poisson bootstrap streams for free where a classical
    bootstrap cannot: a multinomial resample needs the FINAL corpus size
    before any row can be weighted, so history would need a second pass
    once the stream grows; the Poisson weight of a row in replicate b is
    a pure function of (row identity, b) — batch-independent — so each
    micro-batch lands its |groups|·B weighted-sum partial and the CI
    retrains continuously by exact BIGINT merge. State is
    O(groups · B) numbers, independent of stream length."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import (
        boot_exact_partial,
        boot_rep_partial,
        boot_rev_projection,
        bootstrap_ci_from_partials,
    )

    tune_session(spark)
    d = _stage_lineitem_boot_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_boot_{_uuid.uuid4().hex[:8]}"
    ex_dir, rep_dir = f"{base}/exact", f"{base}/reps"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        li = boot_rev_projection(batch_df)
        boot_exact_partial(li).write.mode("overwrite").parquet(
            f"{ex_dir}/batch={epoch_id}"
        )
        boot_rep_partial(li).write.mode("overwrite").parquet(
            f"{rep_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(LINEITEM_BOOT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            bootstrap_ci_from_partials(
                spark.read.parquet(f"{ex_dir}/batch=*"),
                spark.read.parquet(f"{rep_dir}/batch=*"),
            ),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental KMV distinct sketch — bitwise equal to the
    one-shot ``plans.relational.kmv_distinct`` (its SQL is the oracle).

    THE mergeable-sketch mirror: each micro-batch lands only its K
    smallest distinct u32 hashes (a KMV_KMAX-row partial — the whole
    point of the sketch: state is O(K), not O(distinct)); partials merge
    by distinct-union + re-take-K, sound because the K smallest of a
    union are contained in the union of per-part K smallest. Emission
    runs the shared take-K + estimate tail."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import KMV_KMAX, _kmv_u32, kmv_from_values

    tune_session(spark)
    d = _stage_lineitem_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_kmv_{_uuid.uuid4().hex[:8]}"
    mins_dir = f"{base}/kmins"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(_kmv_u32(F.col("l_partkey")).alias("u"))
            .distinct()
            .orderBy("u")
            .limit(KMV_KMAX)
            .write.mode("overwrite")
            .parquet(f"{mins_dir}/batch={epoch_id}")
        )

    try:
        src = (
            spark.readStream.schema(LINEITEM_PAIR_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = spark.read.parquet(f"{mins_dir}/batch=*")
        out, _ = tracked_local_checkpoint(kmv_from_values(merged), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_two_hop_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental two-hop recommendations — bitwise equal to
    the one-shot ``plans.relational.two_hop_recs`` (its SQL is the
    oracle).

    Sixth graph mirror off the same staged pair state: both the top-M
    edge cap (ordered by corpus-global counts) and the path-weight scores
    (products of corpus-global counts) can be flipped by a later batch,
    so emission runs the shared cap + expand + score kernel over the
    merged exact counts."""
    from ..plans.relational import two_hop_from_pairs

    return _incremental_from_pair_state(spark, sf_dir, "th", two_hop_from_pairs)


LINEITEM_RETRACT_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("sign", T.IntegerType()),
    ]
)


def _stage_lineitem_retraction_batches(spark: SparkSession, sf_dir: str) -> str:
    """Four mtime-ordered SIGNED lineitem batches: the three order
    terciles as (+1) inserts plus a CANCELLATIONS batch carrying the
    lineitems of every order with l_orderkey % RETRACT_MOD == RETRACT_RES
    at sign -1 — staged SECOND, so two thirds of the retractions arrive
    before the inserts they cancel (transient negative net pair counts,
    the adversarial schedule). Order-atomic slicing as in
    _stage_lineitem_batches: an order's lineitems never straddle a batch,
    so per-batch SIGNED pair partials are exact."""
    import hashlib

    from ..plans.relational import RETRACT_MOD, RETRACT_RES
    from ..plans.tables import load

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"{_STAGE_ROOT}/lineitem_retract_{key}"

    def build():
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        ks = li.select("l_orderkey").distinct()
        lo, hi = ks.approxQuantile("l_orderkey", [1 / 3, 2 / 3], 0.0)

        def ins(df: DataFrame) -> DataFrame:
            return df.select("l_orderkey", "l_partkey", F.lit(1).alias("sign"))

        cancel = li.filter(
            F.col("l_orderkey") % RETRACT_MOD == RETRACT_RES
        ).select("l_orderkey", "l_partkey", F.lit(-1).alias("sign"))
        return [
            ins(li.filter(F.col("l_orderkey") <= lo)),
            cancel,
            ins(li.filter((F.col("l_orderkey") > lo) & (F.col("l_orderkey") <= hi))),
            ins(li.filter(F.col("l_orderkey") > hi)),
        ]

    return _stage_ordered(
        d,
        ["01_lo.parquet", "02_cancel.parquet", "03_mid.parquet", "04_hi.parquet"],
        build,
    )


def incremental_shortest_path_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION composed with the ITERATIVE-GRAPH family: streaming
    K-hop shortest paths over the co-purchase graph of SURVIVING
    (never-cancelled) orders — bitwise equal to the one-shot Bellman-Ford
    over the filtered lineitem feed (that SQL is the oracle).

    A cancelled order retracts its co-purchase pairs: per-batch pair
    partials carry SIGNED counts (the pair kernel is per-ORDER local and
    every order lands with one sign, so each pair instance contributes
    the order's sign), merged by signed integer sum — a pair supported
    only by cancelled orders nets to zero and LEAVES the graph, and a
    pair partially supported keeps the surviving count, which matters
    because the edge weight is 1/cnt (a retraction can LENGTHEN a
    shortest path, or re-route it entirely). The cancellations batch
    lands second of four, driving transient negative net pair counts the
    signed merge shrugs off. Tombstone pairs compact out at the same
    watermark boundaries as the scalar retraction mirrors
    (compact_signed_state — net != 0 survives, net == 0 leaves).
    Emission recomputes weights from the exact net counts and runs the
    shared relaxation kernel; nothing downstream knows deletions ever
    happened."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import shortest_path_from_pairs

    tune_session(spark)
    d = _stage_lineitem_retraction_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_spr_{_uuid.uuid4().hex[:8]}"
    pairs_dir = f"{base}/pairs"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        a, b = batch_df.alias("a"), batch_df.alias("b")
        (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
            )
            .agg(F.sum("a.sign").cast("bigint").alias("c"))
            .write.mode("overwrite")
            .parquet(f"{pairs_dir}/batch={epoch_id}")
        )
        if epoch_id % COMPACT_EVERY == 1:
            compact_signed_state(spark, pairs_dir, ["pa", "pb"], epoch_id)

    try:
        src = (
            spark.readStream.schema(LINEITEM_RETRACT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        net = (
            spark.read.parquet(f"{pairs_dir}/batch=*")
            .groupBy("pa", "pb")
            .agg(F.sum("c").cast("bigint").alias("cnt"))
            .filter(F.col("cnt") > 0)
        )
        out, _ = tracked_local_checkpoint(
            shortest_path_from_pairs(net), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _incremental_from_daily_state(
    spark: SparkSession, sf_dir: str, tag: str, kernel
) -> DataFrame:
    """Shared daily-revenue state for the time-series mirror family
    (seasonal decomposition, Mann-Whitney, BinSeg changepoint) — the
    `_incremental_from_pair_state` discipline applied to the calendar:
    each micro-batch lands its (dn, cents) partial (plain BIGINT sums,
    so partials merge by addition into the exact corpus series), and
    the family differs only in the emission kernel run over the merged
    series. All three answers are corpus-global order statistics
    (ranks, moving windows, prefix sums), which is exactly why emission
    recomputes over the merged DAILY rows — calendar-bounded, ~2.4k —
    never over raw orders."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import daily_revenue_partial

    tune_session(spark)
    d = _stage_order_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_{tag}_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/daily"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        daily_revenue_partial(batch_df).write.mode("overwrite").parquet(
            f"{part_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(ORDERS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("dn")
            .agg(
                F.sum("cents").cast("bigint").alias("cents"),
                F.sum("n_orders").cast("bigint").alias("n_orders"),
            )
        )
        out, _ = tracked_local_checkpoint(kernel(merged), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental seasonal decomposition — bitwise equal to
    the one-shot ``plans.relational.seasonal_decompose`` (its SQL is the
    oracle). A late batch can CREATE a contiguous 7-day window around an
    earlier day (gap fills in), so trend eligibility is corpus-global —
    emission reruns the windowed kernel over the merged series."""
    from ..plans.relational import seasonal_from_daily

    return _incremental_from_daily_state(
        spark, sf_dir, "seas", seasonal_from_daily
    )


def incremental_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Mann-Whitney — bitwise equal to the one-shot
    ``plans.relational.mann_whitney`` (its SQL is the oracle). Ranks are
    global order statistics (every new day shifts ranks above it), so
    emission re-ranks the merged series."""
    from ..plans.relational import mann_whitney_from_daily

    return _incremental_from_daily_state(
        spark, sf_dir, "mw", mann_whitney_from_daily
    )


def incremental_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental BinSeg changepoint — bitwise equal to the
    one-shot ``plans.relational.changepoint_binseg`` (its SQL is the
    oracle). Prefix sums and the argmax are global (a late batch moves
    every split statistic), so emission re-sweeps the merged series."""
    from ..plans.relational import changepoint_from_daily

    return _incremental_from_daily_state(
        spark, sf_dir, "chg", changepoint_from_daily
    )


def incremental_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Spearman correlation — bitwise equal to the
    one-shot ``plans.relational.spearman_corr`` (its SQL is the oracle).
    Fourth member of the shared-daily-state family; both rank columns
    are global order statistics, so emission re-ranks the merged
    (cents, n_orders) series."""
    from ..plans.relational import spearman_from_daily

    return _incremental_from_daily_state(
        spark, sf_dir, "spear", spearman_from_daily
    )


def incremental_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental autocorrelation — bitwise equal to the
    one-shot ``plans.relational.autocorrelation`` (its SQL is the
    oracle). A late batch moves the corpus mean and adds lag pairs on
    both sides, so emission recomputes the exact integer forms over the
    merged series."""
    from ..plans.relational import acf_from_daily

    return _incremental_from_daily_state(spark, sf_dir, "acf", acf_from_daily)


def incremental_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Theil-Sen trend — bitwise equal to the
    one-shot ``plans.relational.theil_sen`` (its SQL is the oracle).
    Every pair involving a newly-arrived day shifts the slope median, so
    emission re-pairs the merged calendar-bounded series — still ~2.9M
    bounded pairs however long the stream runs."""
    from ..plans.relational import theil_sen_from_daily

    return _incremental_from_daily_state(
        spark, sf_dir, "tsen", theil_sen_from_daily
    )


def incremental_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Gini concentration — bitwise equal to the
    one-shot ``plans.relational.gini_concentration`` (its SQL is the
    oracle). Per-customer cent partials merge by BIGINT addition (the
    rfm_partial posture — customer-dimension state); the Lorenz ranks
    are global order statistics, so emission re-ranks the merged
    customer totals."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import customer_cents_partial, gini_from_per_customer

    tune_session(spark)
    d = _stage_order_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_gini_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/per_cust"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        customer_cents_partial(batch_df).write.mode("overwrite").parquet(
            f"{part_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(ORDERS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("o_custkey")
            .agg(F.sum("cents").cast("bigint").alias("cents"))
        )
        out, _ = tracked_local_checkpoint(
            gini_from_per_customer(merged), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Kaplan-Meier — bitwise equal to the one-shot
    ``plans.relational.kaplan_meier`` (its SQL is the oracle). The
    textbook case for min/max-distributive state: per-batch (customer,
    first, last) spans merge by min-of-mins / max-of-maxes, and BOTH the
    lake end (censoring anchor) and every lifetime are corpus-global —
    a customer's next order extends their span and can flip them from
    churned to censored — so emission reruns the shared product-limit
    tail over the merged customer dimension."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import km_from_spans, km_span_partial

    tune_session(spark)
    d = _stage_order_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_km_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/spans"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        km_span_partial(batch_df).write.mode("overwrite").parquet(
            f"{part_dir}/batch={epoch_id}"
        )

    try:
        src = (
            spark.readStream.schema(ORDERS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        out, _ = tracked_local_checkpoint(
            km_from_spans(spark.read.parquet(f"{part_dir}/batch=*")),
            register=True,
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental Kendall tau-b — bitwise equal to the
    one-shot ``plans.relational.kendall_tau`` (its SQL is the oracle).
    Eighth kernel off the shared daily state: every pair involving a
    newly-arrived (or revenue-updated) day changes the concordance
    counts, so emission re-pairs the merged calendar-bounded series."""
    from ..plans.relational import kendall_from_daily

    return _incremental_from_daily_state(
        spark, sf_dir, "ktau", kendall_from_daily
    )


SEAS_RETRACT_SCHEMA = T.StructType(
    [
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("sign", T.IntegerType()),
    ]
)


def incremental_seasonal_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-AWARE streaming seasonal decomposition — bitwise equal
    to the one-shot decomposition over the SURVIVING (never-cancelled)
    orders (that batch SQL is the oracle). The composition the
    compact_signed_state machinery makes nearly free for the whole
    shared-daily-state statistics family: the per-day state is a SIGNED
    (cents, n_orders) pair — inserts add (+cents, +1), cancellations add
    (−cents, −1) — so partials still merge by plain integer addition
    under any arrival slicing, including the staged adversarial schedule
    where two thirds of the cancellations land BEFORE their inserts
    (transient negative nets). Tombstone compaction folds the batch
    prefix every COMPACT_EVERY epochs and physically drops days whose
    BOTH nets hit zero.

    The day-granularity consequence the exemplar pytest pins: a
    cancellation does not merely shrink a day's revenue — cancelling a
    day's LAST surviving order removes the day row entirely, which can
    break a 7-day contiguity window and silently change which days are
    trend-eligible. Emission therefore reruns the shared windowed kernel
    (seasonal_from_daily) over the net series with zero-net days
    filtered out — nothing downstream knows deletions ever happened.

    At 100 TB: state is calendar-sized (days, not orders) however large
    the stream; compaction keeps it net-days-sized; the kernel rerun
    touches ~2.4k rows."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import SEAS_ANCHOR, seasonal_from_daily

    tune_session(spark)
    d = _stage_retraction_batches(
        spark,
        sf_dir,
        cols=("o_totalprice", "o_orderdate"),
        name="orders_retract_seas",
    )
    base = f"{d.rstrip('/')}_seasr_{_uuid.uuid4().hex[:8]}"
    daily_dir = f"{base}/daily"

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        dn = F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit(SEAS_ANCHOR))
        ).cast("bigint")
        part = (
            batch_df.select(
                dn.alias("dn"),
                (
                    F.col("sign").cast("bigint")
                    * F.round(F.col("o_totalprice") * 100).cast("bigint")
                ).alias("scents"),
                F.col("sign").cast("bigint").alias("sn"),
            )
            .groupBy("dn")
            .agg(
                F.sum("scents").cast("bigint").alias("cents"),
                F.sum("sn").cast("bigint").alias("n_orders"),
            )
        )
        part.write.mode("overwrite").parquet(f"{daily_dir}/batch={epoch_id}")
        if epoch_id % COMPACT_EVERY == 1:
            compact_signed_state(
                spark,
                daily_dir,
                ["dn"],
                epoch_id,
                val_cols=("cents", "n_orders"),
            )

    try:
        src = (
            spark.readStream.schema(SEAS_RETRACT_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{daily_dir}/batch=*")
            .groupBy("dn")
            .agg(
                F.sum("cents").cast("bigint").alias("cents"),
                F.sum("n_orders").cast("bigint").alias("n_orders"),
            )
            # a fully-cancelled day LEAVES the series (its absence is
            # load-bearing: it can break a 7-day trend window)
            .filter(F.col("n_orders") > 0)
        )
        out, _ = tracked_local_checkpoint(
            seasonal_from_daily(merged.select("dn", "cents")), register=True
        )
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _incremental_from_seg_daily_state(
    spark: SparkSession, sf_dir: str, tag: str, kernel
) -> DataFrame:
    """KEYED daily-revenue state for the sampled-trend mirror family
    (per-segment Theil-Sen / Kendall): `_incremental_from_daily_state`
    with the state key widened from the calendar day to (c_mktsegment,
    day). Each micro-batch STREAM-STATIC-joins the customer dimension
    (the enrichment every real order stream does) and lands its
    (seg, dn, cents, n_orders) partial — plain BIGINT sums, so partials
    merge by addition into the exact keyed series. The deterministic
    pair sampler downstream is a pure function of the MERGED series
    (md5 of (seg, day-index, draw)), so the sampled pair set — and both
    audit branches — are arrival-order-free by construction; emission
    reruns the shared kernel over the merged |segments|·calendar rows."""
    import shutil
    import uuid as _uuid

    from ..operators.checkpoints import tracked_local_checkpoint
    from ..plans.relational import SEAS_ANCHOR
    from ..plans.tables import load

    tune_session(spark)
    d = _stage_order_batches(spark, sf_dir)
    base = f"{d.rstrip('/')}_{tag}_{_uuid.uuid4().hex[:8]}"
    part_dir = f"{base}/segdaily"
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("seg"),
    )

    def _update(batch_df: DataFrame, epoch_id: int) -> None:
        dn = F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit(SEAS_ANCHOR))
        ).cast("bigint")
        part = (
            batch_df.join(cust, "o_custkey")
            .select(
                "seg",
                dn.alias("dn"),
                F.round(F.col("o_totalprice") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .groupBy("seg", "dn")
            .agg(
                F.sum("cents").cast("bigint").alias("cents"),
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            )
        )
        part.write.mode("overwrite").parquet(f"{part_dir}/batch={epoch_id}")

    try:
        src = (
            spark.readStream.schema(ORDERS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(d)
        )
        q = src.writeStream.foreachBatch(_update).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        merged = (
            spark.read.parquet(f"{part_dir}/batch=*")
            .groupBy("seg", "dn")
            .agg(
                F.sum("cents").cast("bigint").alias("cents"),
                F.sum("n_orders").cast("bigint").alias("n_orders"),
            )
        )
        merged, _ = tracked_local_checkpoint(merged, register=True)
        out, _ = tracked_local_checkpoint(kernel(merged), register=True)
        return out
    finally:
        shutil.rmtree(base, ignore_errors=True)


def incremental_theil_sen_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental sampled per-segment Theil-Sen — bitwise
    equal to the one-shot ``plans.relational.theil_sen_sampled`` (its
    SQL is the oracle). A new day shifts every later day's per-segment
    index i, which re-seeds the sampler's partner draws — so the sampled
    pair set is a corpus-global function and emission reruns the sampler
    + both medians over the merged keyed series."""
    from ..plans.relational import theil_sen_sampled_from_seg_daily

    return _incremental_from_seg_daily_state(
        spark, sf_dir, "tss", theil_sen_sampled_from_seg_daily
    )


def incremental_kendall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental sampled per-segment Kendall τ-b — bitwise
    equal to the one-shot ``plans.relational.kendall_sampled`` (its SQL
    is the oracle). Same keyed daily state as the Theil-Sen mirror, a
    different emission kernel — the batch family's sampler-sharing
    carried over to the mirrors."""
    from ..plans.relational import kendall_sampled_from_seg_daily

    return _incremental_from_seg_daily_state(
        spark, sf_dir, "kts", kendall_sampled_from_seg_daily
    )
