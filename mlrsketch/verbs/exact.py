"""Miller's verb surface re-expressed as exact, Catalyst-planned DataFrame ops.

Each function cites the reference implementation it matches
(file:line into /root/reference, miller v6 Go) and preserves Miller's
semantics where they differ from SQL defaults:

- percentiles are NON-interpolated by default: index = int(p/100 * n)
  clamped to [0, n-1] over the sorted values
  (pkg/bifs/percentiles.go:193-208); ``interpolated=True`` gives the
  R-type-7 linear interpolation (percentiles.go:9-28).
- mode/antimode break ties by FIRST-SEEN order
  (pkg/transformers/utils/stats1_accumulators.go:367-445).
- distinct_count counts distinct ORIGINAL STRINGS ("4.1" != "4.10",
  stats1_accumulators.go:341-365); on a typed DataFrame column this is
  plain distinct of the column value.

All of these are shuffle-aware: grouped aggregations are single-shuffle
hash aggregations with map-side partial aggregation (Catalyst supplies
partial_/final split automatically); window verbs shuffle once on the
partition keys. Nothing here collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _cols(c: str | Sequence[str]) -> list[str]:
    return [c] if isinstance(c, str) else list(c)


def _percentile_exact(col: str, p: float, interpolated: bool) -> Column:
    """Miller percentile semantics (pkg/bifs/percentiles.go:193-208).

    Non-interpolated: sorted_values[clamp(int(p/100*n), 0, n-1)].
    Interpolated: R type 7 == SQL percentile_cont == Spark `percentile`.
    """
    if interpolated:
        return F.expr(f"percentile({col}, {p / 100.0})")
    # sort_array(collect_list(x))[int(p*n/100)] — element-valued, so it
    # matches any exact oracle bit-for-bit. Fine at test scale; at 100 TB
    # use the sketch variants in mlrsketch.verbs.sketch instead.
    arr = F.array_sort(F.collect_list(F.col(col)))
    n = F.size(arr)
    idx = F.least(F.greatest(F.floor(F.lit(p / 100.0) * n).cast("int"), F.lit(0)), n - 1)
    return F.get(arr, idx)


# percentile-family accumulators share ONE keeper per field, exactly like
# Miller's shared PercentileKeeper (stats1_accumulators.go:160-168,258-290):
# median == p50; Tukey fences derive from p25/p75
# (utils/percentile_keeper.go:105-165, k = 1.5 inner / 3.0 outer at :19-21).
_FENCE_K = {"lof": -3.0, "lif": -1.5, "uif": 1.5, "uof": 3.0}


def _pct_needs(a: str) -> list[float] | None:
    """Percentile points acc `a` needs, or None if not percentile-family."""
    if a == "median":
        return [50.0]
    if a == "iqr" or a in _FENCE_K:
        return [25.0, 75.0]
    if a.startswith("p"):
        try:
            return [float(a[1:])]
        except ValueError:
            return None
    return None


_INT_PAT = r"^-?[0-9]+$"


def _stats1_typed(df, accs, values, by, interpolated):
    """Typed (mlr-CLI byte path) stats1 — see the stats1 docstring.

    min/max/percentile results are STRING columns carrying the typed
    Miller value: the original element spelling for picks (the writer
    re-scans: int prints bare, float through OFMT, strings verbatim),
    Miller collation (numbers numerically before strings lexically,
    cmp_dispositions mlrval_cmp.go:146; min/max matrices
    arithmetic.go:783-965) and int->float promotion when any float
    entered the fold. Plan shape is unchanged: one hash aggregation,
    one shared sorted buffer per field for the percentile family.
    """
    pct_points: dict[str, list[float]] = {}
    for f in values:
        pts = sorted({p for a in accs for p in (_pct_needs(a) or [])})
        if pts:
            pct_points[f] = pts
    want_mx = {"min", "max"} & set(accs)

    aggs = []
    dtypes = dict(df.dtypes)
    for f in values:
        num = F.col(f).try_cast("double")
        if dtypes.get(f, "string") == "string":
            s = F.col(f).cast("string")
        else:
            # numeric carrier column: integral values re-spell as INT
            # (a long/double column cast to string would say "1.0";
            # Miller's per-value typing prints data int 1 as "1")
            s = F.when(
                num.isNotNull() & (num == F.floor(num))
                & (F.abs(num) < F.lit(9.0e18)),
                num.cast("long").cast("string"),
            ).otherwise(F.col(f).cast("string"))
        present = F.col(f).isNotNull() & (s != "")  # void skips ingest
        # (stats1.go:667-675)
        isnum = present & num.isNotNull()
        elem = F.struct(
            F.when(isnum, F.lit(0)).otherwise(F.lit(1)).alias("r"),
            F.when(isnum, num).alias("num"),
            # int64 tiebreak: near-2^63 ints are indistinguishable as
            # doubles (cmp_b_ii compares exact int64)
            F.when(isnum, s.try_cast("long")).alias("lnum"),
            s.alias("s"),
        )
        for a in accs:
            if _pct_needs(a) is not None:
                continue
            if a in ("min", "max"):
                agg = (F.min if a == "min" else F.max)(
                    F.when(present, elem)
                )
                aggs.append(agg.alias(f"__mx_{f}_{a}"))
            else:
                aggs.append(_acc(a, f, interpolated).alias(f"{f}_{a}"))
        if f in pct_points:
            aggs.append(
                F.array_sort(
                    F.collect_list(F.when(present, elem))
                ).alias(f"__sorted_{f}")
            )
        if want_mx or f in pct_points:
            aggs.append(
                F.max(
                    F.when(isnum & ~s.rlike(_INT_PAT), 1).otherwise(0)
                ).alias(f"__anyf_{f}")
            )

    grouped = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)

    def pickv(f: str, p: float):
        """(isnum, isint, num, out) of the Miller percentile result."""
        arr = F.col(f"__sorted_{f}")
        n = F.size(arr)
        if not interpolated:
            # sorted[clamp(int(p/100*n), 0, n-1)], the element ITSELF
            # (percentiles.go:193-208)
            idx = F.least(
                F.greatest(
                    F.floor(F.lit(p / 100.0) * n).cast("int"), F.lit(0)
                ),
                n - 1,
            )
            el = F.get(arr, idx)
            return (
                el.getField("r") == 0,
                el.getField("s").rlike(_INT_PAT),
                el.getField("num"),
                F.when(n == 0, F.lit("")).otherwise(el.getField("s")),
            )
        # linear interpolation (percentiles.go:9-28): findex =
        # p/100*(n-1); iindex>=n-1 returns the element itself; else
        # a + frac*(b-a) via the BIFs — float whenever computed
        findex = F.lit(p / 100.0) * (n - 1).cast("double")
        iindex = F.floor(findex).cast("int")
        a_el = F.get(arr, iindex)
        b_el = F.get(arr, F.least(iindex + 1, n - 1))
        top = iindex >= n - 1
        bothnum = (a_el.getField("r") == 0) & (b_el.getField("r") == 0)
        comp = a_el.getField("num") + (findex - iindex.cast("double")) * (
            b_el.getField("num") - a_el.getField("num")
        )
        isnum = F.when(top, a_el.getField("r") == 0).otherwise(bothnum)
        isint = F.when(top, a_el.getField("s").rlike(_INT_PAT)).otherwise(
            F.lit(False)
        )
        numv = F.when(top, a_el.getField("num")).otherwise(comp)
        out = (
            F.when(n == 0, F.lit(""))
            .when(top, a_el.getField("s"))
            .when(bothnum, comp.cast("string"))
            .otherwise(F.lit("(error)"))
        )
        return isnum, isint, numv, out

    out_cols: list[Column] = [F.col(c) for c in by]
    for f in values:
        anyf = F.col(f"__anyf_{f}") == 1
        for a in accs:
            if a in ("min", "max"):
                st = F.col(f"__mx_{f}_{a}")
                out_cols.append(
                    F.when(
                        (st.getField("r") == 0) & anyf,
                        st.getField("num").cast("string"),
                    )
                    .otherwise(st.getField("s"))
                    .alias(f"{f}_{a}")
                )
            elif _pct_needs(a) is None:
                out_cols.append(F.col(f"{f}_{a}"))
            elif a == "iqr" or a in _FENCE_K:
                n75, i75, v75, _ = pickv(f, 75.0)
                n25, i25, v25, _ = pickv(f, 25.0)
                d = v75 - v25
                if a == "iqr":
                    # BIF_minus: int-int stays int, any float -> float,
                    # non-numeric operand -> (error)
                    out_cols.append(
                        F.when(~(n75 & n25), F.lit("(error)"))
                        .when(i75 & i25, d.cast("long").cast("string"))
                        .otherwise(d.cast("string"))
                        .alias(f"{f}_{a}")
                    )
                else:
                    k = _FENCE_K[a]
                    nb, _, vb, _ = pickv(f, 25.0 if k < 0 else 75.0)
                    # base + K*iqr with float K -> always float
                    out_cols.append(
                        F.when(~(n75 & n25 & nb), F.lit("(error)"))
                        .otherwise((vb + F.lit(k) * d).cast("string"))
                        .alias(f"{f}_{a}")
                    )
            else:
                p = 50.0 if a == "median" else float(a[1:])
                out_cols.append(pickv(f, p)[3].alias(f"{f}_{a}"))
    return grouped.select(*out_cols)


# accumulator registry mirroring stats1 (pkg/transformers/utils/
# stats1_accumulators.go:29-124). Each returns a Column for value field f.
def _acc(name: str, f: str, interpolated: bool = False) -> Column:
    if name == "count":
        return F.count(F.col(f))
    if name == "null_count":
        return F.sum(F.when(F.col(f).isNull() | (F.col(f).cast("string") == ""), 1).otherwise(0))
    if name == "distinct_count":
        # void ("") values don't count as a distinct value (golden
        # verb-stats1/0019)
        return F.countDistinct(
            F.when(F.col(f).cast("string") != "", F.col(f))
        )
    if name == "sum":
        return F.sum(F.col(f))
    if name == "mean":
        return F.avg(F.col(f))
    if name == "min":
        return F.min(F.col(f))
    if name == "max":
        return F.max(F.col(f))
    if name == "minlen":
        return F.min(F.length(F.col(f).cast("string")))
    if name == "maxlen":
        return F.max(F.length(F.col(f).cast("string")))
    if name == "var":
        return F.var_samp(F.col(f))
    if name == "stddev":
        return F.stddev_samp(F.col(f))
    if name == "meaneb":  # stats1_accumulators.go:618-705: var/n then sqrt
        return F.sqrt(F.var_samp(F.col(f)) / F.count(F.col(f)))
    if name in ("skewness", "kurtosis"):
        # Miller's exact finalization from raw power sums
        # (pkg/bifs/stats.go:85-105 skewness, :121-147 kurtosis):
        # population central moment over SAMPLE-variance denominator —
        # different from both Spark's and DuckDB's builtins, so spelled
        # out. Raw sums are trivially mergeable => partial agg applies.
        x = F.col(f).cast("double")
        n = F.count(x).cast("double")
        s1, s2 = F.sum(x), F.sum(x * x)
        s3, s4 = F.sum(x * x * x), F.sum(x * x * x * x)
        mean = s1 / n
        if name == "skewness":  # denom: SAMPLE variance^1.5 (stats.go:102)
            svar = (s2 - n * mean * mean) / (n - 1)
            num = (s3 - mean * (3.0 * s2 - 2.0 * n * mean * mean)) / n
            return num / F.pow(svar, 1.5)
        # kurtosis denom: POPULATION variance^2 (stats.go:141-143)
        pvar = (s2 - n * mean * mean) / n
        num = (s4 - mean * (4.0 * s3 - mean * (6.0 * s2 - 3.0 * n * mean * mean))) / n
        return num / (pvar * pvar) - 3.0
    if name == "first":
        return F.first(F.col(f))
    if name == "last":
        return F.last(F.col(f))
    raise ValueError(f"unknown stats1 accumulator: {name}")


# ---------------------------------------------------------------------------
# aggregation verbs (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


def stats1(
    df: DataFrame,
    accs: Sequence[str],
    values: Sequence[str],
    by: Sequence[str] = (),
    interpolated: bool = False,
    typed: bool = False,
) -> DataFrame:
    """`mlr stats1 -a ... -f ... -g ...` (pkg/transformers/stats1.go:36).

    Output columns named ``{field}_{acc}`` exactly like Miller
    (stats1.go docs). One single-shuffle hash aggregation; Catalyst
    emits partial aggregates map-side.

    All percentile-family accumulators of one field share a single
    aggregate buffer — one ``percentile(f, array(ps))`` (interpolated)
    or one sorted ``collect_list`` (Miller non-interpolated pick) —
    mirroring Miller's shared PercentileKeeper instead of sorting the
    group once per requested percentile.

    ``typed=True`` (the mlr-CLI byte path): min/max/percentile-family
    results become STRING columns carrying Miller's typed result —
    original element spelling for percentile picks
    (percentiles.go:9-28,193-208 return the mlrval itself), the
    min/max disposition collation (numbers before strings,
    arithmetic.go:783-965) with int->float promotion when any float
    entered the fold (min_f_fi/max_f_fi). Same plan shape — the only
    change is WHAT the one aggregation buffer carries.
    """
    accs, values, by = _cols(accs), _cols(values), _cols(by)
    if typed:
        return _stats1_typed(df, accs, values, by, interpolated)
    pct_points: dict[str, list[float]] = {}  # field -> sorted needed points
    for f in values:
        pts = sorted({p for a in accs for p in (_pct_needs(a) or [])})
        if pts:
            pct_points[f] = pts

    aggs = []
    for f in values:
        for a in accs:
            if _pct_needs(a) is None:
                aggs.append(_acc(a, f, interpolated).alias(f"{f}_{a}"))
        if f in pct_points:
            if interpolated:
                aggs.append(
                    F.percentile(
                        F.col(f), F.array(*[F.lit(p / 100.0) for p in pct_points[f]])
                    ).alias(f"__pcts_{f}")
                )
            else:
                aggs.append(F.array_sort(F.collect_list(F.col(f))).alias(f"__sorted_{f}"))

    grouped = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)
    if not pct_points:
        return grouped

    def pick(f: str, p: float) -> Column:
        if interpolated:
            return F.element_at(F.col(f"__pcts_{f}"), pct_points[f].index(p) + 1)
        arr = F.col(f"__sorted_{f}")
        n = F.size(arr)
        idx = F.least(
            F.greatest(F.floor(F.lit(p / 100.0) * n).cast("int"), F.lit(0)), n - 1
        )
        return F.get(arr, idx)

    out_cols: list[Column] = [F.col(c) for c in by]
    for f in values:
        for a in accs:
            if _pct_needs(a) is None:
                out_cols.append(F.col(f"{f}_{a}"))
            elif a == "iqr":
                out_cols.append((pick(f, 75.0) - pick(f, 25.0)).alias(f"{f}_{a}"))
            elif a in _FENCE_K:
                k = _FENCE_K[a]
                base = pick(f, 25.0) if k < 0 else pick(f, 75.0)
                iqr = pick(f, 75.0) - pick(f, 25.0)
                out_cols.append((base + F.lit(k) * iqr).alias(f"{f}_{a}"))
            elif a == "median":
                out_cols.append(pick(f, 50.0).alias(f"{f}_{a}"))
            else:
                out_cols.append(pick(f, float(a[1:])).alias(f"{f}_{a}"))
    return grouped.select(*out_cols)


def mad(df: DataFrame, value: str, by: Sequence[str] = ()) -> DataFrame:
    """stats1 `mad` = MEAN absolute deviation from the mean
    (stats1_accumulators.go:496-534 — Miller keeps all samples and does
    two passes; here: two aggregations, no row retention).

    Grouped: per-group mean via one hash-partitioned window. Ungrouped:
    the mean is a SCALAR — computed with a plain aggregate and broadcast
    back, instead of an empty-partition window that would funnel every
    row through one task.
    """
    by = _cols(by)
    if by:
        w = Window.partitionBy(*by)
        centered = df.withColumn("__mean", F.avg(value).over(w))
        return centered.groupBy(*by).agg(
            F.avg(F.abs(F.col(value) - F.col("__mean"))).alias(f"{value}_mad")
        )
    mean_row = df.agg(F.avg(value).alias("m"))
    centered = df.crossJoin(F.broadcast(mean_row))
    return centered.agg(
        F.avg(F.abs(F.col(value) - F.col("m"))).alias(f"{value}_mad")
    )


def mode_impl(df: DataFrame, value: str, by: Sequence[str], anti: bool = False) -> DataFrame:
    """stats1 mode/antimode with Miller's first-seen tie-break
    (stats1_accumulators.go:367-445): among values with the max (min)
    count, the one seen earliest in stream order wins. Stream order is
    approximated by a caller-provided monotonic column ``__ord`` if
    present, else by value for determinism.
    """
    by = _cols(by)
    ordc = "__ord" if "__ord" in df.columns else value
    counted = df.groupBy(*by, value).agg(
        F.count("*").alias("__cnt"), F.min(ordc).alias("__first_seen")
    )
    name = f"{value}_antimode" if anti else f"{value}_mode"
    # Pure aggregations, no window: find the target count (min/max) per
    # group, keep only candidates at that count, break ties by earliest
    # first-seen with min_by. Distributed for ANY group cardinality —
    # the previous row_number window was single-task ungrouped.
    pick_cnt = F.min("__cnt") if anti else F.max("__cnt")
    target = (counted.groupBy(*by) if by else counted.groupBy()).agg(
        pick_cnt.alias("__best")
    )
    # grouped: plain equi-join (AQE broadcasts when the per-group best
    # table is small); ungrouped: broadcast the single-row target
    joined = (
        counted.join(target, on=by)
        if by
        else counted.crossJoin(F.broadcast(target))
    ).filter(F.col("__cnt") == F.col("__best"))
    best = (joined.groupBy(*by) if by else joined.groupBy()).agg(
        F.min_by(F.col(value), F.col("__first_seen")).alias(name)
    )
    return best


def count_records(df: DataFrame, by: Sequence[str] = ()) -> DataFrame:
    """`mlr count [-g ...]` (pkg/transformers/count.go:22)."""
    if by:
        return df.groupBy(*_cols(by)).agg(F.count("*").alias("count"))
    return df.agg(F.count("*").alias("count"))


def count_distinct(df: DataFrame, fields: Sequence[str], unlashed: bool = False) -> DataFrame:
    """`mlr count-distinct -f ...` (pkg/transformers/uniq.go:27,359-365).

    Default (lashed): count per distinct combination of the fields.
    Unlashed (-u, uniq.go:477-530): independent per-field value counts,
    output (field, value, count).
    """
    fields = _cols(fields)
    if not unlashed:
        return df.groupBy(*fields).agg(F.count("*").alias("count"))
    parts = [
        df.groupBy(F.lit(f).alias("field"), F.col(f).cast("string").alias("value")).agg(
            F.count("*").alias("count")
        )
        for f in fields
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def uniq(df: DataFrame, by: Sequence[str], show_counts: bool = False) -> DataFrame:
    """`mlr uniq -g ...` [-c] (pkg/transformers/uniq.go:45,391-454)."""
    by = _cols(by)
    if show_counts:
        return df.groupBy(*by).agg(F.count("*").alias("count"))
    return df.select(*by).distinct()


def uniq_distinct_count(df: DataFrame, by: Sequence[str]) -> DataFrame:
    """`mlr uniq -n` (uniq.go:427-454): number of distinct groups."""
    return df.select(*_cols(by)).distinct().agg(F.count("*").alias("count"))


def uniq_records(
    df: DataFrame,
    show_counts: bool = False,
    order_by: Sequence[str] = (),
    exclude: Sequence[str] = (),
    count_field: str = "count",
) -> DataFrame:
    """`mlr uniq -a [-c] [-x ...]` (pkg/transformers/uniq.go:391-425):
    whole-record dedupe (or all-fields-except with ``exclude``), the
    count PREPENDED when ``show_counts``. First-occurrence order is
    preserved when ``order_by`` names a stream-order column (min() of it
    travels with the group — one hash aggregate, no extra shuffle).
    """
    exclude = set(_cols(exclude))
    order_by = _cols(order_by)
    cols = [c for c in df.columns if c not in exclude and c not in order_by]
    aggs = [F.count("*").alias(count_field)] + [
        F.min(c).alias(c) for c in order_by
    ]
    g = df.groupBy(*cols).agg(*aggs)
    sel = ([count_field] if show_counts else []) + cols + order_by
    return g.select(*sel)


def top(
    df: DataFrame,
    value: str,
    n: int = 1,
    by: Sequence[str] = (),
    use_min: bool = False,
    show_full_records: bool = False,
    tiebreak: Sequence[str] = (),
    pad: bool = False,
) -> DataFrame:
    """`mlr top -f v -n N -g g [--min] [-a]` (pkg/transformers/top.go:29;
    sorted-insert keeper utils/top_keeper.go:68-94).

    Emits per group the top-N values of ``value`` with 1-up ``top_idx``.
    Spark plan: single shuffle on the group keys + in-partition sort;
    with AQE this is a bounded-memory windowed rank, the distributed
    analogue of Miller's capacity-N keeper.
    """
    by = _cols(by)
    order = [F.col(value).asc() if use_min else F.col(value).desc()] + [
        F.col(c).asc() for c in _cols(tiebreak)
    ]
    if not by:
        # global top-n: orderBy+limit plans as TakeOrdered (per-partition
        # top-n + driver merge of n·partitions rows) — NOT a global
        # single-partition window sort. The row_number window then runs
        # over just n rows.
        ranked = (
            df.orderBy(*order)
            .limit(n)
            .withColumn("top_idx", F.row_number().over(Window.orderBy(*order)))
        )
    else:
        w = Window.partitionBy(*by).orderBy(*order)
        ranked = df.withColumn("top_idx", F.row_number().over(w)).filter(
            F.col("top_idx") <= n
        )
    if show_full_records:
        return ranked
    out = ranked.select(*by, "top_idx", F.col(value).alias(f"{value}_top"))
    if pad:
        # Miller emits exactly n rows per group (one group when
        # ungrouped), void-padded when the group has fewer candidates
        # (top.go emit loop `for i < topCount`; golden verb-top/0002)
        idxs = df.sparkSession.range(1, n + 1).select(
            F.col("id").cast("int").alias("top_idx")
        )
        if by:
            full = out.select(*by).distinct().crossJoin(F.broadcast(idxs))
        else:
            full = idxs
        out = full.join(out, [*by, "top_idx"], "left")
    return out


def most_frequent(
    df: DataFrame, fields: Sequence[str], n: int = 10, descending: bool = True
) -> DataFrame:
    """`mlr most-frequent/least-frequent -f ... -b n`
    (pkg/transformers/most_or_least_frequent.go:28,216-295).

    Exact heavy hitters: groupBy + count + global top-n. The grouped
    count is one shuffle with map-side combine; the final top-n is a
    driver-sized limit (n rows), not a full sort.
    """
    fields = _cols(fields)
    counted = df.groupBy(*fields).agg(F.count("*").alias("count"))
    order = [F.col("count").desc() if descending else F.col("count").asc()] + [
        F.col(f).asc() for f in fields
    ]
    return counted.orderBy(*order).limit(n)


def count_similar(df: DataFrame, by: Sequence[str]) -> DataFrame:
    """`mlr count-similar -g ...` (pkg/transformers/count_similar.go:21):
    append per-group record count to every record."""
    w = Window.partitionBy(*_cols(by))
    return df.withColumn("count", F.count("*").over(w))


def fraction(
    df: DataFrame,
    value: str,
    by: Sequence[str] = (),
    cumulative: bool = False,
    order_by: Sequence[str] = (),
    percent: bool = False,
) -> DataFrame:
    """`mlr fraction -f v [-g g] [-c] [-p]` (pkg/transformers/fraction.go:25).
    -p emits {v}_percent = 100x the fraction (golden verb-fraction/0004).

    value / sum(value) per group; -c makes it cumulative in stream
    order (here: explicit ``order_by``). Window over the full group —
    one shuffle, no driver collect (Miller does two passes holding all
    records; fraction.go:19-22).
    """
    by = _cols(by)
    scale = F.lit(100.0) if percent else F.lit(1.0)
    suffix = "percent" if percent else "fraction"
    present = F.col(value).isNotNull()  # absent value => absent output field

    if cumulative and not by:
        # ungrouped -c: an empty-partition window funnels EVERY row
        # through one task — fatal at 100x. Range-partition on the
        # stream order, per-partition prefix sums, then add each
        # partition's carry (a tiny collected map, broadcast back) —
        # the same shape as _step_ungrouped's rsum. One range exchange,
        # no SinglePartition stage; the global denominator falls out of
        # the same per-partition sums for free.
        order_cols = _cols(order_by)
        ordered = df.repartitionByRange(
            *[F.col(c) for c in order_cols]
        ).withColumn("__pid", F.spark_partition_id())
        # pin the (sampling-nondeterministic) range placement before the
        # two dependent subplans — see global_row_number
        ordered = ordered.localCheckpoint(eager=True)
        sums = {
            r["__pid"]: float(r["s"] or 0.0)
            for r in ordered.groupBy("__pid").agg(F.sum(value).alias("s")).collect()
        }
        carries, acc = {}, 0.0
        for pid in sorted(sums):
            carries[pid] = acc
            acc += sums[pid]
        carry = (
            F.create_map(*[F.lit(x) for kv in carries.items() for x in kv])
            if carries
            else F.create_map()
        )
        w_in = (
            Window.partitionBy("__pid")
            .orderBy(*[F.col(c) for c in order_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        num = F.sum(value).over(w_in) + F.coalesce(
            carry[F.col("__pid")], F.lit(0.0)
        )
        return ordered.withColumn(
            f"{value}_cumulative_{suffix}", F.when(present, scale * num / F.lit(acc))
        ).drop("__pid")

    if by:
        denom = F.sum(value).over(Window.partitionBy(*by))
    else:
        # ungrouped: the global sum is a scalar — aggregate it (partial +
        # final, fully parallel) and broadcast-cross-join the one row.
        total = df.agg(F.sum(value).alias("__total"))
        df = df.crossJoin(F.broadcast(total))
        denom = F.col("__total")
    if cumulative:
        w_cum = (
            Window.partitionBy(*by)
            .orderBy(*[F.col(c) for c in _cols(order_by)])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        num = F.sum(value).over(w_cum)
        out = df.withColumn(
            f"{value}_cumulative_{suffix}", F.when(present, scale * num / denom)
        )
    else:
        out = df.withColumn(
            f"{value}_{suffix}", F.when(present, scale * F.col(value) / denom)
        )
    return out.drop("__total") if not by else out


def histogram(
    df: DataFrame, value: str, lo: float, hi: float, nbins: int,
    include_hi: bool = False,
) -> DataFrame:
    """`mlr histogram -f v --lo --hi --nbins`
    (pkg/transformers/histogram.go:28). Fixed-width bins; values outside
    [lo, hi) are dropped (histogram.go semantics). Emits bin_lo, bin_hi,
    count for every bin including empty ones (Miller emits all bins).
    ``include_hi`` sends values == hi into the top bin (the --auto mode,
    where hi is the data max — clamping, never width-padding, so bin
    boundaries stay exact for integer data).
    """
    width = (hi - lo) / nbins
    upper = F.col(value) <= hi if include_hi else F.col(value) < hi
    binned = (
        df.filter((F.col(value) >= lo) & upper)
        .withColumn(
            "__bin",
            F.least(
                F.floor((F.col(value) - lo) / width).cast("int"), F.lit(nbins - 1)
            ),
        )
        .groupBy("__bin")
        .agg(F.count("*").alias("count"))
    )
    spark = df.sparkSession
    bins = spark.range(nbins).select(F.col("id").cast("int").alias("__bin"))
    return (
        bins.join(binned, "__bin", "left")
        .select(
            (F.lit(lo) + F.col("__bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("__bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.coalesce(F.col("count"), F.lit(0)).alias("count"),
        )
        .orderBy("bin_lo")
    )


def merge_fields(
    df: DataFrame,
    accs: Sequence[str],
    fields: Sequence[str],
    out_prefix: str,
    interpolated: bool = False,
) -> DataFrame:
    """`mlr merge-fields -a ... -f ... -o prefix` [-i]
    (pkg/transformers/merge_fields.go:29): stats1 accumulators applied
    HORIZONTALLY across fields within each record. Pure row-wise
    expressions — zero shuffle, fully codegen'd.
    """
    fields = _cols(fields)
    arr = (
        F.array(*[F.col(f).try_cast("double") for f in fields])
        if fields
        else F.array().cast("array<double>")
    )
    nn = F.filter(arr, lambda x: x.isNotNull())
    out = df
    for a in _cols(accs):
        name = f"{out_prefix}_{a}"
        ssum = F.aggregate(nn, F.lit(0.0), lambda acc, x: acc + x)
        ssum2 = F.aggregate(nn, F.lit(0.0), lambda acc, x: acc + x * x)
        cnt = F.size(nn)
        pct = _pct_needs(a)
        if pct is not None:
            # horizontal Miller percentile: sorted row values, index
            # int(p/100*n) clamped (percentiles.go:193-208); median/iqr/
            # fences share the same picks. With -i, R-type-7 linear
            # interpolation at (p/100)*(n-1) (percentiles.go:157-176).
            srt = F.array_sort(nn)

            def pick(p: float) -> Column:
                if interpolated:
                    findex = F.greatest(
                        F.lit(p / 100.0) * (cnt - 1).cast("double"), F.lit(0.0)
                    )
                    iidx = F.floor(findex).cast("int")
                    frac = findex - iidx.cast("double")
                    lo = F.get(srt, iidx)
                    hi = F.coalesce(F.get(srt, iidx + 1), lo)
                    return lo + frac * (hi - lo)
                idx = F.least(
                    F.greatest(F.floor(F.lit(p / 100.0) * cnt).cast("int"), F.lit(0)),
                    cnt - 1,
                )
                return F.get(srt, idx)

            if a == "median":
                c = pick(50.0)
            elif a == "iqr":
                c = pick(75.0) - pick(25.0)
            elif a in _FENCE_K:
                k2 = _FENCE_K[a]
                c = (pick(25.0) if k2 < 0 else pick(75.0)) + F.lit(k2) * (
                    pick(75.0) - pick(25.0)
                )
            else:
                c = pick(float(a[1:]))
            out = out.withColumn(f"{out_prefix}_{a}", c)
            continue
        if a == "min":
            c = F.array_min(nn)
        elif a == "max":
            c = F.array_max(nn)
        elif a == "sum":
            c = ssum
        elif a == "mean":
            c = ssum / cnt
        elif a == "count":
            c = cnt
        elif a == "var":  # sample variance from raw moments (n-1 denom)
            c = (ssum2 - ssum * ssum / cnt) / (cnt - 1)
        elif a == "stddev":
            c = F.sqrt((ssum2 - ssum * ssum / cnt) / (cnt - 1))
        else:
            raise ValueError(f"merge-fields accumulator not supported: {a}")
        out = out.withColumn(name, c)
    return out


def stats2(df: DataFrame, x: str, y: str, stats: Sequence[str], by: Sequence[str] = ()) -> DataFrame:
    """`mlr stats2 -a corr,cov,r2,linreg-ols -f x,y [-g ...]`
    (pkg/transformers/stats2.go:32; accumulators
    utils/stats2_accumulators.go:123-500). All derivable from raw
    cross-moments, so Catalyst's partial aggregation applies.
    """
    aggs = []
    for s in _cols(stats):
        if s == "corr":
            aggs.append(F.corr(x, y).alias(f"{x}_{y}_corr"))
        elif s == "cov":
            aggs.append(F.covar_samp(x, y).alias(f"{x}_{y}_cov"))
        elif s == "r2":
            aggs.append((F.corr(x, y) ** 2).alias(f"{x}_{y}_r2"))
        elif s == "linreg-ols":
            # slope m = cov/var(x), intercept b = ȳ - m·x̄ (stats2_accumulators.go:123+)
            m = F.covar_pop(x, y) / F.var_pop(x)
            aggs.append(m.alias(f"{x}_{y}_m"))
            aggs.append((F.avg(y) - m * F.avg(x)).alias(f"{x}_{y}_b"))
        elif s == "linreg-pca":
            # Total least squares via the principal eigenvector of the
            # 2x2 SAMPLE covariance matrix (lib/stats.go:165-183 GetCovMatrix,
            # :207-229 GetLinearRegressionPCA). Closed form for 2x2
            # symmetric [[sxx,sxy],[sxy,syy]]:
            #   lambda = ((sxx+syy) +- sqrt((sxx-syy)^2 + 4 sxy^2)) / 2
            #   principal direction (sxy, l1 - sxx)  =>  m = (l1-sxx)/sxy
            #   b = ybar - m*xbar; quality = 1 - |l2|/|l1|.
            sxx, syy, sxy = F.var_samp(x), F.var_samp(y), F.covar_samp(x, y)
            disc = F.sqrt((sxx - syy) * (sxx - syy) + 4 * sxy * sxy)
            l1 = (sxx + syy + disc) / 2
            l2 = (sxx + syy - disc) / 2
            m = (l1 - sxx) / sxy
            aggs.append(m.alias(f"{x}_{y}_pca_m"))
            aggs.append((F.avg(y) - m * F.avg(x)).alias(f"{x}_{y}_pca_b"))
            aggs.append(F.count(F.col(x)).alias(f"{x}_{y}_pca_n"))
            aggs.append(
                F.when(F.abs(l1) == 0, F.lit(0.0))
                .otherwise(1.0 - F.abs(l2) / F.abs(l1))
                .alias(f"{x}_{y}_pca_quality")
            )
        elif s == "covx":
            # sample-covariance matrix (stats2_accumulators.go:78-81)
            aggs.append(F.var_samp(x).alias(f"{x}_var"))
            aggs.append(F.covar_samp(x, y).alias(f"{x}_{y}_cov"))
            aggs.append(F.var_samp(y).alias(f"{y}_var"))
        else:
            raise ValueError(f"unknown stats2: {s}")
    if by:
        return df.groupBy(*_cols(by)).agg(*aggs)
    return df.agg(*aggs)


# ---------------------------------------------------------------------------
# per-record verbs (SURVEY.md §2.2) — zero-shuffle, codegen'd
# ---------------------------------------------------------------------------


def cut(df: DataFrame, fields: Sequence[str], complement: bool = False) -> DataFrame:
    """`mlr cut -f ...` [-x] (pkg/transformers/cut.go:26)."""
    fields = _cols(fields)
    if complement:
        return df.drop(*fields)
    return df.select(*fields)


def global_row_number(
    df: DataFrame, order_by: Sequence[str], out: str = "n", keep_pid: bool = False
) -> DataFrame:
    """Distributed 1-up row number in a global ``order_by`` order.

    A bare ``Window.orderBy`` funnels EVERY row through one task — fatal
    at 100 TB. Classic two-pass instead: range-partition on the order
    keys (so partition p holds a contiguous key range), number rows
    within each partition, then add each partition's start offset
    (per-partition counts are a tiny collected map, broadcast back).
    One range-exchange, no single-task stage.
    """
    order_by = _cols(order_by)
    ordered = df.repartitionByRange(
        *[F.col(c) for c in order_by]
    ).sortWithinPartitions(*[F.col(c) for c in order_by])
    # Materialize the partition assignment before reuse in two subplans:
    # range sampling is nondeterministic on recompute, so both the counts
    # collect and the downstream scan must read the SAME placement.
    # localCheckpoint (not persist) so the blocks are released by the
    # ContextCleaner when the result DataFrame is garbage-collected,
    # instead of pinning executor storage for the session's lifetime.
    ordered = ordered.localCheckpoint(eager=True)
    # Number WITHOUT a window: monotonically_increasing_id over the
    # checkpointed (sorted, placement-fixed) blocks encodes
    # (partition << 33) | local-row-index, so the local index and pid
    # are pure projections — a Window.partitionBy(pid) here would
    # re-exchange the full payload by pid hash just to compute what the
    # physical layout already knows. The 33-bit local index caps a
    # partition at 8.6e9 rows — three orders of magnitude above a sane
    # 128 MB-split partition even at 100 TB. Consumers that window over __pid
    # (prefix sums, boundary lags) still pay their one clustering
    # exchange; __n-only consumers (cat -n, decimate, sample) now pay
    # only the range exchange.
    tagged = ordered.withColumn("__mid", F.monotonically_increasing_id())
    pid_of = F.shiftright("__mid", 33).cast("int")
    counts = {
        r["__pid"]: r["cnt"]
        for r in tagged.groupBy(pid_of.alias("__pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)).cast("long")
    numbered = tagged.withColumn(
        out, local + 1 + F.coalesce(off[pid_of], F.lit(0))
    ).withColumn("__pid", pid_of).drop("__mid")
    return numbered if keep_pid else numbered.drop("__pid")


def percentiles_rank(
    df: DataFrame,
    value: str,
    ps: Sequence[float],
    by: Sequence[str] = (),
    interpolated: bool = True,
) -> DataFrame:
    """EXACT per-group percentiles WITHOUT per-group buffers — the
    distributed alternative to the sorted-collect_list oracle path
    (stats1 percentile family) and the exact cousin of the KLL/t-digest
    estimates.

    Plan: ONE range exchange on (by..., value) clusters and sorts the
    frame; per-partition group counts (a tiny collect — groups are
    CONTIGUOUS within a sorted partition) give every (partition, group)
    both its in-partition start index and its global rank offset, so a
    row's global in-group rank is a pure projection off
    monotonically_increasing_id — no Window, no second exchange. Only
    the <= 2 order statistics each requested percentile needs survive
    the rank filter (a broadcast semi-join against a few rows), and a
    conditional aggregation interpolates them. Memory class: O(one
    partition) rows executor-side, O(#partitions x #groups) driver
    state — this is the 100 TB shape when the quantile must be EXACT
    rather than KLL-approximate.

    Semantics: interpolated=True == Miller --interpolate == R type 7 ==
    SQL percentile_cont (position p*(n-1), linear); False == Miller's
    default element pick sorted[clamp(int(p/100*n), 0, n-1)]
    (pkg/bifs/percentiles.go:193-208). Output: by..., {value}_p{p}.
    """
    by = _cols(by)
    ps = list(ps)
    d = df.select(*by, F.col(value).cast("double").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    ordered = d.repartitionByRange(
        *[F.col(c) for c in by], F.col("__v")
    ).sortWithinPartitions(*[F.col(c) for c in by], F.col("__v"))
    ordered = ordered.localCheckpoint(eager=True)  # pin range placement
    tagged = ordered.withColumn("__mid", F.monotonically_increasing_id())
    pid_of = F.shiftright("__mid", 33).cast("int")
    gkey = F.concat_ws("\x01", *[F.col(c).cast("string") for c in by]) if by else F.lit("")
    # per-(partition, group) row counts; groups are contiguous in the
    # range-sorted layout, so these yield both start indexes and offsets
    pg = (
        tagged.groupBy(pid_of.alias("__pid"), gkey.alias("__g"))
        .agg(F.count(F.lit(1)).alias("__c"), F.min("__mid").alias("__m0"))
        .collect()
    )
    per_group: dict[str, list] = {}
    for r in pg:
        per_group.setdefault(r["__g"], []).append(r)
    # adj(pid, g): global in-group rank = partition-local row index
    # + adj, where adj = (rows of g in earlier partitions) - (g's start
    # index within this partition)
    adj_entries: list[tuple[str, int]] = []
    n_of: dict[str, int] = {}
    for g, rows in per_group.items():
        rows.sort(key=lambda r: r["__pid"])
        run = 0
        for r in rows:
            start_local = r["__m0"] & ((1 << 33) - 1)
            adj_entries.append((f"{r['__pid']}|{g}", run - start_local))
            run += r["__c"]
        n_of[g] = run
    adj = F.create_map(
        *[F.lit(x) for kv in adj_entries for x in kv]
    ) if adj_entries else F.create_map()
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)).cast("long")
    ranked = tagged.withColumn(
        "__rk", local + adj[F.concat(pid_of.cast("string"), F.lit("|"), gkey)]
    )
    # needed 0-based ranks per group with interpolation weights
    need_rows = []
    for g, n in n_of.items():
        for p in ps:
            if n == 0:
                continue
            if interpolated:
                pos = (p / 100.0) * (n - 1)
                lo = int(pos)
                frac = pos - lo
                need_rows.append((g, lo, p, 1.0 - frac))
                if frac > 0 and lo + 1 <= n - 1:
                    need_rows.append((g, lo + 1, p, frac))
            else:
                idx = min(max(int((p / 100.0) * n), 0), n - 1)
                need_rows.append((g, idx, p, 1.0))
    spark = df.sparkSession
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    dedup_need = {(g, rk, float(p)): w for g, rk, p, w in need_rows}
    need = spark.createDataFrame(
        [(g, int(rk), p, float(w)) for (g, rk, p), w in dedup_need.items()],
        StructType([
            StructField("__g", StringType()), StructField("__rk", LongType()),
            StructField("__p", DoubleType()), StructField("__w", DoubleType()),
        ]),
    )
    hits = ranked.withColumn("__g", gkey).join(
        F.broadcast(need), ["__g", "__rk"]
    )
    aggs = [
        F.sum(F.when(F.col("__p") == p, F.col("__v") * F.col("__w"))).alias(
            f"{value}_p{('%g' % p).replace('.', '_')}"
        )
        for p in ps
    ]
    out = hits.groupBy(*by).agg(*aggs) if by else hits.groupBy().agg(*aggs)
    return out


def cat_numbered(df: DataFrame, by: Sequence[str] = (), order_by: Sequence[str] = ()) -> DataFrame:
    """`mlr cat -n [-g ...]` (pkg/transformers/cat.go:23): prepend 1-up
    counter, optionally per group, in ``order_by`` order. Grouped:
    one hash-partitioned window. Ungrouped: distributed two-pass
    global_row_number (no single-task window)."""
    by = _cols(by)
    if not by:
        num = global_row_number(df, _cols(order_by), out="n")
        return num.select("n", *df.columns)
    w = Window.partitionBy(*by).orderBy(*[F.col(c) for c in _cols(order_by)])
    return df.select(F.row_number().over(w).alias("n"), "*")


def rename_fields(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """`mlr rename old,new,...` (pkg/transformers/rename.go:29).
    Renaming onto an EXISTING field replaces it — the prior field is
    dropped (golden verb-rename/0004: `rename a,b` discards old b)."""
    collisions = [
        new for old, new in mapping.items()
        if new in df.columns and new not in mapping
    ]
    return df.drop(*collisions).withColumnsRenamed(mapping)


def reorder(df: DataFrame, front: Sequence[str] = (), back: Sequence[str] = ()) -> DataFrame:
    """`mlr reorder -f ...` [-e] (pkg/transformers/reorder.go:26)."""
    front, back = _cols(front), _cols(back)
    mid = [c for c in df.columns if c not in front and c not in back]
    return df.select(*front, *mid, *back)


def fill_empty(df: DataFrame, fill: str = "N/A", fields: Sequence[str] | None = None) -> DataFrame:
    """`mlr fill-empty -v ...` (pkg/transformers/fill_empty.go:21):
    replace empty-string values (Miller's VOID) with a constant."""
    fields = _cols(fields) if fields else [c for c, t in df.dtypes if t == "string"]
    return df.withColumns(
        {f: F.when(F.col(f) == "", F.lit(fill)).otherwise(F.col(f)) for f in fields}
    )


def fill_down(
    df: DataFrame,
    fields: Sequence[str],
    order_by: Sequence[str],
    by: Sequence[str] = (),
    only_if_absent: bool = False,
    only_voids: bool = False,
) -> DataFrame:
    """`mlr fill-down` (pkg/transformers/fill_down.go:16-18,160-189) in
    ``order_by`` order, with the reference's three missingness modes
    under the fixed-schema mapping absent==null, void==empty string:

    - default (``-f a,b``): a field is missing when absent OR void;
      only non-void present values are remembered as the carry.
    - ``only_if_absent`` (``-a``/``--only-if-absent``): missing means
      absent only; void values are remembered and carried.
    - ``only_voids`` (``--all``): the reference iterates each record's
      OWN fields, so absent fields are never filled — only voids are
      replaced (and with ``-a`` too, ``--all`` is a pass-through).

    A field with no prior carry keeps its original value (absent stays
    absent, void stays void — fill_down.go:176-180).

    Grouped: one hash-partitioned window. Ungrouped: range-partition on
    the order key, fill within each partition, and resolve the
    cross-partition carry (the last rememberable value of every
    PREVIOUS partition) from a tiny per-partition aggregate collected
    to the driver — the two-pass pattern of global_row_number, instead
    of an empty-partition window that serializes all rows through one
    task."""
    fields = _cols(fields)
    order_by = _cols(order_by)
    str_cols = {c for c, t in df.dtypes if t == "string"}

    def memcol(f):  # the value a row contributes to the carry, else null
        if only_if_absent or f not in str_cols:
            return F.col(f)
        return F.nullif(F.col(f), F.lit(""))

    def fill_expr(f, carryv):  # apply the carry per missingness mode
        c = F.col(f)
        if only_voids:
            if f not in str_cols:
                return c
            missing = c == ""
        elif only_if_absent or f not in str_cols:
            missing = c.isNull()
        else:
            missing = c.isNull() | (c == "")
        return F.when(missing, F.coalesce(carryv, c)).otherwise(c)

    if by:
        w = (
            Window.partitionBy(*_cols(by))
            .orderBy(*[F.col(c) for c in order_by])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumns(
            {f: fill_expr(f, F.last(memcol(f), ignorenulls=True).over(w)) for f in fields}
        )
    ordered = df.repartitionByRange(*[F.col(c) for c in order_by]).withColumn(
        "__pid", F.spark_partition_id()
    )
    ordered = ordered.localCheckpoint(eager=True)
    # per-partition last rememberable value of each field, in order:
    # max_by(f, ord-when-rememberable) — one tiny row per partition
    lastkey = F.struct(*[F.col(c) for c in order_by])
    tails = (
        ordered.groupBy("__pid")
        .agg(
            *[
                F.max_by(
                    memcol(f), F.when(memcol(f).isNotNull(), lastkey)
                ).alias(f)
                for f in fields
            ]
        )
        .collect()
    )
    by_pid = {r["__pid"]: r for r in tails}
    carries: dict[str, dict[int, object]] = {f: {} for f in fields}
    running = {f: None for f in fields}
    for pid in sorted(by_pid):
        for f in fields:
            carries[f][pid] = running[f]
        for f in fields:
            v = by_pid[pid][f]
            if v is not None:
                running[f] = v
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    updates = {}
    for f in fields:
        carry = None
        for pid, v in carries[f].items():
            if v is None:
                continue
            clause = F.when(F.col("__pid") == pid, F.lit(v))
            carry = clause if carry is None else carry.when(F.col("__pid") == pid, F.lit(v))
        filled = F.last(memcol(f), ignorenulls=True).over(w_in)
        carryv = F.coalesce(filled, carry) if carry is not None else filled
        updates[f] = fill_expr(f, carryv)
    return ordered.withColumns(updates).drop("__pid")


def clean_whitespace(df: DataFrame, fields: Sequence[str] | None = None) -> DataFrame:
    """`mlr clean-whitespace` (pkg/transformers/clean_whitespace.go:21):
    trim + collapse internal runs of whitespace."""
    fields = _cols(fields) if fields else [c for c, t in df.dtypes if t == "string"]
    return df.withColumns(
        {f: F.regexp_replace(F.trim(F.col(f)), r"\s+", " ") for f in fields}
    )


def sub_field(df: DataFrame, field: str, pattern: str, replacement: str, all_matches: bool = True) -> DataFrame:
    """`mlr sub/gsub -f field pattern repl` (pkg/transformers/subs.go:26)."""
    if all_matches:
        return df.withColumn(field, F.regexp_replace(F.col(field), pattern, replacement))
    # sub: FIRST match only (subs.go:26 `sub` vs `gsub`). Spark's
    # regexp_replace is global, so wrap: the (?s)(.*) tail makes the
    # first match consume the rest of the string, leaving exactly one
    # replacement site. The wrap adds one leading group, so user
    # backrefs $n/\n in `replacement` shift to $n+1, and the tail group
    # index is (pattern's own group count)+2.
    import re as _re

    n_inner = _re.compile(pattern).groups
    shifted = _re.sub(
        r"(?<!\\)\$(\d)", lambda m: f"${int(m.group(1)) + 1}", replacement
    )
    return df.withColumn(
        field,
        F.regexp_replace(
            F.col(field),
            f"(?s)({pattern})(.*)",
            shifted + f"${n_inner + 2}",
        ),
    )


def case_fields(
    df: DataFrame, fields: Sequence[str], mode: str = "upper", which: str = "values"
) -> DataFrame:
    """`mlr case -u/-l/-t [-k|-v] -f ...` (pkg/transformers/case.go:29).
    Default (no -k/-v) cases BOTH keys and values (golden
    verb-case/0001); numeric values are untouched (casing a number is a
    no-op on its string form here since [A-Z] never appears)."""
    def _py_sentence(s: str) -> str:
        return (s[0].upper() + s[1:].lower()) if s else s

    py_fn = {"upper": str.upper, "lower": str.lower, "title": str.title,
             "sentence": _py_sentence}[mode]

    fn = {
        "upper": F.upper,
        "lower": F.lower,
        "title": F.initcap,
        "sentence": lambda c: F.when(
            F.length(c) > 0,
            F.concat(F.upper(c.substr(F.lit(1), F.lit(1))), F.lower(c.substr(F.lit(2), F.length(c)))),
        ).otherwise(c),
    }[mode]
    fields = _cols(fields)
    out = df
    if which in ("values", "both"):
        str_fields = [f for f in fields if dict(df.dtypes).get(f) == "string"]
        out = out.withColumns({f: fn(F.col(f)) for f in str_fields})
    if which in ("keys", "both"):
        out = out.withColumnsRenamed({f: py_fn(f) for f in fields})
    return out


def sec2gmt(
    df: DataFrame, fields: Sequence[str], decimals: int = 0, divisor: float = 1.0
) -> DataFrame:
    """`mlr sec2gmt [-1|-2|...] [--millis|--micros|--nanos]`
    (pkg/transformers/sec2gmt.go:30): epoch seconds → ISO-8601
    'YYYY-MM-DDTHH:MM:SSZ'. Non-numeric values pass through unchanged
    (golden verb-sec2gmt/0001); fractional seconds truncate to
    `decimals` digits (golden verb-sec2gmt/0002 for -1); --millis etc
    divide the input by 1e3/1e6/1e9 first."""
    def conv(f: str) -> Column:
        num = F.col(f).try_cast("double")  # ANSI-safe: non-numeric -> null
        if divisor != 1.0:
            num = num / F.lit(divisor)
        base = F.date_format(F.timestamp_seconds(F.floor(num)), "yyyy-MM-dd'T'HH:mm:ss")
        if decimals > 0:
            frac = F.floor((num - F.floor(num)) * (10 ** decimals)).cast("long")
            iso = F.concat(base, F.lit("."), F.lpad(frac.cast("string"), decimals, "0"), F.lit("Z"))
        else:
            iso = F.concat(base, F.lit("Z"))
        return F.when(num.isNotNull(), iso).otherwise(F.col(f).cast("string"))

    return df.withColumns({f: conv(f) for f in _cols(fields)})


def format_values(df: DataFrame, fmt: str = "%.6f", fields: Sequence[str] | None = None) -> DataFrame:
    """`mlr format-values -f fmt` (pkg/transformers/format_values.go:26)."""
    fields = _cols(fields) if fields else [c for c, t in df.dtypes if t in ("double", "float")]
    return df.withColumns({f: F.format_string(fmt, F.col(f)) for f in fields})


def having_fields_all_defined(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr having-fields --at-least ...`
    (pkg/transformers/having_fields.go:28) under a fixed schema:
    presence == non-null."""
    return having_fields(df, "at-least", fields=fields)


def having_fields(
    df: DataFrame,
    mode: str,
    fields: Sequence[str] | None = None,
    pattern: str | None = None,
    exclude: Sequence[str] = (),
) -> DataFrame:
    """`mlr having-fields` — all six modes
    (pkg/transformers/having_fields.go:27-35) under the fixed-schema
    mapping: a field is present in a record iff its column is non-null.

    ``mode`` ∈ {"at-least", "any-defined", "which-are", "at-most",
    "all-matching", "any-matching", "none-matching"}; the first four
    take ``fields``, the last three a Go-compatible regex ``pattern``
    (``"..."i`` / ``/.../i`` case-insensitive forms accepted).
    ``exclude`` names bookkeeping columns (e.g. an order key) ignored
    by the presence test. Pure Catalyst filter — pushes down, no
    shuffle."""
    import re as _re

    cols = [c for c in df.columns if c not in set(exclude)]
    if mode in ("all-matching", "any-matching", "none-matching"):
        pat = pattern or ""
        flags = 0
        m = _re.fullmatch(r'(?:/(.*)/|"(.*)")(i?)', pat, _re.S)
        if m:
            pat = m.group(1) if m.group(1) is not None else m.group(2)
            if m.group(3):
                flags = _re.I
        rx = _re.compile(pat, flags)
        hit = [c for c in cols if rx.search(c)]
        miss = [c for c in cols if c not in hit]
        if mode == "any-matching":
            cond = F.lit(False)
            for c in hit:
                cond = cond | F.col(c).isNotNull()
        elif mode == "all-matching":
            # every PRESENT field's name matches (and at least one does)
            cond = F.lit(True)
            for c in miss:
                cond = cond & F.col(c).isNull()
            any_hit = F.lit(False)
            for c in hit:
                any_hit = any_hit | F.col(c).isNotNull()
            cond = cond & any_hit
        else:  # none-matching
            cond = F.lit(True)
            for c in hit:
                cond = cond & F.col(c).isNull()
        return df.filter(cond)

    want = _cols(fields or ())
    if mode in ("at-least", "all-defined"):
        if any(f not in cols for f in want):
            return df.limit(0)  # a field no record has => nothing passes
        cond = F.lit(True)
        for f in want:
            cond = cond & F.col(f).isNotNull()
        return df.filter(cond)
    if mode == "any-defined":
        present = [f for f in want if f in cols]
        if not present:
            return df.limit(0)
        cond = F.lit(False)
        for f in present:
            cond = cond | F.col(f).isNotNull()
        return df.filter(cond)
    if mode == "which-are":
        wset = set(want)
        if wset - set(cols):
            return df.limit(0)
        cond = F.lit(True)
        for c in cols:
            has = F.col(c).isNotNull()
            cond = cond & (has if c in wset else ~has)
        return df.filter(cond)
    if mode == "at-most":
        allowed = set(want)
        cond = F.lit(True)
        for c in cols:
            if c not in allowed:
                cond = cond & F.col(c).isNull()
        return df.filter(cond)
    raise ValueError(f"having_fields: unknown mode {mode!r}")


def skip_trivial_records(df: DataFrame) -> DataFrame:
    """`mlr skip-trivial-records` (skip_trivial_records.go:16)."""
    return df.na.drop("all")


def repeat(df: DataFrame, n_field_or_const: str | int) -> DataFrame:
    """`mlr repeat -n n | -f field` (pkg/transformers/repeat.go:37):
    emit each record n times via explode(array_repeat) — distributed,
    no driver loop."""
    n = (
        F.lit(int(n_field_or_const))
        if isinstance(n_field_or_const, int)
        else F.col(n_field_or_const).cast("int")
    )
    return (
        df.withColumn("__rep", F.explode(F.array_repeat(F.lit(1), n)))
        .drop("__rep")
    )


def decimate(
    df: DataFrame, n: int, order_by: Sequence[str], by: Sequence[str] = (),
    keep_first: bool = False,
) -> DataFrame:
    """`mlr decimate -n N [-b|-e]` (pkg/transformers/decimate.go:21):
    keep one record per block of N — the last (default / -e) or the
    first (-b). Ungrouped path numbers rows with the distributed
    two-pass global_row_number."""
    by = _cols(by)
    keep = (F.col("__rn") % n == 1) if keep_first else (F.col("__rn") % n == 0)
    if not by:
        return (
            global_row_number(df, _cols(order_by), out="__rn")
            .filter(keep)
            .drop("__rn")
        )
    w = Window.partitionBy(*by).orderBy(*[F.col(c) for c in _cols(order_by)])
    return df.withColumn("__rn", F.row_number().over(w)).filter(keep).drop("__rn")


# ---------------------------------------------------------------------------
# sort / head / tail / sampling (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


def sort(df: DataFrame, specs: Sequence[tuple[str, str]]) -> DataFrame:
    """`mlr sort -f/-r/-nf/-nr ...` (pkg/transformers/sort.go:69).

    specs: (field, one of 'f'|'r'|'nf'|'nr'|'c'|'cr'|'t'|'tr') —
    lexical asc/desc, numeric asc/desc, case-folded, natural
    (sort.go:57-66). Miller: numeric sort puts non-numerics last.
    Spark's sort is a distributed range-partitioned sort (spills),
    unlike Miller's in-memory sort (performance.md:27).
    """
    order = []
    for f, how in specs:
        c = F.col(f)
        # records MISSING the sort field always go last (sort.go),
        # regardless of direction
        if how == "f":
            order.append(c.cast("string").asc_nulls_last())
        elif how == "r":
            order.append(c.cast("string").desc_nulls_last())
        elif how == "nf":
            order.append(c.cast("double").asc_nulls_last())
        elif how == "nr":
            order.append(c.cast("double").desc_nulls_last())
        elif how == "c":
            order.append(F.lower(c.cast("string")).asc_nulls_last())
        elif how == "cr":
            order.append(F.lower(c.cast("string")).desc_nulls_last())
        elif how in ("t", "tr"):
            k = _natural_sort_key(c.cast("string"))
            order.append(k.asc_nulls_last() if how == "t" else k.desc_nulls_last())
        else:
            raise ValueError(how)
    return df.orderBy(*order)


def _natural_sort_key(c: Column) -> Column:
    """Natural-order sort key (`mlr sort -t`, sort.go:57-66): digit runs
    compare numerically, text runs lexically. Built entirely from JVM
    HOFs (split on digit/non-digit boundaries, left-pad digit runs to a
    fixed width) — stays inside whole-stage codegen, no UDF."""
    toks = F.split(c, r"(?<=\D)(?=\d)|(?<=\d)(?=\D)")
    padded = F.transform(
        toks,
        lambda t: F.when(t.rlike("^[0-9]+$"), F.lpad(t, 20, "0")).otherwise(t),
    )
    return F.array_join(padded, "")


def head(df: DataFrame, n: int, by: Sequence[str] = (), order_by: Sequence[str] = ()) -> DataFrame:
    """`mlr head -n N [-g ...]` (pkg/transformers/head.go:19). Ungrouped
    head maps to limit() — Spark's limit pushdown is the analogue of
    Miller's reader-stop done-channel (stream.go:79-86)."""
    if not by:
        if order_by:
            return df.orderBy(*[F.col(c) for c in _cols(order_by)]).limit(n)
        return df.limit(n)
    w = Window.partitionBy(*_cols(by)).orderBy(*[F.col(c) for c in _cols(order_by)])
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n).drop("__rn")


def tail(df: DataFrame, n: int, by: Sequence[str] = (), order_by: Sequence[str] = ()) -> DataFrame:
    """`mlr tail -n N [-g ...]` (pkg/transformers/tail.go:20). Ungrouped:
    last-n == top-n in reversed order, planned as TakeOrdered (no
    single-partition window)."""
    by = _cols(by)
    if not by:
        return df.orderBy(*[F.col(c).desc() for c in _cols(order_by)]).limit(n)
    w = Window.partitionBy(*by).orderBy(*[F.col(c).desc() for c in _cols(order_by)])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def tac(df: DataFrame, order_by: Sequence[str]) -> DataFrame:
    """`mlr tac` (pkg/transformers/tac.go:16): reverse; needs an explicit
    order column in Spark (no stream order)."""
    return df.orderBy(*[F.col(c).desc() for c in _cols(order_by)])


def sample(
    df: DataFrame,
    k: int,
    by: Sequence[str] = (),
    seed: int = 42,
    key: Sequence[str] = (),
) -> DataFrame:
    """`mlr sample -k K [-g ...]` (pkg/transformers/sample.go:30):
    exact-k per-group reservoir sample. Distributed equivalent: rank on
    a pseudo-random key — grouped: one-shuffle window; ungrouped: top-k
    on the key, planned as TakeOrdered (the distributed reservoir).

    With ``key`` (a stable record identity, e.g. the primary key) the
    rank key is ``md5(seed || key)`` — a seeded hash-sample that is
    reproducible across cluster sizes, partitionings, and resumed runs
    (the right default at 100 TB, and SQL-oracle-checkable). Without
    ``key`` it falls back to seeded ``rand()``, which is deterministic
    only for a fixed input partitioning.
    """
    by = _cols(by)
    key = _cols(key)
    if key:
        rk = F.md5(
            F.concat_ws("\x01", F.lit(str(seed)), *[F.col(c).cast("string") for c in key])
        )
    else:
        rk = F.rand(seed)
    if not by:
        return df.withColumn("__r", rk).orderBy("__r").limit(k).drop("__r")
    w = Window.partitionBy(*by).orderBy(rk)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


# ---------------------------------------------------------------------------
# join (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

_JOIN_HOW = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "full",
    "left-anti": "left_anti",
    "left-semi": "left_semi",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    broadcast_left: bool = False,
    lp: str = "",
    rp: str = "",
) -> DataFrame:
    """`mlr join -f left.file -j keys` + emit flags
    (pkg/transformers/join.go:36; flag→join-type matrix join.go:24-31:
    inner / --ul left / --ur right / --ul --ur full / --np --ul anti).

    Miller's unsorted mode hash-loads the whole left file
    (join.go:533) — the Spark analogue is an explicit broadcast of the
    small side (``broadcast_left``); its sorted mode is Catalyst's
    SortMergeJoin, chosen automatically for large-large joins.
    --lp/--rp prefixes map to column renames before joining.
    """
    on = _cols(on)
    if lp:
        left = left.withColumnsRenamed({c: lp + c for c in left.columns if c not in on})
    if rp:
        right = right.withColumnsRenamed({c: rp + c for c in right.columns if c not in on})
    lhs = F.broadcast(left) if broadcast_left else left
    return lhs.join(right, on=on, how=_JOIN_HOW[how])


# ---------------------------------------------------------------------------
# step / windowed verbs (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


def _steppers_max_forward(steppers: Sequence[str], slwins: Sequence[tuple[int, int]]) -> int:
    """Max forward-window across all steppers (step.go:36: 'the delay is
    the max of each stepper's look-forward' — the window structure is
    SHARED, so one shift_lead_2 delays every stepper's emission)."""
    f_max = 0
    for s in steppers:
        base_name, k = _parse_stepper(s)
        if base_name == "shift_lead":
            f_max = max(f_max, k)
    for _b, fw in slwins:
        f_max = max(f_max, fw)
    return f_max


def step(
    df: DataFrame,
    steppers: Sequence[str],
    values: Sequence[str],
    order_by: Sequence[str],
    by: Sequence[str] = (),
    ewma_alphas: Sequence[float] = (),
    slwins: Sequence[tuple[int, int]] = (),
) -> DataFrame:
    """`mlr step -a shift,delta,ratio,rsum,counter,from-first,slwin_m_n
    -f ...` (pkg/transformers/step.go:630-712). Output columns
    ``{f}_{stepper}`` like Miller (slwin: ``{f}_slwin_{m}_{n}`` — the
    caller renames to Miller's ``{f}_{m}_{n}``).

    Heterogeneity model (step.go:404-496): with F = max look-forward
    across steppers, record j is the 'window center' of the event fired
    when record j+F is ingested (or when record j itself is drained at
    end-of-stream, step.go:383-391). The event's GATE is the
    field-presence of the *ingested* record — r_{j+F} while streaming,
    r_j during drain. A gated-off event emits no stepper outputs for
    that field on the center record and pushes nil into the prev-value
    caches (clearPrevValue, step.go:446-457), so shift/delta/ratio read
    ``lag`` over the gated value sequence v_j = gate(j) ? f_j : null —
    NOT an ignorenulls lag. Running state (rsum/rprod/counter/
    from-first/ewma) advances only on events where the gate is open and
    the center value is present. Records in groups smaller than F are
    silently dropped by the reference's drain loop (each pending log
    entry gets exactly one nil-ingest): a group of m records emits only
    its first min(m, max(0, 2m-F)) records — verb-step/0022 and 0026
    goldens encode this.

    Grouped: one shuffle on the group keys; all steppers share the same
    window, so Catalyst plans a single Window exec. Ungrouped: an
    empty-partition window would single-task every row, so the work is
    decomposed scale-safely instead — bounded lookback (shift/delta/
    ratio/lead) becomes an equi-join on the distributed global row
    number; running aggregates (rsum/rprod/counter/ewma) run
    per-range-partition with the tiny cross-partition carries combined
    on the driver (global_row_number's two-pass pattern).
    """
    by = _cols(by)
    values = _cols(values)
    steppers = _cols(steppers)
    slwins = list(slwins)
    f_max = _steppers_max_forward(steppers, slwins)
    if not by:
        return _step_ungrouped(df, steppers, values, order_by, ewma_alphas, slwins, f_max)
    base = Window.partitionBy(*by).orderBy(*[F.col(c) for c in _cols(order_by)])
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp_m = F.count(F.lit(1)).over(Window.partitionBy(*by))
    grp_j = F.row_number().over(base)
    result_cols: dict[str, Column] = {}
    for f in values:
        c = F.col(f)
        # het gate: ingested-record field presence (see docstring)
        if f_max:
            gate = F.when(
                grp_j + f_max <= grp_m, F.lead(c, f_max).over(base).isNotNull()
            ).otherwise(c.isNotNull())
        else:
            gate = c.isNotNull()
        v = F.when(gate, c)  # the value each event pushes into prev-caches
        for s in steppers:
            # parameterized steppers shift_lag_N / shift_lead_N / delta_N /
            # ratio_N (step.go:679-701 registers the _n variants)
            base_name, lag_n = _parse_stepper(s)
            if base_name in ("shift", "shift_lag"):
                # outputs VOID when no prev (absent==null here; the two
                # canonicalize identically in the fixed-schema mapping)
                e = F.when(gate, F.lag(v, lag_n).over(base))
            elif base_name == "shift_lead":
                e = F.when(gate, F.lead(c, lag_n).over(base))
            elif base_name == "delta":  # step.go:639-645: no prev gets 0
                e = F.when(
                    gate & c.isNotNull(),
                    F.coalesce(c - F.lag(v, lag_n).over(base), F.lit(0)),
                )
            elif base_name == "ratio":  # leading records (no lag yet) get 1
                e = F.when(
                    gate & c.isNotNull(),
                    F.coalesce(c / F.lag(v, lag_n).over(base), F.lit(1.0)),
                )
            elif s == "rsum":
                e = F.when(gate & c.isNotNull(), F.sum(v).over(run))
            elif s == "rprod":
                e = F.when(gate & c.isNotNull(), F.exp(F.sum(F.log(v)).over(run)))
            elif s == "counter":
                e = F.when(gate & c.isNotNull(), F.count(v).over(run))
            elif s == "from-first":
                e = F.when(
                    gate & c.isNotNull(),
                    c - F.first(v, ignorenulls=True).over(run),
                )
            else:
                raise ValueError(f"unknown stepper: {s}")
            result_cols[f"{f}_{s.replace('-', '_')}"] = e
        for m_back, n_fwd in slwins:
            # slwin averages the RAW field over the positional window,
            # skipping absent/void slots (step.go:1575-1608); empty
            # window -> VOID
            e = F.when(gate, F.avg(c).over(base.rowsBetween(-m_back, n_fwd)))
            result_cols[f"{f}_slwin_{m_back}_{n_fwd}"] = e
        # ewma (step.go:647-651): y_t = αx_t + (1-α)y_{t-1}, y_0 = x_0,
        # advancing only on gated-open present values. Closed form avoids
        # applyInPandas: y_t = Σ α'(i) x_i with weights α(1-α)^(t-i) over
        # the NON-NULL event index; expressed via running sums of
        # v_i/(1-α)^i. Numerically unstable for long series — for those,
        # use mlrsketch.verbs.sketch.ewma_pandas (applyInPandas).
        for alpha in ewma_alphas:
            beta = 1.0 - alpha
            i = F.count(v).over(run)  # index among gated-present values
            scaled = v * F.pow(F.lit(beta), -i)
            s1 = F.sum(scaled).over(run)
            first_scaled = F.first(scaled, ignorenulls=True).over(run)
            label = ("%g" % alpha).replace(".", "_")
            y = F.pow(F.lit(beta), i) * (
                F.lit(alpha) * s1 + F.lit(1 - alpha) * first_scaled
            )
            result_cols[f"{f}_ewma_{label}"] = F.when(gate & c.isNotNull(), y)
    out = df.withColumns(result_cols)
    if f_max:
        # drain drop rule (see docstring): keep first min(m, 2m-F) of each group
        out = (
            out.withColumn("__m_", grp_m)
            .withColumn("__j_", grp_j)
            .filter(
                (F.col("__m_") >= f_max)
                | (F.col("__j_") <= 2 * F.col("__m_") - f_max)
            )
            .drop("__m_", "__j_")
        )
    return out


def _parse_stepper(s: str) -> tuple[str, int]:
    parts = s.rsplit("_", 1)
    if len(parts) == 2 and parts[1].isdigit() and parts[0] in (
        "shift_lag", "shift_lead", "delta", "ratio"
    ):
        return parts[0], int(parts[1])
    return s, 1


# literal boundary maps inflate the Catalyst plan by len(edge_rows)
# entries PER USE SITE (the plan-size blowup class dsl/compiler.py:85
# warns about); past this budget _step_ungrouped's boundary lookup
# becomes a tiny broadcast left-join per (offset, field) instead —
# same values, bounded plan.
_EDGE_LITERAL_MAX = 10_000


def _step_ungrouped(
    df: DataFrame,
    steppers: Sequence[str],
    values: Sequence[str],
    order_by: Sequence[str],
    ewma_alphas: Sequence[float] = (),
    slwins: Sequence[tuple[int, int]] = (),
    f_max: int = 0,
) -> DataFrame:
    """Ungrouped steppers without a single-task window (see step()).

    Implements the same het event model as the grouped path: gates come
    from the ingested record (a +f_max presence join), prev-caches lag
    over the gated value sequence, and running state skips gated-off
    events. slwin composes separately via slwin() (the caller handles
    it); a het input mixing slwin with forward steppers ungrouped would
    need a shared f_max across both — no reference golden exercises
    that combination, documented here for honesty.
    """
    if slwins:
        raise ValueError("ungrouped slwin: compose slwin() after step()")
    values = _cols(values)
    steppers = _cols(steppers)
    numbered = global_row_number(df, _cols(order_by), out="__n", keep_pid=True)

    # ---- het gate: presence of each field on the record f_max ahead
    # (the 'ingested' record of this center's event); tail rows with no
    # record f_max ahead gate on their own presence (drain events)
    if f_max:
        # the gate is a LEAD of presence flags by f_max — in-partition
        # window lead plus a broadcast boundary map of the first f_max
        # rows per partition (same no-exchange shape as the lag path
        # below; this used to be a full equi-join on __n). n_total (the
        # global-tail gate bound) rides along as the per-partition max
        # __n on the same edge rows — no separate count() job.
        w_g = Window.partitionBy("__pid").orderBy("__n")
        edge_gate = (
            numbered.withColumn("__fpos", F.row_number().over(w_g))
            .withColumn("__pmax", F.max("__n").over(Window.partitionBy("__pid")))
            .filter(F.col("__fpos") <= f_max)
            .select(
                "__n", "__pmax",
                *[F.col(f).isNotNull().alias(f"__p_{f}") for f in values],
            )
            .collect()
        )
        n_total = max((r["__pmax"] for r in edge_gate), default=0)
        vbase = numbered.withColumn(
            "__gpos", F.row_number().over(w_g)
        ).withColumn("__gsz", F.count(F.lit(1)).over(Window.partitionBy("__pid")))
        gates = {}
        for f in values:
            pairs = [
                x
                for r in edge_gate
                for x in (F.lit(r["__n"]), F.lit(r[f"__p_{f}"]))
            ]
            bmap = F.create_map(*pairs) if pairs else F.create_map()
            gp = F.when(
                F.col("__gpos") <= F.col("__gsz") - f_max,
                F.lead(F.col(f).isNotNull(), f_max).over(w_g),
            ).otherwise(bmap[F.col("__n") + f_max])
            gates[f] = F.when(
                F.col("__n") + f_max <= F.lit(n_total),
                F.coalesce(gp, F.lit(False)),
            ).otherwise(F.col(f).isNotNull())
    else:
        vbase = numbered
        gates = {f: F.col(f).isNotNull() for f in values}
    # the value each event pushes into prev-caches (null when gated off)
    vbase = vbase.withColumns(
        {f"__v_{f}": F.when(gates[f], F.col(f)) for f in values}
    )

    # ---- bounded lookback/lookahead WITHOUT an exchange: the frame is
    # already range-partitioned with __n contiguous per partition, so a
    # lag/lead is an in-partition window function for every row deeper
    # than k from the partition edge; only the ≤k edge rows per
    # partition need a value from a neighboring partition, and those
    # source rows (the last/first k of each partition) are a tiny
    # driver-collected broadcast map keyed by global __n. The previous
    # implementation equi-joined on __n, which hash-shuffled the FULL
    # payload twice per distinct offset — the dominant exchange of this
    # verb at scale.
    lag_offsets: set[int] = set()
    lead_offsets: set[int] = set()
    for s in steppers:
        base_name, k = _parse_stepper(s)
        if base_name in ("shift", "shift_lag", "delta", "ratio"):
            lag_offsets.add(k)
        elif base_name == "shift_lead":
            lead_offsets.add(k)
    out = vbase
    w_ord = Window.partitionBy("__pid").orderBy("__n")
    if lag_offsets or lead_offsets:
        out = out.withColumn("__pos", F.row_number().over(w_ord)).withColumn(
            "__psz", F.count(F.lit(1)).over(Window.partitionBy("__pid"))
        )

    def _edge_map(rows: list, col: str, dtype) -> Column:
        pairs = []
        for r in rows:
            pairs.append(F.lit(r["__n"]))
            pairs.append(F.lit(r[col]).cast(dtype))
        return F.create_map(*pairs) if pairs else F.create_map()

    def _edge_join(rows: list, col: str, dtype, k: int, bname: str):
        """Broadcast-join fallback: left-join edge values keyed at the
        TARGET row's __n (edge __n shifted by k) into column bname."""
        from pyspark.sql.types import LongType, StructField, StructType

        nonlocal out
        bdf = df.sparkSession.createDataFrame(
            [(r["__n"] + k, r[col]) for r in rows],
            StructType([StructField("__bn", LongType()), StructField(bname, dtype)]),
        )
        out = out.join(F.broadcast(bdf), out["__n"] == bdf["__bn"], "left").drop("__bn")

    if lag_offsets:
        max_lag = max(lag_offsets)
        # prev-caches see the GATED sequence (clearPrevValue pushes nil)
        edge_tail = (
            vbase.withColumn(
                "__rpos",
                F.row_number().over(
                    Window.partitionBy("__pid").orderBy(F.col("__n").desc())
                ),
            )
            .filter(F.col("__rpos") <= max_lag)
            .select("__n", *[f"__v_{f}" for f in values])
            .collect()
        )
        use_join = len(edge_tail) > _EDGE_LITERAL_MAX
        # one map per FIELD, shared across offsets (not one per use)
        lag_maps = {} if use_join else {
            f: _edge_map(edge_tail, f"__v_{f}", df.schema[f].dataType)
            for f in values
        }
        for k in sorted(lag_offsets):
            for f in values:
                name = f"__lag{k}_{f}"
                if use_join:
                    _edge_join(edge_tail, f"__v_{f}", df.schema[f].dataType,
                               k, name + "_b")
                    boundary = F.col(name + "_b")
                else:
                    boundary = lag_maps[f][F.col("__n") - k]
                out = out.withColumn(
                    name,
                    F.when(
                        F.col("__pos") > k,
                        F.lag(f"__v_{f}", k).over(w_ord),
                    ).otherwise(boundary),
                )
    if lead_offsets:
        max_lead = max(lead_offsets)
        # shift_lead reads the raw next-record value (step.go:1087-1106)
        edge_head = (
            numbered.withColumn(
                "__fpos", F.row_number().over(w_ord)
            )
            .filter(F.col("__fpos") <= max_lead)
            .select("__n", *values)
            .collect()
        )
        use_join = len(edge_head) > _EDGE_LITERAL_MAX
        lead_maps = {} if use_join else {
            f: _edge_map(edge_head, f, df.schema[f].dataType) for f in values
        }
        for k in sorted(lead_offsets):
            for f in values:
                name = f"__lead{k}_{f}"
                if use_join:
                    _edge_join(edge_head, f, df.schema[f].dataType, -k, name + "_b")
                    boundary = F.col(name + "_b")
                else:
                    boundary = lead_maps[f][F.col("__n") + k]
                out = out.withColumn(
                    name,
                    F.when(
                        F.col("__pos") <= F.col("__psz") - k,
                        F.lead(f, k).over(w_ord),
                    ).otherwise(boundary),
                )

    # ---- running aggregates: per-partition prefix + driver-combined
    # carries (one tiny exports row per range partition)
    need_run = [s for s in steppers if s in ("rsum", "rprod", "counter")]
    need_first = "from-first" in steppers
    w_pid = Window.partitionBy("__pid").orderBy("__n")
    run_pid = w_pid.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    exports = None
    carries_needed = bool(need_run) or need_first or bool(ewma_alphas)
    if carries_needed:
        tmp = out
        ew_cols = []
        for f in values:
            vc = F.col(f"__v_{f}")
            # index among gated-present values (the reference recursion
            # only advances on those)
            if ewma_alphas:
                tmp = tmp.withColumn(f"__i_{f}", F.count(vc).over(run_pid))
            for alpha in ewma_alphas:
                label = ("%g" % alpha).replace(".", "_")
                beta = 1.0 - alpha
                scaled = vc * F.pow(F.lit(beta), -F.col(f"__i_{f}"))
                tmp = tmp.withColumn(f"__sc_{f}_{label}", scaled)
                tmp = tmp.withColumn(
                    f"__s1_{f}_{label}", F.sum(f"__sc_{f}_{label}").over(run_pid)
                )
                ew_cols.append((f, alpha, label, beta))
        out = tmp
        agg_list = [F.count(F.lit(1)).alias("__rows")]
        for f in values:
            vc = F.col(f"__v_{f}")
            nn_key = F.when(vc.isNotNull(), F.col("__n"))  # non-null order key
            agg_list += [
                F.sum(vc).alias(f"__sum_{f}"),
                F.count(vc).alias(f"__cnt_{f}"),
                F.product(vc).alias(f"__prod_{f}"),
                F.min_by(vc, nn_key).alias(f"__first_{f}"),
            ]
            for f2, alpha, label, beta in ew_cols:
                if f2 != f:
                    continue
                agg_list += [
                    F.max_by(F.col(f"__s1_{f}_{label}"), nn_key).alias(
                        f"__S_{f}_{label}"
                    ),
                    F.min_by(F.col(f"__sc_{f}_{label}"), nn_key).alias(
                        f"__FS_{f}_{label}"
                    ),
                ]
        exports = {
            r["__pid"]: r for r in out.groupBy("__pid").agg(*agg_list).collect()
        }

    def _chain(per_pid: dict[int, object]):
        expr = None
        for pid, v in per_pid.items():
            if v is None:
                continue
            if expr is None:
                expr = F.when(F.col("__pid") == pid, F.lit(v))
            else:
                expr = expr.when(F.col("__pid") == pid, F.lit(v))
        return expr if expr is not None else F.lit(None)

    result_cols = {}
    for f in values:
        c = F.col(f)
        gate = gates[f]
        present = gate & c.isNotNull()
        for s in steppers:
            base_name, k = _parse_stepper(s)
            if base_name in ("shift", "shift_lag"):
                result_cols[f"{f}_{s.replace('-', '_')}"] = F.when(
                    gate, F.col(f"__lag{k}_{f}")
                )
            elif base_name == "shift_lead":
                result_cols[f"{f}_{s.replace('-', '_')}"] = F.when(
                    gate, F.col(f"__lead{k}_{f}")
                )
            elif base_name == "delta":
                result_cols[f"{f}_{s.replace('-', '_')}"] = F.when(
                    present, F.coalesce(c - F.col(f"__lag{k}_{f}"), F.lit(0))
                )
            elif base_name == "ratio":
                result_cols[f"{f}_{s.replace('-', '_')}"] = F.when(
                    present, F.coalesce(c / F.col(f"__lag{k}_{f}"), F.lit(1.0))
                )
            elif s in ("rsum", "rprod", "counter"):
                key = {"rsum": "__sum_", "rprod": "__prod_", "counter": "__cnt_"}[s]
                acc_off: dict[int, object] = {}
                running = 0 if s in ("rsum", "counter") else 1.0
                for pid in sorted(exports):
                    acc_off[pid] = running
                    v = exports[pid][key + f]
                    if v is not None:
                        running = (
                            running + v if s in ("rsum", "counter") else running * v
                        )
                vc = F.col(f"__v_{f}")
                local = (
                    F.sum(vc).over(run_pid)
                    if s == "rsum"
                    else F.count(vc).over(run_pid)
                    if s == "counter"
                    else F.product(vc).over(run_pid)
                )
                offc = _chain(acc_off)
                if s == "rprod":
                    e = local * F.coalesce(offc, F.lit(1.0))
                else:
                    e = local + F.coalesce(offc, F.lit(0))
                result_cols[f"{f}_{s.replace('-', '_')}"] = F.when(present, e)
            elif s == "from-first":
                first_v = None
                for pid in sorted(exports):
                    if exports[pid][f"__cnt_{f}"] > 0:
                        first_v = exports[pid][f"__first_{f}"]
                        break
                result_cols[f"{f}_{s.replace('-', '_')}"] = F.when(
                    present, c - F.lit(first_v)
                )
            else:
                raise ValueError(f"unknown stepper: {s}")
        for alpha in ewma_alphas:
            label = ("%g" % alpha).replace(".", "_")
            beta = 1.0 - alpha
            # driver composition of per-partition carries: partition 0
            # uses Miller's y1=x1 seeding; later partitions take the
            # previous partition's final y as init c:
            # y_t = beta^t * (alpha*s1 + c), t = per-partition count of
            # gated-present values (the recursion skips the rest)
            carry: dict[int, float] = {}
            c_prev = None
            for pid in sorted(exports):
                r = exports[pid]
                carry[pid] = c_prev
                n_p = r[f"__cnt_{f}"]
                if n_p == 0:
                    continue
                S, FS = r[f"__S_{f}_{label}"], r[f"__FS_{f}_{label}"]
                if S is None:
                    continue
                if c_prev is None:  # first partition with a present value
                    c_prev = (beta ** n_p) * (alpha * S + (1 - alpha) * FS)
                else:
                    c_prev = (beta ** n_p) * (alpha * S) + (beta ** n_p) * c_prev
            carry_expr = _chain(carry)
            s1 = F.col(f"__s1_{f}_{label}")
            fs = F.first(F.col(f"__sc_{f}_{label}"), ignorenulls=True).over(run_pid)
            i_f = F.col(f"__i_{f}")
            seeded = F.pow(F.lit(beta), i_f) * (
                F.lit(alpha) * s1 + F.lit(1 - alpha) * fs
            )
            carried = F.pow(F.lit(beta), i_f) * (
                F.lit(alpha) * s1 + F.coalesce(carry_expr, F.lit(0.0))
            )
            result_cols[f"{f}_ewma_{label}"] = F.when(
                present, F.when(carry_expr.isNull(), seeded).otherwise(carried)
            )

    out = out.withColumns(result_cols)
    # drain drop rule (see step()): with a forward window larger than the
    # stream, the reference's drain loop drops the tail — only reachable
    # at toy scale (n_total < f_max)
    if f_max and n_total is not None and n_total < f_max:
        out = out.filter(F.col("__n") <= 2 * n_total - f_max)
    # __n/__pid/__i and join/scratch columns are internal; __ord (if the
    # caller carries one) stays
    keep_ord = [c for c in df.columns] + list(result_cols)
    return out.select(*[c for c in out.columns if c in keep_ord])


def slwin(
    df: DataFrame,
    value: str,
    m_back: int,
    n_fwd: int,
    order_by: Sequence[str],
    by: Sequence[str] = (),
) -> DataFrame:
    """`mlr step -a slwin_m_n` (step.go:703-711;
    utils/window_keeper.go:12-60): centered sliding-window mean.

    Grouped: hash-partitioned frame window. Ungrouped: mean over the
    [n-m, n+k] index range = difference of running sums — computed from
    the distributed global row number with one offsets join, no
    single-task window."""
    by = _cols(by)
    if not by:
        numbered = global_row_number(df, _cols(order_by), out="__n", keep_pid=True)
        w_pid = Window.partitionBy("__pid").orderBy("__n")
        run = w_pid.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        c = F.col(value).cast("double")
        # prefix sums/counts with cross-partition offsets
        pre = numbered.withColumn("__ps", F.sum(c).over(run)).withColumn(
            "__pc", F.count(c).over(run)
        )
        exports = {
            r["__pid"]: (r["s"], r["n"], r["rows"])
            for r in pre.groupBy("__pid")
            .agg(
                F.sum(c).alias("s"),
                F.count(c).alias("n"),
                F.count(F.lit(1)).alias("rows"),
            )
            .collect()
        }
        off_s, off_n, rs, rn = {}, {}, 0.0, 0
        total_rows = 0
        for pid in sorted(exports):
            off_s[pid], off_n[pid] = rs, rn
            s_, n_, rows_ = exports[pid]
            rs += s_ or 0.0
            rn += n_
            total_rows += rows_
        def chain(d, default):
            e = None
            for pid, v in d.items():
                e = (e.when if e is not None else F.when)(F.col("__pid") == pid, F.lit(v))
            return F.coalesce(e, F.lit(default)) if e is not None else F.lit(default)
        pre = pre.withColumn("__gs", F.coalesce(F.col("__ps"), F.lit(0.0)) + chain(off_s, 0.0)).withColumn(
            "__gn", F.col("__pc") + chain(off_n, 0)
        )
        # prefix table joined at the window edges: hi = n + n_fwd
        # (clamped), lo = n - m_back - 1 (0 -> zero prefix)
        prefix = pre.select(F.col("__n").alias("__pn"), F.col("__gs").alias("__hs"), F.col("__gn").alias("__hn"))
        hi = F.least(F.col("__n") + n_fwd, F.lit(total_rows))
        lo = F.col("__n") - m_back - 1
        res = (
            pre.withColumn("__hi", hi)
            .withColumn("__lo", lo)
            .join(prefix.withColumnsRenamed({"__pn": "__hi"}), on="__hi", how="left")
            .join(
                prefix.withColumnsRenamed(
                    {"__pn": "__lo", "__hs": "__ls", "__hn": "__ln"}
                ),
                on="__lo",
                how="left",
            )
        )
        mean = F.try_divide(
            F.col("__hs") - F.coalesce(F.col("__ls"), F.lit(0.0)),
            F.col("__hn") - F.coalesce(F.col("__ln"), F.lit(0)),
        )
        res = res.withColumn(f"{value}_slwin_{m_back}_{n_fwd}", mean)
        keep = list(df.columns) + [f"{value}_slwin_{m_back}_{n_fwd}"]
        return res.select(*[c2 for c2 in res.columns if c2 in keep])
    w = (
        Window.partitionBy(*_cols(by))
        .orderBy(*[F.col(c) for c in _cols(order_by)])
        .rowsBetween(-m_back, n_fwd)
    )
    return df.withColumn(f"{value}_slwin_{m_back}_{n_fwd}", F.avg(value).over(w))


def rank(df: DataFrame, value: str, by: Sequence[str] = (), descending: bool = False) -> DataFrame:
    """`mlr rank -f v [-g ...]` (pkg/transformers/rank.go:22): competition
    rank 1,2,2,4 (percentile_keeper.go:87-104 EmitRank).

    Grouped: one hash-partitioned rank window. Ungrouped: a bare
    ``Window.orderBy`` would single-task every row; instead rank(v) =
    1 + count of strictly smaller values, computed on the (much smaller)
    DISTINCT-value table with the range-partition + offset-broadcast
    pattern, then joined back on the value."""
    by = _cols(by)
    order = F.col(value).desc() if descending else F.col(value).asc()
    if by:
        w = Window.partitionBy(*by).orderBy(order)
        return df.withColumn("rank", F.rank().over(w))
    vals = (
        df.filter(F.col(value).isNotNull())
        .groupBy(value)
        .agg(F.count("*").alias("__c"))
    )
    ordered = vals.repartitionByRange(order).localCheckpoint(eager=True)
    ordered = ordered.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["s"]
        for r in ordered.groupBy("__pid").agg(F.sum("__c").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        if offsets
        else F.create_map()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        ordered.withColumn(
            "rank",
            F.coalesce(F.sum("__c").over(w_in), F.lit(0))
            + F.coalesce(off[F.col("__pid")], F.lit(0))
            + 1,
        )
        .select(value, "rank")
    )
    return df.join(ranked, on=value, how="left")


# ---------------------------------------------------------------------------
# restructuring (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


def nest_explode_values(df: DataFrame, field: str, sep: str = ";") -> DataFrame:
    """`mlr nest --explode --values --across-records -f field --nested-fs sep`
    (pkg/transformers/nest.go:34): one output record per separated value;
    records WITHOUT the field pass through unchanged (golden
    verb-nest/evar-0001) — hence explode_outer, not explode.
    This is the tokenizer primitive for heavy-hitter token queries."""
    return df.withColumn(field, F.explode_outer(F.split(F.col(field), sep)))


def nest_implode_values(df: DataFrame, field: str, by: Sequence[str], sep: str = ";") -> DataFrame:
    """`mlr nest --implode ...` (nest.go:34): concat values back per group."""
    others = [c for c in df.columns if c != field and c not in _cols(by)]
    return df.groupBy(*_cols(by), *others).agg(
        F.concat_ws(sep, F.collect_list(field)).alias(field)
    )


def reshape_long_to_wide(df: DataFrame, key_field: str, value_field: str, by: Sequence[str]) -> DataFrame:
    """`mlr reshape --l2w` (pkg/transformers/reshape.go:50)."""
    return df.groupBy(*_cols(by)).pivot(key_field).agg(F.first(value_field))


def reshape_wide_to_long(
    df: DataFrame, fields: Sequence[str], key_name: str, value_name: str
) -> DataFrame:
    """`mlr reshape --w2l` (reshape.go:50) via stack()."""
    fields = _cols(fields)
    ids = [c for c in df.columns if c not in fields]
    pairs = ", ".join(f"'{f}', cast(`{f}` as double)" for f in fields)
    return df.select(
        *ids, F.expr(f"stack({len(fields)}, {pairs}) as ({key_name}, {value_name})")
    )


def seqgen(spark, start: int, stop: int, step_n: int = 1, field: str = "i") -> DataFrame:
    """`mlr seqgen --start --stop --step [-f name]`
    (pkg/transformers/seqgen.go:23). Miller's stop is inclusive."""
    return spark.range(start, stop + (1 if step_n > 0 else -1), step_n).select(
        F.col("id").alias(field)
    )


def split_write(df: DataFrame, path: str, by: Sequence[str] = (), n: int | None = None) -> None:
    """`mlr split -g ... | -n N` (pkg/transformers/split.go:33) as a
    partitioned parquet write."""
    if by:
        df.write.mode("overwrite").partitionBy(*_cols(by)).parquet(path)
    else:
        df.repartition(n or df.sparkSession.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(path)


def template(df: DataFrame, fields: Sequence[str], fill: str | None = None) -> DataFrame:
    """`mlr template -f ...` (pkg/transformers/template.go:22): force
    column order/presence; missing columns filled with NULL (or fill)."""
    cols = []
    for f in _cols(fields):
        if f in df.columns:
            if fill is None:
                cols.append(F.col(f))
            else:
                # --fill-with also fills per-record ABSENT cells (nulls
                # under the fixed schema) — golden verb-template/0003
                cols.append(F.coalesce(F.col(f).cast("string"), F.lit(fill)).alias(f))
        else:
            cols.append(F.lit(fill).alias(f))
    # stream ordinal survives (template is a pure per-record projection)
    if "__ord" in df.columns:
        cols.append(F.col("__ord"))
    return df.select(*cols)


# ---------------------------------------------------------------------------
# column profiling (SURVEY.md §2.5: summary / describe)
# ---------------------------------------------------------------------------

_NUMERIC_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")


def summary(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """`mlr summary` (pkg/transformers/summary.go:77; stat list
    summary.go:71): per-COLUMN profile. One output row per field with
    field_type, count, null_count, distinct_count, sum/mean/min/max/
    var/stddev/median for numeric fields, minlen/maxlen for all.

    Plan shape: one grouped aggregation per column, unioned — each is a
    single-shuffle partial/final hash agg over one column (column
    pruning means each branch scans only its own column). Miller builds
    the same profile in one streaming pass over a single process;
    at cluster scale the per-column branches run as independent stages.
    """
    cols = _cols(columns) if columns else df.columns
    dtypes = dict(df.dtypes)
    parts = []
    for name in cols:
        t = dtypes[name]
        is_num = any(t.startswith(nt) for nt in _NUMERIC_TYPES)
        c = F.col(name)
        s = c.cast("string")
        d = c.cast("double") if is_num else F.lit(None).cast("double")
        null_like = c.isNull() | (s == "")
        aggs = [
            F.count(F.lit(1)).alias("count"),
            F.sum(null_like.cast("long")).alias("null_count"),
            F.countDistinct(c).alias("distinct_count"),
            F.sum(d).alias("sum"),
            F.avg(d).alias("mean"),
            F.min(d).alias("min"),
            F.max(d).alias("max"),
            F.var_samp(d).alias("var"),
            F.stddev_samp(d).alias("stddev"),
            (
                F.get(
                    F.array_sort(F.collect_list(d)),
                    F.least(
                        F.greatest(
                            F.floor(F.lit(0.5) * F.count(d)).cast("int"), F.lit(0)
                        ),
                        F.count(d).cast("int") - 1,
                    ),
                )
                if is_num
                else F.lit(None).cast("double")
            ).alias("median"),
            F.min(F.length(s)).alias("minlen"),
            F.max(F.length(s)).alias("maxlen"),
        ]
        parts.append(
            df.select(c, s.alias("__s"), d.alias("__d"))
            .agg(*aggs)
            .select(
                F.lit(name).alias("field_name"), F.lit(t).alias("field_type"), "*"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# time verbs (SURVEY.md §2.2: sec2gmt / sec2gmtdate / gmt2sec)
# ---------------------------------------------------------------------------


def sec2gmtdate(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr sec2gmtdate` (pkg/transformers/sec2gmtdate.go:17): epoch
    seconds → 'YYYY-MM-DD'; non-numeric values pass through unchanged
    (and never trip ANSI timestamp parsing on string columns)."""

    def conv(f: str) -> Column:
        num = F.col(f).try_cast("double")
        return F.when(
            num.isNotNull(),
            F.date_format(F.timestamp_seconds(F.floor(num)), "yyyy-MM-dd"),
        ).otherwise(F.col(f).cast("string"))

    return df.withColumns({f: conv(f) for f in _cols(fields)})


def gmt2sec(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """DSL `gmt2sec` (pkg/bifs/datetime.go): ISO-8601 → epoch seconds."""
    return df.withColumns(
        {f: F.unix_timestamp(F.col(f), "yyyy-MM-dd'T'HH:mm:ss'Z'") for f in _cols(fields)}
    )


# ---------------------------------------------------------------------------
# key/value & nesting restructure (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


def unspace(df: DataFrame, fill: str = "_", values_too: bool = True) -> DataFrame:
    """`mlr unspace -f X` (pkg/transformers/unspace.go:21): replace
    spaces in keys (column names) and optionally values."""
    renames = {c: c.replace(" ", fill) for c in df.columns if " " in c}
    out = df.withColumnsRenamed(renames) if renames else df
    if values_too:
        out = out.withColumns(
            {
                c: F.regexp_replace(F.col(c), " ", fill)
                for c, t in out.dtypes
                if t == "string"
            }
        )
    return out


def altkv(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr altkv` (pkg/transformers/altkv.go:18): alternating values
    become key/value pairs — (v1,v2,v3,v4) → {v1:v2, v3:v4}. Emitted
    exploded as (key, value) string rows (fixed-schema analogue of
    Miller's dynamic record)."""
    fields = _cols(fields)
    ks = F.array(*[F.col(f).cast("string") for f in fields[0::2]])
    vs = F.array(*[F.col(f).cast("string") for f in fields[1::2]])
    return df.select(F.explode(F.map_from_arrays(ks, vs)).alias("key", "value"))


def flatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """`mlr flatten` (pkg/transformers/flatten.go:20; core
    pkg/mlrval/mlrmap_flatten_unflatten.go): nested struct columns →
    dotted top-level columns, recursively."""
    out_cols: list[Column] = []

    def walk(prefix: str, schema, path: str):
        for field in schema.fields:
            full = f"{path}.`{field.name}`" if path else f"`{field.name}`"
            name = f"{prefix}{sep}{field.name}" if prefix else field.name
            if field.dataType.typeName() == "struct":
                walk(name, field.dataType, full)
            else:
                out_cols.append(F.col(full).alias(name))

    walk("", df.schema, "")
    return df.select(*out_cols)


def unflatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """`mlr unflatten` (pkg/transformers/unflatten.go:20): dotted column
    names reassembled into struct columns (single level of nesting per
    dotted prefix, applied recursively)."""
    groups: dict[str, list[str]] = {}
    plain: list[str] = []
    for c in df.columns:
        if sep in c:
            groups.setdefault(c.split(sep, 1)[0], []).append(c)
        else:
            plain.append(c)
    sel: list[Column] = [F.col(f"`{c}`") for c in plain]
    for prefix, cols in groups.items():
        sel.append(
            F.struct(
                *[F.col(f"`{c}`").alias(c.split(sep, 1)[1]) for c in cols]
            ).alias(prefix)
        )
    return df.select(*sel)


def json_stringify(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr json-stringify -f ...` (pkg/transformers/json_stringify.go:35)."""
    return df.withColumns({f: F.to_json(F.col(f)) for f in _cols(fields)})


def json_parse(df: DataFrame, field: str, schema: str) -> DataFrame:
    """`mlr json-parse -f ...` (pkg/transformers/json_parse.go:29)."""
    return df.withColumn(field, F.from_json(F.col(field), schema))


def label(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """`mlr label a,b,c` (pkg/transformers/label.go:17): rename the
    first n columns positionally; a LATER original column whose name
    collides with a new label is dropped (golden verb-label/0004)."""
    names = _cols(names)
    tail_cols = [c for c in df.columns[len(names):] if c not in names]
    return df.select(*df.columns[: len(names)], *tail_cols).toDF(*names, *tail_cols)


def group_by_stream(df: DataFrame, by: Sequence[str]) -> DataFrame:
    """`mlr group-by` (pkg/transformers/group_by.go:17): reorder the
    stream so same-group records are contiguous, WITHOUT aggregating.
    Spark: hash-repartition on the keys + in-partition sort — the records
    of one group land contiguous in one partition, no driver collect."""
    by = _cols(by)
    return df.repartition(*by).sortWithinPartitions(*by)


def remove_empty_columns(df: DataFrame) -> DataFrame:
    """`mlr remove-empty-columns` (remove_empty_columns.go:17): drop
    columns that are empty/null in EVERY record. Two-pass: one tiny agg
    row (max length per column) drives the projection."""
    probe = df.agg(
        *[
            F.max(F.length(F.col(c).cast("string"))).alias(c)
            for c in df.columns
        ]
    ).first()
    keep = [c for c in df.columns if probe[c] is not None and probe[c] > 0]
    return df.select(*keep)


# ---------------------------------------------------------------------------
# randomized verbs (SURVEY.md §2.7) — seeded, distributed
# ---------------------------------------------------------------------------


def shuffle_verb(df: DataFrame, seed: int = 42) -> DataFrame:
    """`mlr shuffle` (pkg/transformers/shuffle.go:17): random
    permutation — a seeded distributed sort on rand()."""
    return df.orderBy(F.rand(seed))


def bootstrap(df: DataFrame, seed: int = 42) -> DataFrame:
    """`mlr bootstrap` (pkg/transformers/bootstrap.go:19): sample WITH
    replacement, same expected size as the input — df.sample with
    replacement (Poisson per-row multiplicity; the distributed analogue
    of Miller's in-memory index draw)."""
    return df.sample(withReplacement=True, fraction=1.0, seed=seed)


def md5_60(col: Column) -> Column:
    """Deterministic 60-bit uniform hash: the first 15 hex chars of
    md5, parsed base-16. Engine-portable — DuckDB computes the identical
    value as ``('0x'||substr(md5(x),1,15))::BIGINT``, which is what
    makes hash-seeded randomness (bootstrap multiplicities, seeded
    samples) exactly oracle-checkable. Pure codegen (md5+conv), no
    Python."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _poisson1_thresholds(max_k: int = 10) -> list[int]:
    """Integer CDF thresholds for Poisson(1) scaled to 2^60: a uniform
    60-bit hash h maps to multiplicity k = #{t in thresholds : h >= t}.
    Integer comparisons only — bit-identical across engines."""
    import math

    out, cdf = [], 0.0
    for k in range(max_k + 1):
        cdf += math.exp(-1.0) / math.factorial(k)
        out.append(min(int(cdf * (1 << 60)), 1 << 60))
    return out


POISSON1_T60 = _poisson1_thresholds()


def poisson1_mult(hash_col: Column) -> Column:
    """Poisson(1) multiplicity from a uniform 60-bit hash via the
    integer inverse-CDF thresholds (POISSON1_T60)."""
    c = F.lit(0)
    for t in POISSON1_T60:
        c = c + (hash_col >= F.lit(t)).cast("int")
    return c


def bootstrap_hash(df: DataFrame, key: Sequence[str], seed: int = 42) -> DataFrame:
    """Deterministic Poisson bootstrap: each row is repeated
    Poisson(1)-many times, with the multiplicity drawn by inverse-CDF
    from a 60-bit md5 hash of (seed, key). Same sampling design as
    df.sample(replacement, 1.0) but partitioning-independent and
    engine-portable, so a DuckDB oracle reproduces the exact multiset.
    Pure codegen: hash -> integer threshold cascade -> array_repeat
    explode; no shuffle, no Python. This is also the preferred 100 TB
    shape (no RNG state, embarrassingly parallel, reproducible under
    any re-partitioning / task retry)."""
    key = _cols(key)
    h = md5_60(F.concat_ws(":", F.lit(str(seed)), *[F.col(k).cast("string") for k in key]))
    c = poisson1_mult(h)
    return (
        df.withColumn("__bc", c)
        .filter(F.col("__bc") > 0)
        .withColumn("__rep", F.explode(F.array_repeat(F.lit(1), F.col("__bc"))))
        .drop("__bc", "__rep")
    )


def bootstrap_ci_hash(
    df: DataFrame,
    value: str,
    key: Sequence[str],
    by: Sequence[str] = (),
    n_boot: int = 100,
    lo: float = 0.025,
    hi: float = 0.975,
    seed: int = 42,
) -> DataFrame:
    """Bootstrap CI for the per-group mean via the deterministic Poisson
    bootstrap (see bootstrap_hash): boot b's multiplicity for a row is
    poisson1(md5_60(seed:b:key)). Boot means accumulate in integer
    cents (sum(c*round(100*v)) / (100*sum(c))) so the sums are EXACT in
    any engine and the lo/hi quantiles over the n_boot means interpolate
    over identical doubles — the whole statistic is oracle-exact.

    Scale shape: one explode (x n_boot), one partial-aggregated groupBy
    on (by, b), one tiny groupBy on (by) — no per-group materialization
    (unlike the applyInPandas variant), no RNG state, skew-free keys.
    Output: (by..., {value}_mean, {value}_ci_lo, {value}_ci_hi)."""
    by, key = _cols(by), _cols(key)
    cents = F.round(F.col(value) * 100).cast("long")
    base = df.select(
        *by, cents.alias("__cents"),
        F.concat_ws(":", *[F.col(k).cast("string") for k in key]).alias("__k"),
    )
    boots = base.withColumn("__b", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))))
    h = md5_60(F.concat_ws(":", F.lit(str(seed)), F.col("__b").cast("string"), F.col("__k")))
    c = poisson1_mult(h).cast("long")
    bm = (
        boots.withColumn("__c", c)
        .groupBy(*by, "__b")
        .agg(
            (F.sum(F.col("__c") * F.col("__cents"))
             / (F.lit(100.0) * F.sum("__c"))).alias("__bm")
        )
    )
    ci = bm.groupBy(*by).agg(
        F.percentile("__bm", F.lit(lo)).alias("__lo"),
        F.percentile("__bm", F.lit(hi)).alias("__hi"),
    )
    mean = base.groupBy(*by).agg(
        (F.sum("__cents") / (F.lit(100.0) * F.count("__cents"))).alias("__mean")
    )
    joined = mean.join(ci, by) if by else mean.crossJoin(ci)
    return joined.select(
        *by,
        F.col("__mean").alias(f"{value}_mean"),
        F.col("__lo").alias(f"{value}_ci_lo"),
        F.col("__hi").alias(f"{value}_ci_hi"),
    )


def bootstrap_ci(
    df: DataFrame,
    value: str,
    by: Sequence[str] = (),
    n_boot: int = 200,
    lo: float = 0.025,
    hi: float = 0.975,
    seed: int = 42,
) -> DataFrame:
    """`mlr bootstrap-ci` (pkg/transformers/bootstrap_ci.go:29):
    bootstrap confidence interval for the per-group mean. Vectorized
    resampling per group via applyInPandas (numpy draws an
    (n_boot x n) index matrix in one shot — no Python loop per row)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    by = _cols(by)
    by_fields = [df.schema[c] for c in by]
    schema = StructType(
        by_fields
        + [
            StructField(f"{value}_mean", DoubleType()),
            StructField(f"{value}_ci_lo", DoubleType()),
            StructField(f"{value}_ci_hi", DoubleType()),
        ]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]
        # group-content-derived seed: deterministic under any partitioning
        gseed = (seed + len(x) + int(abs(float(x.sum())) * 1000) % 100003) % (2**31)
        rng = np.random.default_rng(gseed)
        idx = rng.integers(0, len(x), size=(n_boot, len(x)))
        means = x[idx].mean(axis=1)
        row = {c: pdf[c].iloc[0] for c in by}
        row[f"{value}_mean"] = float(x.mean())
        row[f"{value}_ci_lo"] = float(np.quantile(means, lo))
        row[f"{value}_ci_hi"] = float(np.quantile(means, hi))
        return pd.DataFrame([row])

    grouped = df.groupBy(*by) if by else df.groupBy()
    return grouped.applyInPandas(per_group, schema=schema)


# ---------------------------------------------------------------------------
# survival analysis (SURVEY.md §2.5: surv)
# ---------------------------------------------------------------------------


def surv(df: DataFrame, time_col: str, status_col: str, by: Sequence[str] = ()) -> DataFrame:
    """`mlr surv -d t -s status` (pkg/transformers/surv.go:23):
    Kaplan-Meier product-limit survival estimate. At each distinct event
    time t_i: n_i = subjects still at risk, d_i = events at t_i,
    S(t_i) = prod_{j<=i} (1 - d_j/n_j).

    Expressed shuffle-lean: one grouped count per (time), a window
    cumsum for n_at_risk, and the running product as exp(sum(log)) —
    all Catalyst windows, no iteration.
    """
    by = _cols(by)
    total_w = Window.partitionBy(*by) if by else Window.partitionBy()
    ordw = (
        (Window.partitionBy(*by) if by else Window.partitionBy())
        .orderBy(F.col(time_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = (
        (Window.partitionBy(*by) if by else Window.partitionBy())
        .orderBy(F.col(time_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_t = (
        df.groupBy(*by, time_col)
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.col(status_col).cast("long")).alias("d"),
        )
    )
    per_t = per_t.withColumn("n_total_all", F.sum("n_total").over(total_w))
    per_t = per_t.withColumn(
        "n_risk", F.col("n_total_all") - F.coalesce(F.sum("n_total").over(prev), F.lit(0))
    )
    # running product via exp-sum-log; a factor of exactly 0 (all
    # at-risk subjects die: d == n_risk) would be log(0) -> null in
    # Spark, so it is tracked separately and forces survival 0 from
    # that time onward
    hit_zero = F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(ordw)
    surv_col = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.log(
                    F.when(
                        F.col("d") < F.col("n_risk"),
                        1.0 - F.col("d") / F.col("n_risk"),
                    ).otherwise(F.lit(1.0))
                )
            ).over(ordw)
        )
    )
    return (
        per_t.withColumn("survival", surv_col)
        .select(*by, F.col(time_col), "n_risk", F.col("d").alias("n_events"), "survival")
        .orderBy(*by, time_col)
    )


# ---------------------------------------------------------------------------
# sliding-window stats1 (`stats1 -w n`, stats1.go:31,483-553)
# ---------------------------------------------------------------------------

_WIN_ACCS = {
    "count": F.count,
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "var": F.var_samp,
    "stddev": F.stddev_samp,
}


def stats1_windowed(
    df: DataFrame,
    accs: Sequence[str],
    values: Sequence[str],
    w: int,
    order_by: Sequence[str],
    by: Sequence[str] = (),
) -> DataFrame:
    """`mlr stats1 -w n` (stats1.go:31,483-553): trailing window of n
    records per group, one output per input record. All accumulators
    share one Window frame — Catalyst plans a single WindowExec.

    Ungrouped: rows are hashed into blocks of B >= w consecutive global
    indices, each row duplicated into its own block and the next one as
    read-only context ("ghost"); the trailing frame then runs entirely
    within a block. Bounded ~2x duplication, no single-task window."""
    by = _cols(by)
    if by:
        frame = (
            Window.partitionBy(*by)
            .orderBy(*[F.col(c) for c in _cols(order_by)])
            .rowsBetween(-(w - 1), 0)
        )
        out = df
        for f in _cols(values):
            for a in _cols(accs):
                if a not in _WIN_ACCS:
                    raise ValueError(f"stats1 -w accumulator not supported: {a}")
                out = out.withColumn(f"{f}_{a}_{w}", _WIN_ACCS[a](F.col(f)).over(frame))
        return out
    numbered = global_row_number(df, _cols(order_by), out="__n")
    B = max(w, 1024)
    blk = ((F.col("__n") - 1) / B).cast("long")
    real = numbered.withColumn("__blk", blk).withColumn("__real", F.lit(1))
    ghost = numbered.withColumn("__blk", blk + 1).withColumn("__real", F.lit(0))
    both = real.unionByName(ghost)
    frame = (
        Window.partitionBy("__blk").orderBy("__n").rowsBetween(-(w - 1), 0)
    )
    out = both
    names = []
    for f in _cols(values):
        for a in _cols(accs):
            if a not in _WIN_ACCS:
                raise ValueError(f"stats1 -w accumulator not supported: {a}")
            names.append(f"{f}_{a}_{w}")
            out = out.withColumn(f"{f}_{a}_{w}", _WIN_ACCS[a](F.col(f)).over(frame))
    return out.filter(F.col("__real") == 1).select(*df.columns, *names)


def stats1_iterative(
    df: DataFrame,
    accs: Sequence[str],
    values: Sequence[str],
    order_by: Sequence[str],
    by: Sequence[str] = (),
) -> DataFrame:
    """`mlr stats1 -s` (stats1.go:30,192-193,457-471): iterative
    (expanding/cumulative) stats appended to each record, one output
    per input record.

    Grouped: a single WindowExec partitioned by the group keys — each
    group's expanding frame runs where its rows live, distributed
    across groups. Ungrouped: a bare expanding window is a single-task
    stage; instead every supported accumulator decomposes associatively
    (count / sum / sum-of-squares / min / max), so compute a prefix
    within each range partition and add a broadcast exclusive-prefix
    carry per partition — the same shape as ``_step_ungrouped``'s rsum.
    One range exchange, no SinglePartition anywhere.

    Output columns are named ``{field}_{acc}`` (stats1 -s emits the
    record plus the running stats under the batch naming). Supported
    accs: count, sum, mean, min, max, var, stddev; the full accumulator
    list (mode/antimode/percentiles cumulative) is replayed at test
    scale by the golden runner's array path and is memory-class A by
    nature — out of the scale contract by design.
    """
    accs = _cols(accs)
    values = _cols(values)
    for a in accs:
        if a not in _WIN_ACCS:
            raise ValueError(f"stats1 -s accumulator not supported: {a}")
    if by:
        frame = (
            Window.partitionBy(*_cols(by))
            .orderBy(*[F.col(c) for c in _cols(order_by)])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumns(
            {
                f"{f}_{a}": _WIN_ACCS[a](F.col(f)).over(frame)
                for f in values
                for a in accs
            }
        )

    # ---- ungrouped: per-range-partition prefix + broadcast carry
    numbered = global_row_number(df, _cols(order_by), out="__n", keep_pid=True)
    run = (
        Window.partitionBy("__pid")
        .orderBy("__n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    need_var = any(a in ("var", "stddev") for a in accs)
    need_sum = need_var or any(a in ("sum", "mean") for a in accs)
    need_cnt = need_var or any(a in ("count", "mean") for a in accs)
    need_min = "min" in accs
    need_max = "max" in accs
    # Miller-typed results: min/max/sum of an integer column stay integer
    # (reference pkg/lib/arithmetic.go:69-100) — mirror the grouped path,
    # which aggregates the uncast column. Only the moment terms (s2, and
    # anything feeding mean/var) are forced to double.
    dtypes = dict(df.dtypes)
    _INT_T = {"tinyint", "smallint", "int", "bigint"}

    def _is_int(f: str) -> bool:
        return dtypes.get(f) in _INT_T

    prefix_cols: dict[str, Column] = {}
    for f in values:
        raw = F.col(f)
        v = raw.cast("double")
        if need_cnt:
            prefix_cols[f"__c_{f}"] = F.count(raw).over(run)
        if need_sum:
            prefix_cols[f"__s_{f}"] = F.sum(raw if _is_int(f) else v).over(run)
        if need_var:
            prefix_cols[f"__s2_{f}"] = F.sum(v * v).over(run)
        if need_min:
            prefix_cols[f"__mn_{f}"] = F.min(raw).over(run)
        if need_max:
            prefix_cols[f"__mx_{f}"] = F.max(raw).over(run)
    pre = numbered.withColumns(prefix_cols)

    # per-partition totals: a tiny exports row per range partition,
    # combined on the driver into EXCLUSIVE prefix carries
    agg_list = []
    for f in values:
        raw = F.col(f)
        v = raw.cast("double")
        agg_list += [
            F.count(raw).alias(f"c_{f}"),
            F.sum(raw if _is_int(f) else v).alias(f"s_{f}"),
            F.sum(v * v).alias(f"s2_{f}"),
            F.min(raw).alias(f"mn_{f}"),
            F.max(raw).alias(f"mx_{f}"),
        ]
    exports = {r["__pid"]: r for r in pre.groupBy("__pid").agg(*agg_list).collect()}
    carries: dict[str, dict[int, object]] = {}
    for f in values:
        c = 0
        s = 0 if _is_int(f) else 0.0
        s2 = 0.0
        mn = mx = None
        cc: dict[int, tuple] = {}
        for pid in sorted(exports):
            cc[pid] = (c, s, s2, mn, mx)
            r = exports[pid]
            c += r[f"c_{f}"] or 0
            if r[f"s_{f}"] is not None:
                s += r[f"s_{f}"]
                s2 += r[f"s2_{f}"]
            if r[f"mn_{f}"] is not None:
                mn = r[f"mn_{f}"] if mn is None else min(mn, r[f"mn_{f}"])
            if r[f"mx_{f}"] is not None:
                mx = r[f"mx_{f}"] if mx is None else max(mx, r[f"mx_{f}"])
        carries[f] = cc

    def _carry(f: str, idx: int, cast: str = "double") -> Column:
        pairs = [
            x
            for pid, tup in carries[f].items()
            for x in (F.lit(pid), F.lit(tup[idx]).cast(cast))
        ]
        return F.create_map(*pairs)[F.col("__pid")] if pairs else F.lit(None)

    out_cols: dict[str, Column] = {}
    for f in values:
        sum_t = "bigint" if _is_int(f) else "double"
        mm_t = dtypes.get(f, "double")
        cnt = (F.col(f"__c_{f}") + _carry(f, 0, "long")) if need_cnt else None
        ssum = (
            F.col(f"__s_{f}") + F.coalesce(_carry(f, 1, sum_t), F.lit(0).cast(sum_t))
        ) if need_sum else None
        ssum2 = (
            F.col(f"__s2_{f}") + F.coalesce(_carry(f, 2), F.lit(0.0))
        ) if need_var else None
        for a in accs:
            name = f"{f}_{a}"
            if a == "count":
                out_cols[name] = cnt
            elif a == "sum":
                out_cols[name] = F.when(cnt > 0, ssum)
            elif a == "mean":
                out_cols[name] = F.when(cnt > 0, ssum.cast("double") / cnt)
            elif a == "min":
                out_cols[name] = F.least(F.col(f"__mn_{f}"), _carry(f, 3, mm_t))
            elif a == "max":
                out_cols[name] = F.greatest(F.col(f"__mx_{f}"), _carry(f, 4, mm_t))
            elif a in ("var", "stddev"):
                sd = ssum.cast("double")
                var = (ssum2 - sd * sd / cnt) / (cnt - 1)
                out_cols[name] = F.when(
                    cnt > 1, F.sqrt(var) if a == "stddev" else var
                )
    return pre.withColumns(out_cols).select(
        *df.columns, *[f"{f}_{a}" for f in values for a in accs]
    )


def count_distinct_n(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr count-distinct -n` (uniq.go:18-25): just the number of
    distinct field-value combinations."""
    return df.select(*_cols(fields)).distinct().agg(F.count("*").alias("count"))


# ---------------------------------------------------------------------------
# small remaining verbs (SURVEY.md §2.1/2.2 completeness)
# ---------------------------------------------------------------------------


def tee(df: DataFrame, path: str, fmt: str = "parquet") -> DataFrame:
    """`mlr tee file` (pkg/transformers/tee.go:20): copy the stream to a
    sink and pass it through. Spark: persist once so the side write and
    the downstream plan share the scan, write, return the df."""
    df = df.persist()
    df.write.mode("overwrite").format(fmt).save(path)
    return df


def nothing(df: DataFrame) -> DataFrame:
    """`mlr nothing` (pkg/transformers/nothing.go:16): consume the
    stream, emit no records (side-effects only)."""
    return df.limit(0)


def ssub_field(df: DataFrame, field: str, literal: str, replacement: str) -> DataFrame:
    """`mlr ssub` (pkg/transformers/subs.go:26): LITERAL (non-regex)
    first-occurrence replacement. F.replace is literal but global;
    Miller ssub replaces only the first occurrence — split once on the
    literal and rejoin."""
    c = F.col(field)
    pos = F.instr(c, literal)
    return df.withColumn(
        field,
        F.when(
            pos > 0,
            F.concat(
                F.substring(c, 1, pos - 1),
                F.lit(replacement),
                F.substring(c, pos + len(literal), F.length(c)),
            ),
        ).otherwise(c),
    )


def latin1_to_utf8(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr latin1-to-utf8` (latin1_to_utf8.go:18). The reference works
    on raw bytes (latin-1 byte 0xE9 re-encodes as the UTF-8 pair for
    é); in this engine strings are already decoded code points, so the
    VALUE is unchanged — every latin-1 code point is a valid character.
    The byte-level change happens in the writer's encoding, not here."""
    return df


def utf8_to_latin1(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr utf8-to-latin1` (utf8_to_latin1.go:18): the VALUE is
    unchanged when it fits in latin-1 (only the byte encoding changes at
    write time); values with code points above U+00FF cannot be encoded
    and become Miller's (error) value."""
    return df.withColumns(
        {
            f: F.when(
                F.col(f).rlike("[^\\x00-\\xff]"), F.lit("(error)")
            ).otherwise(F.col(f))
            for f in _cols(fields)
        }
    )


def histogram_auto(df: DataFrame, value: str, nbins: int) -> DataFrame:
    """`mlr histogram --auto` (histogram.go:19-25): lo/hi from the data.
    Miller holds all values; here a first tiny min/max aggregate sizes
    the bins, then the binned count runs as usual (two scans, bounded
    memory — the 100 TB-safe variant of Miller's retain-all)."""
    row = df.agg(
        F.min(F.col(value).cast("double")).alias("lo"),
        F.max(F.col(value).cast("double")).alias("hi"),
    ).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return histogram(df, value, 0.0, 1.0, nbins)
    if hi == lo:
        hi = lo + 1.0
    return histogram(df, value, lo, hi, nbins, include_hi=True)


def logireg(df: DataFrame, x: str, y: str, by: Sequence[str] = (),
            tol: float = 1e-9, maxits: int = 100,
            reference_stopping: bool = True) -> DataFrame:
    """`mlr stats2 -a logireg -f x,y` (pkg/transformers/utils/
    stats2_accumulators.go:63-66; solver pkg/lib/mlrmath.go:324-420):
    per-group 1-D logistic regression y ~ sigmoid(m*x + b), fit by
    Newton-Raphson on the log-likelihood with Miller's exact seeds
    (m0=-0.001, b0=0.002) and stopping rule.

    Iterative => no closed moments, so this runs as a vectorized
    numpy Newton loop per group via applyInPandas (the per-iteration
    reductions are O(n) numpy sums; ~10 iterations typical). Groups fit
    independently in parallel; at 100 TB scale fit per group, not one
    global fit over 10^12 rows (subsample first if you need that).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    by = _cols(by)
    by_fields = [df.schema[c] for c in by]
    schema = StructType(
        by_fields
        + [
            StructField(f"{x}_{y}_m", DoubleType()),
            StructField(f"{x}_{y}_b", DoubleType()),
            StructField(f"{x}_{y}_n", LongType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf[x].to_numpy(dtype=np.float64)
        ys = pdf[y].to_numpy(dtype=np.float64)
        ok = ~(np.isnan(xs) | np.isnan(ys))
        xs, ys = xs[ok], ys[ok]
        m0, b0 = -0.001, 0.002
        m, b = m0, b0
        with np.errstate(over="ignore"):
            ell0 = None
            for _ in range(maxits):
                p = 1.0 / (1.0 + np.exp(-m0 * xs - b0))
                q = 1.0 - p
                dldm = float(np.sum(xs * (ys - p)))
                dldb = float(np.sum(ys - p))
                pq = p * q
                ha = -float(np.sum(xs * xs * pq))
                hb = -float(np.sum(xs * pq))
                hd = -float(np.sum(pq))
                ell0 = float(np.sum(np.log(np.maximum(q, 1e-300)) + ys * (m0 * xs + b0)))
                D = ha * hd - hb * hb
                m = m0 - (hd * dldm - hb * dldb) / D
                b = b0 - (-hb * dldm + ha * dldb) / D
                qn = 1.0 / (1.0 + np.exp(m * xs + b))
                ell = float(np.sum(np.log(np.maximum(qn, 1e-300)) + ys * (m0 * xs + b0)))
                dell = max(ell, ell0)
                # Reference parity (mlrmath.go:404-407): |Δℓ| is divided
                # by the SIGNED max log-likelihood; with the always-
                # negative ℓ the ratio is negative, so the loop stops
                # after one Newton step. Reproduced bit-for-bit when
                # reference_stopping=True; pass False for a properly
                # converged Newton fit.
                err = (abs(ell - ell0) / dell) if dell != 0.0 else 0.0
                if not reference_stopping:
                    err = abs(err)
                m0, b0 = m, b
                if err < tol:
                    break
        row = {c: pdf[c].iloc[0] for c in by}
        row[f"{x}_{y}_m"] = m
        row[f"{x}_{y}_b"] = b
        row[f"{x}_{y}_n"] = int(len(xs))
        return pd.DataFrame([row])

    grouped = df.groupBy(*by) if by else df.groupBy()
    return grouped.applyInPandas(fit, schema=schema)
