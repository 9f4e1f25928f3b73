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


# accumulator registry mirroring stats1 (pkg/transformers/utils/
# stats1_accumulators.go:29-124). Each returns a Column for value field f.
def _acc(name: str, f: str, interpolated: bool = False) -> Column:
    if name == "count":
        return F.count(F.col(f))
    if name == "null_count":
        return F.sum(F.when(F.col(f).isNull() | (F.col(f).cast("string") == ""), 1).otherwise(0))
    if name == "distinct_count":
        return F.countDistinct(F.col(f))
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
    if name == "skewness":
        return F.skewness(F.col(f))
    if name == "kurtosis":
        return F.kurtosis(F.col(f))
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
    """
    accs, values, by = _cols(accs), _cols(values), _cols(by)
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
    order = [F.col("__cnt").asc() if anti else F.col("__cnt").desc(), F.col("__first_seen").asc()]
    w = Window.partitionBy(*by).orderBy(*order) if by else Window.orderBy(*order)
    name = f"{value}_antimode" if anti else f"{value}_mode"
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*by, F.col(value).alias(name))
    )


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


def top(
    df: DataFrame,
    value: str,
    n: int = 1,
    by: Sequence[str] = (),
    use_min: bool = False,
    show_full_records: bool = False,
    tiebreak: Sequence[str] = (),
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
    w = Window.partitionBy(*by).orderBy(*order) if by else Window.orderBy(*order)
    ranked = df.withColumn("top_idx", F.row_number().over(w)).filter(F.col("top_idx") <= n)
    if show_full_records:
        return ranked
    return ranked.select(*by, "top_idx", F.col(value).alias(f"{value}_top"))


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
) -> DataFrame:
    """`mlr fraction -f v [-g g] [-c]` (pkg/transformers/fraction.go:25).

    value / sum(value) per group; -c makes it cumulative in stream
    order (here: explicit ``order_by``). Window over the full group —
    one shuffle, no driver collect (Miller does two passes holding all
    records; fraction.go:19-22).
    """
    by = _cols(by)
    w_all = Window.partitionBy(*by) if by else Window.partitionBy()
    denom = F.sum(value).over(w_all)
    if cumulative:
        w_cum = (
            (Window.partitionBy(*by) if by else Window.partitionBy())
            .orderBy(*[F.col(c) for c in _cols(order_by)])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        num = F.sum(value).over(w_cum)
        return df.withColumn(f"{value}_cumulative_fraction", num / denom)
    return df.withColumn(f"{value}_fraction", F.col(value) / denom)


def histogram(
    df: DataFrame, value: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """`mlr histogram -f v --lo --hi --nbins`
    (pkg/transformers/histogram.go:28). Fixed-width bins; values outside
    [lo, hi) are dropped (histogram.go semantics). Emits bin_lo, bin_hi,
    count for every bin including empty ones (Miller emits all bins).
    """
    width = (hi - lo) / nbins
    binned = (
        df.filter((F.col(value) >= lo) & (F.col(value) < hi))
        .withColumn("__bin", F.floor((F.col(value) - lo) / width).cast("int"))
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


def merge_fields(df: DataFrame, accs: Sequence[str], fields: Sequence[str], out_prefix: str) -> DataFrame:
    """`mlr merge-fields -a ... -f ... -o prefix`
    (pkg/transformers/merge_fields.go:29): stats1 accumulators applied
    HORIZONTALLY across fields within each record. Pure row-wise
    expressions — zero shuffle, fully codegen'd.
    """
    arr = F.array(*[F.col(f).cast("double") for f in _cols(fields)])
    nn = F.filter(arr, lambda x: x.isNotNull())
    out = df
    for a in _cols(accs):
        name = f"{out_prefix}_{a}"
        if a == "min":
            c = F.array_min(nn)
        elif a == "max":
            c = F.array_max(nn)
        elif a == "sum":
            c = F.aggregate(nn, F.lit(0.0), lambda acc, x: acc + x)
        elif a == "mean":
            c = F.aggregate(nn, F.lit(0.0), lambda acc, x: acc + x) / F.size(nn)
        elif a == "count":
            c = F.size(nn)
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


def cat_numbered(df: DataFrame, by: Sequence[str] = (), order_by: Sequence[str] = ()) -> DataFrame:
    """`mlr cat -n [-g ...]` (pkg/transformers/cat.go:23): prepend 1-up
    counter, optionally per group, in ``order_by`` order."""
    by = _cols(by)
    w = Window.partitionBy(*by) if by else Window.partitionBy()
    w = w.orderBy(*[F.col(c) for c in _cols(order_by)])
    return df.select(F.row_number().over(w).alias("n"), "*")


def rename_fields(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """`mlr rename old,new,...` (pkg/transformers/rename.go:29)."""
    return df.withColumnsRenamed(mapping)


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
    df: DataFrame, fields: Sequence[str], order_by: Sequence[str], by: Sequence[str] = ()
) -> DataFrame:
    """`mlr fill-down -f ...` (pkg/transformers/fill_down.go:21): carry
    forward last non-null value in ``order_by`` order."""
    w = (
        (Window.partitionBy(*_cols(by)) if by else Window.partitionBy())
        .orderBy(*[F.col(c) for c in _cols(order_by)])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns(
        {f: F.last(F.col(f), ignorenulls=True).over(w) for f in _cols(fields)}
    )


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
    # sub: first match only — regexp_replace with a compiled "once" trick
    return df.withColumn(
        field,
        F.concat(
            F.regexp_replace(
                F.substring_index(F.col(field), F.regexp_extract(F.col(field), pattern, 0), 1),
                F.lit("$^"),
                F.lit(""),
            ),
            F.regexp_replace(F.regexp_extract(F.col(field), pattern, 0), pattern, replacement),
            F.expr(
                f"substring({field}, length(substring_index({field}, "
                f"regexp_extract({field}, '{pattern}', 0), 1)) + "
                f"length(regexp_extract({field}, '{pattern}', 0)) + 1)"
            ),
        ),
    )


def case_fields(df: DataFrame, fields: Sequence[str], mode: str = "upper") -> DataFrame:
    """`mlr case -u/-l/-t -f ...` (pkg/transformers/case.go:29)."""
    fn = {"upper": F.upper, "lower": F.lower, "title": F.initcap}[mode]
    return df.withColumns({f: fn(F.col(f)) for f in _cols(fields)})


def sec2gmt(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr sec2gmt` (pkg/transformers/sec2gmt.go:30): epoch seconds →
    ISO-8601 'YYYY-MM-DDTHH:MM:SSZ'."""
    return df.withColumns(
        {
            f: F.date_format(F.to_timestamp(F.col(f)), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            for f in _cols(fields)
        }
    )


def format_values(df: DataFrame, fmt: str = "%.6f", fields: Sequence[str] | None = None) -> DataFrame:
    """`mlr format-values -f fmt` (pkg/transformers/format_values.go:26)."""
    fields = _cols(fields) if fields else [c for c, t in df.dtypes if t in ("double", "float")]
    return df.withColumns({f: F.format_string(fmt, F.col(f)) for f in fields})


def having_fields_all_defined(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """`mlr having-fields --all-defined ...`
    (pkg/transformers/having_fields.go:37) under a fixed schema:
    presence == non-null."""
    cond = F.lit(True)
    for f in _cols(fields):
        cond = cond & F.col(f).isNotNull()
    return df.filter(cond)


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


def decimate(df: DataFrame, n: int, order_by: Sequence[str], by: Sequence[str] = ()) -> DataFrame:
    """`mlr decimate -n N` (pkg/transformers/decimate.go:21): keep every
    Nth record (the Nth, 2Nth, ... in order)."""
    w = (Window.partitionBy(*_cols(by)) if by else Window.partitionBy()).orderBy(
        *[F.col(c) for c in _cols(order_by)]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") % n == 0)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# sort / head / tail / sampling (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


def sort(df: DataFrame, specs: Sequence[tuple[str, str]]) -> DataFrame:
    """`mlr sort -f/-r/-nf/-nr ...` (pkg/transformers/sort.go:69).

    specs: (field, one of 'f'|'r'|'nf'|'nr') — lexical asc/desc,
    numeric asc/desc. Miller: numeric sort puts non-numerics last.
    Spark's sort is a distributed range-partitioned sort (spills),
    unlike Miller's in-memory sort (performance.md:27).
    """
    order = []
    for f, how in specs:
        c = F.col(f)
        if how == "f":
            order.append(c.cast("string").asc())
        elif how == "r":
            order.append(c.cast("string").desc())
        elif how == "nf":
            order.append(c.cast("double").asc_nulls_last())
        elif how == "nr":
            order.append(c.cast("double").desc_nulls_last())
        else:
            raise ValueError(how)
    return df.orderBy(*order)


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
    """`mlr tail -n N [-g ...]` (pkg/transformers/tail.go:20)."""
    w = (Window.partitionBy(*_cols(by)) if by else Window.partitionBy()).orderBy(
        *[F.col(c).desc() for c in _cols(order_by)]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def tac(df: DataFrame, order_by: Sequence[str]) -> DataFrame:
    """`mlr tac` (pkg/transformers/tac.go:16): reverse; needs an explicit
    order column in Spark (no stream order)."""
    return df.orderBy(*[F.col(c).desc() for c in _cols(order_by)])


def sample(df: DataFrame, k: int, by: Sequence[str] = (), seed: int = 42) -> DataFrame:
    """`mlr sample -k K [-g ...]` (pkg/transformers/sample.go:30):
    exact-k per-group reservoir sample. Distributed equivalent: seeded
    rand() ranking window — one shuffle, deterministic given the seed.
    """
    w = (Window.partitionBy(*_cols(by)) if by else Window.partitionBy()).orderBy(F.rand(seed))
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


def step(
    df: DataFrame,
    steppers: Sequence[str],
    values: Sequence[str],
    order_by: Sequence[str],
    by: Sequence[str] = (),
    ewma_alphas: Sequence[float] = (),
) -> DataFrame:
    """`mlr step -a shift,delta,ratio,rsum,counter,from-first -f ...`
    (pkg/transformers/step.go:630-712). Output columns ``{f}_{stepper}``
    like Miller. One shuffle on the group keys; all steppers share the
    same window, so Catalyst plans a single Window exec.
    """
    by = _cols(by)
    base = (Window.partitionBy(*by) if by else Window.partitionBy()).orderBy(
        *[F.col(c) for c in _cols(order_by)]
    )
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for f in _cols(values):
        c = F.col(f)
        for s in _cols(steppers):
            if s in ("shift", "shift_lag"):
                e = F.lag(c, 1).over(base)
            elif s == "shift_lead":
                e = F.lead(c, 1).over(base)
            elif s == "delta":  # step.go:639-645: first record gets 0
                e = F.coalesce(c - F.lag(c, 1).over(base), F.lit(0))
            elif s == "ratio":
                e = c / F.lag(c, 1).over(base)
            elif s == "rsum":
                e = F.sum(c).over(run)
            elif s == "rprod":
                e = F.exp(F.sum(F.log(c)).over(run))
            elif s == "counter":
                e = F.count(c).over(run)
            elif s == "from-first":
                e = c - F.first(c).over(run)
            else:
                raise ValueError(f"unknown stepper: {s}")
            out = out.withColumn(f"{f}_{s}", e)
        # ewma (step.go:647-651): y_t = αx_t + (1-α)y_{t-1}, y_0 = x_0.
        # Closed form avoids applyInPandas: y_t = Σ_{i<=t} α'(i) x_i with
        # weights α(1-α)^(t-i); expressed via two running sums of
        # x_i/(1-α)^i. Numerically unstable for long series — for those,
        # use mlrsketch.verbs.sketch.ewma_pandas (applyInPandas).
        for alpha in ewma_alphas:
            beta = 1.0 - alpha
            i = F.row_number().over(base)
            scaled = c * F.pow(F.lit(beta), -i)
            s1 = F.sum(scaled).over(run)
            first_scaled = F.first(scaled).over(run)
            label = ("%g" % alpha).replace(".", "_")
            y = F.pow(F.lit(beta), i) * (
                F.lit(alpha) * s1 + F.lit(1 - alpha) * first_scaled
            )
            out = out.withColumn(f"{f}_ewma_{label}", y)
    return out


def slwin(
    df: DataFrame,
    value: str,
    m_back: int,
    n_fwd: int,
    order_by: Sequence[str],
    by: Sequence[str] = (),
) -> DataFrame:
    """`mlr step -a slwin_m_n` (step.go:703-711;
    utils/window_keeper.go:12-60): centered sliding-window mean."""
    w = (
        (Window.partitionBy(*_cols(by)) if by else Window.partitionBy())
        .orderBy(*[F.col(c) for c in _cols(order_by)])
        .rowsBetween(-m_back, n_fwd)
    )
    return df.withColumn(f"{value}_slwin_{m_back}_{n_fwd}", F.avg(value).over(w))


def rank(df: DataFrame, value: str, by: Sequence[str] = (), descending: bool = False) -> DataFrame:
    """`mlr rank -f v [-g ...]` (pkg/transformers/rank.go:22): competition
    rank 1,2,2,4 (percentile_keeper.go:87-104 EmitRank)."""
    order = F.col(value).desc() if descending else F.col(value).asc()
    w = Window.partitionBy(*_cols(by)).orderBy(order) if by else Window.orderBy(order)
    return df.withColumn("rank", F.rank().over(w))


# ---------------------------------------------------------------------------
# restructuring (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


def nest_explode_values(df: DataFrame, field: str, sep: str = ";") -> DataFrame:
    """`mlr nest --explode --values --across-records -f field --nested-fs sep`
    (pkg/transformers/nest.go:34): one output record per separated value.
    This is the tokenizer primitive for heavy-hitter token queries."""
    return df.withColumn(field, F.explode(F.split(F.col(field), sep)))


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


def seqgen(spark, start: int, stop: int, step_n: int = 1) -> DataFrame:
    """`mlr seqgen --start --stop --step` (pkg/transformers/seqgen.go:23).
    Miller's stop is inclusive."""
    return spark.range(start, stop + (1 if step_n > 0 else -1), step_n).select(
        F.col("id").alias("i")
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
            cols.append(F.col(f))
        else:
            cols.append(F.lit(fill).alias(f))
    return df.select(*cols)
