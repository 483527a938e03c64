"""Distributed dataset profiling, schema audit, and catalog rollups.

Spark-first analog of the reference's profiling and audit layers:
- ``src/forest_pipelines/profiling.py:269-318`` profiles one resource at
  a time (row/column counts, per-column samples) on a single machine;
  here one declarative aggregation profiles the whole table in a single
  distributed pass (map-side partial aggs, no per-file Python loop).
- ``src/forest_pipelines/audits/inpe/bdqueimadas_focos.py:60-210``
  computes column presence, modal schema and divergent files across
  yearly ZIPs; here the same semantics run over source-partitioned data
  with collect_set + a broadcast modal signature.
- ``src/forest_pipelines/catalog/build.py`` aggregates datasets per
  source agency; `catalog_summary` is that rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from forest_open_data_pipelines_spark.functions.columns import ratio


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column statistics: non-null count, nulls, exact distinct,
    min/max/mean (numeric columns only for min/max/mean).

    One wide aggregation computes every column's stats in a single scan
    (the reference re-reads the file per concern); the per-column rows
    are produced by unioning the already-aggregated scalars, so the
    fact table is read exactly once per stat family.
    """
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in {"integer", "long", "double", "float", "decimal"}
    }
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
        ]
        if c in numeric:
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"{c}__min"),
                F.max(F.col(c)).cast("double").alias(f"{c}__max"),
                ratio(F.avg(F.col(c))).alias(f"{c}__mean"),
            ]
    wide = df.agg(*aggs)
    # Pivot the single wide row into one row per column via a stack expr
    # (pure Catalyst, no Python iteration over data).
    parts = []
    for c in cols:
        if c in numeric:
            parts.append(
                f"'{c}', `{c}__nn`, `{c}__nulls`, `{c}__distinct`, "
                f"`{c}__min`, `{c}__max`, `{c}__mean`"
            )
        else:
            parts.append(
                f"'{c}', `{c}__nn`, `{c}__nulls`, `{c}__distinct`, "
                f"cast(null as double), cast(null as double), cast(null as double)"
            )
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) as "
        "(column_name, non_null_count, null_count, distinct_count, min_value, max_value, mean_value)"
    )
    return wide.selectExpr(stack).orderBy("column_name")


def profile_columns_approx(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Sketch-based profile: HLL++ approximate distinct counts and
    approximate percentiles (p50/p95) per column.

    This is the 100 TB profiling path: ``countDistinct`` needs a full
    shuffle of every distinct value, while ``approx_count_distinct``
    (HyperLogLog++, rsd 1%) and ``percentile_approx`` keep fixed-size
    mergeable sketches per partition — one map-side pass, O(columns)
    driver result. Accuracy bounds are asserted against the exact
    profile in tests/test_operators.py; no SQL oracle (sketch internals
    are engine-specific), so the driver applies the rows-only check.
    """
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in {"integer", "long", "double", "float", "decimal"}
    }
    aggs = []
    for c in cols:
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=0.01).alias(f"{c}__ad")
        )
        if c in numeric:
            aggs += [
                F.percentile_approx(F.col(c), 0.5, 10_000)
                .cast("double")
                .alias(f"{c}__p50"),
                F.percentile_approx(F.col(c), 0.95, 10_000)
                .cast("double")
                .alias(f"{c}__p95"),
            ]
    wide = df.agg(*aggs)
    parts = []
    for c in cols:
        if c in numeric:
            parts.append(f"'{c}', `{c}__ad`, `{c}__p50`, `{c}__p95`")
        else:
            parts.append(
                f"'{c}', `{c}__ad`, cast(null as double), cast(null as double)"
            )
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) as "
        "(column_name, approx_distinct, approx_p50, approx_p95)"
    )
    return wide.selectExpr(stack).orderBy("column_name")


def catalog_summary(documents: DataFrame) -> DataFrame:
    """Per-source catalog rollup (catalog/build.py analog): item count,
    distinct languages, size stats."""
    return (
        documents.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            ratio(F.avg("n_chars")).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


def schema_audit(documents: DataFrame) -> DataFrame:
    """Per-source language-signature audit vs the modal signature.

    Reference semantics (audits/inpe/bdqueimadas_focos.py:129-154):
    compute each file's column list, find the modal schema, report each
    file's signature and whether it diverges. Here "file" ≈ source
    partition and "columns" ≈ the set of langs observed in it; the
    modal signature is the most frequent signature (ties broken
    lexicographically) attached via broadcast.
    """
    sigs = documents.groupBy("source").agg(
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("signature"),
        F.count("*").alias("n_docs"),
    )
    modal = (
        sigs.groupBy("signature")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "signature")
        .limit(1)
        .select(F.col("signature").alias("modal_signature"))
    )
    return (
        sigs.join(F.broadcast(modal))
        .select(
            "source",
            "n_docs",
            "signature",
            "modal_signature",
            (F.col("signature") != F.col("modal_signature")).alias("diverges"),
        )
        .orderBy("source")
    )


# Type-inference thresholds — audits/utils.py:126-150 infer_series_kind.
NUMERIC_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"
INT_RE = r"^-?\d+$"
DATETIME_RE = r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d+)?)?$"


def infer_types(strings: DataFrame) -> DataFrame:
    """Per-column type inference over an all-string two-column frame
    ``(column_name, value)``.

    Mirrors audits/utils.py ``infer_series_kind``: trim, drop empties;
    numeric ratio ≥ .95 → int (int ratio ≥ .95) else float; datetime
    ratio ≥ .8 → datetime; ≤5 distinct with ≥10 values → categorical;
    else string. The pandas to_numeric/to_datetime parsers are replaced
    by explicit regexes so any engine (and the SQL oracle) classifies
    identically.

    One scan → stack → partial-agg on a handful of column_name keys;
    regex matching is JVM-side codegen, no Python.
    """
    v = F.trim(F.col("value"))
    usable = v.isNotNull() & (v != "")
    agg = (
        strings.groupBy("column_name")
        .agg(
            F.sum(F.when(usable, 1).otherwise(0)).alias("n_values"),
            F.sum(F.when(usable & v.rlike(NUMERIC_RE), 1).otherwise(0)).alias("n_num"),
            F.sum(F.when(usable & v.rlike(INT_RE), 1).otherwise(0)).alias("n_int"),
            F.sum(F.when(usable & v.rlike(DATETIME_RE), 1).otherwise(0)).alias(
                "n_date"
            ),
            F.count_distinct(F.when(usable, v)).alias("n_distinct"),
        )
    )
    n = F.col("n_values")
    kind = (
        F.when(n == 0, "empty")
        .when(
            (F.col("n_num") / n >= 0.95) & (F.col("n_int") / n >= 0.95), "int"
        )
        .when(F.col("n_num") / n >= 0.95, "float")
        .when(F.col("n_date") / n >= 0.8, "datetime")
        .when((F.col("n_distinct") <= 5) & (n >= 10), "categorical")
        .otherwise("string")
    )
    return agg.select(
        "column_name",
        "n_values",
        "n_distinct",
        ratio(F.col("n_num") / n).alias("numeric_ratio"),
        ratio(F.col("n_date") / n).alias("datetime_ratio"),
        kind.alias("inferred_kind"),
    ).orderBy("column_name")


def type_inference(orders: DataFrame) -> DataFrame:
    """Audit query: infer kinds of orders columns rendered as strings —
    the 'this CSV column is really an int/date/category' audit the
    reference runs on synced resources."""
    stacked = orders.select(
        F.expr(
            "stack(5, "
            "'o_orderkey', cast(o_orderkey AS string), "
            "'o_totalprice', cast(o_totalprice AS string), "
            "'o_orderdate', cast(o_orderdate AS string), "
            "'o_orderstatus', cast(o_orderstatus AS string), "
            "'o_orderpriority', cast(o_orderpriority AS string)"
            ") AS (column_name, value)"
        )
    )
    return infer_types(stacked)


def join_key_skew_report(
    fact: DataFrame, key: str, top_k: int = 10
) -> DataFrame:
    """Heavy-hitter report for a join/aggregation key: the top-K keys
    by row count with their share of the table and their ratio to the
    mean per-key count — the diagnostic that decides whether a key
    needs salting (``functions/skew.py``) or AQE skew-join handling
    before a 100 TB run.

    One map-side-combinable groupBy; the global totals ride along via
    a broadcast single-row aggregate, and the top-K rank runs over the
    (bounded) per-key counts.
    """
    counts = fact.groupBy(F.col(key).alias("key_value")).agg(
        F.count("*").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count("*").alias("n_keys"),
    )
    w = Window.orderBy(F.desc("n_rows"), "key_value")
    return (
        counts.join(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "rank",
            F.col("key_value").cast("string").alias("key_value"),
            "n_rows",
            ratio(F.col("n_rows") / F.col("total_rows")).alias("share"),
            ratio(
                F.col("n_rows") * F.col("n_keys") / F.col("total_rows")
            ).alias("skew_ratio"),
        )
        .orderBy("rank")
    )


#: Columns profiled by ``numeric_correlations`` (2-dp-ish numeric
#: lineitem measures; shared with the DuckDB oracle generator).
CORRELATION_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def numeric_correlations(
    lineitem: DataFrame, cols: tuple[str, ...] = CORRELATION_COLS
) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric measures — the
    data-profiling pass a feature pipeline runs before trusting
    derived signals.

    Cross-engine determinism: every moment (Σx, Σx², Σxy) is summed in
    DECIMAL — exact and order-independent — and only the final Pearson
    formula runs in doubles from those exact sums, so the 6-dp result
    cannot drift with partition count or summation order (a plain
    ``corr()`` aggregates doubles and is partitioning-dependent).
    ONE scan computes all m + m(m+1)/2 moments map-side.

    Measured trade (round-8 scan audit): the former union-per-pair
    formulation benched ~3× faster at sf0.1 because each branch's
    aggregate PRUNED to its pair's 6 moments and the branches ran as
    concurrent stages — but it re-scanned the fact table once per
    pair (6 scans), which is the wrong side of the trade at 100 TB
    where the scan dominates. The single wide pass is CPU-bound on
    128-bit decimal product sums at bench scale (~1.5 s vs ~0.5 s)
    and scan-bound — 6× cheaper — at corpus scale.
    """
    # (18,6): products land at (37,12) — inside the 38-digit cap, so
    # every moment stays EXACT decimal (a (28,8) cast would push
    # products past 38 digits and silently round)
    d = lambda c: F.col(c).cast("decimal(18,6)")
    aggs: list = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(d(c)).alias(f"s_{c}"))
        aggs.append(F.sum(d(c) * d(c)).alias(f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.sum(d(a) * d(b)).alias(f"sp_{a}_{b}"))
    m = lineitem.agg(*aggs)

    def _corr(a: str, b: str):
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        ssa, ssb = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{b}").cast("double")
        sp = F.col(f"sp_{a}_{b}").cast("double")
        cov = n * sp - sa * sb
        var_a = n * ssa - sa * sa
        var_b = n * ssb - sb * sb
        return ratio(cov / F.sqrt(var_a * var_b))

    # One explode over the single moment row — the union-per-pair
    # formulation recomputed the fact-table aggregate once per pair
    # (6 scans for a 6-row result; round-8 scan audit).
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                _corr(a, b).alias("pearson_r"),
                F.col("n").alias("n_rows"),
            )
            for i, a in enumerate(cols)
            for b in cols[i + 1 :]
        ]
    )
    return (
        m.select(F.explode(rows).alias("p"))
        .select("p.col_a", "p.col_b", "p.pearson_r", "p.n_rows")
        .orderBy("col_a", "col_b")
    )


def referential_integrity_audit(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Star-schema referential-integrity report: one row per foreign-key
    relationship with child cardinality, orphan count (child keys with
    no parent), and distinct orphan keys — the data-quality audit a
    warehouse runs before trusting joins (dbt-test / expectations
    style; extends the reference's per-file schema audit to
    CROSS-TABLE contracts it has no analog for).

    Scale: each relationship is ONE pass over the child's key
    projection — a left join against the parent's DISTINCT keys
    (parents broadcast while they fit) feeding a single conditional
    aggregate that yields child cardinality AND orphan counts
    together (the former anti-join + separate count-agg shape scanned
    every child key column twice; round-8 scan audit). The child fact
    table is never shuffled wide, and the output is one bounded row
    per relationship.
    """
    rels = [
        ("orders.o_custkey", "customer.c_custkey", orders, "o_custkey",
         customer, "c_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey", lineitem, "l_orderkey",
         orders, "o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey", lineitem, "l_partkey",
         part, "p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey", lineitem, "l_suppkey",
         supplier, "s_suppkey"),
        ("customer.c_nationkey", "nation.n_nationkey", customer, "c_nationkey",
         nation, "n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey", supplier, "s_nationkey",
         nation, "n_nationkey"),
        ("nation.n_regionkey", "region.r_regionkey", nation, "n_regionkey",
         region, "r_regionkey"),
    ]
    out = None
    for child_col, parent_col, child, ck, parent, pk in rels:
        child_keys = child.select(F.col(ck).alias("k"))
        # distinct() keeps the left join duplicate-proof (parents are
        # PKs here, but the audit must not silently multiply child
        # rows if a parent table ever violates that)
        parent_keys = parent.select(
            F.col(pk).alias("k"), F.lit(True).alias("__hit")
        ).distinct()
        joined = child_keys.join(parent_keys, "k", "left")
        orphan = F.col("__hit").isNull()
        row = joined.agg(
            F.count("*").alias("n_child_rows"),
            F.countDistinct("k").alias("n_child_keys"),
            F.sum(F.when(orphan, 1).otherwise(0)).alias("n_orphan_rows"),
            F.countDistinct(F.when(orphan, F.col("k"))).alias("n_orphan_keys"),
        ).select(
            F.lit(child_col).alias("child_key"),
            F.lit(parent_col).alias("parent_key"),
            "n_child_rows",
            "n_child_keys",
            "n_orphan_rows",
            "n_orphan_keys",
            (F.col("n_orphan_rows") == 0).alias("intact"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("child_key", "parent_key")


# ── Audit markdown rendering (audits/markdown.py twin) ──────────────────────


def _escape_md_cell(col: Column) -> Column:
    """audits/markdown.py:7-9 ``_escape_cell``: None → '', pipes
    backslash-escaped, newlines → <br>."""
    return F.replace(
        F.replace(F.coalesce(col.cast("string"), F.lit("")), F.lit("|"), F.lit("\\|")),
        F.lit("\n"),
        F.lit("<br>"),
    )


def audit_markdown_table(documents: DataFrame) -> DataFrame:
    """The audit report's markdown table over a per-source rollup —
    audits/markdown.py:12-24 ``render_table`` semantics exactly:
    header + '---' separator + one '| a | b |' row per source, cells
    escaped via ``_escape_cell`` (a synthesized note cell carries a
    REAL pipe so the escaping is value-checked, not just present).

    Output is (seq, line) — deterministic line order, so the full
    document is ``array_join(collect_list)`` away for a writer.

    Scale: the rollup is one map-side-combinable aggregate; rendering
    is a projection; the header/separator are two literal rows.
    """
    per_source = documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
    )
    note = F.concat(F.lit("fonte|"), F.col("source"))
    body = per_source.select(
        F.col("source").alias("k"),
        F.concat(
            F.lit("| "),
            F.concat_ws(
                " | ",
                _escape_md_cell(F.col("source")),
                _escape_md_cell(F.col("n_docs")),
                _escape_md_cell(F.col("n_langs")),
                _escape_md_cell(note),
            ),
            F.lit(" |"),
        ).alias("line"),
    )
    w = Window.orderBy("k")
    numbered = body.select(
        (F.row_number().over(w) + 1).cast("long").alias("seq"), "line"
    )
    spark = documents.sparkSession
    head = spark.createDataFrame(
        [
            (0, "| source | n_docs | n_langs | note |"),
            (1, "| --- | --- | --- | --- |"),
        ],
        "seq long, line string",
    )
    return head.unionByName(numbered).orderBy("seq")


# ── Header → candidate column matching (audits/utils.py twin) ───────────────

# audits/utils.py:113-123: normalize = strip non-[a-z0-9] AFTER
# casefold (accents are REMOVED, not transliterated — 'Município' and
# 'municpio' normalize equal); the normalized map keeps the LAST
# header per normalized form (dict overwrite), and the FIRST candidate
# with a normalized hit wins. (casefold vs lower diverges only on
# chars like ß, which these Brazilian-agency headers never carry.)
BEST_MATCH_FIELDS = (
    ("date", ("data_hora", "data", "datahora_gmt")),
    ("municipality", ("municipio", "município", "cidade")),
    ("count", ("focos", "n_focos", "quantidade")),
)

_HEADER_KINDS = 5


def _norm_header(col: Column) -> Column:
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def wrap_documents_as_csv_headers(documents: DataFrame) -> DataFrame:
    """Render documents as messy CSV header lists cycled by doc_id:
    exact snake_case, spaced Title Case, accented UPPERCASE, a
    duplicate-normalized-form pair (last one must win), and a header
    set with NO match for the count field (NULL pick)."""
    kinds = F.array(
        F.array(F.lit("data_hora"), F.lit("municipio"), F.lit("focos")),
        F.array(F.lit("Data Hora"), F.lit("Cidade"), F.lit("N Focos")),
        F.array(F.lit("DATAHORA_GMT"), F.lit("MUNICÍPIO"), F.lit("QUANTIDADE")),
        F.array(
            F.lit("data-hora"), F.lit("Data_Hora"), F.lit("municipio"),
            F.lit("Focos"),
        ),
        F.array(F.lit("data"), F.lit("municipio"), F.lit("bioma")),
    )
    return documents.select(
        "doc_id",
        F.element_at(
            kinds, (F.col("doc_id") % _HEADER_KINDS + 1).cast("int")
        ).alias("headers"),
    )


def column_best_match(documents: DataFrame) -> DataFrame:
    """``pick_best_column`` for every (document, target field): the
    schema-mapping step an audit runs before reading a messy agency
    CSV. One row per (doc, field) with the chosen ORIGINAL header (or
    NULL when no candidate normalizes into the header set).

    Scale: pure array-lambda projection per row (the candidate lists
    are literals), one explode for the field fan-out, no join, no
    shuffle except the presentation sort.
    """
    import re as _re

    def _hits(norm_target: str):
        # single-arg lambda on purpose: a 2-arg filter lambda would be
        # interpreted as (element, INDEX) by Spark
        t = F.lit(norm_target)
        return F.filter(F.col("headers"), lambda x: _norm_header(x) == t)

    h = wrap_documents_as_csv_headers(documents)
    picks = []
    for field, candidates in BEST_MATCH_FIELDS:
        # coalesce in candidate order = FIRST candidate with a hit
        # wins; element_at(…, -1) = LAST header per normalized form
        # wins within a candidate (the reference dict's overwrite)
        chosen = None
        for cand in candidates:
            hit = _hits(_re.sub(r"[^a-z0-9]", "", cand.casefold()))
            pick = F.when(F.size(hit) > 0, F.element_at(hit, -1))
            chosen = pick if chosen is None else F.coalesce(chosen, pick)
        picks.append(
            F.struct(F.lit(field).alias("field"), chosen.alias("chosen"))
        )
    return (
        h.select("doc_id", F.explode(F.array(*picks)).alias("p"))
        .select("doc_id", F.col("p.field").alias("field"),
                F.col("p.chosen").alias("chosen_column"))
        .orderBy("doc_id", "field")
    )
