"""Row-id-keyed incremental materialized views over the change feed.

The reference's whole job shape is reader → transform → writer run as a
batch (database/dbms/reader/job.go:122 → writer/job.go:63); a lakehouse
wants the same declared pipeline kept CONTINUOUSLY true without
re-running it over the full table. This module restates that job as an
incremental loop over the versioned layer's primitives:

    {"materialize": {
        "connection": {"url": root, "table": {"name": "src"}},
        "target": "/lake/src_view",
        "select": ["o_orderkey", "o_totalprice * 2 AS double_price"],
        "where":  "o_orderstatus = 'O'"}}

The VIEW is itself a versioned table holding the transformed rows plus
``_src_row_id`` — the source's stable row id (row tracking must be ON:
the id survives update/merge/compact rewrites, so the view never has to
re-derive row identity from payload). Each refresh:

  * reads ``change_feed(with_row_ids=True)`` since the last refreshed
    source version — cost ∝ changed rows, never ∝ table;
  * nets the feed to ONE terminal event per row id (a row updated five
    times and deleted applies as one delete);
  * applies it with two id-keyed MERGEs into the view: net-deletes and
    filtered-out rows drop by id, surviving rows upsert by id — the id
    IS the join key, no payload-key derivation, and the merge rewrites
    only the view files holding matched ids (file-pruned discovery);
  * records the refreshed source version in the view's properties.

Refreshes are IDEMPOTENT: both merges key on ``_src_row_id``, so a
crash between the data commits and the version bookmark replays the
same net changes to the same result. A feed range the CDF cannot
serve row-level (overwrite / restore / vacuumed history — the
documented "full re-read required" contract) falls back to one full
rebuild, as does a changed view definition (fingerprint mismatch) and
change rows predating row-tracking enablement (NULL ids are unkeyable).

Scale shape at 100 TB: the steady-state refresh plans two scans over
the range's change files (the CDF contract), one window shuffle ∝ net
changes, and merge rewrites ∝ matched view files. Source row ids
allocate monotonically, so ``_src_row_id`` correlates with view file
order and the manifest bounds keep the merge's touched-file discovery
selective without any explicit clustering. The initial build is the
only table-sized pass — exactly Delta's materialized-view posture.

Supported view definitions are DETERMINISTIC ROW-LEVEL transforms of
one source table — per-row ``select`` expressions plus an optional
``where``. Aggregates / joins / windows / sorts / limits / random
expressions are refused at refresh setup (plan-shape check): their
incremental maintenance needs group-state algebra this job does not
claim (run them as ordinary queries, or stack them on the view)...

...EXCEPT the maintainable aggregates (r17): ``groupBy`` +
``aggregates`` of ``count(*)``/``count(expr)`` (non-NULL values)/
``sum``/``avg``/``min``/``max`` maintain a GROUPED view
incrementally:

  * count/sum fold ABELIAN: every feed event contributes sign-weighted
    to its group (insert/update postimage +, delete/update preimage −)
    and the per-group deltas fold with ONE group-keyed merge
    (``target.n + source.n``); groups whose internal live-row count
    hits zero are swept. avg rides the same algebra on hidden
    ``<name>__sum``/``<name>__cnt`` state columns, re-deriving the
    exposed value in the fold expression.
  * min/max fold on ADDITIONS (``least``/``greatest`` against the
    stored extreme) and recompute ONLY the DIRTY groups — those where
    some removed value ties-or-beats the candidate extreme, i.e. the
    stored witness may be gone. The recompute scans the source scoped
    to the dirty groups (literal pushed predicates for small sets,
    broadcast semi-join beyond) and REPLACES those view rows
    wholesale; in the steady state the dirty set is empty and no
    source scan happens at all. count(distinct)/percentile stay
    refused by name: they need per-group value state, and a silent
    wrong answer is the contract this job refuses to break.

This is textbook incremental view maintenance over the CDF; it needs
no row tracking (groups key on their OWN columns), refresh cost is
∝ changed rows + matched view files (+ dirty-group source rows when
an extreme's witness was removed), and the delta aggregation is
exactly as parallel as the feed scan. One numeric caveat, inherent to
ALL incremental folding: float sums are non-associative, so a folded
double sum can differ from a from-scratch rebuild in the last bits —
declare ``sum(CAST(x AS DECIMAL(p,s)))`` when bit-exact parity with a
rebuild matters (decimal addition is exact and associative).

...AND the JOIN form (r17): ``join`` enriches each source row with a
unique-keyed dimension lookup (``left`` or ``inner``) before the
per-row select/where, kept true from BOTH change feeds. Source DML
applies id-keyed exactly like the plain row-level path (the dim
lookup rides inside the transform); dimension DML extracts the
distinct AFFECTED JOIN KEYS from the dim CDF and re-derives only the
source rows holding them (see ``_apply_join_deltas``). Join+groupBy
is refused — stack an aggregate view on the enriched view instead
(views are versioned tables; stacking is the composition story).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from as_etl_storage_spark.spec import MaterializeSpec, SpecError

#: the view-side column carrying the SOURCE's stable row id
SRC_ROW_ID = "_src_row_id"

#: aggregate views' internal live-row counter per group: the zero-test
#: that decides when a group leaves the view (a user count(*) output is
#: optional; this one always rides along)
MV_COUNT = "_mv_count"

#: the aggregate grammar: count(*)/sum/avg fold abelian (sign-weighted
#: deltas invert cleanly under deletes — avg rides on hidden sum+count
#: state columns); min/max fold on inserts and RECOMPUTE only the
#: groups whose stored extreme a delete may have invalidated (the
#: dirty-group set). Everything else (count(distinct), percentile, ...)
#: is refused by name.
_AGG_RE = re.compile(
    r"^\s*(?:(count)\s*\(\s*\*\s*\)"
    r"|(count|sum|avg|min|max)\s*\((.+)\))\s*$",
    re.IGNORECASE | re.DOTALL,
)

#: suffixes of the hidden state columns an avg aggregate materializes
#: alongside its output (the fold state: exposed avg = __sum / __cnt)
AVG_SUM = "__sum"
AVG_CNT = "__cnt"

#: delta-frame-only suffix carrying the extreme over a range's REMOVED
#: rows per min/max aggregate (the dirty test input; never merged)
_DEL_SUFFIX = "__del"

#: plan nodes a row-level view definition must not produce (their
#: incremental maintenance is not id-keyed); checked on the ANALYZED
#: plan of the definition applied to an empty slice of the source
_FORBIDDEN_PLAN = re.compile(
    r"\b(Aggregate|Window|Join|Sort|GlobalLimit|LocalLimit|Distinct|"
    r"Generate|Sample)\b"
)

#: textual guard for non-deterministic expressions the plan-shape check
#: cannot see (they analyze as ordinary projections)
_FORBIDDEN_EXPR = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id|"
    r"current_timestamp|current_date|now|unix_timestamp\s*\(\s*\))\b",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class MaterializeResult:
    """What one materialize run did. ``mode``: ``'initial'`` (first
    build), ``'incremental'`` (id-keyed delta apply), ``'full'``
    (rebuild — non-CDF range, changed definition, or ``fullRefresh``),
    ``'noop'`` (source unchanged — zero commits), ``'bookmark'``
    (only layout-only source versions in range — one metadata commit,
    zero data files touched) or ``'status'`` (``check: true`` — report
    ``needs``/``behind`` without touching anything). ``deletes``/``upserts`` count the net
    id-keyed changes applied (None outside incremental mode);
    ``recomputed`` counts the work a refresh had to re-derive from the
    source snapshot: for an aggregate view the dirty groups whose
    stored min/max a removal may have invalidated; for a join view the
    distinct dimension keys whose source rows re-derived (0 = the
    steady state — no source scan at all). None outside those modes."""

    view_path: str
    mode: str
    source_version: int
    view_version: int | None
    deletes: int | None = None
    upserts: int | None = None
    recomputed: int | None = None
    #: status mode only: what the next real refresh would do
    #: ('none' | 'incremental' | 'rebuild' — best-effort: a CDF gap
    #: inside the range can still escalate incremental to rebuild)
    needs: str | None = None
    #: status mode only: how many committed source (+ dimension)
    #: versions the view has not absorbed; None when the view does
    #: not exist yet
    behind: int | None = None


def _fingerprint(source_path: str, spec: MaterializeSpec) -> str:
    """Content identity of the view DEFINITION: a changed select/where/
    groupBy/aggregates/join (or a re-pointed source or dimension) must
    force a rebuild, never silently apply new transforms to old rows.
    Bookmarked VERSIONS are deliberately absent — they advance, the
    definition does not."""
    blob = json.dumps(
        {
            "source": source_path,
            "select": list(spec.select),
            "where": spec.where,
            "group_by": list(spec.group_by),
            "aggregates": list(spec.aggregates),
            "join": None
            if spec.join is None
            else {
                "path": _dim_path(source_path, spec),
                "on": list(spec.join.on),
                "how": spec.join.how,
                "select": list(spec.join.select),
            },
        },
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()


def _dim_path(source_path: str, spec: MaterializeSpec) -> str:
    """The dimension table's root: its own url when declared, else a
    sibling of the source under the source connection's url."""
    root = spec.join.url or os.path.dirname(source_path)
    return os.path.join(root, spec.join.table)


def _dim_projected(dim_df: DataFrame, spec: MaterializeSpec) -> DataFrame:
    """The dimension side as the join sees it: the declared projection
    (default: all columns), which must carry the join keys."""
    if spec.join.select:
        dim_df = dim_df.select(*[F.expr(e) for e in spec.join.select])
    missing = [k for k in spec.join.on if k not in dim_df.columns]
    if missing:
        raise SpecError(
            f"materialize join.select must carry the join keys; "
            f"missing {missing} from the projected dimension columns "
            f"{dim_df.columns}"
        )
    return dim_df


def _joined(
    src_df: DataFrame, dim_df: DataFrame, spec: MaterializeSpec
) -> DataFrame:
    """Source rows (carrying ``_row_id``) enriched by the dimension
    lookup, then filtered/projected by the view definition. Non-key
    column collisions are refused up front — they would make every
    downstream expression ambiguous."""
    dim = _dim_projected(dim_df, spec)
    _check_clash(src_df.columns, dim.columns, spec)
    return _transform(
        src_df.join(dim, on=list(spec.join.on), how=spec.join.how), spec
    )


def _check_clash(src_cols, dim_cols, spec: MaterializeSpec) -> None:
    clash = (
        set(c for c in src_cols if c != "_row_id") & set(dim_cols)
    ) - set(spec.join.on)
    if clash:
        raise SpecError(
            f"materialize join: dimension columns {sorted(clash)} "
            f"collide with source columns — project them away or "
            f"alias them in join.select"
        )


def _check_join_form(spark, empty_src, dim_empty, spec):
    """Zero-row setup validation of the join form: the dimension
    projection analyzes and carries the keys, no non-key collisions,
    and the select/where over the JOINED schema is pure row-level. The
    joined schema is flattened into a LocalRelation first so the
    forbidden-plan matcher never sees our own Join node."""
    try:
        dim_proj = _dim_projected(dim_empty, spec)
        _check_clash(empty_src.columns, dim_proj.columns, spec)
        flat = spark.createDataFrame(
            [],
            empty_src.join(
                dim_proj, on=list(spec.join.on), how=spec.join.how
            ).schema,
        )
    except SpecError:
        raise
    except Exception as exc:
        raise SpecError(
            f"materialize join does not analyze against the source/"
            f"dimension schemas: {exc}"
        ) from None
    return _check_row_level(flat, spec)


def _assert_unique_dim_keys(
    dim: DataFrame, spec: MaterializeSpec, scope: DataFrame | None = None
) -> None:
    """A dimension with duplicate join keys would fan every matching
    source row out — fail the refresh by name instead of silently
    duplicating view rows. One aggregate over the projected dimension;
    incremental phases pass ``scope`` (a key frame) to check only the
    slice they are about to join — cost ∝ affected keys, not dim."""
    proj = _dim_projected(dim, spec)
    if scope is not None:
        proj = proj.join(scope, list(spec.join.on), "semi")
    dup = proj.groupBy(*spec.join.on).count().where(F.col("count") > 1)
    if not dup.isEmpty():
        raise SpecError(
            f"materialize join: the dimension is not unique on "
            f"{list(spec.join.on)} — deduplicate it (or aggregate it "
            f"into a unique-keyed view) before joining"
        )


def _transform(df: DataFrame, spec: MaterializeSpec) -> DataFrame:
    """The view definition applied to source-shaped rows carrying
    ``_row_id``: filter, project, and carry the id out as the view key."""
    if spec.where.strip():
        df = df.where(spec.where)
    cols = (
        [F.expr(e) for e in spec.select]
        if spec.select
        else [F.col(c) for c in df.columns if c != "_row_id"]
    )
    return df.select(*cols, F.col("_row_id").alias(SRC_ROW_ID))


def _check_row_level(src_empty: DataFrame, spec: MaterializeSpec):
    """Refuse definitions whose maintenance is not id-keyed: the
    analyzed plan of the definition over an EMPTY source-shaped frame
    (a LocalRelation — its own plan contributes no nodes the matcher
    watches) must be pure filter+project (no Aggregate/Window/Join/
    Sort/Limit/...), and no expression may be non-deterministic.
    Zero-row, zero-job — the plan is analyzed, never executed."""
    for text in (*spec.select, spec.where):
        m = _FORBIDDEN_EXPR.search(text or "")
        if m:
            raise SpecError(
                f"materialize definitions must be deterministic; "
                f"{m.group(0)!r} in {text!r} is not — its incremental "
                f"re-evaluation would diverge from the initial build"
            )
    try:
        probe = _transform(src_empty, spec)
        analyzed = probe._jdf.queryExecution().analyzed().toString()
    except SpecError:
        raise
    except Exception as exc:
        # covers plain typos AND aggregate selects Spark itself rejects
        # before our plan check (MISSING_GROUP_BY: sum(v) next to the
        # carried row id)
        raise SpecError(
            f"materialize definition does not analyze against the "
            f"source schema (row-level filter + per-row projections "
            f"only): {exc}"
        ) from None
    m = _FORBIDDEN_PLAN.search(analyzed)
    if m:
        raise SpecError(
            f"materialize supports row-level definitions only "
            f"(filter + per-row projections); the declared select/where "
            f"produces a {m.group(0)} — aggregates, joins, windows, "
            f"sorts, limits and sampling are not id-keyed-maintainable "
            f"by this job"
        )
    return probe.schema


def _parse_aggregates(spec: MaterializeSpec) -> list:
    """(output name, kind, inner expr) per declared aggregate; refuses
    specs outside the maintainable grammar BY NAME — count(distinct)
    and friends cannot be maintained without per-group value state, so
    their 'incremental' maintenance would be silently wrong under DML."""
    out = []
    for name, agg in spec.aggregates:
        m = _AGG_RE.match(agg)
        if not m:
            raise SpecError(
                f"materialize aggregate {name!r} = {agg!r}: the "
                f"maintainable grammar is count(*), sum(<expr>), "
                f"avg(<expr>), min(<expr>) and max(<expr>) — "
                f"count(distinct)/percentile/collect need per-group "
                f"value state; recompute those as ordinary queries"
            )
        kind = (m.group(1) or m.group(2)).lower()
        inner = m.group(3)
        if inner is not None and kind == "count" and re.match(
            r"(?is)^\s*distinct\b", inner
        ):
            raise SpecError(
                f"materialize aggregate {name!r}: count(DISTINCT ...) "
                f"needs per-group value state and is not incrementally "
                f"maintainable — recompute it as an ordinary query"
            )
        if inner is not None:
            bad = _FORBIDDEN_EXPR.search(inner)
            if bad:
                raise SpecError(
                    f"materialize aggregate {name!r}: {bad.group(0)!r} "
                    f"is not deterministic"
                )
        out.append((name, kind, inner))
    # avg materializes <name>__sum/<name>__cnt state columns in the
    # view — a user name landing on one of them (or on MV_COUNT) would
    # silently alias fold state
    taken = set(spec.group_by) | {MV_COUNT}
    for name, kind, _ in out:
        taken.add(name)
        if kind == "avg":
            taken.update((name + AVG_SUM, name + AVG_CNT))
    if len(taken) < len(spec.group_by) + 1 + len(out) + 2 * sum(
        1 for _, k, _ in out if k == "avg"
    ):
        raise SpecError(
            f"materialize aggregate names collide with group keys, "
            f"{MV_COUNT!r}, or an avg's {AVG_SUM}/{AVG_CNT} state "
            f"columns: {sorted(n for n, _, _ in out)}"
        )
    return out


def _checked_keys(df: DataFrame, spec: MaterializeSpec) -> DataFrame:
    """Fail the refresh job on a NULL group key instead of silently
    splitting the group: the aggregate view folds deltas with a
    group-keyed equi-MERGE, and SQL equality never matches NULL to
    NULL — a NULL-keyed group would duplicate on every refresh. Fused
    as assert_true inside the plan (zero extra passes)."""
    for k in spec.group_by:
        df = df.where(
            F.coalesce(
                F.assert_true(
                    F.col(k).isNotNull(),
                    F.lit(
                        f"materialize groupBy key {k!r} is NULL; filter "
                        f"NULL keys in the where clause (or coalesce "
                        f"them to a sentinel in the source)"
                    ),
                ),
                F.lit(True),
            )
        )
    return df


def _agg_transform(df: DataFrame, spec: MaterializeSpec) -> DataFrame:
    """The aggregate definition applied from scratch to source-shaped
    rows: filter → group → count/sum, plus the internal live-row
    counter (the zero-test for group removal)."""
    if spec.where.strip():
        df = df.where(spec.where)
    df = _checked_keys(df, spec)
    aggs = []
    for name, kind, inner in _parse_aggregates(spec):
        if kind == "count":
            # count(*) counts rows; count(expr) counts non-NULL values
            aggs.append(
                F.count("*").alias(name)
                if inner is None
                else F.count(F.expr(inner)).alias(name)
            )
        elif kind == "sum":
            aggs.append(F.sum(F.expr(inner)).alias(name))
        elif kind == "avg":
            # exposed value plus the fold state it is derived from
            aggs.append(F.avg(F.expr(inner)).alias(name))
            aggs.append(F.sum(F.expr(inner)).alias(name + AVG_SUM))
            aggs.append(F.count(F.expr(inner)).alias(name + AVG_CNT))
        elif kind == "min":
            aggs.append(F.min(F.expr(inner)).alias(name))
        else:
            aggs.append(F.max(F.expr(inner)).alias(name))
    return df.groupBy(*spec.group_by).agg(
        *aggs, F.count("*").alias(MV_COUNT)
    )


def _agg_deltas(feed: DataFrame, spec: MaterializeSpec) -> DataFrame:
    """Per-group ±deltas from the raw feed: every event row passes the
    view's filter independently (a row UPDATED across the filter
    boundary contributes −pre, +post, or one side only — exactly its
    effect on the group), then folds sign-weighted. Same columns as
    the view, so the frame merges straight in. No netting needed:
    addition commutes, the window shuffle of the row-level path is
    replaced by one partial-aggregated groupBy ∝ changed rows."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"),
        F.lit(1),
    ).otherwise(F.lit(-1))
    df = feed.withColumn("__mv_sign", sign)
    if spec.where.strip():
        df = df.where(spec.where)
    df = _checked_keys(df, spec)
    pos, neg = F.col("__mv_sign") == 1, F.col("__mv_sign") == -1
    aggs, avg_fix = [], []
    for name, kind, inner in _parse_aggregates(spec):
        if kind == "count":
            aggs.append(
                F.sum("__mv_sign").alias(name)
                if inner is None
                else F.sum(
                    F.col("__mv_sign")
                    * F.expr(inner).isNotNull().cast("bigint")
                ).alias(name)
            )
        elif kind == "sum":
            aggs.append(
                F.sum(F.col("__mv_sign") * F.expr(inner)).alias(name)
            )
        elif kind == "avg":
            e = F.expr(inner)
            aggs.append(
                F.sum(F.col("__mv_sign") * e).alias(name + AVG_SUM)
            )
            aggs.append(
                F.sum(
                    F.col("__mv_sign") * e.isNotNull().cast("bigint")
                ).alias(name + AVG_CNT)
            )
            avg_fix.append(name)
        elif kind == "min":
            # column NAME carries the extreme over ADDED rows (what a
            # clean fold and a brand-new group need); __del carries the
            # extreme over REMOVED rows (the dirty test, merged never)
            e = F.expr(inner)
            aggs.append(F.min(F.when(pos, e)).alias(name))
            aggs.append(F.min(F.when(neg, e)).alias(name + _DEL_SUFFIX))
        else:
            e = F.expr(inner)
            aggs.append(F.max(F.when(pos, e)).alias(name))
            aggs.append(F.max(F.when(neg, e)).alias(name + _DEL_SUFFIX))
    out = df.groupBy(*spec.group_by).agg(
        *aggs, F.sum("__mv_sign").alias(MV_COUNT)
    )
    for name in avg_fix:
        # the exposed avg for a group UNSEEN by the view: its delta
        # sum/cnt ARE its state (sign-weighting nets in-range churn),
        # so the insert branch is exact; matched rows re-derive it in
        # the fold expressions instead
        out = out.withColumn(
            name,
            F.when(
                F.col(name + AVG_CNT) > 0,
                F.col(name + AVG_SUM) / F.col(name + AVG_CNT),
            ),
        )
    return out


def _agg_fold_exprs(spec: MaterializeSpec, tgt_types: dict) -> dict:
    """whenMatched SET expressions folding a delta row into the view
    row. Counts add plainly (never NULL); sums add null-safely so an
    all-NULL group stays SQL-NULL instead of being zeroed, and a NULL
    delta never wipes an accumulated sum. Every fold casts back to the
    column's STORED type (decimal addition widens precision by one;
    the schema must not creep refresh-over-refresh — under ANSI mode a
    true overflow fails the job loudly instead)."""
    def _add(col: str, ts: str) -> str:
        return (
            f"CAST(CASE WHEN target.{col} IS NULL AND "
            f"source.{col} IS NULL THEN NULL ELSE "
            f"coalesce(target.{col}, 0) + coalesce(source.{col}, 0) "
            f"END AS {ts})"
        )

    exprs = {
        MV_COUNT: f"CAST(target.{MV_COUNT} + source.{MV_COUNT} AS "
        f"{tgt_types[MV_COUNT].simpleString()})"
    }
    for name, kind, _ in _parse_aggregates(spec):
        ts = tgt_types[name].simpleString()
        if kind == "count":
            exprs[name] = f"CAST(target.{name} + source.{name} AS {ts})"
        elif kind == "sum":
            exprs[name] = _add(name, ts)
        elif kind == "avg":
            # fold the state, re-derive the exposed value from the
            # FOLDED state (cnt never NULL: count deltas are 0/1 sums)
            s, c = name + AVG_SUM, name + AVG_CNT
            sum_ts = tgt_types[s].simpleString()
            cnt_fold = f"(target.{c} + source.{c})"
            sum_fold = _add(s, sum_ts)
            exprs[s] = sum_fold
            exprs[c] = f"CAST({cnt_fold} AS {tgt_types[c].simpleString()})"
            exprs[name] = (
                f"CAST(CASE WHEN {cnt_fold} > 0 THEN "
                f"{sum_fold} / {cnt_fold} END AS {ts})"
            )
        elif kind == "min":
            # least/greatest skip NULLs: a range with no surviving adds
            # for the group folds to the stored extreme unchanged (the
            # dirty test already routed invalidating deletes away from
            # this merge)
            exprs[name] = (
                f"CAST(least(target.{name}, source.{name}) AS {ts})"
            )
        else:
            exprs[name] = (
                f"CAST(greatest(target.{name}, source.{name}) AS {ts})"
            )
    return exprs


def _net_changes(feed: DataFrame) -> DataFrame:
    """One TERMINAL event per row id across the range: the latest
    commit wins; within a commit the postimage/insert/delete outranks
    the update preimage. Shuffle ∝ change rows (the feed is already
    ∝ changed files)."""
    ord_col = F.when(
        F.col("_change_type") == "update_preimage", F.lit(0)
    ).otherwise(F.lit(1))
    w = Window.partitionBy("_row_id").orderBy(
        F.col("_commit_version").desc(), F.col("__mv_ord").desc()
    )
    return (
        feed.withColumn("__mv_ord", ord_col)
        .withColumn("__mv_rn", F.row_number().over(w))
        .where(F.col("__mv_rn") == 1)
        .drop("__mv_rn", "__mv_ord")
    )


def _dirty_groups(deltas, view, view_v, keys, minmax):
    """The groups whose stored min/max a removal MAY have invalidated:
    for each min (max symmetric), the group is dirty iff some removed
    value ties-or-undercuts the CANDIDATE extreme — least of the stored
    value and the range's added values. If every removal sits strictly
    above the candidate, the candidate is witnessed by a surviving row
    and folds cleanly; ties recompute conservatively (the removed row
    may have been the only witness). Joins the touched groups against
    the view's stored extremes only — cost ∝ view ∩ changed groups."""
    state = view.read(version_as_of=view_v).select(
        *keys, *[F.col(n).alias(f"__tgt_{n}") for n, _ in minmax]
    )
    joined = deltas.join(state, keys, "left")
    cond = F.lit(False)
    for n, k in minmax:
        d = F.col(n + _DEL_SUFFIX)
        if k == "min":
            cand = F.least(F.col(f"__tgt_{n}"), F.col(n))
            cond = cond | (d.isNotNull() & (cand.isNull() | (d <= cand)))
        else:
            cand = F.greatest(F.col(f"__tgt_{n}"), F.col(n))
            cond = cond | (d.isNotNull() & (cand.isNull() | (d >= cand)))
    return joined.where(cond).select(*keys)


def _scoped_snapshot(snap: DataFrame, dirty, n_dirty: int, keys):
    """The source rows belonging to the dirty groups. A small dirty set
    (the steady state — most refreshes have zero) becomes literal
    equality predicates pushed into the parquet scan (footer-stats
    row-group pruning); a large one broadcast-semi-joins instead of
    materializing a giant IN list in the plan."""
    if n_dirty <= 64:
        rows = dirty.collect()
        if len(keys) == 1:
            pred = F.col(keys[0]).isin([r[keys[0]] for r in rows])
        else:
            pred = F.lit(False)
            for r in rows:
                clause = F.lit(True)
                for k in keys:
                    clause = clause & (F.col(k) == F.lit(r[k]))
                pred = pred | clause
        return snap.where(pred)
    return snap.join(F.broadcast(dirty), keys, "semi")


def _apply_agg_deltas(
    spec: MaterializeSpec,
    src,
    src_v: int,
    view,
    view_v: int,
    feed: DataFrame,
) -> MaterializeResult:
    """Fold one feed range into an aggregate view: sign-weighted group
    deltas, ONE group-keyed merge for the CLEAN groups (matched rows
    ADD/least/greatest via the fold expressions, unseen groups insert
    their delta as the opening balance), then sweep groups whose
    live-row count reached zero. Groups whose min/max a removal may
    have invalidated are recomputed EXACTLY from the source snapshot —
    scoped to those groups only — and replace their view rows
    wholesale (vanished groups delete). ``upserts`` reports all groups
    refreshed; ``recomputed`` the dirty subset."""
    # Spark widens sum types by input precision, and the delta's
    # sign-multiply widens differently than the build's plain sum — cast
    # each delta column to the VIEW's stored type (lossless: a delta
    # over a subset is bounded by the full sum's own headroom)
    tgt = {
        f.name: f.dataType
        for f in view.read(version_as_of=view_v).schema.fields
    }
    keys = list(spec.group_by)
    minmax = [
        (n, k)
        for n, k, _ in _parse_aggregates(spec)
        if k in ("min", "max")
    ]
    del_cols = [n + _DEL_SUFFIX for n, _ in minmax]
    deltas = _agg_deltas(feed, spec)
    deltas = deltas.select(
        *[
            F.col(c).cast(tgt[c]).alias(c) if c in tgt else F.col(c)
            for c in deltas.columns
        ]
    ).persist()
    dirty = None
    try:
        if deltas.isEmpty():
            # layout-only (or filtered-away) range: bookmark only
            nv = view.set_properties(
                {"vt.mv.sourceVersion": str(src_v)}
            )
            return MaterializeResult(
                view_path=spec.target,
                mode="bookmark",
                source_version=src_v,
                view_version=nv,
            )
        n_dirty = 0
        fold = deltas.drop(*del_cols)
        if minmax:
            dirty = _dirty_groups(
                deltas, view, view_v, keys, minmax
            ).persist()
            n_dirty = dirty.count()
            if n_dirty:
                fold = fold.join(dirty, keys, "left_anti")
        n_clean = fold.count()
        if n_clean:
            view.merge(
                fold,
                on=keys,
                when_matched="update",
                when_not_matched="insert",
                when_matched_set=_agg_fold_exprs(spec, tgt),
            )
            # a group whose rows all left the filtered source leaves
            # the view (its sums read 0/NULL but COUNT(*)-semantics say
            # the group row must not exist); file-pruned like any delete
            view.delete(f"{MV_COUNT} = 0")
        if n_dirty:
            scoped = _scoped_snapshot(
                src.read(version_as_of=src_v), dirty, n_dirty, keys
            )
            exact = _agg_transform(scoped, spec)
            exact = exact.select(
                *[F.col(c).cast(tgt[c]).alias(c) for c in exact.columns]
            ).persist()
            try:
                view.merge(
                    exact,
                    on=keys,
                    when_matched="update",
                    when_not_matched="insert",
                )
                # dirty groups the recompute returned NO row for lost
                # their last filtered row in this range — delete them
                gone = dirty.join(exact.select(*keys), keys, "left_anti")
                pad = [
                    F.lit(None).cast(t).alias(c)
                    for c, t in tgt.items()
                    if c not in keys
                ]
                gone = gone.select(*[F.col(k) for k in keys], *pad)
                if not gone.isEmpty():
                    view.merge(
                        gone,
                        on=keys,
                        when_matched="delete",
                        when_not_matched=None,
                    )
            finally:
                exact.unpersist()
    finally:
        deltas.unpersist()
        if dirty is not None:
            dirty.unpersist()
    nv = view.set_properties({"vt.mv.sourceVersion": str(src_v)})
    return MaterializeResult(
        view_path=spec.target,
        mode="incremental",
        source_version=src_v,
        view_version=nv,
        upserts=n_clean + n_dirty,
        recomputed=n_dirty,
    )


def _merge_drop_ids(view, view_v: int, ids: DataFrame) -> None:
    """merge-delete the given ``_src_row_id`` frame from the view. The
    merge surface wants a full-width source; a matched-DELETE never
    reads the payload, so the non-key columns ride as typed NULLs
    (schema from ``view_v`` — data merges never change it)."""
    pad = [
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in view.read(version_as_of=view_v).schema.fields
        if f.name != SRC_ROW_ID
    ]
    view.merge(
        ids.select(F.col(SRC_ROW_ID), *pad),
        on=[SRC_ROW_ID],
        when_matched="delete",
        when_not_matched=None,
    )


def _apply_join_deltas(
    spec: MaterializeSpec,
    src,
    src_v: int,
    last: int,
    dim,
    dim_v: int,
    dim_last: int,
    view,
    view_v: int,
) -> MaterializeResult | None:
    """Two-phase incremental refresh of an enrichment view, each phase
    computing FINAL-state rows against the dimension at ``dim_v`` so
    overlap converges (the merges are id-keyed and idempotent):

    * phase A — source DML: net the source CDF to one terminal event
      per row id, join the survivors against the current dimension,
      upsert by id, drop net-deleted / filtered-out / inner-unmatched
      ids. Cost ∝ source changes.
    * phase B — dimension DML: distinct join keys touched by the
      dimension CDF (pre+postimages, so a key rewrite hits both
      sides), re-derive every source row holding one of them from the
      source snapshot scoped to those keys (literal pushed predicates
      for small key sets, broadcast semi-join beyond), upsert the
      survivors, drop the rest. Cost ∝ source rows under affected
      keys, never ∝ source.

    Both phases re-check dimension key uniqueness SCOPED to the keys
    they join (∝ affected keys). Returns None when either feed cannot
    serve its range row-level — the caller rebuilds."""
    from as_etl_storage_spark.writers.versioned import (
        VersionedTableError,
    )

    keys = list(spec.join.on)
    dim_now = dim.read(version_as_of=dim_v)
    n_del = n_up = n_keys = 0
    did_work = False

    if src_v > last:  # ---- phase A: source DML, id-keyed
        try:
            feed = src.change_feed(
                from_version=last, to_version=src_v, with_row_ids=True
            )
        except VersionedTableError:
            return None
        if not feed.where(F.col("_row_id").isNull()).isEmpty():
            return None
        net = _net_changes(feed).persist()
        try:
            if not net.isEmpty():
                did_work = True
                base = net.where(
                    F.col("_change_type") != "delete"
                ).drop("_change_type", "_commit_version")
                _assert_unique_dim_keys(
                    dim_now, spec, scope=base.select(*keys).distinct()
                )
                survivors = _joined(base, dim_now, spec).persist()
                try:
                    n_up_a = survivors.count()
                    drops = (
                        net.select(F.col("_row_id").alias(SRC_ROW_ID))
                        .join(
                            survivors.select(SRC_ROW_ID),
                            SRC_ROW_ID,
                            "left_anti",
                        )
                        .persist()
                    )
                    try:
                        n_del_a = drops.count()
                        if n_del_a:
                            _merge_drop_ids(view, view_v, drops)
                        if n_up_a:
                            view.merge(
                                survivors,
                                on=[SRC_ROW_ID],
                                when_matched="update",
                                when_not_matched="insert",
                            )
                        n_del += n_del_a
                        n_up += n_up_a
                    finally:
                        drops.unpersist()
                finally:
                    survivors.unpersist()
        finally:
            net.unpersist()

    if dim_v > dim_last:  # ---- phase B: dim DML, key-scoped recompute
        try:
            dfeed = dim.change_feed(
                from_version=dim_last, to_version=dim_v
            )
        except VersionedTableError:
            return None
        aff = (
            _dim_projected(
                dfeed.drop("_change_type", "_commit_version"), spec
            )
            .select(*keys)
            .distinct()
        )
        for k in keys:
            # a NULL key never equi-matches any source row
            aff = aff.where(F.col(k).isNotNull())
        aff = aff.persist()
        try:
            n_keys = aff.count()
            if n_keys:
                did_work = True
                _assert_unique_dim_keys(dim_now, spec, scope=aff)
                scoped = _scoped_snapshot(
                    src.read(version_as_of=src_v, with_row_ids=True),
                    aff,
                    n_keys,
                    keys,
                ).persist()
                try:
                    recomputed = _joined(scoped, dim_now, spec).persist()
                    try:
                        n_up_b = recomputed.count()
                        drops_b = (
                            scoped.select(
                                F.col("_row_id").alias(SRC_ROW_ID)
                            )
                            .join(
                                recomputed.select(SRC_ROW_ID),
                                SRC_ROW_ID,
                                "left_anti",
                            )
                            .persist()
                        )
                        try:
                            n_del_b = drops_b.count()
                            if n_del_b:
                                _merge_drop_ids(view, view_v, drops_b)
                            if n_up_b:
                                view.merge(
                                    recomputed,
                                    on=[SRC_ROW_ID],
                                    when_matched="update",
                                    when_not_matched="insert",
                                )
                            n_del += n_del_b
                            n_up += n_up_b
                        finally:
                            drops_b.unpersist()
                    finally:
                        recomputed.unpersist()
                finally:
                    scoped.unpersist()
        finally:
            aff.unpersist()

    nv = view.set_properties(
        {
            "vt.mv.sourceVersion": str(src_v),
            "vt.mv.dimVersion": str(dim_v),
        }
    )
    if not did_work:
        return MaterializeResult(
            view_path=spec.target,
            mode="bookmark",
            source_version=src_v,
            view_version=nv,
        )
    return MaterializeResult(
        view_path=spec.target,
        mode="incremental",
        source_version=src_v,
        view_version=nv,
        deletes=n_del,
        upserts=n_up,
        recomputed=n_keys,
    )


def run_materialize(
    spark: SparkSession, spec: MaterializeSpec
) -> MaterializeResult:
    """Execute one materialize job: create the view on first run,
    bookmark-only on layout-only source activity, id-keyed incremental
    apply otherwise; full rebuild when the CDF cannot serve the range,
    the definition changed, or the spec forces it."""
    from as_etl_storage_spark.writers.versioned import (
        VersionedTable,
        VersionedTableError,
    )

    src_path = os.path.join(
        spec.connection.url, spec.connection.table.name
    )
    src = VersionedTable(spark, src_path)
    src_v = src.latest_version()
    if src_v is None:
        raise SpecError(
            f"materialize source is not a versioned table (no log): "
            f"{src_path}"
        )
    agg_mode = bool(spec.group_by)
    if not agg_mode and not src._row_tracked_at(src_v):
        # the AGGREGATE form needs no ids: groups key on their own
        # columns and deltas are sign-weighted — the CDF alone suffices
        raise SpecError(
            f"materialize needs row tracking on the source (the view "
            f"keys on the stable row id); run enable_row_tracking() on "
            f"{src_path} first — or declare groupBy+aggregates, which "
            f"key on the group columns instead"
        )
    dim = dim_v = None
    if spec.join is not None:
        dim = VersionedTable(
            spark, _dim_path(src_path, spec), log_store=src._store
        )
        dim_v = dim.latest_version()
        if dim_v is None:
            raise SpecError(
                f"materialize join dimension is not a versioned table "
                f"(no log): {_dim_path(src_path, spec)}"
            )
    fp = _fingerprint(src_path, spec)
    empty_src = spark.createDataFrame(
        [],
        src.read(version_as_of=src_v, with_row_ids=not agg_mode).schema,
    )
    if agg_mode:
        # parse (and refuse non-abelian specs), then analyze the full
        # definition against the source schema — zero-row, zero-job
        m = _FORBIDDEN_EXPR.search(spec.where or "")
        if m:
            raise SpecError(
                f"materialize definitions must be deterministic; "
                f"{m.group(0)!r} in the where clause is not"
            )
        try:
            probe = _agg_transform(empty_src, spec)
            probe._jdf.queryExecution().analyzed()
            expected_schema = probe.schema
        except SpecError:
            raise
        except Exception as exc:
            raise SpecError(
                f"materialize aggregate definition does not analyze "
                f"against the source schema: {exc}"
            ) from None
    elif spec.join is not None:
        expected_schema = _check_join_form(
            spark,
            empty_src,
            spark.createDataFrame(
                [], dim.read(version_as_of=dim_v).schema
            ),
            spec,
        )
    else:
        expected_schema = _check_row_level(empty_src, spec)
    view = VersionedTable(spark, spec.target, log_store=src._store)
    view_v = view.latest_version()

    if spec.check:  # status only: zero jobs, zero commits
        needs, behind = "incremental", None
        if view_v is None:
            needs = "rebuild"
        else:
            props = view._properties_at(view_v)
            vschema = {
                (f.name, f.dataType)
                for f in view.read(version_as_of=view_v).schema.fields
            }
            if (
                spec.full_refresh
                or props.get("vt.mv.fingerprint") != fp
                or {
                    (f.name, f.dataType)
                    for f in expected_schema.fields
                }
                != vschema
            ):
                needs = "rebuild"
            else:
                last = int(props["vt.mv.sourceVersion"])
                if src_v < last:
                    needs = "rebuild"
                else:
                    behind = src_v - last
                    if spec.join is not None:
                        dim_last = int(props["vt.mv.dimVersion"])
                        if dim_v < dim_last:
                            needs, behind = "rebuild", None
                        else:
                            behind += dim_v - dim_last
                    if behind == 0:
                        needs = "none"
        return MaterializeResult(
            view_path=spec.target,
            mode="status",
            source_version=src_v,
            view_version=view_v,
            needs=needs,
            behind=behind,
        )

    def _rebuild(mode: str) -> MaterializeResult:
        # the only table-sized pass: snapshot at src_v, transformed,
        # last-writer-wins into the view, bookmark in a trailing
        # metadata commit (a crash between them leaves no fingerprint
        # match, so the next run rebuilds — idempotent)
        snap = src.read(version_as_of=src_v, with_row_ids=not agg_mode)
        if agg_mode:
            full = _agg_transform(snap, spec)
        elif spec.join is not None:
            dim_snap = dim.read(version_as_of=dim_v)
            _assert_unique_dim_keys(dim_snap, spec)
            full = _joined(snap, dim_snap, spec)
        else:
            full = _transform(snap, spec)
        # a rebuild re-baselines the DEFINITION's shape wholesale —
        # additions, removals and retypes alike (Delta's overwriteSchema)
        view.overwrite(full, overwrite_schema=True)
        props = {
            "vt.mv.source": src_path,
            "vt.mv.sourceVersion": str(src_v),
            "vt.mv.fingerprint": fp,
        }
        if spec.join is not None:
            props["vt.mv.dimVersion"] = str(dim_v)
        nv = view.set_properties(props)
        return MaterializeResult(
            view_path=spec.target,
            mode=mode,
            source_version=src_v,
            view_version=nv,
        )

    if view_v is None:
        return _rebuild("initial")
    props = view._properties_at(view_v)
    if spec.full_refresh or props.get("vt.mv.fingerprint") != fp:
        return _rebuild("full")
    if {(f.name, f.dataType) for f in expected_schema.fields} != {
        (f.name, f.dataType)
        for f in view.read(version_as_of=view_v).schema.fields
    }:
        # the DEFINITION is unchanged but its SHAPE drifted — a
        # default-select view whose source (or dimension) evolved, or
        # a type widening. The incremental merges would refuse the new
        # column; re-baseline instead (schema-only comparison, no jobs)
        return _rebuild("full")
    last = int(props["vt.mv.sourceVersion"])
    if src_v < last:
        # the source was restored/vacuumed below the bookmark — the
        # feed range would be backwards; only a rebuild is sound
        return _rebuild("full")
    if spec.join is not None:
        dim_last = int(props["vt.mv.dimVersion"])
        if dim_v < dim_last:
            return _rebuild("full")
        if src_v == last and dim_v == dim_last:
            return MaterializeResult(
                view_path=spec.target,
                mode="noop",
                source_version=src_v,
                view_version=view_v,
            )
        out = _apply_join_deltas(
            spec, src, src_v, last, dim, dim_v, dim_last, view, view_v
        )
        return out if out is not None else _rebuild("full")
    if src_v == last:
        return MaterializeResult(
            view_path=spec.target,
            mode="noop",
            source_version=src_v,
            view_version=view_v,
        )
    try:
        feed = src.change_feed(
            from_version=last, to_version=src_v, with_row_ids=not agg_mode
        )
    except VersionedTableError:
        # the CDF's documented "full re-read required" contract:
        # overwrite/restore in range, or the history was vacuumed
        return _rebuild("full")
    if agg_mode:
        return _apply_agg_deltas(spec, src, src_v, view, view_v, feed)
    if not feed.where(F.col("_row_id").isNull()).isEmpty():
        # change rows from versions before enablement carry NULL ids —
        # unkeyable; one rebuild re-baselines onto dense ids
        return _rebuild("full")
    net = _net_changes(feed).persist()
    try:
        if net.isEmpty():
            # layout-only versions in range: move the bookmark in ONE
            # metadata commit — zero data files read or written
            nv = view.set_properties(
                {"vt.mv.sourceVersion": str(src_v)}
            )
            return MaterializeResult(
                view_path=spec.target,
                mode="bookmark",
                source_version=src_v,
                view_version=nv,
            )
        survivors = _transform(
            net.where(F.col("_change_type") != "delete").drop(
                "_change_type", "_commit_version"
            ),
            spec,
        ).persist()
        try:
            n_up = survivors.count()
            # ids whose terminal state leaves the view: net deletes,
            # plus updated rows the where-filter now excludes. The
            # merge surface wants a full-width source; a matched-DELETE
            # never reads the payload, so the non-key columns ride as
            # typed NULLs.
            pad = [
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in view.read(version_as_of=view_v).schema.fields
                if f.name != SRC_ROW_ID
            ]
            drops = (
                net.select(F.col("_row_id").alias(SRC_ROW_ID))
                .join(survivors.select(SRC_ROW_ID), SRC_ROW_ID, "left_anti")
                .select(F.col(SRC_ROW_ID), *pad)
                .persist()
            )
            try:
                n_del = drops.count()
                view_version = view_v
                if n_del:
                    v = view.merge(
                        drops,
                        on=[SRC_ROW_ID],
                        when_matched="delete",
                        when_not_matched=None,
                    )
                    view_version = v if v is not None else view_version
                if n_up:
                    v = view.merge(
                        survivors,
                        on=[SRC_ROW_ID],
                        when_matched="update",
                        when_not_matched="insert",
                    )
                    view_version = v if v is not None else view_version
            finally:
                drops.unpersist()
        finally:
            survivors.unpersist()
    finally:
        net.unpersist()
    nv = view.set_properties({"vt.mv.sourceVersion": str(src_v)})
    return MaterializeResult(
        view_path=spec.target,
        mode="incremental",
        source_version=src_v,
        view_version=nv,
        deletes=n_del,
        upserts=n_up,
    )
