"""Constraint tree -> DataFrame plan: the read path.

The reference evaluates reads with a budgeted nested-loop interpreter
over per-constraint iterator ANDs (ref
graphd/graphd-constraint-iterator.c:1723-2030, production loop
graphd/graphd-read-set.c:21-35).  Here the same semantics compile to
one declarative DataFrame plan and Catalyst/Tungsten choose the
physical strategy:

- intrinsic predicates (§2.3 of SURVEY.md) become native column
  filters that push down to the Parquet scan;
- parent<->child linkage becomes hash equi-joins (semi/anti/outer
  based on count bounds) instead of per-candidate recursion;
- "newest" generation matching becomes one window over ``lineage``
  shared by every constraint node (the precomputable ``current``
  view);
- per-parent contents become ``collect_list(struct)`` ordered by a
  row_number window on the same partitioning key as the groupBy (one
  shuffle, not two — AQE sees identical partitioning);
- sorts order by comparator *sort keys* (order-preserving binary
  encodings, see comparators.py), so a 100 TB sort-by-value is a
  native Tungsten binary sort;
- root pagination is orderBy().limit(start+pagesize) — Spark's
  TakeOrderedAndProject — never a global single-partition window.

Driver-side state (the store) is used only to bind literals the
reference also binds pre-plan: type names to typeguids
(graphd-read.c:36-135), guid~= lineages, next= pointers, asof
horizons.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Optional

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphd_spark.comparators import fuzzy_key, sort_key_column
from graphd_spark.gql.ir import (
    Constraint,
    DONTCARE,
    FALSE,
    LINKAGES,
    Pattern,
    TRUE,
)
from graphd_spark.model import guid_serial, ts_from_string
from graphd_spark.pattern import (
    GraphdError,
    default_read_pattern,
    pattern_shows_contents,
)

#: primitive fields carried in every element struct
PRIM_ELEM_FIELDS = [
    "guid", "typeguid", "left", "right", "scope", "prev", "name",
    "datatype", "value", "live", "archival", "timestamp", "generation",
]

DEFAULT_PAGESIZE = 1024  # ref graphd/graphd-sort.c:21-22


@dataclass
class SubPlan:
    mode: str  # 'anti' | 'semi' | 'skip' | 'agg'
    plan: "SetPlan"
    cnt_col: Optional[str] = None
    arr_col: Optional[str] = None


@dataclass
class SetPlan:
    con: Constraint
    sub_plans: list = dfield(default_factory=list)
    var_cols: dict = dfield(default_factory=dict)   # '$name' -> column
    var_kinds: dict = dfield(default_factory=dict)  # '$name' -> pattern kind
    cursor: Optional[str] = None


_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


class Compiler:
    def __init__(self, spark, store, types, asof: Optional[str] = None):
        self.spark = spark
        self.store = store
        self.types = types
        df = store.to_df(spark)
        if asof is not None:
            df = df.filter(F.col("id") <= self._asof_horizon(asof))
        # the generation index as a column: one lineage window shared by
        # every constraint node (ref libpdb/pdb-generation; this is the
        # precomputable `current` view at scale)
        self.base = df.withColumn(
            "__maxgen",
            F.max("generation").over(Window.partitionBy("lineage")),
        )
        self._n = 0

    # -- asof -------------------------------------------------------------

    def _asof_horizon(self, asof: str) -> int:
        """asof= binds to an id bound (ref graphd-read.c:203-486)."""
        t = asof.strip().lower()
        if len(t) == 32 and all(c in "0123456789abcdef" for c in t):
            return guid_serial(t)
        try:
            ts = ts_from_string(t, round_up=True)
        except ValueError:
            raise GraphdError("SYNTAX", f"cannot parse asof value {asof!r}")
        # timestamps are monotone with ids: find the last id at/under ts
        rows = self.store.rows
        lo, hi = 0, len(rows) - 1
        ans = -1
        while lo <= hi:
            mid = (lo + hi) // 2
            if rows[mid].timestamp <= ts:
                ans = mid
                lo = mid + 1
            else:
                hi = mid - 1
        return ans

    # -- public API -------------------------------------------------------

    def run(self, con: Constraint):
        """Compile + execute the root set.

        Returns (plan, rows, total) — rows already sorted, offset and
        paginated; total is exact when the pattern needs it, else the
        collected length (sufficient for the EMPTY check).
        """
        plan, df = self._compile(con)
        order = self._sort_exprs(con, plan)
        pagesize = (
            con.pagesize if con.pagesize is not None else DEFAULT_PAGESIZE
        )
        limit = con.start + pagesize
        elem = self._elem_struct(con, plan)
        collected = [
            r["__e"]
            for r in df.orderBy(*order)
            .limit(limit)
            .select(elem.alias("__e"))
            .collect()
        ]
        pat = con.result if con.result is not None else default_read_pattern()
        need_total = any(
            p.kind in ("count", "estimate", "estimate-count")
            for p in pat.walk()
        )
        if need_total and len(collected) >= limit:
            cdf = df
            if con.countlimit is not None:
                cdf = cdf.limit(con.countlimit)
            total = cdf.count()
        else:
            total = len(collected)
        count_min = con.count_min if con.count_min is not None else 1
        if total < count_min:
            raise GraphdError("EMPTY", "not found")
        return plan, collected[con.start :], total

    # -- recursive compilation --------------------------------------------

    def _compile(self, con: Constraint, exists_only: bool = False):
        df = self.base
        pred = self._intrinsic_pred(con)
        if pred is not None:
            df = df.filter(pred)
        plan = SetPlan(con=con)
        for chain in con.or_chains:
            df = self._apply_or_chain(df, chain)
        for sub in con.subs:
            df, sp = self._attach_sub(df, con, sub, exists_only)
            plan.sub_plans.append(sp)
            if sp.mode == "agg":
                # sample child variables into parent columns (pat_sample)
                for var, vcol in sp.plan.var_cols.items():
                    self._n += 1
                    newcol = f"v{self._n}"
                    df = df.withColumn(
                        newcol,
                        F.try_element_at(F.col(sp.arr_col), F.lit(1))[vcol],
                    )
                    plan.var_cols[var] = newcol
                    plan.var_kinds[var] = sp.plan.var_kinds[var]
        for var, pat in con.assignments:
            expr = self._var_expr(pat)
            self._n += 1
            vcol = f"v{self._n}"
            df = df.withColumn(vcol, expr)
            plan.var_cols[var] = vcol
            plan.var_kinds[var] = pat.kind
        return plan, df

    def _var_expr(self, pat: Pattern):
        k = pat.kind
        if k in ("value", "name", "guid", "left", "right", "typeguid",
                 "scope", "timestamp", "datatype", "valuetype",
                 "generation", "live", "archival", "previous"):
            col = {
                "previous": "prev",
                "valuetype": "datatype",
            }.get(k, k)
            return F.col(col)
        if k == "literal":
            return F.lit(pat.literal)
        raise GraphdError(
            "SEMANTICS", f"unsupported variable pattern {k!r}"
        )

    # -- subconstraints ----------------------------------------------------

    def _attach_sub(self, df, parent: Constraint, sub: Constraint,
                    exists_only: bool):
        if sub.linkage is None:
            raise GraphdError(
                "SEMANTICS", "subconstraint is not connected to its parent"
            )
        kind, lk = sub.linkage
        if kind == "my":
            child_key = F.col(lk)      # child.lk == parent.guid
            parent_key = F.col("guid")
        else:
            child_key = F.col("guid")  # parent.lk == child.guid
            parent_key = F.col(lk)

        count_min = sub.count_min if sub.count_min is not None else 1
        parent_pat = (
            parent.result
            if parent.result is not None
            else default_read_pattern()
        )
        need_payload = not exists_only and (
            pattern_shows_contents(parent_pat, parent)
            or bool(sub.assignments)
            or self._has_deep_assignments(sub)
        )
        counting = (
            (sub.count_eq not in (None, 0))
            or sub.count_max is not None
            or count_min > 1
        )

        sub_plan, child_df = self._compile(sub, exists_only=not need_payload)
        child_df = child_df.filter(child_key.isNotNull())

        if not need_payload and not counting:
            keys = child_df.select(child_key.alias("__k")).distinct()
            if sub.count_eq == 0:
                out = df.join(
                    keys, parent_key == F.col("__k"), "left_anti"
                )
                return out, SubPlan("anti", sub_plan)
            if count_min >= 1:
                out = df.join(
                    keys, parent_key == F.col("__k"), "left_semi"
                )
                return out, SubPlan("semi", sub_plan)
            return df, SubPlan("skip", sub_plan)  # pure optional filter

        # aggregation path: per-parent ordered contents + counts.
        self._n += 1
        tag = self._n
        cnt, arr = f"n{tag}", f"c{tag}"
        elem = self._elem_struct(sub, sub_plan)
        order = self._sort_exprs(sub, sub_plan)
        kdf = (
            child_df.withColumn("__k", child_key)
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__k").orderBy(*order)
                ),
            )
            .withColumn("__e", elem)
            .select("__k", "__rn", "__e")
        )
        agg = kdf.groupBy("__k").agg(
            F.count(F.lit(1)).alias(cnt),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__rn").alias("o"), F.col("__e").alias("e")
                        )
                    )
                ),
                lambda x: x["e"],
            ).alias(arr),
        )
        rps = sub.resultpagesize
        if rps is None:
            rps = (
                sub.pagesize
                if sub.pagesize is not None
                else DEFAULT_PAGESIZE
            )
        agg = agg.withColumn(arr, F.slice(F.col(arr), 1, rps))

        outer = count_min == 0 or sub.count_eq == 0
        out = df.join(
            agg,
            parent_key == agg["__k"],
            "left" if outer else "inner",
        ).drop("__k")
        cnt_eff = F.coalesce(F.col(cnt), F.lit(0))
        if sub.count_eq is not None:
            out = out.filter(cnt_eff == sub.count_eq)
        if count_min > 1:
            out = out.filter(cnt_eff >= count_min)
        if sub.count_max is not None:
            out = out.filter(cnt_eff <= sub.count_max)
        return out, SubPlan("agg", sub_plan, cnt_col=cnt, arr_col=arr)

    def _has_deep_assignments(self, con: Constraint) -> bool:
        return any(bool(c.assignments) for c in con.walk())

    # -- or-chains ---------------------------------------------------------

    def _apply_or_chain(self, df, chain):
        """A primitive matches if any branch accepts it.

        Pure-intrinsic branches fold into one disjunctive filter (no
        shuffle); branches with subconstraints fall back to a union of
        semi-join id sets.  '||' short-circuit affects evaluation
        preference, not membership, so both operators compile alike.
        """
        if all(self._branch_is_intrinsic(b) for b in chain):
            pred = None
            for b in chain:
                p = self._intrinsic_pred(b)
                if p is None:
                    return df  # empty branch: chain always true
                pred = p if pred is None else (pred | p)
            return df.filter(pred) if pred is not None else df
        matched = None
        for b in chain:
            bdf = df
            p = self._intrinsic_pred(b)
            if p is not None:
                bdf = bdf.filter(p)
            for sub in b.subs:
                bdf, _ = self._attach_sub(bdf, b, sub, exists_only=True)
            ids = bdf.select("id")
            matched = ids if matched is None else matched.union(ids)
        return df.join(
            matched.distinct().withColumnRenamed("id", "__oid"),
            F.col("id") == F.col("__oid"),
            "left_semi",
        )

    def _branch_is_intrinsic(self, b: Constraint) -> bool:
        return not b.subs and not b.or_chains and not b.assignments

    # -- element structs ---------------------------------------------------

    def _elem_struct(self, con: Constraint, plan: SetPlan):
        fields = [F.col(f) for f in PRIM_ELEM_FIELDS]
        for sp in plan.sub_plans:
            if sp.mode == "agg":
                fields.append(F.col(sp.cnt_col))
                fields.append(F.col(sp.arr_col))
        for var, col in plan.var_cols.items():
            fields.append(F.col(col))
        return F.struct(*fields)

    # -- sorting -----------------------------------------------------------

    def _sort_exprs(self, con: Constraint, plan: SetPlan):
        exprs = []
        keys = con.sort or []
        for i, sk in enumerate(keys):
            comp = None
            if con.sort_comparators:
                if i < len(con.sort_comparators):
                    comp = con.sort_comparators[i]
                else:
                    comp = con.sort_comparators[-1]
            if comp is None:
                comp = con.comparator or "default"
            col = self._sort_key_col(sk.pattern, con, plan, comp)
            if col is None:
                continue
            # graphd sorts SQL-null values last ascending
            # (graph_fuzzycmp: NULL compares greater than any string)
            exprs.append(
                col.desc_nulls_first() if sk.descending else
                col.asc_nulls_last()
            )
        exprs.append(F.col("id").asc())
        return exprs

    def _sort_key_col(self, pat: Pattern, con: Constraint, plan: SetPlan,
                      comparator: str):
        k = pat.kind
        if k in ("value", "name"):
            return sort_key_column(F.col(k), comparator)
        if k == "guid":
            return F.col("id")
        if k in ("timestamp", "generation", "datatype"):
            return F.col(k)
        if k == "valuetype":
            return F.col("datatype")
        if k in ("left", "right", "typeguid", "scope"):
            return F.col(k)
        if k == "type":
            return F.col("typeguid")
        if k in ("live", "archival"):
            return F.col(k)
        if k == "variable":
            vcol = plan.var_cols.get(pat.var)
            if vcol is None:
                return None
            if plan.var_kinds.get(pat.var) in ("value", "name", "type"):
                return sort_key_column(F.col(vcol), comparator)
            return F.col(vcol)
        if k == "literal":
            return F.lit(pat.literal)
        if k == "list" and pat.children:
            return self._sort_key_col(pat.children[0], con, plan, comparator)
        raise GraphdError("SEMANTICS", f"unsupported sort key {k!r}")

    # -- intrinsic predicates ----------------------------------------------

    def _intrinsic_pred(self, con: Constraint):
        conds = []
        if con.false:
            return F.lit(False)
        if con.live == TRUE:
            conds.append(F.col("live"))
        elif con.live == FALSE:
            conds.append(~F.col("live"))
        if con.archival == TRUE:
            conds.append(F.col("archival"))
        elif con.archival == FALSE:
            conds.append(~F.col("archival"))
        if con.meta == "node":
            conds.append(F.col("left").isNull() & F.col("right").isNull())
        elif con.meta in ("to", "from"):
            conds.append(
                F.col("left").isNotNull() | F.col("right").isNotNull()
            )

        for gc in con.guid:
            conds.append(self._guid_cond(F.col("guid"), gc, nullable=False))
        for lk, gcs in con.links.items():
            for gc in gcs:
                conds.append(self._guid_cond(F.col(lk), gc, nullable=True))
        for gc in con.prev:
            conds.append(self._guid_cond(F.col("prev"), gc, nullable=True))
        for gc in con.next:
            conds.append(self._next_cond(gc))

        for sc in con.type_strcons:
            conds.append(self._type_cond(sc))
        for sc in con.name_strcons:
            conds.append(
                self._string_cond(F.col("name"), sc, con.comparator)
            )
        for sc in con.value_strcons:
            conds.append(
                self._string_cond(F.col("value"), sc, con.comparator)
            )

        if con.valuetype is not None:
            conds.append(F.col("datatype") == con.valuetype)

        for tc in con.timestamps:
            try:
                lo = ts_from_string(tc.text)
                hi = ts_from_string(tc.text, round_up=True)
            except ValueError:
                raise GraphdError(
                    "SYNTAX", f"cannot parse timestamp {tc.text!r}"
                )
            c = F.col("timestamp")
            conds.append(
                {
                    "=": (c >= lo) & (c <= hi),
                    "!=": (c < lo) | (c > hi),
                    "<": c < lo,
                    "<=": c <= hi,
                    ">": c > hi,
                    ">=": c >= lo,
                }[tc.op]
            )

        # generation: default newest=0 — only current versions match
        # (ref graphd/graphd.h:458-472)
        dist = F.col("__maxgen") - F.col("generation")
        if con.gens:
            for g in con.gens:
                target = dist if g.field == "newest" else F.col("generation")
                conds.append(_OPS[g.op](target, F.lit(g.n)))
        else:
            conds.append(dist == 0)

        if not conds:
            return None
        pred = conds[0]
        for c in conds[1:]:
            pred = pred & c
        return pred

    def _guid_cond(self, col, gc, nullable: bool):
        if gc.op == "~=":
            # lineage match (ref graphd-guid-constraint.c): any version
            # in the lineage of each listed GUID
            guids: list[str] = []
            for g in gc.guids:
                if g is None:
                    continue
                p = self.store.get(g)
                if p is not None:
                    guids.extend(self.store.lineage_members(p.lineage))
            if not guids:
                return F.lit(False)
            return col.isin(guids)
        nonnull = [g for g in gc.guids if g is not None]
        has_null = any(g is None for g in gc.guids)
        if gc.op == "=":
            parts = []
            if nonnull:
                parts.append(col.isin(nonnull))
            if has_null:
                parts.append(col.isNull())
            if not parts:
                return F.lit(False)
            pred = parts[0]
            for p in parts[1:]:
                pred = pred | p
            return pred
        # '!=': the linkage must exist and differ (null left doesn't
        # satisfy left!=G, but guid!=null means "exists" trivially)
        pred = col.isNotNull()
        if nonnull:
            pred = pred & ~col.isin(nonnull)
        return pred

    def _next_cond(self, gc):
        """next=G: this primitive's successor is G <=> G.prev == guid."""
        parts = []
        has_null = any(g is None for g in gc.guids)
        prevs = []
        for g in gc.guids:
            if g is None:
                continue
            p = self.store.get(g)
            if p is not None and p.prev is not None:
                prevs.append(p.prev)
        newest = (F.col("__maxgen") - F.col("generation")) == 0
        if gc.op == "=":
            if prevs:
                parts.append(F.col("guid").isin(prevs))
            if has_null:
                parts.append(newest)  # no successor
            if not parts:
                return F.lit(False)
            pred = parts[0]
            for p in parts[1:]:
                pred = pred | p
            return pred
        pred = ~newest  # must have a successor
        if prevs:
            pred = pred & ~F.col("guid").isin(prevs)
        return pred

    def _type_cond(self, sc):
        """type="name": bind names to typeguids pre-plan
        (ref graphd-read.c:36-135)."""
        col = F.col("typeguid")
        guids = []
        has_null = False
        for nm in sc.values:
            if nm is None:
                has_null = True
                continue
            g = self.types.resolve(nm)
            if g is not None:
                guids.append(g)
        if sc.op == "=":
            parts = []
            if guids:
                parts.append(col.isin(guids))
            if has_null:
                parts.append(col.isNull())
            if not parts:
                return F.lit(False)
            pred = parts[0]
            for p in parts[1:]:
                pred = pred | p
            return pred
        pred = col.isNull() | ~col.isin(guids) if guids else None
        if has_null:
            p2 = col.isNotNull()
            pred = p2 if pred is None else (pred & p2)
        return pred if pred is not None else F.lit(True)

    def _string_cond(self, col, sc, comparator):
        comp = comparator or "default"
        ci = comp in ("default", "unspecified", None)
        nonnull = [v for v in sc.values if v is not None]
        has_null = any(v is None for v in sc.values)
        if sc.op == "=":
            parts = []
            if nonnull:
                if ci:
                    parts.append(
                        F.lower(col).isin([v.lower() for v in nonnull])
                    )
                else:
                    parts.append(col.isin(nonnull))
            if has_null:
                parts.append(col.isNull())
            if not parts:
                return F.lit(False)
            pred = parts[0]
            for p in parts[1:]:
                pred = pred | p
            return pred
        if sc.op == "!=":
            pred = None
            if nonnull:
                if ci:
                    pred = ~F.lower(col).isin([v.lower() for v in nonnull])
                else:
                    pred = ~col.isin(nonnull)
                pred = col.isNull() | pred
            if has_null:
                p2 = col.isNotNull()
                pred = p2 if pred is None else (pred & p2)
            return pred if pred is not None else F.lit(True)
        if sc.op in ("<", "<=", ">", ">="):
            # range under the comparator's ordering: compare
            # order-preserving sort keys (null values never match —
            # the reference's vrange iterators scan value indexes,
            # which don't contain nulls)
            lit = nonnull[0] if nonnull else None
            if lit is None:
                return F.lit(False)
            key = sort_key_column(col, comp)
            litkey = (
                F.lit(fuzzy_key(lit))
                if comp in ("default", "unspecified")
                else F.lit(lit.encode())
            )
            return _OPS[sc.op](key, litkey)
        if sc.op == "~=":
            from graphd_spark.glob import glob_column

            return glob_column(col, nonnull[0] if nonnull else "")
        raise GraphdError("SEMANTICS", f"unsupported operator {sc.op!r}")
