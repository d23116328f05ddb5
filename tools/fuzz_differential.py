"""Randomized differential fuzzing vs DuckDB (judge ask, r7).

The (90+) registry gates are hand-written; this harness pins the GENERAL
SQL surface SURVEY §3.3 promises: a seeded generator emits random
filter / join / group-by / having / top-k / window queries over the
testdata star schema, runs each on Spark AND DuckDB, and compares with
the oracle harness's canonicalization (row count + sorted columns +
order-insensitive bit-exact value hash). Failures are shrunk by
predicate/aggregate deletion before reporting.

The grammar is restricted to the cross-engine-exact subset — every
restriction is a CLAUDE.md rule baked into the renderer rather than a
coverage hole:

- SUM/AVG over DOUBLE never generated (order-dependent accumulation);
  doubles still appear in predicates and MIN/MAX (exact).
- DuckDB SUM(int) returns HUGEINT -> rendered with CAST(... AS BIGINT).
- TIMESTAMP columns only project/group through the
  date_format/strftime 'yyyy-MM-dd' device and compare against
  TIMESTAMP literals (the midnight-datetime rendering trap).
- Every LIMIT rides a grouped query ordered by (aggs, ALL group keys)
  — the group keys are a unique key of the output, so the sort is
  total (rule 3). Window queries ride tables with a unique pk for the
  same reason.

Usage:
    python tools/fuzz_differential.py [sf_dir] [n_queries] [seed]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# column kinds: i = integer, s = string, f = double, t = timestamp
TABLES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "i", "r_name": "s"},
    "nation": {"n_nationkey": "i", "n_name": "s", "n_regionkey": "i"},
    "customer": {
        "c_custkey": "i",
        "c_name": "s",
        "c_nationkey": "i",
        "c_acctbal": "f",
        "c_mktsegment": "s",
    },
    "supplier": {
        "s_suppkey": "i",
        "s_name": "s",
        "s_nationkey": "i",
        "s_acctbal": "f",
    },
    "part": {
        "p_partkey": "i",
        "p_name": "s",
        "p_brand": "s",
        "p_type": "s",
        "p_size": "i",
        "p_retailprice": "f",
    },
    "orders": {
        "o_orderkey": "i",
        "o_custkey": "i",
        "o_orderstatus": "s",
        "o_totalprice": "f",
        "o_orderdate": "t",
        "o_orderpriority": "s",
    },
    "lineitem": {
        "l_orderkey": "i",
        "l_partkey": "i",
        "l_suppkey": "i",
        "l_linenumber": "i",
        "l_quantity": "f",
        "l_extendedprice": "f",
        "l_discount": "f",
        "l_tax": "f",
        "l_returnflag": "s",
        "l_linestatus": "s",
        "l_shipdate": "t",
    },
    "documents": {
        "doc_id": "i",
        "lang": "s",
        "source": "s",
        "n_chars": "i",
    },
    # events is the nanos-timestamp table: Spark reads it through
    # tables.load_events (timestamp_ntz rebuild), so its ts column is
    # kind "n" — NTZ literals Spark-side, plain TIMESTAMP DuckDB-side
    "events": {
        "event_id": "i",
        "ts": "n",
        "user_id": "i",
        "event_type": "s",
        "value": "f",
    },
}

# fact -> (dim, fact_key, dim_key); chains compose (lineitem->orders->customer)
JOINS: dict[str, list[tuple[str, str, str]]] = {
    "nation": [("region", "n_regionkey", "r_regionkey")],
    "customer": [("nation", "c_nationkey", "n_nationkey")],
    "supplier": [("nation", "s_nationkey", "n_nationkey")],
    "orders": [("customer", "o_custkey", "c_custkey")],
    "lineitem": [
        ("orders", "l_orderkey", "o_orderkey"),
        ("part", "l_partkey", "p_partkey"),
        ("supplier", "l_suppkey", "s_suppkey"),
    ],
}

# tables whose first column is a verified-unique pk (window tiebreaks)
UNIQUE_PK = {"orders": "o_orderkey", "customer": "c_custkey",
             "part": "p_partkey", "documents": "doc_id",
             "events": "event_id"}


def _load_canon():
    """Import canon_frame from the oracle harness (same comparison)."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "check_correctness.py")
    spec = importlib.util.spec_from_file_location("_cc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.canon_frame


class Expr:
    """One expression rendered for both engines."""

    def __init__(self, spark: str, duck: str, kind: str, alias: str):
        self.spark, self.duck, self.kind, self.alias = spark, duck, kind, alias

    def s(self) -> str:
        return f"{self.spark} AS {self.alias}"

    def d(self) -> str:
        return f"{self.duck} AS {self.alias}"


def _esc(v: str) -> str:
    return v.replace("'", "''")


class Generator:
    def __init__(self, sf_dir: str, seed: int):
        import duckdb

        self.rng = random.Random(seed)
        self.samples: dict[tuple[str, str], list] = {}
        con = duckdb.connect()
        for t, cols in TABLES.items():
            for c in cols:
                rows = con.execute(
                    f"SELECT {c} FROM '{sf_dir}/{t}.parquet' "
                    f"WHERE {c} IS NOT NULL "
                    f"ORDER BY md5(CAST({c} AS VARCHAR)) LIMIT 8"
                ).fetchall()
                self.samples[(t, c)] = [r[0] for r in rows]
        # the per-column samples are 8 md5-ordered ROWS (identical
        # values group under one hash) — the temporal shapes need the
        # DISTINCT type inventory
        self.event_types = [
            r[0]
            for r in con.execute(
                f"SELECT DISTINCT event_type FROM "
                f"'{sf_dir}/events.parquet' ORDER BY 1"
            ).fetchall()
        ]
        con.close()

    # --- projections --------------------------------------------------------

    def _proj(self, col: str, kind: str, alias: str) -> Expr:
        if kind in ("t", "n"):
            return Expr(
                f"date_format({col}, 'yyyy-MM-dd')",
                f"strftime({col}, '%Y-%m-%d')",
                "s",
                alias,
            )
        return Expr(col, col, kind, alias)

    def _group_exprs(self, col: str, kind: str, alias: str) -> Expr:
        if kind in ("t", "n") and self.rng.random() < 0.5:
            return Expr(f"year({col})", f"year({col})", "i", alias)
        return self._proj(col, kind, alias)

    # --- predicates ---------------------------------------------------------

    def _pred(self, table_cols: list[tuple[str, str, str]]) -> str | None:
        t, c, kind = self.rng.choice(table_cols)
        vals = self.samples.get((t, c))
        if not vals:
            return None
        v = self.rng.choice(vals)
        if kind == "i":
            op = self.rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            return f"{c} {op} {int(v)}"
        if kind == "f":
            op = self.rng.choice(["<", "<=", ">", ">="])
            return f"{c} {op} {v!r}"
        if kind == "s":
            sv = str(v)
            if self.rng.random() < 0.3 and len(sv) >= 2:
                pfx = _esc(sv[:2].replace("%", "").replace("_", ""))
                if pfx:
                    return f"{c} LIKE '{pfx}%'"
            op = self.rng.choice(["=", "<>", "<", ">"])
            return f"{c} {op} '{_esc(sv)}'"
        # timestamp (kind "t"); kind "n" is NTZ on the Spark side only
        iso = str(v)[:19]
        op = self.rng.choice(["<", "<=", ">", ">="])
        if kind == "n":
            return (f"{c} {op} TIMESTAMP_NTZ '{iso}'",
                    f"{c} {op} TIMESTAMP '{iso}'")
        return f"{c} {op} TIMESTAMP '{iso}'"

    # --- aggregates ---------------------------------------------------------

    def _agg(self, table_cols: list[tuple[str, str, str]], i: int) -> Expr:
        alias = f"a{i}"
        choice = self.rng.random()
        if choice < 0.25:
            return Expr("COUNT(*)", "CAST(COUNT(*) AS BIGINT)", "i", alias)
        t, c, kind = self.rng.choice(table_cols)
        if choice < 0.45:
            return Expr(
                f"COUNT({c})", f"CAST(COUNT({c}) AS BIGINT)", "i", alias
            )
        if choice < 0.6:
            return Expr(
                f"COUNT(DISTINCT {c})",
                f"CAST(COUNT(DISTINCT {c}) AS BIGINT)",
                "i",
                alias,
            )
        if choice < 0.8 and kind == "i":
            return Expr(
                f"SUM({c})", f"CAST(SUM({c}) AS BIGINT)", "i", alias
            )
        if choice < 0.85:
            # max_by/min_by keyed on a unique pk (ties impossible →
            # deterministic). The value column comes from the SAME
            # table as the pk: under a LEFT join, dim-side values can
            # be NULL, and DuckDB's arg_max SKIPS null arguments while
            # Spark's max_by returns them — a real semantic divergence
            # this generator must not manufacture.
            pks = [
                (t, c)
                for t, c, k in table_cols
                if UNIQUE_PK.get(t) == c
            ]
            if pks:
                pt, pk = self.rng.choice(pks)
                vals = [
                    (c2, k2)
                    for t2, c2, k2 in table_cols
                    if t2 == pt and c2 != pk and k2 in ("i", "s")
                ]
                if vals:
                    v, vkind = self.rng.choice(vals)
                    s_fn, d_fn = self.rng.choice(
                        [("MAX_BY", "arg_max"), ("MIN_BY", "arg_min")]
                    )
                    return Expr(
                        f"{s_fn}({v}, {pk})",
                        f"{d_fn}({v}, {pk})",
                        vkind,
                        alias,
                    )
        fn = self.rng.choice(["MIN", "MAX"])
        if kind in ("t", "n"):
            return Expr(
                f"date_format({fn}({c}), 'yyyy-MM-dd')",
                f"strftime({fn}({c}), '%Y-%m-%d')",
                "s",
                alias,
            )
        return Expr(f"{fn}({c})", f"{fn}({c})", kind, alias)

    # --- query shapes -------------------------------------------------------

    def _from_clause(self) -> tuple[str, list[tuple[str, str, str]], str]:
        """Random FROM over the join graph: chains (lineitem→orders→
        customer→nation→region), STAR fan-outs (a fact joined to
        several of its dims at once — the BI shape, r8 ask #6), and
        mixtures of both, each hop independently INNER or LEFT (LEFT
        exercises the null-introducing path: 3-valued predicates, null
        group keys, null-skipping aggregates). A table joins at most
        once (nation is reachable via customer AND supplier — a repeat
        would need aliases). Returns (sql, usable cols, base)."""
        t = self.rng.choice(list(TABLES))
        sql = t
        cols = [(t, c, k) for c, k in TABLES[t].items()]
        joined = {t}
        frontier = [t]
        while frontier:
            cur = frontier.pop(0)
            hops = [h for h in JOINS.get(cur, []) if h[0] not in joined]
            if not hops:
                continue
            if cur == t and len(hops) >= 2 and self.rng.random() < 0.35:
                picks = self.rng.sample(
                    hops, self.rng.randrange(2, len(hops) + 1)
                )
            elif self.rng.random() < 0.55:
                picks = [self.rng.choice(hops)]
            else:
                picks = []
            for dim, fk, dk in picks:
                jt = "LEFT JOIN" if self.rng.random() < 0.3 else "JOIN"
                sql += f" {jt} {dim} ON {fk} = {dk}"
                cols += [(dim, c, k) for c, k in TABLES[dim].items()]
                joined.add(dim)
                frontier.append(dim)
        return sql, cols, t

    def _in_subquery(self, base: str) -> str | None:
        """fk IN (SELECT dk FROM dim WHERE pred) off the join graph —
        Catalyst rewrites to a semi join; DuckDB plans it natively."""
        hops = JOINS.get(base)
        if not hops:
            return None
        dim, fk, dk = self.rng.choice(hops)
        dim_cols = [(dim, c, k) for c, k in TABLES[dim].items()]
        pred = self._pred(dim_cols)
        if pred is None or isinstance(pred, tuple):
            return None
        neg = "NOT " if self.rng.random() < 0.3 else ""
        if self.rng.random() < 0.4:
            # correlated EXISTS: the aliased inner table wins bare-name
            # resolution for the dim predicate (innermost scope, same
            # rule both engines); the fk column is unambiguously outer
            # because every table's columns carry its prefix
            return (
                f"{neg}EXISTS (SELECT 1 FROM {dim} __sub "
                f"WHERE __sub.{dk} = {fk} AND {pred})"
            )
        return f"{fk} {neg}IN (SELECT {dk} FROM {dim} WHERE {pred})"

    def _scalar_subquery(self, cols) -> str | None:
        """int_col <op> (SELECT MIN/MAX/COUNT ... FROM other [WHERE]) —
        an uncorrelated scalar subquery; an empty inner relation yields
        NULL → UNKNOWN → row filtered, identically in both engines."""
        ints = [x for x in cols if x[2] == "i"]
        if not ints:
            return None
        _, c, _ = self.rng.choice(ints)
        t2 = self.rng.choice(list(TABLES))
        t2_cols = [(t2, c2, k2) for c2, k2 in TABLES[t2].items()]
        pred = self._pred(t2_cols)
        if isinstance(pred, tuple):
            pred = None
        where = f" WHERE {pred}" if pred else ""
        op = self.rng.choice(["<", "<=", ">", ">="])
        if self.rng.random() < 0.4:
            return f"{c} {op} (SELECT COUNT(*) FROM {t2}{where})"
        ints2 = [x for x in t2_cols if x[2] == "i"]
        if not ints2:
            return None
        _, c2, _ = self.rng.choice(ints2)
        fn = self.rng.choice(["MIN", "MAX"])
        return f"{c} {op} (SELECT {fn}({c2}) FROM {t2}{where})"

    def _where(self, cols, base: str | None = None):
        """Returns (spark_where, duck_where) — identical text except
        NTZ-vs-naive timestamp literals."""
        preds = [p for p in (self._pred(cols)
                             for _ in range(self.rng.randrange(3))) if p]
        if base is not None and self.rng.random() < 0.2:
            sub = self._in_subquery(base)
            if sub:
                preds.append(sub)
        if self.rng.random() < 0.15:
            sub = self._scalar_subquery(cols)
            if sub:
                preds.append(sub)
        sp = [p[0] if isinstance(p, tuple) else p for p in preds]
        dp = [p[1] if isinstance(p, tuple) else p for p in preds]
        if not preds:
            return "", ""
        return " WHERE " + " AND ".join(sp), " WHERE " + " AND ".join(dp)

    # --- temporal shapes (r9 ask #6) ---------------------------------------

    def _events_side_preds(self):
        """One optional extra predicate over events, split into the
        (spark, duck) forms (ts literals differ — NTZ vs naive)."""
        ecols = [("events", c, k) for c, k in TABLES["events"].items()
                 if c != "event_type"]
        p = self._pred(ecols)
        if p is None:
            return "", ""
        ps, pd = p if isinstance(p, tuple) else (p, p)
        return f" AND {ps}", f" AND {pd}"

    def _asof_shape(self) -> tuple[str, str]:
        """ASOF join: each point event matches the LATEST mark event of
        another type at-or-before its ts for the same user. DuckDB runs
        its NATIVE ASOF JOIN; Spark runs the engine's carry-forward
        union device (tagged union + last_value IGNORE NULLS over
        (ts, is_point) — marks sort before points at equal ts, the
        '>=' tie semantics). Two INDEPENDENT implementations of the
        same semantics — the whole point of the differential. Marks
        dedup to MIN(event_id) per (user, ts) so the match target is
        unique by construction (determinism rule)."""
        mt, pt = self.rng.sample(self.event_types, 2)
        ms, md = self._events_side_preds()
        ps_, pd_ = self._events_side_preds()
        left = self.rng.random() < 0.4
        marks_s = (
            f"SELECT user_id AS k, ts, MIN(event_id) AS mid FROM events "
            f"WHERE event_type = '{mt}'{ms} GROUP BY user_id, ts"
        )
        marks_d = (
            f"SELECT user_id AS k, ts, MIN(event_id) AS mid FROM events "
            f"WHERE event_type = '{mt}'{md} GROUP BY user_id, ts"
        )
        pts_s = (
            f"SELECT event_id, user_id AS k, ts FROM events "
            f"WHERE event_type = '{pt}'{ps_}"
        )
        pts_d = (
            f"SELECT event_id, user_id AS k, ts FROM events "
            f"WHERE event_type = '{pt}'{pd_}"
        )
        jt = "ASOF LEFT JOIN" if left else "ASOF JOIN"
        duck_rows = (
            f"SELECT p.event_id AS pk, p.k, m.mid "
            f"FROM ({pts_d}) p {jt} ({marks_d}) m "
            f"ON p.k = m.k AND p.ts >= m.ts"
        )
        inner_filter = "" if left else " AND mid IS NOT NULL"
        spark_rows = (
            f"SELECT pid AS pk, k, mid FROM ("
            f"SELECT k, is_pt, pid, "
            f"last_value(mid, true) OVER (PARTITION BY k "
            f"ORDER BY ts, is_pt "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mid "
            f"FROM ("
            f"SELECT k, ts, 0 AS is_pt, mid, CAST(NULL AS BIGINT) AS pid "
            f"FROM ({marks_s}) "
            f"UNION ALL "
            f"SELECT k, ts, 1 AS is_pt, CAST(NULL AS BIGINT) AS mid, "
            f"event_id AS pid FROM ({pts_s})"
            f")) WHERE is_pt = 1{inner_filter}"
        )
        if self.rng.random() < 0.4:
            # per-user rollup of the matches: SUM(BIGINT) rides the
            # HUGEINT cast rule; all-NULL groups agree (NULL both)
            agg = ("k, CAST(COUNT(*) AS BIGINT) AS n, "
                   "CAST(COUNT(mid) AS BIGINT) AS nm, "
                   "CAST(SUM(mid) AS BIGINT) AS sm")
            return (
                f"SELECT {agg} FROM ({spark_rows}) GROUP BY k",
                f"SELECT {agg} FROM ({duck_rows}) GROUP BY k",
            )
        return spark_rows, duck_rows

    def _range_shape(self) -> tuple[str, str]:
        """BETWEEN range join: points fall inside per-mark time windows
        [mark_ts, mark_ts + h hours] of the same user. The SQL text is
        IDENTICAL both engines except the ts literals — the
        differential exercises DuckDB's IEJoin range planner vs
        Spark's join execution on the same semantics. Fan-out is
        bounded by window length × per-user event rate; (pk, mid) row
        identity is unique because windows dedup per (user, ts)."""
        mt, pt = self.rng.sample(self.event_types, 2)
        hours = self.rng.randrange(1, 13)
        ms, md = self._events_side_preds()
        ps_, pd_ = self._events_side_preds()

        def q(mpred, ppred):
            wins = (
                f"SELECT user_id AS k, ts AS ws, "
                f"ts + INTERVAL {hours} HOUR AS we, "
                f"MIN(event_id) AS mid FROM events "
                f"WHERE event_type = '{mt}'{mpred} GROUP BY user_id, ts"
            )
            pts = (
                f"SELECT event_id, user_id AS k, ts FROM events "
                f"WHERE event_type = '{pt}'{ppred}"
            )
            return (
                f"SELECT p.event_id AS pk, w.mid "
                f"FROM ({pts}) p JOIN ({wins}) w "
                f"ON p.k = w.k AND p.ts >= w.ws AND p.ts <= w.we"
            )

        s_rows, d_rows = q(ms, ps_), q(md, pd_)
        if self.rng.random() < 0.5:
            agg = ("CAST(COUNT(*) AS BIGINT) AS n, "
                   "CAST(COUNT(DISTINCT pk) AS BIGINT) AS nd, "
                   "CAST(SUM(mid) AS BIGINT) AS sm")
            return (
                f"SELECT {agg} FROM ({s_rows})",
                f"SELECT {agg} FROM ({d_rows})",
            )
        return s_rows, d_rows

    def gen(self) -> tuple[str, str]:
        """One random query -> (spark_sql, duck_sql)."""
        r = self.rng.random()
        if r < 0.07:
            return self._asof_shape()
        if r < 0.13:
            return self._range_shape()
        shape = self.rng.random()
        frm, cols, base = self._from_clause()
        sw, dw = self._where(cols, base)
        if shape < 0.22:  # plain filter + projection [DISTINCT]
            n = self.rng.randrange(1, 4)
            picks = self.rng.sample(cols, min(n, len(cols)))
            exprs = [
                self._proj(c, k, f"c{i}")
                for i, (_, c, k) in enumerate(picks)
            ]
            dis = "DISTINCT " if self.rng.random() < 0.3 else ""
            return (
                f"SELECT {dis}{', '.join(e.s() for e in exprs)} FROM {frm}{sw}",
                f"SELECT {dis}{', '.join(e.d() for e in exprs)} FROM {frm}{dw}",
            )
        if shape < 0.3:  # set operation over two filtered projections
            t = self.rng.choice(list(TABLES))
            tcols = [(t, c, k) for c, k in TABLES[t].items()]
            picks = self.rng.sample(tcols, min(2, len(tcols)))
            exprs = [
                self._proj(c, k, f"c{i}")
                for i, (_, c, k) in enumerate(picks)
            ]
            op = self.rng.choice(
                ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
            )
            (s1, d1), (s2, d2) = self._where(tcols), self._where(tcols)
            sp = ", ".join(e.s() for e in exprs)
            dp = ", ".join(e.d() for e in exprs)
            return (
                f"SELECT {sp} FROM {t}{s1} {op} SELECT {sp} FROM {t}{s2}",
                f"SELECT {dp} FROM {t}{d1} {op} SELECT {dp} FROM {t}{d2}",
            )
        if shape < 0.4:  # global aggregate
            aggs = [self._agg(cols, i)
                    for i in range(self.rng.randrange(1, 4))]
            return (
                f"SELECT {', '.join(e.s() for e in aggs)} FROM {frm}{sw}",
                f"SELECT {', '.join(e.d() for e in aggs)} FROM {frm}{dw}",
            )
        if shape < 0.5:  # FROM-clause derived table (LIMIT + total order)
            # the other BI-tool shape (r8 ask #6): an inner top-k over
            # a unique-pk table — ORDER BY (ocol NULLS FIRST, pk) is a
            # TOTAL order, so the LIMIT k row SET is deterministic —
            # then joins/aggregates composed on top of the derived
            # table. SELECT * keeps original column names visible, so
            # outer predicates/aggregates reuse the shared helpers.
            t = self.rng.choice(list(UNIQUE_PK))
            pk = UNIQUE_PK[t]
            tcols = [(t, c, k) for c, k in TABLES[t].items()]
            _, ocol, _ = self.rng.choice(tcols)
            sw_i, dw_i = self._where(tcols)
            lim = self.rng.randrange(5, 200)
            off = (f" OFFSET {self.rng.randrange(1, 50)}"
                   if self.rng.random() < 0.4 else "")
            inner = (f" ORDER BY {ocol} NULLS FIRST, {pk} LIMIT {lim}{off})"
                     " dt")
            dt_s = f"(SELECT * FROM {t}{sw_i}{inner}"
            dt_d = f"(SELECT * FROM {t}{dw_i}{inner}"
            cols2 = list(tcols)
            join_sql = ""
            hops = JOINS.get(t, [])
            if hops and self.rng.random() < 0.6:
                dim, fk, dk = self.rng.choice(hops)
                jt = "LEFT JOIN" if self.rng.random() < 0.3 else "JOIN"
                join_sql = f" {jt} {dim} ON {fk} = {dk}"
                cols2 += [(dim, c, k) for c, k in TABLES[dim].items()]
            so, do = self._where(cols2)
            aggs = [self._agg(cols2, i)
                    for i in range(self.rng.randrange(1, 3))]
            if self.rng.random() < 0.5:  # global aggregate over dt⋈dim
                return (
                    f"SELECT {', '.join(e.s() for e in aggs)} "
                    f"FROM {dt_s}{join_sql}{so}",
                    f"SELECT {', '.join(e.d() for e in aggs)} "
                    f"FROM {dt_d}{join_sql}{do}",
                )
            _, gc_, gk = self.rng.choice(cols2)
            key = self._group_exprs(gc_, gk, "g0")
            order = ""
            if self.rng.random() < 0.5:
                by = [a.alias + " DESC NULLS LAST" for a in aggs] + [
                    "g0 NULLS FIRST"
                ]
                order = (f" ORDER BY {', '.join(by)} "
                         f"LIMIT {self.rng.randrange(1, 20)}")
            return (
                f"SELECT {key.s()}, {', '.join(e.s() for e in aggs)} "
                f"FROM {dt_s}{join_sql}{so} GROUP BY {key.spark}{order}",
                f"SELECT {key.d()}, {', '.join(e.d() for e in aggs)} "
                f"FROM {dt_d}{join_sql}{do} GROUP BY {key.duck}{order}",
            )
        if shape < 0.56:  # LATERAL explode / UNNEST over token arrays
            # Spark: LATERAL VIEW explode(...); DuckDB: unnest(...) in
            # an inner projection — same rowset (one row per non-empty
            # whitespace token), grouped by token. Preds mix doc-level
            # columns with token-level ones (both apply post-explode).
            toks_s = "filter(split(text, ' '), t -> t != '')"
            toks_d = "list_filter(string_split(text, ' '), t -> t != '')"
            dcols = [
                ("documents", c, k) for c, k in TABLES["documents"].items()
            ]
            preds_s, preds_d = [], []
            p = self._pred(dcols)
            if p:
                ps, pd = p if isinstance(p, tuple) else (p, p)
                preds_s.append(ps)
                preds_d.append(pd)
            if self.rng.random() < 0.5:
                tp = self.rng.choice(
                    [
                        f"length(token) >= {self.rng.randrange(2, 6)}",
                        f"token >= '{self.rng.choice('abcdefgklmnpqrstw')}'",
                    ]
                )
                preds_s.append(tp)
                preds_d.append(tp)
            sw2 = f" WHERE {' AND '.join(preds_s)}" if preds_s else ""
            dw2 = f" WHERE {' AND '.join(preds_d)}" if preds_d else ""
            aggs = ["COUNT(*) AS n"]
            if self.rng.random() < 0.6:
                aggs.append("COUNT(DISTINCT d.doc_id) AS nd")
            if self.rng.random() < 0.5:
                aggs.append(
                    self.rng.choice(
                        [
                            "CAST(SUM(d.n_chars) AS BIGINT) AS s1",
                            "CAST(SUM(d.doc_id) AS BIGINT) AS s1",
                            "CAST(MIN(d.doc_id) AS BIGINT) AS s1",
                        ]
                    )
                )
            having = ""
            if self.rng.random() < 0.3:
                having = f" HAVING COUNT(*) > {self.rng.randrange(1, 4)}"
            order = ""
            if self.rng.random() < 0.5:
                # total order: token is a unique key of the grouped
                # output and never NULL (empty tokens are filtered)
                order = (
                    " ORDER BY n DESC NULLS LAST, token NULLS FIRST"
                    f" LIMIT {self.rng.randrange(1, 30)}"
                )
            proj = "token, " + ", ".join(aggs)
            return (
                f"SELECT {proj} FROM documents d "
                f"LATERAL VIEW explode({toks_s}) tv AS token"
                f"{sw2} GROUP BY token{having}{order}",
                f"SELECT {proj} FROM (SELECT *, unnest({toks_d}) AS token"
                f" FROM documents) d{dw2} GROUP BY token{having}{order}",
            )
        if shape < 0.85:  # group by [having] [order+limit]
            nk = self.rng.randrange(1, 3)
            picks = self.rng.sample(cols, min(nk, len(cols)))
            keys = [
                self._group_exprs(c, k, f"g{i}")
                for i, (_, c, k) in enumerate(picks)
            ]
            if self.rng.random() < 0.25:  # CASE bucket as an extra key
                p = self._pred(cols)
                if p:
                    ps, pd = p if isinstance(p, tuple) else (p, p)
                    keys.append(
                        Expr(
                            f"CASE WHEN {ps} THEN 'hi' ELSE 'lo' END",
                            f"CASE WHEN {pd} THEN 'hi' ELSE 'lo' END",
                            "s",
                            f"g{len(keys)}",
                        )
                    )
            aggs = [self._agg(cols, i)
                    for i in range(self.rng.randrange(1, 3))]
            having = ""
            if self.rng.random() < 0.3:
                having = f" HAVING COUNT(*) > {self.rng.randrange(1, 4)}"
            # ROLLUP/CUBE variant: subtotal rows + GROUPING() markers per
            # key (a subtotal NULL must stay distinguishable from a
            # data NULL, and the markers complete the row identity).
            # No ORDER/LIMIT — the canon compare is order-insensitive
            # and a total order over subtotal NULLs buys nothing.
            # ENGINE DIVERGENCE (found by this fuzzer, seed 71): on an
            # EMPTY input Spark's ROLLUP/CUBE emits 0 rows while DuckDB
            # (per the standard) emits the () grand-total row with
            # count 0 — even though both agree a PLAIN global
            # aggregate yields one row. HAVING COUNT(*) >= 1 removes
            # exactly that divergent row and nothing else (every
            # non-empty group counts ≥ 1), so the renderer always
            # forces a count floor on grouping-sets queries.
            if self.rng.random() < 0.2:
                having = having or " HAVING COUNT(*) >= 1"
                op = self.rng.choice(["ROLLUP", "CUBE"])
                gfs = [
                    Expr(
                        f"CAST(GROUPING({k.spark}) AS INT)",
                        f"CAST(GROUPING({k.duck}) AS INT)",
                        "i",
                        f"gf{i}",
                    )
                    for i, k in enumerate(keys)
                ]
                s_proj = ", ".join(
                    e.s() for e in (*keys, *gfs, *aggs)
                )
                d_proj = ", ".join(
                    e.d() for e in (*keys, *gfs, *aggs)
                )
                gb = ", ".join(e.spark for e in keys)
                gd = ", ".join(e.duck for e in keys)
                return (
                    f"SELECT {s_proj} FROM {frm}{sw} "
                    f"GROUP BY {op} ({gb}){having}",
                    f"SELECT {d_proj} FROM {frm}{dw} "
                    f"GROUP BY {op} ({gd}){having}",
                )
            order = ""
            if self.rng.random() < 0.5:
                # total order: aggs first, then EVERY group key (the
                # keys are a unique key of the grouped output). NULL
                # placement is EXPLICIT on every term (the window-
                # grammar rule): Spark defaults NULLS LAST on DESC /
                # FIRST on ASC, DuckDB the opposite — a NULL agg (SUM
                # of an all-NULL group) or a NULL key (LEFT JOIN right
                # side) under LIMIT would silently diverge otherwise.
                by = [a.alias + " DESC NULLS LAST" for a in aggs] + [
                    k.alias + " NULLS FIRST" for k in keys
                ]
                order = (f" ORDER BY {', '.join(by)} "
                         f"LIMIT {self.rng.randrange(1, 20)}")
                if self.rng.random() < 0.4:
                    # pagination: OFFSET under the same total order —
                    # the page a BI tool fetches is a deterministic
                    # row SET iff the order is total (it is: aggs +
                    # every group key). Same clause text both engines.
                    order += f" OFFSET {self.rng.randrange(1, 10)}"
            s_keys = ", ".join(e.s() for e in keys)
            d_keys = ", ".join(e.d() for e in keys)
            s_aggs = ", ".join(e.s() for e in aggs)
            d_aggs = ", ".join(e.d() for e in aggs)
            gb = ", ".join(e.spark for e in keys)
            gd = ", ".join(e.duck for e in keys)
            return (
                f"SELECT {s_keys}, {s_aggs} FROM {frm}{sw} "
                f"GROUP BY {gb}{having}{order}",
                f"SELECT {d_keys}, {d_aggs} FROM {frm}{dw} "
                f"GROUP BY {gd}{having}{order}",
            )
        # window over a unique-pk table. Determinism discipline: ranked
        # / offset / running variants order by (ocol NULLS FIRST, pk) —
        # a total order (Spark defaults NULLS FIRST, DuckDB NULLS LAST,
        # so the null placement is always EXPLICIT); rank/dense_rank
        # order by ocol alone (tie-stable by definition); frame-free
        # partition aggregates need no order at all.
        t = self.rng.choice(list(UNIQUE_PK))
        pk = UNIQUE_PK[t]
        cols = [(t, c, k) for c, k in TABLES[t].items()]
        _, part, pkind = self.rng.choice(
            [x for x in cols if x[1] != pk] or cols
        )
        _, ocol, okind = self.rng.choice(cols)
        sw, dw = self._where(cols)
        part_s = self._group_exprs(part, pkind, "p")
        order = f"ORDER BY {ocol} NULLS FIRST, {pk}"
        variant = self.rng.random()
        if variant < 0.35:  # row_number top-k per partition
            rn = self.rng.randrange(1, 5)
            inner_s = (
                f"SELECT {pk} AS pk, {part_s.s()}, row_number() OVER "
                f"(PARTITION BY {part_s.spark} {order}) AS rn "
                f"FROM {t}{sw}"
            )
            inner_d = (
                f"SELECT {pk} AS pk, {part_s.d()}, row_number() OVER "
                f"(PARTITION BY {part_s.duck} {order}) AS rn "
                f"FROM {t}{dw}"
            )
            return (
                f"SELECT pk, p, CAST(rn AS BIGINT) AS rn FROM ({inner_s}) "
                f"WHERE rn <= {rn}",
                f"SELECT pk, p, CAST(rn AS BIGINT) AS rn FROM ({inner_d}) "
                f"WHERE rn <= {rn}",
            )
        if variant < 0.55:  # rank family — ties are value-stable.
            # percent_rank/cume_dist emit DOUBLE, but both are exact
            # divisions of IDENTICAL integer operands (rank/peers/n),
            # so the bits agree across engines — the cosine device.
            fn = self.rng.choice(
                ["rank", "dense_rank", "percent_rank", "cume_dist"]
            )
            cast = "BIGINT" if fn in ("rank", "dense_rank") else "DOUBLE"
            w_s = (f"{fn}() OVER (PARTITION BY {part_s.spark} "
                   f"ORDER BY {ocol} NULLS FIRST)")
            w_d = (f"{fn}() OVER (PARTITION BY {part_s.duck} "
                   f"ORDER BY {ocol} NULLS FIRST)")
            return (
                f"SELECT {pk} AS pk, {part_s.s()}, "
                f"CAST({w_s} AS {cast}) AS rnk FROM {t}{sw}",
                f"SELECT {pk} AS pk, {part_s.d()}, "
                f"CAST({w_d} AS {cast}) AS rnk FROM {t}{dw}",
            )
        if variant < 0.75:  # frame-free whole-partition aggregate
            ints = [x for x in cols if x[2] == "i"]
            if ints and self.rng.random() < 0.7:
                _, ic, _ = self.rng.choice(ints)
                agg_s = f"SUM({ic}) OVER (PARTITION BY {part_s.spark})"
                agg_d = f"SUM({ic}) OVER (PARTITION BY {part_s.duck})"
            else:
                agg_s = f"COUNT(*) OVER (PARTITION BY {part_s.spark})"
                agg_d = f"COUNT(*) OVER (PARTITION BY {part_s.duck})"
            return (
                f"SELECT {pk} AS pk, {part_s.s()}, "
                f"CAST({agg_s} AS BIGINT) AS w FROM {t}{sw}",
                f"SELECT {pk} AS pk, {part_s.d()}, "
                f"CAST({agg_d} AS BIGINT) AS w FROM {t}{dw}",
            )
        if variant < 0.85:  # running sum/count, explicit ROWS frame
            frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            ints = [x for x in cols if x[2] == "i"]
            if ints and self.rng.random() < 0.7:
                _, ic, _ = self.rng.choice(ints)
                fn_s = f"SUM({ic})"
            else:
                fn_s = "COUNT(*)"
            w_s = (f"{fn_s} OVER (PARTITION BY {part_s.spark} "
                   f"{order} {frame})")
            w_d = (f"{fn_s} OVER (PARTITION BY {part_s.duck} "
                   f"{order} {frame})")
            return (
                f"SELECT {pk} AS pk, {part_s.s()}, "
                f"CAST({w_s} AS BIGINT) AS run FROM {t}{sw}",
                f"SELECT {pk} AS pk, {part_s.d()}, "
                f"CAST({w_d} AS BIGINT) AS run FROM {t}{dw}",
            )
        if variant < 0.92:  # ntile over the total order
            k = self.rng.randrange(2, 6)
            w_s = (f"ntile({k}) OVER (PARTITION BY {part_s.spark} "
                   f"{order})")
            w_d = (f"ntile({k}) OVER (PARTITION BY {part_s.duck} "
                   f"{order})")
            return (
                f"SELECT {pk} AS pk, {part_s.s()}, "
                f"CAST({w_s} AS BIGINT) AS nt FROM {t}{sw}",
                f"SELECT {pk} AS pk, {part_s.d()}, "
                f"CAST({w_d} AS BIGINT) AS nt FROM {t}{dw}",
            )
        # lag/lead over the total order; value restricted to exact kinds
        fn = self.rng.choice(["lag", "lead"])
        plain = [x for x in cols if x[2] in ("i", "s", "f")]
        _, vc, _ = self.rng.choice(plain)
        w_s = f"{fn}({vc}) OVER (PARTITION BY {part_s.spark} {order})"
        w_d = f"{fn}({vc}) OVER (PARTITION BY {part_s.duck} {order})"
        return (
            f"SELECT {pk} AS pk, {part_s.s()}, {w_s} AS lv FROM {t}{sw}",
            f"SELECT {pk} AS pk, {part_s.d()}, {w_d} AS lv FROM {t}{dw}",
        )


def _shrink(spark, con, canon, s_sql: str, d_sql: str):
    """Greedy 1-minimal shrink: drop AND-predicates while the mismatch
    persists (the common failure unit in this grammar)."""

    def mismatch(ss: str, ds: str) -> bool:
        # only a reproduced VALUE divergence counts (the caller shrinks
        # only err-free failures): a deletion that merely breaks the
        # SQL — e.g. splicing across a set-op branch — must be
        # rejected, or the report stops demonstrating the original bug
        try:
            a = canon(spark.sql(ss).toPandas())
            b = canon(con.execute(ds).fetchdf())
        except Exception:
            return False
        return a[:3] != b[:3]

    def split(sql: str):
        """head WHERE p1 AND p2 ... [tail] -> (head, [preds], tail);
        only the FIRST WHERE clause is shrunk (set-op right arms and
        subqueries keep their predicates — deleting across branch
        boundaries would splice unrelated queries together)."""
        if " WHERE " not in sql:
            return None
        head, rest = sql.split(" WHERE ", 1)
        # a WHERE clause ends at the next top-level clause keyword
        tail = ""
        for kw in (" GROUP BY ", " ORDER BY ", " UNION", " INTERSECT ",
                   " EXCEPT "):
            idx = rest.find(kw)
            if idx >= 0:
                rest, tail = rest[:idx], rest[idx:]
                break
        if "(" in rest:  # predicate list contains a subquery: too
            return None  # structured for the flat AND-splitter
        return head, rest.split(" AND "), tail

    def join(head, preds, tail):
        w = (" WHERE " + " AND ".join(preds)) if preds else ""
        return f"{head}{w}{tail}"

    changed = True
    while changed:
        changed = False
        sp, dp = split(s_sql), split(d_sql)
        if sp is None or dp is None or len(sp[1]) != len(dp[1]):
            break
        for i in range(len(sp[1])):
            ss = join(sp[0], sp[1][:i] + sp[1][i + 1 :], sp[2])
            ds = join(dp[0], dp[1][:i] + dp[1][i + 1 :], dp[2])
            if mismatch(ss, ds):
                s_sql, d_sql, changed = ss, ds, True
                break
    return s_sql, d_sql


def run_fuzz(spark, sf_dir: str, n: int = 100, seed: int = 7,
             verbose: bool = False) -> list[dict]:
    """Run ``n`` generated queries on both engines; return failures."""
    import duckdb

    from jobinsight_data_pipeline_v2_spark.tables import load_events

    canon = _load_canon()
    gen = Generator(sf_dir, seed)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
        if t == "events":  # nanos parquet: the ntz-rebuild loader
            load_events(spark, sf_dir).createOrReplaceTempView(t)
        else:
            spark.read.parquet(
                f"{sf_dir}/{t}.parquet"
            ).createOrReplaceTempView(t)
    failures = []
    for i in range(n):
        s_sql, d_sql = gen.gen()
        err = None
        try:
            got = canon(spark.sql(s_sql).toPandas())
            exp = canon(con.execute(d_sql).fetchdf())
        except Exception as e:  # an engine rejecting the query is a bug too
            err = f"{type(e).__name__}: {e}"
            got = exp = None
        ok = err is None and got[:3] == exp[:3]
        if verbose:
            print(f"[{i:03d}] {'ok  ' if ok else 'FAIL'} {s_sql[:100]}",
                  file=sys.stderr)
        if not ok:
            if err is None:
                s_min, d_min = _shrink(spark, con, canon, s_sql, d_sql)
            else:
                s_min, d_min = s_sql, d_sql
            failures.append(
                {
                    "i": i,
                    "spark_sql": s_min,
                    "duck_sql": d_min,
                    "err": err,
                    "spark": got and got[:3],
                    "duck": exp and exp[:3],
                }
            )
    con.close()
    return failures


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    from jobinsight_data_pipeline_v2_spark.session import get_spark

    spark = get_spark("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    fails = run_fuzz(spark, sf_dir, n, seed, verbose=True)
    for f in fails:
        print("FAIL", f)
    print(f"{n - len(fails)} pass, {len(fails)} fail (seed={seed})")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
