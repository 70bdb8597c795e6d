"""Differential fuzzing of the dialect layer (r10 verdict ask #3).

The fixed reference suites are nearly exhausted; the remaining risk
in the translation layer is inputs no suite exercises. This harness
generates random but TYPE-CORRECT StarRocks-flavored SQL over the
sf0.001 lineitem/orders tables — expressions drawn from the
implemented function surface, random predicate/GROUP BY/window
shapes — and runs each statement through ``dialect.translate`` on
Spark AND verbatim on DuckDB, comparing normalized row multisets.
Mismatches shrink by dropping select items / simplifying the
predicate before reporting.

Seeded and bounded: SPARK_FUZZ_N queries (default 60, ~90 s with a
warm session). Divergences found are either fixed in the dialect or
recorded in FUZZ_KNOWN_DIFFS below with the reason.
"""
from __future__ import annotations

import os
import random

import duckdb
import pytest

from starrocks_spark.plans import dialect

SF_DIR = os.environ.get("SPARK_GRAFT_FUZZ_DIR",
                        "/root/testdata/sf0.001")

# grammar scope: functions present (same semantics) in StarRocks,
# Spark (after translate) and DuckDB — the comparable surface
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
DATE_COLS = ["l_shipdate"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]

# statement texts whose divergence is understood and accepted —
# populated only when a real, documented engine difference shows up
FUZZ_KNOWN_DIFFS: dict[str, str] = {}


class Gen:
    def __init__(self, rng: random.Random):
        self.r = rng

    def num(self, depth=0) -> str:
        r = self.r
        if depth > 2 or r.random() < 0.4:
            return r.choice(NUM_COLS + KEY_COLS
                            + [str(r.randint(0, 50)),
                               f"{r.uniform(0, 9):.2f}"])
        pick = r.randrange(7)
        if pick == 0:
            return f"({self.num(depth+1)} + {self.num(depth+1)})"
        if pick == 1:
            return f"({self.num(depth+1)} - {self.num(depth+1)})"
        if pick == 2:
            # multiply only small factors: ANSI/duck overflow parity
            return (f"({r.choice(NUM_COLS)} * "
                    f"{r.randint(1, 9)})")
        if pick == 3:
            return f"abs({self.num(depth+1)})"
        if pick == 4:
            return (f"least({self.num(depth+1)}, "
                    f"{self.num(depth+1)})")
        if pick == 5:
            return (f"greatest({self.num(depth+1)}, "
                    f"{self.num(depth+1)})")
        return (f"(CASE WHEN {self.pred(depth+1)} THEN "
                f"{self.num(depth+1)} ELSE {self.num(depth+1)} END)")

    def txt(self, depth=0) -> str:
        r = self.r
        if depth > 1 or r.random() < 0.5:
            return r.choice(STR_COLS + ["'A'", "'NO'", "'xy'"])
        pick = r.randrange(4)
        if pick == 0:
            return f"upper({self.txt(depth+1)})"
        if pick == 1:
            return f"lower({self.txt(depth+1)})"
        if pick == 2:
            return (f"concat({self.txt(depth+1)}, "
                    f"{self.txt(depth+1)})")
        return f"substr({self.txt(depth+1)}, 1, {r.randint(1, 3)})"

    def pred(self, depth=0) -> str:
        r = self.r
        if depth > 2 or r.random() < 0.5:
            kind = r.randrange(4)
            if kind == 0:
                op = r.choice(["<", "<=", ">", ">=", "=", "<>"])
                return f"({self.num(depth+1)} {op} {self.num(depth+1)})"
            if kind == 1:
                op = r.choice(["=", "<>", "<", ">"])
                return f"({self.txt(depth+1)} {op} {self.txt(depth+1)})"
            if kind == 2:
                c = r.choice(NUM_COLS + STR_COLS)
                return f"({c} IS {'NOT ' if r.random() < .5 else ''}NULL)"
            vals = ", ".join(f"'{v}'" for v in
                             r.sample(["A", "N", "R", "O", "F"], 3))
            return f"({r.choice(STR_COLS)} IN ({vals}))"
        op = r.choice(["AND", "OR"])
        return f"({self.pred(depth+1)} {op} {self.pred(depth+1)})"

    def datep(self) -> str:
        r = self.r
        c = r.choice(DATE_COLS)
        pick = r.randrange(3)
        if pick == 0:
            return (f"(year({c}) {r.choice(['=', '<', '>'])} "
                    f"{r.randint(1992, 1998)})")
        if pick == 1:
            return f"(month({c}) = {r.randint(1, 12)})"
        return (f"({c} {r.choice(['<', '>='])} "
                f"DATE '199{r.randint(2, 8)}-0{r.randint(1, 9)}-15')")

    def query(self) -> str:
        r = self.r
        shape = r.randrange(14)
        if shape >= 12:
            # join shape: fact-to-dim equi join + mixed predicates
            pred = self.pred()
            if r.random() < 0.5:
                pred = f"({pred} AND {self.datep()})"
            aggs = ", ".join(
                f"{r.choice(['sum', 'min', 'max', 'count'])}"
                f"({self.num()}) AS a{i}" for i in range(2))
            return (f"SELECT o_orderstatus, {aggs} FROM lineitem "
                    f"JOIN orders ON l_orderkey = o_orderkey "
                    f"WHERE {pred} GROUP BY o_orderstatus "
                    f"ORDER BY o_orderstatus")
        if shape >= 10:
            # date-grouped aggregation
            g = r.choice([f"year({DATE_COLS[0]})",
                          f"month({DATE_COLS[0]})"])
            return (f"SELECT {g} AS g, count(*) AS c, "
                    f"sum({self.num()}) AS s FROM lineitem "
                    f"WHERE {self.datep()} GROUP BY {g} ORDER BY g")
        where = f" WHERE {self.pred()}" if r.random() < 0.8 else ""
        if shape < 4:
            # plain projection
            items = ", ".join(
                f"{e} AS c{i}" for i, e in enumerate(
                    [self.num() if r.random() < 0.6 else self.txt()
                     for _ in range(r.randint(1, 4))]))
            # no LIMIT: the testdata's (orderkey, linenumber) pairs
            # are not unique, so a row cutoff under a non-total order
            # is engine-dependent — compare the full result instead
            return (f"SELECT {items} FROM lineitem{where} "
                    f"ORDER BY l_orderkey, l_linenumber")
        if shape < 8:
            # grouped aggregation
            keys = r.sample(STR_COLS + ["l_linenumber"],
                            r.randint(1, 2))
            aggs = []
            for i in range(r.randint(1, 3)):
                fn = r.choice(["sum", "min", "max", "count", "avg"])
                aggs.append(f"{fn}({self.num()}) AS a{i}")
            return (f"SELECT {', '.join(keys + aggs)} FROM lineitem"
                    f"{where} GROUP BY {', '.join(keys)} "
                    f"ORDER BY {', '.join(keys)}")
        # window over a deterministic order — r12: wider function set
        # and explicit ROWS frames (r11 verdict: the harness ran only
        # three window functions and never a bounded frame)
        c = self.r.choice(NUM_COLS)
        fn = self.r.choice(
            ["row_number()", "rank()", "dense_rank()",
             f"sum({c})", f"count({c})", f"min({c})", f"max({c})",
             f"lag({c}, 1)", f"lead({c}, 2)", f"first_value({c})"])
        part = self.r.choice(STR_COLS)
        frame = ""
        # bounded frames and navigations are only comparable under a
        # TOTAL order: (orderkey, linenumber) has up-to-5-row ties in
        # the fixture, so which rows land in "3 PRECEDING" is
        # engine-dependent otherwise (same lesson as LIMIT)
        order = ("l_orderkey, l_linenumber, l_partkey, l_suppkey, "
                 "l_quantity, l_extendedprice")
        if "(" in fn and not fn.startswith(("row_number", "rank",
                                            "dense_rank", "lag",
                                            "lead")) \
                and self.r.random() < 0.5:
            lo = self.r.choice(["UNBOUNDED PRECEDING", "3 PRECEDING",
                                "1 PRECEDING"])
            hi = self.r.choice(["CURRENT ROW", "1 FOLLOWING"])
            frame = f" ROWS BETWEEN {lo} AND {hi}"
        return (f"SELECT l_orderkey, l_linenumber, {fn} OVER ("
                f"PARTITION BY {part} ORDER BY {order}{frame}) AS w "
                f"FROM lineitem{where} "
                f"ORDER BY l_orderkey, l_linenumber")


def _norm(v) -> str:
    import datetime
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (float, decimal.Decimal)):
        f = float(v)
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return f"{f:.6g}"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)[:19]
    return str(v)


def _rows(rows) -> list[tuple]:
    return sorted(tuple(_norm(c) for c in r) for r in rows)


def _agree(s_rows, d_rows) -> bool:
    """Multiset equality with relative float tolerance: Spark types
    decimal literals DECIMAL where DuckDB computes DOUBLE, so long
    accumulations legitimately differ past ~6 significant digits —
    a fixed-digit string render misclassifies boundary halves."""
    if len(s_rows) != len(d_rows):
        return False
    for a, b in zip(s_rows, d_rows):
        if a == b:
            continue
        if len(a) != len(b):
            return False
        for x, y in zip(a, b):
            if x == y:
                continue
            try:
                fx, fy = float(x), float(y)
            except ValueError:
                return False
            if abs(fx - fy) > 1e-5 * max(1.0, abs(fx), abs(fy)):
                return False
    return True


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def sparktabs(spark):
    for t in ("lineitem", "orders"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet") \
            .createOrReplaceTempView(t)
    return spark


def _run_both(spark, duck, sql):
    s_rows = _rows(spark.sql(dialect.translate(sql)).collect())
    d_rows = _rows(duck.execute(sql).fetchall())
    return s_rows, d_rows


def _shrink(spark, duck, sql) -> str:
    """Cheap shrink: drop the WHERE clause, then try each candidate
    simplification that still disagrees."""
    cands = []
    if " WHERE " in sql:
        import re as _re
        cands.append(_re.sub(r" WHERE .*?(?=( GROUP BY | ORDER BY ))",
                             " ", sql, count=1))
    best = sql
    for c in cands:
        try:
            s, d = _run_both(spark, duck, c)
        except Exception:  # noqa: BLE001 — shrink candidate invalid
            continue
        if not _agree(s, d) and len(c) < len(best):
            best = c
    return best


def test_fuzz_dialect_vs_duckdb(sparktabs, duck):
    seed = int(os.environ.get("SPARK_FUZZ_SEED", "1107"))
    n = int(os.environ.get("SPARK_FUZZ_N", "60"))
    g = Gen(random.Random(seed))
    failures = []
    for i in range(n):
        sql = g.query()
        norm = " ".join(sql.split())
        if norm in FUZZ_KNOWN_DIFFS:
            continue
        try:
            s_rows, d_rows = _run_both(sparktabs, duck, sql)
        except Exception as e:  # noqa: BLE001 — engine rejected: a
            # generation bug or a real translate gap — surface it
            failures.append((sql, f"error: {str(e)[:200]}"))
            continue
        if not _agree(s_rows, d_rows):
            small = _shrink(sparktabs, duck, sql)
            failures.append(
                (small, f"spark={s_rows[:3]} duck={d_rows[:3]} "
                        f"({len(s_rows)} vs {len(d_rows)} rows)"))
    assert not failures, (
        f"{len(failures)}/{n} fuzzed statements diverge; first: "
        f"{failures[0]}")


# ---------------------------------------------------------------------------
# r12 (r11 verdict ask #2): fuzz the DIALECT-SPECIFIC rewrite surface.
# Each family emits a PAIR — the StarRocks spelling (run through
# ``translate`` on Spark) and a DuckDB-equivalent twin rendering —
# because these functions either do not exist in DuckDB or carry
# MySQL semantics DuckDB spells differently. The run asserts both
# value agreement AND that ≥20 distinct call rewrites actually fired
# (dialect.REWRITE_HITS), so the generator provably exercises the
# mapped surface instead of passing through unchanged.
# ---------------------------------------------------------------------------

_JS = "concat('{\"a\":', l_linenumber, ',\"b\":\"', l_returnflag, '\"}')"


class DialectGen:
    """(sr_expr, duck_expr) pair families over the lineitem schema."""

    def __init__(self, rng: random.Random):
        self.r = rng

    # --- scalar (row-local) families ---
    def date_format(self):
        toks = self.r.sample(
            [("%Y", "%Y"), ("%m", "%m"), ("%d", "%d"), ("%H", "%H"),
             ("%i", "%M"), ("%s", "%S"), ("%j", "%j")],
            self.r.randint(1, 3))
        sep = self.r.choice(["-", " ", ":", "/"])
        f1 = sep.join(t[0] for t in toks)
        f2 = sep.join(t[1] for t in toks)
        return (f"date_format(l_shipdate, '{f1}')",
                f"strftime(l_shipdate, '{f2}')")

    def str_to_date(self):
        if self.r.random() < 0.5:
            return ("str_to_date(date_format(l_shipdate, '%Y-%m-%d'),"
                    " '%Y-%m-%d')", "CAST(l_shipdate AS DATE)")
        return ("str_to_date(date_format(l_shipdate, "
                "'%Y-%m-%d %H:%i:%s'), '%Y-%m-%d %H:%i:%s')",
                "CAST(l_shipdate AS TIMESTAMP)")

    def from_unixtime(self):
        k = self.r.randint(1, 9)
        return (f"from_unixtime(l_orderkey * {k} + 86400)",
                f"epoch_ms((l_orderkey * {k} + 86400) * 1000)")

    def day_month_name(self):
        fn = self.r.choice(["dayname", "monthname"])
        return (f"{fn}(l_shipdate)", f"{fn}(l_shipdate)")

    def strleft_right(self):
        n = self.r.randint(1, 4)
        c = self.r.choice(["l_returnflag", "l_linestatus"])
        fn = self.r.choice([("strleft", "left"), ("strright", "right")])
        return (f"{fn[0]}(concat({c}, 'xyz'), {n})",
                f"{fn[1]}(concat({c}, 'xyz'), {n})")

    def case_fns(self):
        c = self.r.choice(["l_returnflag", "l_linestatus"])
        fn = self.r.choice([("ucase", "upper"), ("lcase", "lower")])
        return (f"{fn[0]}(concat({c}, 'aB'))",
                f"{fn[1]}(concat({c}, 'aB'))")

    def split_part(self):
        n = self.r.randint(1, 3)
        e = "concat(l_returnflag, '-', l_linestatus, '-z')"
        return (f"split_part({e}, '-', {n})",
                f"split_part({e}, '-', {n})")

    def get_json(self):
        pick = self.r.randrange(3)
        if pick == 0:
            return (f"get_json_string({_JS}, '$.b')",
                    f"json_extract_string({_JS}, '$.b')")
        if pick == 1:
            return (f"get_json_int({_JS}, '$.a')",
                    f"CAST(json_extract({_JS}, '$.a') AS BIGINT)")
        return (f"get_json_double({_JS}, '$.a')",
                f"CAST(json_extract({_JS}, '$.a') AS DOUBLE)")

    def int_date_arith(self):
        n = self.r.randint(1, 30)
        fn = self.r.choice(
            [("days_add", "+", "DAY"), ("days_sub", "-", "DAY"),
             ("months_add", "+", "MONTH"), ("months_sub", "-", "MONTH"),
             ("years_add", "+", "YEAR"), ("years_sub", "-", "YEAR"),
             ("adddate", "+", "DAY"), ("subdate", "-", "DAY")])
        return (f"{fn[0]}(l_shipdate, {n})",
                f"l_shipdate {fn[1]} INTERVAL {n} {fn[2]}")

    def interval_date_arith(self):
        n = self.r.randint(1, 20)
        u = self.r.choice(["DAY", "MONTH", "YEAR"])
        fn, op = self.r.choice([("date_add", "+"), ("date_sub", "-")])
        return (f"{fn}(l_shipdate, INTERVAL {n} {u})",
                f"l_shipdate {op} INTERVAL {n} {u}")

    def round_single(self):
        c = self.r.choice(["l_extendedprice", "l_quantity", "l_tax"])
        return (f"round({c})",
                f"CAST(round(CAST({c} AS DOUBLE)) AS BIGINT)")

    def md5sum(self):
        c = self.r.choice(["l_returnflag", "l_linestatus"])
        return (f"md5sum({c})", f"md5({c})")

    def greatest_least_date(self):
        fn = self.r.choice(["greatest", "least"])
        d = f"199{self.r.randint(2, 8)}-06-17"
        return (f"{fn}(l_shipdate, date('{d}'))",
                f"CAST({fn}(l_shipdate, TIMESTAMP '{d} 00:00:00') "
                f"AS TIMESTAMP)")

    def array_fns(self):
        pick = self.r.randrange(3)
        if pick == 0:
            return ("array_length(split(concat(l_returnflag, '-a-b'),"
                    " '-'))",
                    "len(string_split(concat(l_returnflag, '-a-b'),"
                    " '-'))")
        if pick == 1:
            return ("array_sum(array_map(x -> cast(x as int), "
                    "split('1-2-3', '-')))",
                    "list_sum(list_transform(string_split('1-2-3', "
                    "'-'), x -> CAST(x AS INT)))")
        a, b = self.r.randint(0, 3), self.r.randint(4, 7)
        return (f"array_length(array_generate({a}, {b}))",
                f"len(generate_series({a}, {b}))")

    def mysql_string_fns(self):
        """MySQL-surface functions Spark has natively but DuckDB
        spells differently — behavior-parity fuzz for the dialect's
        passthrough set."""
        r = self.r
        e = "concat(l_returnflag, '-', l_linestatus, '-z')"
        pick = r.randrange(6)
        if pick == 0:
            n = r.randint(1, 2)
            return (f"substring_index({e}, '-', {n})",
                    f"array_to_string((string_split({e}, '-'))"
                    f"[1:{n}], '-')")
        if pick == 1:
            sub = r.choice(["'A'", "'F'", "'-'"])
            return (f"locate({sub}, {e})", f"strpos({e}, {sub})")
        if pick == 2:
            sub = r.choice(["'A'", "'O'", "'z'"])
            return (f"instr({e}, {sub})", f"strpos({e}, {sub})")
        if pick == 3:
            return (f"find_in_set(l_returnflag, 'A,N,R')",
                    "coalesce(list_position(string_split('A,N,R', "
                    "','), l_returnflag), 0)")
        if pick == 4:
            n = r.randint(1, 3)
            return (f"elt({n}, 'aa', 'bb', 'cc')",
                    f"(['aa', 'bb', 'cc'])[{n}]")
        n = r.randint(1, 4)
        return (f"repeat(l_returnflag, {n})",
                f"repeat(l_returnflag, {n})")

    def mysql_num_fns(self):
        r = self.r
        pick = r.randrange(3)
        if pick == 0:
            return ("hex(l_linenumber)",
                    "upper(to_hex(l_linenumber))")
        if pick == 1:
            return ("conv(l_linenumber, 10, 2)",
                    "bin(l_linenumber)")
        k = r.randint(100, 999)
        # integer-valued input: HALF_UP vs half-even cannot differ
        # integer-valued input: money_format renders 'N,NNN.00';
        # duck only groups integers, so append the cents
        return (f"money_format(l_orderkey * 7 + {k})",
                f"format('{{:,}}', l_orderkey * 7 + {k}) || '.00'")

    def decimal_cast_arith(self):
        # int/double → DECIMAL storage-class casts with arithmetic
        r = self.r
        sc = r.randint(1, 3)
        c = r.choice(["l_quantity", "l_linenumber", "l_tax"])
        k = r.randint(2, 9)
        return (f"CAST({c} AS DECIMAL(14,{sc})) + CAST({k} AS "
                f"DECIMAL(10,0))",
                f"CAST({c} AS DECIMAL(14,{sc})) + CAST({k} AS "
                f"DECIMAL(10,0))")

    def regexp_replace(self):
        e = "concat(l_returnflag, l_linestatus)"
        return (f"regexp_replace({e}, '[AO]', 'x')",
                f"regexp_replace({e}, '[AO]', 'x', 'g')")

    # --- aggregate families (grouped by l_returnflag) ---
    def group_concat(self):
        sep = self.r.choice(["|", ","])
        return (f"group_concat(l_linestatus ORDER BY l_linestatus "
                f"SEPARATOR '{sep}')",
                f"string_agg(l_linestatus, '{sep}' "
                f"ORDER BY l_linestatus)")

    def count_if(self):
        t = self.r.randint(10, 40)
        return (f"count_if(l_quantity > {t})",
                f"count(*) FILTER (WHERE l_quantity > {t})")

    def multi_distinct(self):
        if self.r.random() < 0.5:
            return ("multi_distinct_count(l_suppkey)",
                    "count(DISTINCT l_suppkey)")
        return ("multi_distinct_sum(l_linenumber)",
                "sum(DISTINCT l_linenumber)")

    def percentile_disc(self):
        q = self.r.choice(["0.25", "0.5", "0.9"])
        return (f"percentile_disc(l_quantity, {q})",
                f"quantile_disc(l_quantity, {q})")

    SCALAR = ["date_format", "str_to_date", "from_unixtime",
              "day_month_name", "strleft_right", "case_fns",
              "split_part", "get_json", "int_date_arith",
              "interval_date_arith", "round_single", "md5sum",
              "greatest_least_date", "array_fns", "regexp_replace",
              "mysql_string_fns", "mysql_num_fns",
              "decimal_cast_arith"]
    AGG = ["group_concat", "count_if", "multi_distinct",
           "percentile_disc"]

    def statement(self):
        """One (sr_sql, duck_sql) statement pair."""
        r = self.r
        shape = r.randrange(10)
        if shape == 9:
            # DISTINCT aggregate over a window partition — StarRocks
            # desugars to scalar-state markers; the DuckDB twin is the
            # equivalent groupBy + join
            ag, col = r.choice([("count", "l_suppkey"),
                                ("sum", "l_linenumber")])
            sr = (f"SELECT l_orderkey, l_linenumber, {ag}(distinct "
                  f"{col}) OVER (PARTITION BY l_returnflag) AS w "
                  f"FROM lineitem ORDER BY l_orderkey, l_linenumber")
            dk = (f"SELECT l_orderkey, l_linenumber, w FROM lineitem "
                  f"JOIN (SELECT l_returnflag AS rf, {ag}(DISTINCT "
                  f"{col}) AS w FROM lineitem GROUP BY 1) ON "
                  f"l_returnflag = rf "
                  f"ORDER BY l_orderkey, l_linenumber")
            return sr, dk
        if shape >= 7:
            fams = r.sample(self.AGG, r.randint(1, 2))
            items = [getattr(self, f)() for f in fams]
            sr_i = ", ".join(f"{s} AS a{i}"
                             for i, (s, _) in enumerate(items))
            dk_i = ", ".join(f"{d} AS a{i}"
                             for i, (_, d) in enumerate(items))
            return (f"SELECT l_returnflag, {sr_i} FROM lineitem "
                    f"GROUP BY l_returnflag ORDER BY l_returnflag",
                    f"SELECT l_returnflag, {dk_i} FROM lineitem "
                    f"GROUP BY l_returnflag ORDER BY l_returnflag")
        fams = r.sample(self.SCALAR, r.randint(1, 3))
        items = [getattr(self, f)() for f in fams]
        sr_i = ", ".join(f"{s} AS c{i}"
                         for i, (s, _) in enumerate(items))
        dk_i = ", ".join(f"{d} AS c{i}"
                         for i, (_, d) in enumerate(items))
        tail = ("FROM lineitem ORDER BY l_orderkey, l_linenumber")
        return (f"SELECT l_orderkey, l_linenumber, {sr_i} {tail}",
                f"SELECT l_orderkey, l_linenumber, {dk_i} {tail}")


def test_fuzz_dialect_rewrite_surface(sparktabs, duck):
    from starrocks_spark.functions import (mmh3, percentile, regexfn,
                                           strcase, strtodate)

    for mod in (strcase, percentile, strtodate, regexfn, mmh3):
        mod.register(sparktabs)
    seed = int(os.environ.get("SPARK_FUZZ_SEED", "1107"))
    n = int(os.environ.get("SPARK_FUZZ_DIALECT_N", "40"))
    g = DialectGen(random.Random(seed + 1))
    dialect.REWRITE_HITS.clear()
    failures = []
    for _ in range(n):
        sr, dk = g.statement()
        if " ".join(sr.split()) in FUZZ_KNOWN_DIFFS:
            continue
        try:
            s_rows = _rows(sparktabs.sql(dialect.translate(sr))
                           .collect())
            d_rows = _rows(duck.execute(dk).fetchall())
        except Exception as e:  # noqa: BLE001 — engine rejected
            failures.append((sr, f"error: {str(e)[:200]}"))
            continue
        if not _agree(s_rows, d_rows):
            failures.append(
                (sr, f"spark={s_rows[:2]} duck={d_rows[:2]} "
                     f"({len(s_rows)} vs {len(d_rows)} rows)"))
    assert not failures, (
        f"{len(failures)}/{n} dialect-family statements diverge; "
        f"first: {failures[0]}")
    # the run must have exercised a broad slice of the mapped surface
    assert len(dialect.REWRITE_HITS) >= 20, sorted(dialect.REWRITE_HITS)
