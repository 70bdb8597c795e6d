"""Unit tests for the token-based statement lexer/classifier/DDL
parser (r10 tokenizer promotion; the acceptance matrix in
test_sqltester.py is the end-to-end safety net)."""
import pytest

from starrocks_spark.plans.sqlddl import parse_create_table
from starrocks_spark.plans.sqllex import (TokenStream, classify,
                                          split_statements, tokenize)
from starrocks_spark.tables.models import TableModel


def test_tokenize_kinds():
    toks = tokenize("select `a b`, 'x;\\'y', 1.5e3 -- c\n/*b*/ from t")
    kinds = [(t.kind, t.text) for t in toks]
    assert ("qident", "`a b`") in kinds
    assert ("string", "'x;\\'y'") in kinds
    assert ("number", "1.5e3") in kinds
    assert all(t.kind != "comment" for t in toks)  # trivia dropped
    toks2 = tokenize("select 1 /*q*/", keep_comments=True)
    assert any(t.kind == "comment" for t in toks2)


def test_token_stream_balanced():
    ts = TokenStream("f(a, g(b, 'x)y'), c) tail")
    ts.next()
    inner, end = ts.balanced()
    assert inner == "a, g(b, 'x)y'), c"
    assert ts.kw() == "TAIL"


@pytest.mark.parametrize("stmt,kind", [
    ("CREATE TABLE t (a int)", "create"),
    ("create table if not exists t (a int)", "create"),
    ("CREATE OR REPLACE VIEW v AS SELECT 1", "createview"),
    ("CREATE VIEW IF NOT EXISTS v AS SELECT 1", "createview"),
    ("CREATE MATERIALIZED VIEW mv AS SELECT 1", "createmv"),
    ("CREATE DATABASE db1", "noop"),
    ("CREATE USER u1", "noop"),
    ("CREATE RESOURCE GROUP rg1 TO (user='x')", "noop"),
    ("CREATE INDEX i ON t (c)", "unsupported"),
    ("DROP TABLE IF EXISTS t FORCE", "drop"),
    ("DROP VIEW v", "dropview"),
    ("DROP MATERIALIZED VIEW mv", "dropmv"),
    ("DROP DATABASE db1", "noop"),
    ("ALTER TABLE t ADD COLUMN c int", "alter"),
    ("ALTER MATERIALIZED VIEW mv ACTIVE", "altermv"),
    ("ALTER SYSTEM SET x = 1", "noop"),
    ("ALTER VIEW v AS SELECT 1", "unsupported"),
    ("TRUNCATE TABLE t", "truncate"),
    ("DELETE FROM t WHERE a = 1", "delete"),
    ("UPDATE t SET a = 1", "update"),
    ("INSERT INTO t VALUES (1)", "insert"),
    ("REFRESH MATERIALIZED VIEW mv", "refreshmv"),
    ("CANCEL REFRESH MATERIALIZED VIEW mv", "noop"),
    ("SYNC", "noop"),
    ("SET enable_x = true", "noop"),
    ("GRANT SELECT ON TABLE t TO u", "noop"),
    ("REVOKE SELECT ON TABLE t FROM u", "noop"),
    ("ANALYZE TABLE t", "noop"),
    ("USE db1", "noop"),
    ("ADMIN SET FRONTEND CONFIG ('k'='v')", "noop"),
    ("/*q0*/select 1", "select"),
    ("VALUES (1), (2)", "select"),
    ("SELECT * FROM t", "select"),
    # CTE head: classify by the first TOP-LEVEL keyword after the
    # CTE list; a CTE named deleted_rows must not become a DELETE
    ("with deleted_rows as (select 1) select * from deleted_rows",
     "select"),
    ("with c as (select 1) update t set a = 1", "update"),
    ("with c as (select 1) delete from t where a in (select 1)",
     "delete"),
    ("nonsense statement", "unsupported"),
])
def test_classify(stmt, kind):
    assert classify(stmt) == kind


def test_split_statements_quirks():
    script = (
        "-- full-line comment dropped\n"
        "select 1; -- trailing comment joins the NEXT stmt head\n"
        "select 'a;b';\n"
        "[UC]select 2;\n"
        "shell: ossutil64 cp a b\n"
        "select 3"
    )
    stmts = split_statements(script)
    assert stmts == ["select 1", "select 'a;b'", "select 2",
                     "select 3"]
    tagged = split_statements(script, keep_tags=True)
    assert any(s.startswith("[UC]") for s in tagged)


def test_parse_create_table_clause_order_independent():
    # tail clauses parse in ANY order (the r9 verdict's ordered-regex
    # concern) — reference FE accepts both orders identically
    a = parse_create_table(
        'CREATE TABLE t (a int, b varchar(10)) '
        'DISTRIBUTED BY HASH(a) BUCKETS 4 '
        'DUPLICATE KEY(a) COMMENT "c" '
        'PROPERTIES("replication_num"="1")')
    b = parse_create_table(
        'CREATE TABLE t (a int, b varchar(10)) '
        'DUPLICATE KEY(a) COMMENT "c" '
        'PROPERTIES("replication_num"="1") '
        'DISTRIBUTED BY HASH(a) BUCKETS 4')
    for d in (a, b):
        assert d.model is TableModel.DUP_KEYS
        assert d.key_cols == ["a"] and d.hash_cols == ["a"]
        assert d.buckets == 4 and d.comment == "c"
        assert d.raw_props["replication_num"] == "1"
        assert not d.random_dist


def test_parse_create_table_coldefs():
    d = parse_create_table(
        'CREATE TABLE t (\n'
        '  `k` bigint NOT NULL AUTO_INCREMENT,\n'
        '  v decimal(19, 2) SUM DEFAULT "1.5",\n'
        '  s struct<a int, b array<int>>,\n'
        '  g bigint AS (k + 1) COMMENT "gen",\n'
        '  INDEX ng (s) USING NGRAMBF ("gram_num"="4")\n'
        ') AGGREGATE KEY(`k`)')
    assert [c.name for c in d.cols] == ["k", "v", "s", "g"]
    k, v, s, g = d.cols
    assert not k.nullable and k.auto_inc
    assert v.agg == "SUM" and v.default == "'1.5'"
    assert s.sr_type == "struct<a int,b array<int>>"
    assert g.gen_expr == "(k + 1)"
    assert d.has_index and d.indexes["ng"]["using"] == "NGRAMBF"
    assert d.indexes["ng"]["props"] == {"gram_num": "4"}


def test_parse_create_table_partitions():
    d = parse_create_table(
        'CREATE TABLE t (dt date, v int) '
        'PARTITION BY RANGE(dt) ('
        ' PARTITION p1 VALUES LESS THAN ("2024-01-01"),'
        ' PARTITION pmax VALUES LESS THAN (MAXVALUE)) '
        'DISTRIBUTED BY HASH(dt)')
    assert d.range_col == "dt" and d.has_partition
    assert d.named_parts["p1"] == (None, "2024-01-01", True)
    assert d.named_parts["pmax"][1] is None
    # half-open form: parens inside [..) do NOT balance — parsed from
    # the raw tail like the LESS THAN form
    h = parse_create_table(
        'CREATE TABLE t (dt date, v int) '
        'PARTITION BY RANGE(dt) ('
        ' PARTITION p2 VALUES [("2024-01-01"), ("2024-02-01"))) '
        'DISTRIBUTED BY HASH(dt)')
    assert h.named_parts["p2"] == ("2024-01-01", "2024-02-01", True)
    assert h.hash_cols == ["dt"]
    e = parse_create_table(
        'CREATE TABLE t2 (dt datetime, v int) '
        'PARTITION BY date_trunc("day", dt) DISTRIBUTED BY HASH(v)')
    assert e.part_expr == 'date_trunc("day", dt)'
    f = parse_create_table(
        "CREATE TABLE t3 (c int) PARTITION BY LIST(c) ("
        "PARTITION pa VALUES IN (1, 2))")
    assert f.list_parts == {"pa": ["1", "2"]}


def test_parse_create_table_defaults_and_sort():
    d = parse_create_table(
        "CREATE TABLE t (a int) PRIMARY KEY(a) ORDER BY (a) "
        "DISTRIBUTED BY RANDOM BUCKETS 2")
    # explicit RANDOM is recorded (non-dup models reject it later)
    assert d.random_explicit and d.buckets == 2
    assert d.sort_cols == ["a"]
    assert not d.cols[0].nullable  # PK implicitly NOT NULL
    with pytest.raises(ValueError, match="Duplicate sort key"):
        parse_create_table(
            "CREATE TABLE t (a int) ORDER BY (a, a)")


def test_balanced_strips_inline_comments():
    # r11 ADVICE: an inline -- comment inside HASH(...)/KEY(...)
    # must not corrupt the split column list
    ts = TokenStream("(id -- hash col\n, name) rest")
    inner, _ = ts.balanced()
    assert [c.strip() for c in inner.split(",")] == ["id", "name"]
    d = parse_create_table(
        "CREATE TABLE t (id int, name string) "
        "DISTRIBUTED BY HASH(id -- hash col\n) BUCKETS 4")
    assert d.hash_cols == ["id"]


def test_default_expression_captured_whole():
    # r11 ADVICE: DEFAULT (expr) keeps the full balanced expression
    d = parse_create_table(
        "CREATE TABLE t (a int, b datetime DEFAULT (now()), "
        "c varchar(10) DEFAULT 'x')")
    assert d.col("b").default == "(now())"
    assert d.col("c").default == "'x'"


def test_parse_alter_table_clauses():
    # r11 tokenizer promotion phase 2: every clause family parses off
    # the shared token stream
    from starrocks_spark.plans.sqlddl import parse_alter_table as pat
    n, _, a = pat("ALTER TABLE t DROP PARTITION IF EXISTS p1 FORCE")
    assert (n, a[0].kind, a[0].a) == (
        "t", "drop_partition", {"name": "p1", "force": True})
    _, _, a = pat('ALTER TABLE t ADD PARTITION IF NOT EXISTS p2 '
                  'VALUES LESS THAN ("100")')
    assert a[0].kind == "add_partition_lt" and a[0].a["hi"] == "100"
    _, _, a = pat('ALTER TABLE t ADD PARTITION p3 VALUES '
                  '[("10"), (MAXVALUE))')
    assert a[0].kind == "add_partition_range"
    assert a[0].a == {"name": "p3", "lo": "10", "hi": None}
    _, _, a = pat("ALTER TABLE t ADD ROLLUP r1 (k, v) FROM t")
    assert a[0].a == {"name": "r1", "cols": ["k", "v"]}
    _, _, a = pat("ALTER TABLE t RENAME COLUMN a TO b")
    assert a[0].kind == "rename_column"
    _, _, a = pat("ALTER TABLE t ADD COLUMN x int DEFAULT '9', "
                  "ADD COLUMN y varchar(10)")
    cols = a[0].a["cols"]
    assert [c.name for c in cols] == ["x", "y"]
    assert cols[0].default == "'9'"
    _, _, a = pat("ALTER TABLE t ADD COLUMN (x int, y int)")
    assert [c.name for c in a[0].a["cols"]] == ["x", "y"]
    _, _, a = pat("ALTER TABLE t ADD INDEX i1 (c) USING GIN")
    assert a[0].a["name"] == "i1" and a[0].a["using"] == "GIN"
    _, _, a = pat("ALTER TABLE t DROP INDEX i1")
    assert a[0].kind == "drop_index"
    _, _, a = pat("ALTER TABLE t MODIFY COLUMN c varchar(30) KEY "
                  "NOT NULL")
    assert a[0].a == {"col": "c", "type": "varchar(30)",
                      "nullable": False}
    _, _, a = pat("ALTER TABLE t DROP COLUMN c")
    assert a[0].kind == "drop_column"
    _, _, a = pat("ALTER TABLE t ORDER BY (a, b)")
    assert a[0].a["cols"] == ["a", "b"]
    _, _, a = pat("ALTER TABLE t AUTO_INCREMENT = 100")
    assert a[0].a["n"] == 100
    _, _, a = pat("ALTER TABLE t RENAME t2")
    assert a[0].kind == "rename_table" and a[0].a["new"] == "t2"
    _, _, a = pat("ALTER TABLE t SWAP WITH u")
    assert a[0].kind == "swap_with"
    _, _, a = pat("ALTER TABLE t DISTRIBUTED BY HASH(k) BUCKETS 4")
    assert a[0].kind == "distribution"
    assert a[0].a["hash_cols"] == ["k"] and a[0].a["buckets"] == 4
    _, _, a = pat("ALTER TABLE t PARTITIONS(p1,p2) DISTRIBUTED BY "
                  "HASH(k) BUCKETS 4")
    assert a[0].a["partitions"] == ["p1", "p2"]
    with pytest.raises(ValueError, match="unsupported action"):
        pat("ALTER TABLE t FROBNICATE")


def test_parse_alter_add_drop_field():
    from starrocks_spark.plans.sqlddl import parse_alter_table as pat
    _, _, a = pat("alter table t modify column c1 add field v1.v5 "
                  "int")
    assert a[0].kind == "add_field"
    assert a[0].a["path"] == ["v1", "v5"] and a[0].a["ftype"] == "int"
    _, _, a = pat("alter table t modify column c1 add field [*].v9 "
                  "int AFTER v2")
    assert a[0].a["path"] == ["[*]", "v9"]
    assert a[0].a["after"] == "v2"
    _, _, a = pat("alter table t modify column c1 drop field [*]")
    assert a[0].kind == "drop_field" and a[0].a["path"] == ["[*]"]


def test_type_tree_roundtrip_and_retype():
    from starrocks_spark.plans.sqlddl import (_parse_type_tree,
                                              _render_type_tree,
                                              _retype_expr)
    s = "struct<v1 int,v2 struct<v3 int,v4 int>>"
    t = _parse_type_tree(s)
    assert _render_type_tree(t) == s
    t2 = _parse_type_tree("struct<v2 struct<v3 int,v4 int>,val1 int>")
    e = _retype_expr("`c`", t, t2)
    assert "named_struct" in e and "'val1', NULL" in e
    a1 = _parse_type_tree("array<struct<v1 int,v2 int>>")
    a2 = _parse_type_tree("array<struct<v2 int>>")
    assert _retype_expr("`c`", a1, a2).startswith("transform(")
