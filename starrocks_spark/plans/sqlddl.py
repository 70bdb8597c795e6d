"""Token-based CREATE TABLE parsing (StarRocks.g4:1346
createTableStatement subset; fe .../sql/parser/AstBuilder.java
visitCreateTableStatement).

Promoted from the r1–r9 ordered-regex parser in ``sqltester`` per the
round-9 verdict: the column-def list and every tail clause (key desc,
ENGINE, COMMENT, PARTITION BY, DISTRIBUTED BY, ORDER BY, ROLLUP,
PROPERTIES) now parse from one token stream, each clause dispatched
by keyword in ANY order — no ordered-regex sensitivity. The
400+-case acceptance matrix pins behavior across the promotion.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field

from starrocks_spark.tables.models import TableModel

from .sqllex import Tok, TokenStream, tokenize

_AGG_TYPES = {"SUM", "MIN", "MAX", "REPLACE", "REPLACE_IF_NOT_NULL",
              "HLL_UNION", "BITMAP_UNION"}

_MODEL_MAP = {
    "DUPLICATE": TableModel.DUP_KEYS,
    "AGGREGATE": TableModel.AGG_KEYS,
    "UNIQUE": TableModel.UNIQUE_KEYS,
    "PRIMARY": TableModel.PRIMARY_KEYS,
}


@dataclass
class ColumnDef:
    name: str
    sr_type: str                 # normalized lowercase StarRocks type
    agg: str | None = None       # AGG_KEYS value-column agg type
    default: str | None = None   # DEFAULT literal (SQL text)
    nullable: bool = True        # NOT NULL absent in the DDL
    # generated column: `name type AS <expr>` — computed from the
    # other columns of the same row at LOAD time (fe
    # GeneratedColumnUtil; StarRocks.g4 columnDesc generatedColumn)
    gen_expr: str | None = None
    auto_inc: bool = False       # AUTO_INCREMENT (fe auto-inc ids)
    null_explicit: bool = False  # a standalone NULL keyword in DDL


@dataclass
class TableDef:
    name: str
    cols: list[ColumnDef]
    model: TableModel = TableModel.DUP_KEYS
    key_cols: list[str] = field(default_factory=list)
    hash_cols: list[str] = field(default_factory=list)
    buckets: int | None = None
    bf_cols: list[str] = field(default_factory=list)  # bloom filters
    # physical names of renamed-away columns: the reference keeps the
    # original column name reserved in the storage schema, so ADD
    # COLUMN with a renamed-away name is rejected
    reserved: list[str] = field(default_factory=list)
    raw_props: dict = field(default_factory=dict)  # DDL PROPERTIES
    has_partition: bool = False     # PARTITION BY present in the DDL
    has_index: bool = False         # secondary INDEX defs present
    comment: str | None = None      # table COMMENT text
    sort_cols: list[str] = field(default_factory=list)  # ORDER BY
    # secondary index DDL: name -> {"col", "using", "props"}
    # (ALTER TABLE ADD INDEX ... USING VECTOR/GIN/BITMAP)
    indexes: dict = field(default_factory=dict)
    auto_seq: int = 0            # next AUTO_INCREMENT id - 1

    def col(self, name: str) -> ColumnDef:
        for c in self.cols:
            if c.name == name:
                return c
        raise KeyError(name)


def _norm_type(t: str) -> str:
    """Lowercase + collapse whitespace, spaces stripped around
    structural chars (struct<a int, b int> keeps the name/type
    space)."""
    return re.sub(r"\s*([<>,()])\s*", r"\1",
                  re.sub(r"\s+", " ", t.lower())).strip()


def _split_coldefs_toks(toks: list[Tok]) -> list[list[Tok]]:
    """Split a column-def token list on top-level commas, tracking
    () AND the <> of generic types (struct<a int, b int> is one
    def). A ``<`` opens a generic only after an array/map/struct
    type word, which cannot be confused with comparisons in DDL."""
    parts: list[list[Tok]] = []
    cur: list[Tok] = []
    depth = 0
    for t in toks:
        if t.kind == "punct":
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
            elif (t.text == "<" and cur
                  and cur[-1].kind == "ident"
                  and cur[-1].up in ("ARRAY", "MAP", "STRUCT")):
                depth += 1
            elif t.text == "<" and depth > 0:
                # nested generic opener inside an outer generic
                # (map<int, array<int>> — inner array< matched above;
                # bare ``<`` inside a generic is a nested opener)
                depth += 1
            elif t.text == ">" and depth > 0:
                depth -= 1
            elif t.text == "," and depth == 0:
                parts.append(cur)
                cur = []
                continue
        cur.append(t)
    if cur:
        parts.append(cur)
    return parts


def _parse_index_def(entry: list[Tok], sql: str, d: TableDef) -> None:
    """INDEX name (col) [USING kind] [(props)] [COMMENT '..']."""
    es = TokenStream(sql, entry)
    es.next()                             # INDEX
    iname = es.ident()
    if iname is None or not es.is_punct("("):
        return
    inner, _ = es.balanced()
    icol = inner.strip().strip("`")
    using = "BITMAP"
    props: dict = {}
    if es.match_kws("USING"):
        using = (es.ident() or "BITMAP").upper()
    if es.is_punct("("):
        pbody, _ = es.balanced()
        props = dict(re.findall(
            r"['\"]([^'\"]+)['\"]\s*=\s*['\"]([^'\"]*)['\"]", pbody))
    d.indexes[iname] = {"col": icol, "using": using, "props": props}


def _parse_coldef(entry: list[Tok], sql: str) -> ColumnDef:
    """name type [agg] [NULL|NOT NULL] [DEFAULT lit]
    [AUTO_INCREMENT] [AS expr] [COMMENT '..']"""
    es = TokenStream(sql, entry)
    cname = es.ident()
    if cname is None:
        raise ValueError(f"unparsed column def: "
                         f"{sql[entry[0].start:entry[-1].end]!r}")
    # type: word + optional (args) + optional <generic>
    t0 = es.peek()
    if t0 is None or t0.kind != "ident":
        raise ValueError(f"unparsed column def: "
                         f"{sql[entry[0].start:entry[-1].end]!r}")
    es.next()
    type_end = t0.end
    if es.is_punct("("):
        _, type_end = es.balanced()
    if es.is_punct("<"):
        depth = 0
        while True:
            t = es.next()
            if t is None:
                raise ValueError("unbalanced generic in column def")
            if t.kind == "punct":
                if t.text == "<":
                    depth += 1
                elif t.text == ">":
                    depth -= 1
                    if depth == 0:
                        type_end = t.end
                        break
    c = ColumnDef(cname, _norm_type(sql[t0.start:type_end]))
    entry_end = entry[-1].end
    first_mod = True
    while not es.at_end():
        t = es.peek()
        if t.kind == "ident":
            u = t.up
            if first_mod and u in _AGG_TYPES:
                c.agg = u
                es.next()
                first_mod = False
                continue
            first_mod = False
            if u == "NOT" and es.kw(1) == "NULL":
                c.nullable = False
                es.pos += 2
                continue
            if u == "NULL":
                c.null_explicit = True
                es.next()
                continue
            if u == "AUTO_INCREMENT":
                c.auto_inc = True
                es.next()
                continue
            if u == "DEFAULT":
                es.next()
                if es.is_punct("("):
                    # expression default (DEFAULT (now()) / (uuid())):
                    # keep the full balanced expression, not just '('.
                    inner, _ = es.balanced()
                    c.default = "(" + inner.strip() + ")"
                    continue
                neg = ""
                if es.is_punct("-"):
                    es.next()
                    neg = "-"
                v = es.next()
                if v is not None:
                    if v.kind == "string" and v.text.startswith('"'):
                        c.default = "'" + v.text[1:-1] + "'"
                    else:
                        c.default = neg + v.text
                continue
            if u == "AS":
                es.next()
                nxt = es.peek()
                gstart = nxt.start if nxt is not None else entry_end
                gexpr = sql[gstart:entry_end].strip()
                c.gen_expr = re.sub(r'\s*COMMENT\s+"[^"]*"\s*$', "",
                                    gexpr) or None
                break
            es.next()
            continue
        first_mod = False
        if t.kind == "punct" and t.text == "(":
            es.balanced()
            continue
        es.next()
    return c


# tail-clause heads that terminate an expression-partition capture
_PART_EXPR_STOPS = {"DISTRIBUTED", "PROPERTIES", "ORDER", "COMMENT"}


def parse_create_table(stmt: str) -> TableDef:
    """CREATE TABLE [IF NOT EXISTS] name (coldefs...) + tail clauses
    in any order."""
    ts = TokenStream(stmt)
    if not ts.match_kws("CREATE", "TABLE"):
        raise ValueError(f"not a CREATE TABLE: {stmt[:60]}")
    ts.match_kws("IF", "NOT", "EXISTS")
    name = ts.ident()
    if name is None or not ts.is_punct("("):
        raise ValueError(f"not a CREATE TABLE: {stmt[:60]}")
    body_toks_start = ts.pos + 1
    _, body_end = ts.balanced()
    body_toks = ts.toks[body_toks_start:ts.pos - 1]

    d = TableDef(name, [])
    d.range_col, d.named_parts = None, {}
    d.list_parts = {}
    d.part_expr = None
    entries = _split_coldefs_toks(body_toks)
    for entry in entries:
        if not entry:
            continue
        head = entry[0].up if entry[0].kind in ("ident", "qident") \
            else ""
        if head == "INDEX":
            d.has_index = True
            _parse_index_def(entry, stmt, d)
            continue
        if head in ("KEY", "CONSTRAINT"):
            continue
        d.cols.append(_parse_coldef(entry, stmt))

    # --- tail clauses, keyword-dispatched in any order -------------
    key_seen = False
    saw_distributed = False
    while not ts.at_end():
        t = ts.peek()
        if t.kind != "ident":
            ts.next()
            continue
        u = t.up
        if u in _MODEL_MAP and ts.kw(1) == "KEY":
            ts.pos += 2
            if ts.is_punct("("):
                inner, _ = ts.balanced()
                d.model = _MODEL_MAP[u]
                d.key_cols = [c.strip().strip("`")
                              for c in inner.split(",")]
                key_seen = True
            continue
        if u == "COMMENT":
            ts.next()
            v = ts.peek()
            if v is not None and v.kind == "string":
                d.comment = v.text[1:-1]
                ts.next()
            continue
        if u == "ORDER" and ts.kw(1) == "BY":
            ts.pos += 2
            if ts.is_punct("("):
                inner, _ = ts.balanced()
                seen_ob: set[str] = set()
                for cn in inner.split(","):
                    cn = cn.strip().strip("`")
                    if cn in seen_ob:
                        raise ValueError(f"Duplicate sort key column "
                                         f"{cn} is not allowed.")
                    seen_ob.add(cn)
                    d.sort_cols.append(cn)
            continue
        if u == "PARTITION" and ts.kw(1) == "BY":
            ts.pos += 2
            d.has_partition = True
            _parse_partition_by(ts, d)
            continue
        if u == "DISTRIBUTED" and ts.kw(1) == "BY":
            ts.pos += 2
            saw_distributed = True
            kind = ts.kw()
            if kind == "HASH":
                ts.next()
                if ts.is_punct("("):
                    inner, _ = ts.balanced()
                    d.hash_cols = [c.strip().strip("`")
                                   for c in inner.split(",")]
            elif kind == "RANDOM":
                ts.next()
                d.random_explicit = True
            if ts.match_kws("BUCKETS"):
                b = ts.next()
                if b is not None and b.kind == "number":
                    d.buckets = int(b.text)
            continue
        if u == "PROPERTIES":
            ts.next()
            if ts.is_punct("("):
                pbody, _ = ts.balanced()
                d.raw_props = dict(re.findall(
                    r'"([^"]+)"\s*=\s*"([^"]*)"', pbody))
            continue
        if u == "ENGINE":
            ts.next()
            if ts.is_punct("="):
                ts.next()
            ts.ident()
            continue
        if u == "ROLLUP":
            ts.next()
            ts.skip_balanced_if_open()
            continue
        ts.next()

    # AUTO_INCREMENT analysis (fe CreateTableAnalyzer /
    # AutoIncrementInfo): exactly one BIGINT NOT-NULL column, no
    # declared default
    autos = [c for c in d.cols if c.auto_inc]
    if len(autos) > 1:
        raise ValueError("More than one AUTO_INCREMENT column "
                         "defined in CREATE TABLE Statement")
    for c in autos:
        if c.null_explicit:
            raise ValueError(f"Getting analyzing error. Detail "
                             f"message: AUTO_INCREMENT column: "
                             f"{c.name} must be NOT NULL.")
        if c.default is not None:
            raise ValueError(f"Getting analyzing error. Detail "
                             f"message: AUTO_INCREMENT column: "
                             f"{c.name} can not have a default "
                             f"value.")
        if not c.sr_type.startswith("bigint"):
            raise ValueError(f"Getting analyzing error. Detail "
                             f"message: AUTO_INCREMENT column: "
                             f"{c.name} must be BIGINT.")
    if not key_seen:
        if not d.cols:
            raise ValueError(f"CREATE TABLE {name}: no columns")
        d.key_cols = [d.cols[0].name]  # reference default: prefix key
    if d.model is TableModel.PRIMARY_KEYS:
        # PK columns are implicitly NOT NULL (CreateTableAnalyzer)
        for c in d.cols:
            if c.name in d.key_cols:
                c.nullable = False
    bf = d.raw_props.get("bloom_filter_columns")
    if bf:
        d.bf_cols = [c.strip().strip("`")
                     for c in bf.split(",") if c.strip()]
    # no DISTRIBUTED clause → the FE defaults DUP tables to RANDOM
    # (CreateTableAnalyzer defaultDistributionInfo); non-dup models
    # default to hash on the key — and reject EXPLICIT random
    d.random_explicit = getattr(d, "random_explicit", False)
    d.random_dist = d.random_explicit or (
        d.model is TableModel.DUP_KEYS and not saw_distributed)
    return d


def _parse_partition_by(ts: TokenStream, d: TableDef) -> None:
    """RANGE(col) (named range parts) | LIST(col) (named list parts)
    | <expression> — cursor sits just past PARTITION BY."""
    kind = ts.kw()
    if kind == "RANGE" and ts.is_punct("(", 1):
        ts.next()
        inner, _ = ts.balanced()
        d.range_col = inner.strip().strip("`")
        # the named-parts list can contain the half-open
        # ``VALUES [("lo"), ("hi"))`` form whose parens do NOT
        # balance — scan the remaining text with findall (the
        # PARTITION..VALUES shape is unambiguous) and let the caller
        # skip the tokens
        t0 = ts.peek()
        if t0 is not None:
            _parse_named_range_parts(ts.sql[t0.start:], d)
        return
    if kind == "LIST" and ts.is_punct("(", 1):
        ts.next()
        inner, _ = ts.balanced()
        d.range_col = inner.strip().strip("`")
        t0 = ts.peek()
        if t0 is not None:
            for pn8, vals8 in re.findall(
                    r"PARTITION\s+`?(\w+)`?\s+VALUES\s+IN\s*"
                    r"\(([^)]*)\)", ts.sql[t0.start:], re.IGNORECASE):
                d.list_parts[pn8] = [v.strip().strip("'\"")
                                     for v in vals8.split(",")]
        return
    # expression partitioning: capture until the next top-level tail
    # clause keyword (any order) or end of statement
    start_tok = ts.peek()
    if start_tok is None:
        return
    pe_start = start_tok.start
    pe_end = pe_start
    while not ts.at_end():
        t = ts.peek()
        if t.kind == "ident" and t.up in _PART_EXPR_STOPS:
            break
        if t.kind == "punct" and t.text == "(":
            _, pe_end = ts.balanced()
            continue
        ts.next()
        pe_end = t.end
    pe9 = ts.sql[pe_start:pe_end].strip()
    if pe9.startswith("(") and pe9.endswith(")"):
        depth = 0
        outer = True
        for i, ch in enumerate(pe9):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(pe9) - 1:
                    outer = False
                    break
        if outer:
            pe9 = pe9[1:-1].strip()
    d.part_expr = pe9.strip("`") or None


def _parse_named_range_parts(pbody: str, d: TableDef) -> None:
    """PARTITION name VALUES LESS THAN ("hi"|MAXVALUE) and
    PARTITION name VALUES [("lo"), ("hi")) forms; NULL keys live in
    the FIRST partition (fe RangePartitionInfo)."""
    pairs8 = re.findall(
        r"PARTITION\s+`?(\w+)`?\s+VALUES\s+LESS\s+THAN\s*"
        r"\(\s*(?:(MAXVALUE)|[\"']([^\"']*)[\"'])\s*\)",
        pbody, re.IGNORECASE)
    prev8 = None
    for i8, (pn8, mx8, up8) in enumerate(pairs8):
        d.named_parts[pn8] = (prev8, None if mx8 else up8, i8 == 0)
        prev8 = None if mx8 else up8
    for i8, (pn8, lo8, hx8, hi8) in enumerate(re.findall(
            r"PARTITION\s+`?(\w+)`?\s+VALUES\s+\[\s*\(\s*"
            r"[\"']([^\"']*)[\"']\s*\)\s*,\s*\(\s*"
            r"(?:(MAXVALUE)|[\"']([^\"']*)[\"'])\s*\)\s*\)", pbody,
            re.IGNORECASE)):
        d.named_parts[pn8] = (lo8, None if hx8 else hi8, i8 == 0)
