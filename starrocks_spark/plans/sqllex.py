"""Token-based SQL lexing for the acceptance runner.

The round-8/9 verdicts flagged the runner's ordered-regex statement
handling as process debt: statement splitting, classification, and
CREATE TABLE parsing each re-scanned raw text with mutually
order-sensitive regexes. This module supplies one shared lexer and
rebuilds the statement splitter and classifier on it; the DDL parser
in ``sqlddl`` builds on the same token stream. The 400+-case
acceptance matrix (tests/test_sqltester.py) pins behavior across the
promotion.

Reference parity: statement kinds mirror the dispatch of the
reference's parser (fe/fe-core .../sql/parser/AstBuilder.java over
StarRocks.g4 statement alternatives); the splitter mirrors
sr_sql_lib's script splitting (test/lib/sr_sql_lib.py).
"""
from __future__ import annotations

import re
from dataclasses import dataclass

# run-mode hints and runner directives, shared with R-file parsing.
# SET_VAR/LOOP block markers (sr_sql_lib config blocks) are dropped
# as directives: their inner statements run ONCE in script order —
# the runner is synchronous, so a one-shot pass is the settled state
# the LOOP would have waited for.
TAG_RE = re.compile(r"^\[(UC|ORDER|REGEX)\]\s*", re.IGNORECASE)
DIRECTIVE_RE = re.compile(
    r"^(function|shell|trino|spark|hive)\s*:"
    r"|^(SET_VAR|LOOP|CONCURRENCY|CLEANUP)\s*\{"
    r"|^\}\s*END\s+(SET_VAR|LOOP|CONCURRENCY|CLEANUP)\b"
    r"|^PROPERTY\s*:|^CHECK\s*:", re.I)


@dataclass
class Tok:
    kind: str   # ident | qident | string | number | punct | comment
    text: str   # verbatim source text (quotes/backticks included)
    start: int
    end: int

    @property
    def up(self) -> str:
        """Uppercased bare text — keyword comparisons for ident
        tokens, unquoted value for qident/string tokens."""
        if self.kind == "qident":
            return self.text[1:-1].upper()
        if self.kind == "string":
            return self.text[1:-1].upper()
        return self.text.upper()

    @property
    def bare(self) -> str:
        """Identifier text with backticks/quotes stripped."""
        if self.kind in ("qident", "string"):
            return self.text[1:-1]
        return self.text


_IDENT_START = set("abcdefghijklmnopqrstuvwxyz"
                   "ABCDEFGHIJKLMNOPQRSTUVWXYZ_$")
_IDENT_CONT = _IDENT_START | set("0123456789")
_DIGITS = set("0123456789")


def tokenize(sql: str, keep_comments: bool = False) -> list[Tok]:
    """Lex ``sql`` into tokens. Strings honor backslash escapes (the
    suites' convention); ``--`` line and ``/* */`` block comments are
    dropped unless ``keep_comments``; punctuation is single-char."""
    toks: list[Tok] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if sql[j] == "\\":
                    j += 2
                    continue
                if sql[j] == ch:
                    break
                j += 1
            j = min(j + 1, n)
            toks.append(Tok("string", sql[i:j], i, j))
            i = j
            continue
        if ch == "`":
            j = sql.find("`", i + 1)
            j = n if j < 0 else j + 1
            toks.append(Tok("qident", sql[i:j], i, j))
            i = j
            continue
        if ch == "-" and sql[i:i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            if keep_comments:
                toks.append(Tok("comment", sql[i:j], i, j))
            i = j
            continue
        if ch == "/" and sql[i:i + 2] == "/*":
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            if keep_comments:
                toks.append(Tok("comment", sql[i:j], i, j))
            i = j
            continue
        if ch in _IDENT_START:
            j = i + 1
            while j < n and sql[j] in _IDENT_CONT:
                j += 1
            toks.append(Tok("ident", sql[i:j], i, j))
            i = j
            continue
        if ch in _DIGITS or (ch == "." and i + 1 < n
                             and sql[i + 1] in _DIGITS):
            j = i + 1
            while j < n and (sql[j] in _DIGITS or sql[j] in ".eE"
                             or (sql[j] in "+-"
                                 and sql[j - 1] in "eE")):
                j += 1
            toks.append(Tok("number", sql[i:j], i, j))
            i = j
            continue
        toks.append(Tok("punct", ch, i, i + 1))
        i += 1
    return toks


class TokenStream:
    """Cursor over a token list with keyword-oriented helpers."""

    def __init__(self, sql: str, toks: list[Tok] | None = None):
        self.sql = sql
        self.toks = tokenize(sql) if toks is None else toks
        self.pos = 0

    def peek(self, k: int = 0) -> Tok | None:
        j = self.pos + k
        return self.toks[j] if j < len(self.toks) else None

    def kw(self, k: int = 0) -> str:
        """Uppercased ident text at offset k; '' for non-idents/EOF."""
        t = self.peek(k)
        return t.up if t is not None and t.kind == "ident" else ""

    def at_end(self, k: int = 0) -> bool:
        return self.pos + k >= len(self.toks)

    def next(self) -> Tok | None:
        t = self.peek()
        if t is not None:
            self.pos += 1
        return t

    def try_kws(self, *kws: str) -> bool:
        """True when the next tokens are exactly these keywords."""
        return all(self.kw(i) == k.upper() for i, k in enumerate(kws))

    def match_kws(self, *kws: str) -> bool:
        """Advance past the keywords when they match; else no-op."""
        if self.try_kws(*kws):
            self.pos += len(kws)
            return True
        return False

    def is_punct(self, ch: str, k: int = 0) -> bool:
        t = self.peek(k)
        return t is not None and t.kind == "punct" and t.text == ch

    def match_punct(self, ch: str) -> bool:
        if self.is_punct(ch):
            self.pos += 1
            return True
        return False

    def ident(self) -> str | None:
        """Consume one (possibly backticked) identifier."""
        t = self.peek()
        if t is not None and t.kind in ("ident", "qident"):
            self.pos += 1
            return t.bare
        return None

    def balanced(self) -> tuple[str, int]:
        """At a '(' token: consume through the matching ')' and
        return (inner source text, end offset in self.sql). Comment
        spans are blanked from the returned text — callers split the
        inner text on ',' and an inline ``-- note`` would otherwise
        corrupt the column list (tokens drop comments; raw slices
        must too)."""
        if not self.is_punct("("):
            raise ValueError("expected '('")
        open_tok = self.next()
        depth = 1
        inner_start = open_tok.end
        while True:
            t = self.next()
            if t is None:
                raise ValueError("unbalanced parens in DDL")
            if t.kind == "punct":
                if t.text == "(":
                    depth += 1
                elif t.text == ")":
                    depth -= 1
                    if depth == 0:
                        inner = self.sql[inner_start:t.start]
                        return strip_comments(inner), t.end

    def skip_balanced_if_open(self) -> None:
        if self.is_punct("("):
            self.balanced()


def strip_comments(text: str) -> str:
    """Blank ``--`` line and ``/* */`` block comment spans (replaced
    by one space, string literals respected) from raw source text."""
    if "--" not in text and "/*" not in text:
        return text
    out, last = [], 0
    for t in tokenize(text, keep_comments=True):
        if t.kind == "comment":
            out.append(text[last:t.start])
            out.append(" ")
            last = t.end
    out.append(text[last:])
    return "".join(out)


def _finalize_stmt(s: str) -> str:
    """Strip leading comment fragments: when ``;`` and ``--`` share a
    line (``insert ...; -- 20000``), the comment tail lands at the
    head of the NEXT statement and must not poison it."""
    lines = s.strip().splitlines()
    while lines and lines[0].lstrip().startswith("--"):
        lines.pop(0)
    return "\n".join(lines).strip()


def split_statements(script: str, keep_tags: bool = False) -> list[str]:
    """Split a T-file script into statements: strip full-line comments
    and runner directives, drop leading ``[TAG]`` markers (run-mode
    hints like [UC]/[ORDER] — sr_sql_lib consumes them the same way),
    then split on ``;`` outside quotes. ``keep_tags=True`` preserves
    the markers so R-file parsing can honor per-statement [UC].

    Deliberately line-oriented before splitting: trailing ``--``
    comments inside a statement are preserved verbatim (view bodies
    record them), so this does NOT lex comments — only quotes guard
    the ``;`` scan."""
    lines = []
    for ln in script.splitlines():
        s = ln.strip()
        if not s or s.startswith("--"):
            continue
        if DIRECTIVE_RE.match(s):
            continue
        lines.append(ln if keep_tags
                     else TAG_RE.sub("", ln.lstrip())
                     if s.startswith("[") else ln)
    text = "\n".join(lines)
    stmts, cur, i, n = [], [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == ch:
                    break
                j += 1
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if ch == ";":
            s = _finalize_stmt("".join(cur))
            if s:
                stmts.append(s)
            cur = []
        else:
            cur.append(ch)
        i += 1
    s = _finalize_stmt("".join(cur))
    if s:
        stmts.append(s)
    return stmts


# first-keyword dispatch: kinds that need no second token
_HEAD_KINDS = {
    "SET": "noop", "ADMIN": "noop", "ANALYZE": "noop", "USE": "noop",
    "GRANT": "noop", "REVOKE": "noop",
    "SELECT": "select", "VALUES": "select",
    "INSERT": "insert", "UPDATE": "update",
}


def classify(stmt: str) -> str:
    """Statement kind for the runner's dispatch — a token decision
    tree on the first few keywords (AstBuilder.java statement
    alternatives), replacing the r1–r9 ordered-regex chain. Leading
    ``/*qN*/`` labels are lexer trivia and never change the kind."""
    ts = TokenStream(stmt)
    k0 = ts.kw()
    if k0 in _HEAD_KINDS:
        return _HEAD_KINDS[k0]
    if k0 == "CREATE":
        if ts.try_kws("CREATE", "TABLE"):
            return "create"
        if (ts.try_kws("CREATE", "VIEW")
                or ts.try_kws("CREATE", "OR", "REPLACE", "VIEW")):
            return "createview"
        if ts.try_kws("CREATE", "MATERIALIZED", "VIEW"):
            return "createmv"
        if (ts.try_kws("CREATE", "DATABASE")
                or ts.try_kws("CREATE", "USER")
                or ts.try_kws("CREATE", "RESOURCE", "GROUP")):
            return "noop"
        return "unsupported"
    if k0 == "DROP":
        if ts.try_kws("DROP", "TABLE"):
            return "drop"
        if ts.try_kws("DROP", "VIEW"):
            return "dropview"
        if ts.try_kws("DROP", "MATERIALIZED", "VIEW"):
            return "dropmv"
        if (ts.try_kws("DROP", "DATABASE")
                or ts.try_kws("DROP", "USER")
                or ts.try_kws("DROP", "RESOURCE", "GROUP")):
            return "noop"
        return "unsupported"
    if k0 == "ALTER":
        if ts.try_kws("ALTER", "TABLE"):
            return "alter"
        if ts.try_kws("ALTER", "MATERIALIZED", "VIEW"):
            return "altermv"
        if ts.try_kws("ALTER", "SYSTEM"):
            return "noop"
        return "unsupported"
    if k0 == "TRUNCATE":
        return ("truncate" if ts.try_kws("TRUNCATE", "TABLE")
                else "unsupported")
    if k0 == "DELETE":
        return ("delete" if ts.try_kws("DELETE", "FROM")
                else "unsupported")
    if k0 == "REFRESH":
        return ("refreshmv"
                if ts.try_kws("REFRESH", "MATERIALIZED", "VIEW")
                else "unsupported")
    if k0 == "CANCEL":
        return ("noop" if ts.try_kws("CANCEL", "REFRESH",
                                     "MATERIALIZED", "VIEW")
                else "unsupported")
    if k0 == "SYNC":
        # bare SYNC waits for loads to become visible; loads here are
        # synchronous already
        nxt = ts.peek(1)
        if nxt is None or (nxt.kind == "punct" and nxt.text == ";"
                           and ts.at_end(2)):
            return "noop"
        return "unsupported"
    if k0 == "WITH":
        # a WITH prefix can head UPDATE/DELETE too (StarRocks.g4
        # updateStatement withClause) — classify by the first
        # top-level keyword AFTER the CTE list
        depth = 0
        ts.next()
        while True:
            t = ts.next()
            if t is None:
                return "select"
            if t.kind == "punct":
                if t.text == "(":
                    depth += 1
                elif t.text == ")":
                    depth -= 1
            elif depth == 0 and t.kind == "ident":
                u = t.up
                if u == "UPDATE":
                    return "update"
                if u == "DELETE":
                    return "delete"
                if u in ("SELECT", "INSERT"):
                    return "select"
    return "unsupported"


def first_keyword(sql: str) -> str:
    """Uppercased first identifier token ('' when none) — the
    dispatch key for the runner's pre-classify interceptors."""
    for t in tokenize(sql):
        return t.up if t.kind == "ident" else ""
    return ""
