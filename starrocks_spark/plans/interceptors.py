"""Start-anchored statement interceptors, dispatched by first
keyword (r11 tokenizer promotion phase 2).

The round-10 verdict flagged the ~40 ordered ``re.match`` gates at
the head of ``ScriptRunner.execute()`` as the remaining regex-chain
debt: every statement paid a linear scan over all of them, and their
relative order was load-bearing by accident. Each gate's MATCH SET is
keyed by its leading keyword, so this module regroups them — bodies
verbatim — into per-keyword handler lists dispatched off
``sqllex``'s token stream: one first-keyword probe, one dict lookup,
then only the (few) gates that can possibly match. Within a keyword
group the original chain order is preserved, which keeps the
promotion behavior-identical; the 414-row acceptance matrix pins it.

A handler returns a ``StatementResult`` to finish the statement, a
``str`` to rewrite it and keep going (CREATE TEMPORARY strips the
keyword; CREATE DATABASE/USE only records), or ``None`` to fall
through.

Reference parity: the groups mirror the statement alternatives of
the reference's parser dispatch (fe .../sql/parser/AstBuilder.java
over StarRocks.g4) that the acceptance scripts exercise.
"""
from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from starrocks_spark.plans import dialect
from starrocks_spark.plans.sqllex import first_keyword


@dataclass
class StatementResult:
    stmt: str
    kind: str                    # create/insert/noop/select/drop/skipped
    df: DataFrame | None = None
    reason: str | None = None    # for kind == "skipped"


class PreDispatch:
    """Mixin for ScriptRunner: keyword-dispatched pre-classify
    interceptors."""

    def _pre_dispatch(self, stmt, table):
        kw = first_keyword(stmt)
        for hname in table.get(kw, ()):
            r = getattr(self, "_pre_" + hname)(stmt)
            if isinstance(r, StatementResult):
                return r
            if isinstance(r, str):
                stmt = r
        return stmt

    def _pre_txn_begin(self, stmt):
        bm = re.match(r"\s*(BEGIN|START\s+TRANSACTION)\b"
                      r"(\s+WITH\s+LABEL\s+`?(\w+)`?)?\s*$",
                      stmt, re.IGNORECASE)
        if bm:
            label = bm.group(3)
            if label is not None:
                if label in self.labels:
                    return StatementResult(
                        stmt, "skipped",
                        reason=f"Label [{label}] has already been "
                               f"used")
                self.labels.add(label)
            self.txn = []
            self.txn_touched = set()
            return StatementResult(stmt, "noop")
        return None

    def _pre_txn_commit(self, stmt):
        if re.match(r"\s*COMMIT\s*(WORK\s*)?$", stmt, re.IGNORECASE):
            self.txn_touched = set()
            pending, self.txn = self.txn or [], None
            for mode, name, pred, batch, plist in pending:
                self._apply_insert(mode, name, pred, batch, plist)
            return StatementResult(stmt, "noop")
        return None

    def _pre_txn_rollback(self, stmt):
        if re.match(r"\s*ROLLBACK\s*(WORK\s*)?$", stmt,
                    re.IGNORECASE):
            self.txn = None
            self.txn_touched = set()
            return StatementResult(stmt, "noop")
        return None

    def _pre_set_sql_mode(self, stmt):
        sqm = re.match(r"\s*SET\s+sql_mode\s*=\s*['\"]([^'\"]*)",
                       stmt, re.IGNORECASE)
        if sqm:
            modes = sqm.group(1).upper()
            self.sql_mode = modes
            dialect.BITMAP_THROW_MODE = \
                "ALLOW_THROW_EXCEPTION" in modes
            dialect.STRTODATE_THROW = \
                "ALLOW_THROW_EXCEPTION" in modes
            # ERROR_FOR_DIVISION_BY_ZERO maps onto ANSI division for
            # the mode's whole window (plans bake the eval mode at
            # analysis, so the conf must be live when INSERT-SELECT
            # batches analyze too; test_sql_mode_errors)
            self.spark.conf.set(
                "spark.sql.ansi.enabled",
                "true" if "ERROR_FOR_DIVISION_BY_ZERO" in modes
                else "false")
            return StatementResult(stmt, "noop")
        return None

    def _pre_set_sql_dialect(self, stmt):
        m = re.match(r"\s*SET\s+sql_dialect\s*=\s*"
                     r"['\"]?(\w+)['\"]?\s*$", stmt, re.IGNORECASE)
        if m:
            # only date_diff's argument order differs in the surface
            # the suites exercise (fe TrinoParserUtils)
            dialect.TRINO_DATE_DIFF = m.group(1).lower() == "trino"
            return StatementResult(stmt, "noop")
        return None

    def _pre_set_feature_vars(self, stmt):
        svm = re.match(r"\s*SET\s+(?:GLOBAL\s+)?"
                       r"(enable_\w+|cbo_\w+|insert_max_filter_ratio"
                       r"|decimal_overflow_to_double"
                       r"|dynamic_overwrite|query_timeout"
                       r"|insert_timeout)"
                       r"\s*=\s*['\"]?([\w.]+)['\"]?\s*$",
                       stmt, re.IGNORECASE)
        if svm:
            # feature toggles the runner honors (drop-dependency check,
            # transparent union rewrite); unknown enable_* flags are
            # stored and ignored, like the reference's session vars
            self.vars[svm.group(1).lower()] = svm.group(2).lower()
            return StatementResult(stmt, "noop")
        return None

    def _pre_set_partial_update(self, stmt):
        pum = re.match(r"\s*SET\s+partial_update_mode\s*=\s*"
                       r"['\"]?(\w*)['\"]?\s*$", stmt, re.IGNORECASE)
        if pum:
            val = pum.group(1).lower()
            if val not in ("auto", "row", "column"):
                return StatementResult(
                    stmt, "skipped",
                    reason="partial_update_mode only support "
                           "auto|row|column")
            self.vars["partial_update_mode"] = val
            return StatementResult(stmt, "noop")
        return None

    def _pre_grant_select(self, stmt):
        gm9 = re.match(r"\s*GRANT\s+SELECT\s+ON\s+(VIEW|TABLE)\s+"
                       r"`?(\w+)`?\s+TO\s+(?:USER\s+)?`?([\w.]+)",
                       stmt, re.IGNORECASE)
        if gm9:
            self.grants.setdefault(
                gm9.group(3).split("@")[0].lower(), set()).add(
                (gm9.group(1).lower(), gm9.group(2)))
            return StatementResult(stmt, "noop")
        return None

    def _pre_revoke_select(self, stmt):
        rv9 = re.match(r"\s*REVOKE\s+SELECT\s+ON\s+(VIEW|TABLE)\s+"
                       r"`?(\w+)`?\s+FROM\s+(?:USER\s+)?`?([\w.]+)",
                       stmt, re.IGNORECASE)
        if rv9:
            self.grants.get(
                rv9.group(3).split("@")[0].lower(), set()).discard(
                (rv9.group(1).lower(), rv9.group(2)))
            return StatementResult(stmt, "noop")
        return None

    def _pre_alter_view_security(self, stmt):
        avs = re.match(r"\s*ALTER\s+VIEW\s+`?(\w+)`?\s+SET\s+"
                       r"SECURITY\s+(NONE|INVOKER)\s*$",
                       stmt, re.IGNORECASE)
        if avs and avs.group(1) in self.view_meta:
            self.view_meta[avs.group(1)]["security"] = \
                avs.group(2).lower()
            return StatementResult(stmt, "noop")
        return None

    def _pre_set_binary_encoding(self, stmt):
        bem = re.match(r"\s*SET\s+binary_encoding_(format|level)\s*"
                       r"=\s*['\"]?(\w+)['\"]?\s*$", stmt,
                       re.IGNORECASE)
        if bem:
            # the render globals live in sqltester (_render_cell
            # reads them) — set them THERE, not module-locally
            import starrocks_spark.plans.sqltester as _st
            if bem.group(1).lower() == "format":
                _st.BINARY_ENC_FORMAT = bem.group(2).lower()
            else:
                _st.BINARY_ENC_LEVEL = bem.group(2).lower()
            return StatementResult(stmt, "noop")
        return None

    def _pre_recover_partition(self, stmt):
        rpm = re.match(r"\s*RECOVER\s+PARTITION\s+`?(\w+)`?\s+FROM\s+"
                       r"`?(\w+)`?\s*$", stmt, re.IGNORECASE)
        if rpm:
            pn9, tn9 = rpm.group(1), rpm.group(2)
            key9 = (tn9, pn9)
            if key9 not in self.part_trash or tn9 not in self.defs:
                return StatementResult(
                    stmt, "skipped",
                    reason=f"No partition named {pn9} in table {tn9} "
                           f"recycle bin")
            pdef9, kept9 = self.part_trash.pop(key9)
            if pdef9[0] == "list":
                # fe RecoverPartitionAnalyzer: list partitions can't
                # be recovered (the bin keeps them, recovery refuses)
                self.part_trash[key9] = (pdef9, kept9)
                return StatementResult(
                    stmt, "skipped",
                    reason="Does not support recover list partition")
            self.defs[tn9].named_parts[pn9] = pdef9[1]
            if kept9 and kept9[0]:
                batch9 = self.spark.createDataFrame(*kept9)
                self.tables[tn9].insert(
                    self._stamp_load_order(tn9, batch9))
            self._auto_refresh_mvs(tn9)
            return StatementResult(stmt, "noop")
        return None

    def _pre_recover_table(self, stmt):
        rcm = re.match(r"\s*RECOVER\s+TABLE\s+`?(\w+)`?\s*$",
                       stmt, re.IGNORECASE)
        if rcm:
            nm9 = rcm.group(1)
            if nm9 not in self.trash:
                return StatementResult(
                    stmt, "skipped",
                    reason=f"Table '{nm9}' is not in the recycle bin")
            if nm9 in self.defs:
                return StatementResult(
                    stmt, "skipped",
                    reason=f"Table '{nm9}' already exists; recover "
                           f"needs a rename")
            self.defs[nm9], self.tables[nm9] = self.trash.pop(nm9)
            return StatementResult(stmt, "noop")
        return None

    def _pre_show_index(self, stmt):
        sim = re.match(r"\s*SHOW\s+INDEX(?:ES)?\s+FROM\s+`?(\w+)`?"
                       r"\s*$", stmt, re.IGNORECASE)
        if sim and sim.group(1) in self.defs:
            d9 = self.defs[sim.group(1)]
            rows9 = []
            for iname9, ix9 in d9.indexes.items():
                if ix9["using"] == "NGRAMBF":
                    pr9 = dict(ix9.get("props") or {})
                    pr9.setdefault("bloom_filter_fpp", "0.05")
                    pr9.setdefault("case_sensitive", "true")
                    pr9.setdefault("gram_num", "2")
                    ty9 = "NGRAMBF(" + ", ".join(
                        f'"{k}" = "{pr9[k]}"'
                        for k in sorted(pr9)) + ")"
                else:
                    ty9 = ix9["using"]
                rows9.append((
                    f"{self.current_db or 'db'}.{d9.name}", "",
                    iname9, "", ix9["col"], "", "", "", "", "",
                    ty9, ""))
            schema9 = ("Table string, Non_unique string, Key_name "
                       "string, Seq_in_index string, Column_name "
                       "string, Collation string, Cardinality string, "
                       "Sub_part string, Packed string, Null string, "
                       "Index_type string, Comment string")
            if not rows9:
                df9 = self.spark.createDataFrame(
                    [("",) * 12], schema9).filter("Table != ''")
            else:
                df9 = self.spark.createDataFrame(rows9, schema9)
            return StatementResult(stmt, "select", df9)
        return None

    def _pre_drop_index_on(self, stmt):
        dio = re.match(r"\s*DROP\s+INDEX\s+`?(\w+)`?\s+ON\s+"
                       r"`?(\w+)`?\s*$", stmt, re.IGNORECASE)
        if dio and dio.group(2) in self.defs:
            return self.execute(f"ALTER TABLE {dio.group(2)} "
                                f"DROP INDEX {dio.group(1)}")
        return None

    def _pre_show_temp_partitions(self, stmt):
        stp = re.match(r"\s*SHOW\s+TEMPORARY\s+PARTITIONS\s+FROM\s+"
                       r"`?(\w+)`?\s*$", stmt, re.IGNORECASE)
        if stp:
            # temporary (shadow) partitions exist only mid-overwrite;
            # after commit or abort the list is empty
            df9 = self.spark.createDataFrame(
                [("",)], "PartitionName string").filter(
                "PartitionName != ''")
            return StatementResult(stmt, "select", df9)
        return None

    def _pre_show_variables(self, stmt):
        shv = re.match(r"\s*SHOW\s+VARIABLES\s+LIKE\s+"
                       r"'%?([\w]+)%?'\s*$", stmt, re.IGNORECASE)
        if shv:
            vn9 = shv.group(1).lower()
            defaults9 = {"dynamic_overwrite": "false"}
            if vn9 in self.vars or vn9 in defaults9:
                val9 = self.vars.get(vn9, defaults9.get(vn9, ""))
                df9 = self.spark.createDataFrame(
                    [(vn9, val9)],
                    "Variable_name string, Value string")
                return StatementResult(stmt, "select", df9)
        return None

    def _pre_execute_as(self, stmt):
        eam = re.match(r"\s*EXECUTE\s+AS\s+`?([\w.]+)`?(?:@\S+)?"
                       r"(?:\s+WITH\s+NO\s+REVERT)?\s*;?\s*$",
                       stmt, re.IGNORECASE)
        if eam:
            # EXECUTE AS swaps the current identity (fe ExecuteAsStmt)
            # — read by MV CREATOR/RUN_AS_USER vs refresh SUBMIT_USER
            self.current_user = eam.group(1)
            return StatementResult(stmt, "noop")
        return None

    def _pre_set_time_zone(self, stmt):
        tzm = re.match(r"\s*SET\s+time_zone\s*=\s*['\"]([^'\"]+)",
                       stmt, re.IGNORECASE)
        if tzm:
            # the reference evaluates time functions against the
            # session time zone; map onto Spark's session conf
            self.spark.conf.set("spark.sql.session.timeZone",
                                tzm.group(1))
            dialect.REF_SESSION_TZ = tzm.group(1)
            return StatementResult(stmt, "noop")
        return None

    def _pre_select_sysvar(self, stmt):
        m = re.match(r"\s*SELECT\s+@@(?:session\.|global\.)?"
                     r"(\w+)\s*;?\s*$", stmt, re.IGNORECASE)
        if not m:
            return None
        name = m.group(1).lower()
        if name == "time_zone":
            val = dialect.REF_SESSION_TZ
        else:
            val = self.vars.get(name)
            if val is None:
                return None  # unknown system var: fall through
        df = self.spark.createDataFrame([(str(val),)],
                                        f"`@@{name}` string")
        return StatementResult(stmt, "select", df)

    def _pre_db_record(self, stmt):
        dbm = re.match(r"\s*(?:CREATE\s+DATABASE\s+(?:IF\s+NOT\s+"
                       r"EXISTS\s+)?|USE\s+)`?(\w+)`?", stmt,
                       re.IGNORECASE)
        if dbm:
            self.dbs.add(dbm.group(1))
            if re.match(r"\s*USE\b", stmt, re.IGNORECASE):
                self.current_db = dbm.group(1)
        return None

    def _pre_drop_database(self, stmt):
        ddbm = re.match(r"\s*DROP\s+DATABASE\s+(IF\s+EXISTS\s+)?"
                        r"`?(\w+)`?\s*(FORCE)?", stmt, re.IGNORECASE)
        if ddbm and not ddbm.group(1) \
                and ddbm.group(2) not in self.dbs:
            if self.strict:
                raise ValueError(f"Unknown database "
                                 f"'{ddbm.group(2)}'")
            return StatementResult(
                stmt, "skipped",
                reason=f"Unknown database '{ddbm.group(2)}'")
        if ddbm and ddbm.group(2) in self.dbs:
            if not ddbm.group(3):
                # non-FORCE db drops land in the catalog recycle bin
                # (information_schema.recyclebin_catalogs)
                self.db_trash.append(ddbm.group(2))
            # INSERT jobs live in the FE LoadMgr keyed by db and are
            # purged with it; stream-load history survives
            # (test_loads_predicate_pushdown pins the split)
            self.loads = [ld for ld in self.loads
                          if not (ld["db_name"] == ddbm.group(2)
                                  and ld["type"] == "INSERT")]
        return None

    def _pre_update_be_configs(self, stmt):
        bcm9 = re.match(
            r"\s*UPDATE\s+(?:default_catalog\.)?information_schema"
            r"\.be_configs\s+SET\s+`?VALUE`?\s*=\s*"
            r"['\"]([^'\"]*)['\"]\s*WHERE\s+name\s*=\s*"
            r"['\"]([^'\"]*)['\"]", stmt, re.IGNORECASE)
        if bcm9:
            # UPDATE on the be_configs scanner pushes a config to the
            # BEs (fe BeConfigsSystemTable UPDATE path). Recorded in a
            # session dict; the statement yields an EMPTY result set
            # (the R file records an empty block), so the suite's
            # check floor is real.
            if not hasattr(self, "be_configs"):
                self.be_configs = {}
            self.be_configs[bcm9.group(2)] = bcm9.group(1)
            return StatementResult(
                stmt, "select",
                df=self.spark.createDataFrame([], "ok string"))
        return None

    def _pre_show_columns(self, stmt):
        scm9 = re.match(r"\s*SHOW\s+COLUMNS\s+FROM\s+`?(\w+)`?\s*"
                        r"(?:WHERE\s+Field\s*=\s*'([^']*)')?\s*$",
                        stmt, re.IGNORECASE)
        if scm9 and scm9.group(1) in self.defs:
            # MySQL six-column shape; integer display widths drop,
            # Key renders '' for non-key columns (test_show_column)
            d9 = self.defs[scm9.group(1)]
            ints9 = ("tinyint", "smallint", "int", "integer",
                     "bigint", "largeint")
            rows9 = []
            for c in d9.cols:
                if scm9.group(2) and c.name != scm9.group(2):
                    continue
                base9 = re.split(r"[(<]", c.sr_type, 1)[0]
                rows9.append((
                    c.name,
                    base9 if base9 in ints9 else c.sr_type,
                    "YES" if c.nullable else "NO",
                    "YES" if c.name in d9.key_cols else "",
                    None if (c.default is None
                             or c.default.upper() == "NULL")
                    else c.default.strip("'"), ""))
            df9 = self.spark.createDataFrame(
                rows9, "Field string, Type string, `Null` string, "
                       "`Key` string, Default string, Extra string")
            return StatementResult(stmt, "select", df9)
        return None

    def _pre_show_full_columns(self, stmt):
        sfc = re.match(r"\s*SHOW\s+FULL\s+COLUMNS\s+FROM\s+"
                       r"`?(\w+)`?\s*$", stmt, re.IGNORECASE)
        if sfc and sfc.group(1) in self.defs:
            # MySQL 9-column shape; the integer family prints without
            # its display width, varchar keeps it (SchemaColumnsScanner)
            d9 = self.defs[sfc.group(1)]
            ints9 = ("tinyint", "smallint", "int", "integer",
                     "bigint", "largeint")
            rows9 = []
            for c in d9.cols:
                base9 = re.split(r"[(<]", c.sr_type, 1)[0]
                disp9 = base9 if base9 in ints9 else c.sr_type
                dflt9 = (None if (c.default is None
                                  or c.default.upper() == "NULL")
                         else c.default.strip("'"))
                rows9.append((c.name, disp9, "",
                              "YES" if c.nullable else "NO",
                              "YES" if c.name in d9.key_cols
                              else "NO", dflt9, "", "", ""))
            df9 = self.spark.createDataFrame(
                rows9, "Field string, Type string, Collation string, "
                       "`Null` string, `Key` string, Default string, "
                       "Extra string, Privileges string, "
                       "Comment string")
            return StatementResult(stmt, "select", df9)
        return None

    def _pre_create_index_stmt(self, stmt):
        cim = re.match(r"\s*CREATE\s+INDEX\s+`?(\w+)`?\s+ON\s+"
                       r"`?(\w+)`?\s*\(\s*`?(\w+)`?\s*\)\s*"
                       r"(?:USING\s+(\w+)\s*)?"
                       r"(?:COMMENT\s+'[^']*'\s*)?$",
                       stmt, re.IGNORECASE)
        if cim:
            # CREATE INDEX — the standalone spelling of ALTER TABLE
            # ADD INDEX (fe CreateIndexStmt); also valid on an async
            # MV (test_alter_mv: bitmap index on an MV column)
            iname, tgt, icol, iusing = cim.groups()
            if tgt in self.defs:
                return self.execute(
                    f"ALTER TABLE {tgt} ADD INDEX {iname} ({icol}) "
                    f"USING {(iusing or 'BITMAP').upper()}")
            if tgt in self.mvs:
                self._refresh_views()
                cols = [f.name for f in
                        self._select(self.mvs[tgt].select_sql)
                        .schema.fields]
                if icol not in cols:
                    raise ValueError(
                        f"Unknown column '{icol}' in MV '{tgt}'")
                self.mvs[tgt].props.setdefault(
                    "__indexes", {})[iname] = {
                    "col": icol,
                    "using": (iusing or "BITMAP").upper()}
                return StatementResult(stmt, "noop")
            raise ValueError(f"create index: unknown target {tgt}")
        return None

    def _pre_show_create_view(self, stmt):
        scv = re.match(r"\s*SHOW\s+CREATE\s+VIEW\s+`?(\w+)`?\s*$",
                       stmt, re.IGNORECASE)
        if scv and scv.group(1) in self.view_meta:
            vn, vm = scv.group(1), self.view_meta[scv.group(1)]
            head9 = ("CREATE VIEW `" + vn + "` ("
                     + ", ".join(f"`{c}`" for c in vm["cols"]) + ")")
            if vm["comment"]:
                head9 += f'\nCOMMENT "{vm["comment"]}"'
            body9 = re.sub(
                r'"(aws\.s3\.(?:access_key|secret_key))"\s*=\s*'
                r'"[^"]*"', r'"\1" = ***', vm["body"].rstrip())
            ddl9 = head9 + " SECURITY NONE AS " + body9 + ";"
            df9 = self.spark.createDataFrame(
                [(vn, ddl9, "utf8", "utf8_general_ci")],
                "View string, `Create View` string, "
                "character_set_client string, collation_connection "
                "string")
            return StatementResult(stmt, "select", df9)
        return None

    def _pre_show_create_table(self, stmt):
        scm = re.match(r"\s*SHOW\s+CREATE\s+TABLE\s+`?(\w+)`?\s*$",
                       stmt, re.IGNORECASE)
        if scm and scm.group(1) in self.defs:
            d = self.defs[scm.group(1)]
            try:
                from starrocks_spark.plans.sqltester import \
                    _render_show_create
                ddl = self._demangle_text(
                    _render_show_create(d, cloud=self.cloud_profile))
            except ValueError as e:
                return StatementResult(stmt, "skipped",
                                       reason=str(e)[:500])
            df = self.spark.createDataFrame(
                [(self._demangle_ident(d.name), ddl)],
                "Table string, `Create Table` string")
            return StatementResult(stmt, "select", df)
        return None

    def _pre_desc_infoschema_direct(self, stmt):
        if re.match(r"\s*DESC(?:RIBE)?\s+information_schema\."
                    r"temp_tables\s*$", stmt, re.IGNORECASE):
            df9 = self.spark.createDataFrame(
                [(n, t, "YES", "false", None, "")
                 for n, t in self._TEMP_TABLES_SCHEMA],
                "Field string, Type string, Null string, Key string, "
                "Default string, Extra string")
            return StatementResult(stmt, "select", df9)
        return None

    def _pre_desc_infoschema_static(self, stmt):
        dsi = re.match(r"\s*DESC(?:RIBE)?\s+information_schema\."
                       r"(\w+)\s*$", stmt, re.IGNORECASE)
        if dsi and dsi.group(1).lower() in self._IS_STATIC:
            # scanner columns render as bigint / varchar(2048) in the
            # MySQL six-column DESC shape (SchemaScannerColumn types)
            schema9 = self._IS_STATIC[dsi.group(1).lower()][0]
            rows9 = []
            for item9 in schema9.split(","):
                nm9, ty9 = item9.strip().rsplit(" ", 1)
                rows9.append((nm9.strip("`"),
                              {"string": "varchar(2048)",
                               "int": "int",
                               "boolean": "boolean"}.get(ty9, ty9),
                              "YES", "false", None, ""))
            df9 = self.spark.createDataFrame(
                rows9, "Field string, Type string, Null string, "
                       "Key string, Default string, Extra string")
            return StatementResult(stmt, "select", df9)
        return None

    def _pre_desc_table(self, stmt):
        dsm = re.match(r"\s*DESC(?:RIBE)?\s+`?(\w+)`?\s*$", stmt,
                       re.IGNORECASE)
        if dsm and dsm.group(1) in self.defs:
            # DESC renders the MySQL-protocol six-column shape
            # (Field/Type/Null/Key/Default/Extra) the R files record
            d = self.defs[dsm.group(1)]
            rows = [(self._demangle_ident(c.name), c.sr_type,
                     "YES" if c.nullable else "NO",
                     "true" if c.name in d.key_cols else "false",
                     None if (c.default is None
                              or c.default.upper() == "NULL")
                     else c.default.strip("'"),
                     "BLOOM_FILTER" if c.name in d.bf_cols else "")
                    for c in d.cols]
            df = self.spark.createDataFrame(
                rows, "Field string, Type string, Null string, "
                      "Key string, Default string, Extra string")
            return StatementResult(stmt, "select", df)
        return None

    def _pre_create_temporary(self, stmt):
        # temporary tables (fe CreateTemporaryTableStmt): same engine
        # behavior, separate listing namespace — strip the keyword and
        # track the name so SHOW [TEMPORARY] TABLES partitions them
        ttm = re.match(r"\s*CREATE\s+TEMPORARY\s+TABLE\s+"
                       r"(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?",
                       stmt, re.IGNORECASE)
        if ttm and self.vars.get("enable_experimental_temporary_table",
                                 "true") == "false":
            msg9 = ("Temporary table feature is experimental and "
                    "disabled (enable_experimental_temporary_table"
                    "=false)")
            if self.strict:
                raise ValueError(msg9)
            return StatementResult(stmt, "skipped", reason=msg9)
        if ttm:
            nm9 = ttm.group(1)
            if nm9 in self.defs and nm9 not in self.temp_tables:
                # a temporary table SHADOWS a same-named permanent
                # one until it is dropped (fe TemporaryTableMgr)
                self.shadowed[nm9] = (self.defs.pop(nm9),
                                      self.tables.pop(nm9))
            stmt = re.sub(r"(?i)^(\s*CREATE\s+)TEMPORARY\s+", r"\1",
                          stmt, count=1)
            self.temp_tables.add(nm9)
        return stmt

    def _pre_admin_set_config(self, stmt):
        if re.match(r"\s*ADMIN\s+(ENABLE|DISABLE)\s+FAILPOINT\b",
                    stmt, re.IGNORECASE):
            # BE failure-injection hooks (be failpoint registry):
            # no failure to inject locally — the gated statements are
            # [UC] by contract (test_exception)
            return StatementResult(stmt, "noop")
        acm9 = re.match(r"\s*ADMIN\s+SET\s+FRONTEND\s+CONFIG\s*\(\s*"
                        r'"([^"]+)"\s*=\s*"([^"]*)"', stmt,
                        re.IGNORECASE)
        if acm9:
            # FE config toggles the runner honors (feature gates)
            self.vars[acm9.group(1).lower()] = acm9.group(2).lower()
            return StatementResult(stmt, "noop")
        return None

    def _pre_drop_temp_table(self, stmt):
        dtm = re.match(r"\s*DROP\s+TEMPORARY\s+TABLE\s+"
                       r"(?:IF\s+EXISTS\s+)?`?(\w+)`?\s*$",
                       stmt, re.IGNORECASE)
        if dtm:
            nm9 = dtm.group(1)
            if nm9 not in self.temp_tables:
                return StatementResult(
                    stmt, "skipped",
                    reason=f"Table '{nm9}' is not a temporary table")
            self.temp_tables.discard(nm9)
            self.tables.pop(nm9).drop()
            del self.defs[nm9]
            if nm9 in self.shadowed:
                self.defs[nm9], self.tables[nm9] = \
                    self.shadowed.pop(nm9)
            return StatementResult(stmt, "noop")
        return None

    def _pre_alter_db_rename(self, stmt):
        adr = re.match(r"\s*ALTER\s+DATABASE\s+`?(\w+)`?\s+RENAME\s+"
                       r"`?(\w+)`?\s*$", stmt, re.IGNORECASE)
        if adr:
            # flat namespace: track the rename so references through
            # the OLD name raise Unknown database
            self.dbs.discard(adr.group(1))
            self.dbs.add(adr.group(2))
            self.dropped_dbs.add(adr.group(1))
            return StatementResult(stmt, "noop")
        return None

    def _pre_show_tables(self, stmt):
        shm9 = re.match(r"\s*SHOW\s+(TEMPORARY\s+)?TABLES\s*$",
                        stmt, re.IGNORECASE)
        if shm9:
            tmp9 = bool(shm9.group(1))
            names = sorted(
                self._demangle_ident(n)
                for n in (list(self.defs) + sorted(self.views)
                          + list(self.mvs))
                if (n in self.temp_tables) == tmp9)
            rows9 = [(n,) for n in names] or [("",)]
            df9 = self.spark.createDataFrame(
                rows9, "Tables_in_db string")
            if not names:
                df9 = df9.filter("Tables_in_db != ''")
            return StatementResult(stmt, "select", df9)
        return None

    # ---- r12 tokenizer promotion phase 3: statement pre-pass
    # + view-handler bodies, moved VERBATIM from
    # ScriptRunner.execute() (module globals become lazy
    # imports; dispatch keys replace the ordered prefix/regex
    # chain). PRE0 runs before variable substitution — exactly
    # where the original chain sat.

    def _pre_streamload(self, stmt):
        if stmt.startswith("__streamload__"):
            try:
                return self._stream_load(stmt)
            except Exception as e:  # noqa: BLE001
                if self.strict:
                    raise
                return StatementResult(stmt, "skipped",
                                       reason=str(e)[:500])
        return None

    def _pre_fnwait(self, stmt):
        if stmt.startswith("__fnwait__"):
            # wait_mv_refresh_count: the point where the ASYNC first
            # refresh of a MANUAL MV is known to have landed — only a
            # PENDING first refresh materializes here; ASYNC MVs are
            # already current (creation refresh + _auto_refresh_mvs)
            mvn = stmt.split(None, 1)[1].strip()
            mv = self.mvs.get(mvn)
            if mv is not None and mv.is_active \
                    and getattr(mv, "first_refresh_pending", False):
                mv.first_refresh_pending = False
                self._refresh_views()
                self._materialize_mv(mv, limit=self._mv_limit(mv))
            return StatementResult(stmt, "noop")
        return None

    def _pre_fnassert(self, stmt):
        if stmt.startswith("__fnassert__"):
            try:
                return self._fn_assert(stmt)
            except Exception as e:  # noqa: BLE001
                if self.strict:
                    raise
                return StatementResult(stmt, "skipped",
                                       reason=str(e)[:500])
        return None

    def _pre_shellfile(self, stmt):
        from starrocks_spark.plans.sqltester import _SHELLFILE_MARK
        if stmt.startswith(_SHELLFILE_MARK):
            try:
                self._shellfile(stmt)
            except Exception as e:  # noqa: BLE001 — unchecked step
                if self.strict:
                    raise
                return StatementResult(stmt, "skipped",
                                       reason=str(e)[:500])
            return StatementResult(stmt, "noop")
        return None

    def _pre_set_uservar(self, stmt):
        from starrocks_spark.plans.sqltester import (
            _SETVAR_RE, _freeze_unset_vars, _substitute_vars)
        vm = _SETVAR_RE.match(stmt)
        if vm:
            # SET @a = e1, @b = e2, ... — assignments evaluate LEFT
            # TO RIGHT with earlier values (and session state)
            # visible; values bind at SET time (fe SetStmtAnalyzer;
            # test_hint pins the chained-reference shapes)
            items = dialect._split_top_level(
                f"@{vm.group(1)} = {vm.group(2)}")
            for it in items:
                im9 = re.match(r"\s*@(\w+)\s*=\s*(.+)$", it,
                               re.DOTALL)
                if im9:
                    self.vars[im9.group(1)] = _freeze_unset_vars(
                        _substitute_vars(im9.group(2).strip(),
                                         self.vars, self.captures))
            return StatementResult(stmt, "noop")
        return None

    def _pre_create_dictionary(self, stmt):
        cdm9 = re.match(r"\s*CREATE\s+DICTIONARY\s+`?(\w+)`?\s+"
                        r"USING\s+`?(\w+)`?\s*\(([^)]*)\)", stmt,
                        re.IGNORECASE | re.DOTALL)
        if cdm9:
            dname, dtbl = cdm9.group(1), cdm9.group(2)
            if dtbl not in self.defs:
                return StatementResult(
                    stmt, "skipped",
                    reason=f"dictionary: unknown table {dtbl}")
            keys9, vals9 = [], []
            for it9 in cdm9.group(3).split(","):
                im9 = re.match(r"\s*`?(\w+)`?\s+(KEY|VALUE)\s*$",
                               it9, re.IGNORECASE)
                if not im9:
                    raise ValueError(
                        f"dictionary: bad column spec {it9!r}")
                (keys9 if im9.group(2).upper() == "KEY"
                 else vals9).append(im9.group(1))
            self.dictionaries[dname] = {
                "table": dtbl, "keys": keys9, "values": vals9,
                "state": "UNINITIALIZED", "view": f"__dict_{dname}"}
            self._refresh_dictionary(dname)
            return StatementResult(stmt, "noop")
        return None

    def _pre_refresh_dictionary(self, stmt):
        rdm9 = re.match(r"\s*REFRESH\s+DICTIONARY\s+`?(\w+)`?\s*$",
                        stmt, re.IGNORECASE)
        if rdm9:
            if rdm9.group(1) not in self.dictionaries:
                return StatementResult(
                    stmt, "skipped",
                    reason=f"dictionary: {rdm9.group(1)} does not "
                           f"exist")
            self._refresh_dictionary(rdm9.group(1))
            return StatementResult(stmt, "noop")
        return None

    def _pre_cancel_refresh_dictionary(self, stmt):
        if re.match(r"\s*CANCEL\s+REFRESH\s+DICTIONARY\b", stmt,
                    re.IGNORECASE):
            return StatementResult(stmt, "noop")
        return None

    def _pre_drop_dictionary(self, stmt):
        ddm9 = re.match(r"\s*DROP\s+DICTIONARY\s+`?(\w+)`?"
                        r"\s*(CACHE)?\s*$", stmt, re.IGNORECASE)
        if ddm9:
            dd9 = self.dictionaries.get(ddm9.group(1))
            if dd9 is None:
                return StatementResult(
                    stmt, "skipped",
                    reason=f"dictionary: {ddm9.group(1)} does not "
                           f"exist")
            if ddm9.group(2):
                # DROP ... CACHE clears the BE cache only: the
                # definition stays, lookups see UNINITIALIZED until
                # the next refresh
                dd9["state"] = "UNINITIALIZED"
            else:
                del self.dictionaries[ddm9.group(1)]
            return StatementResult(stmt, "noop")
        return None

    def _pre_substitute(self, stmt):
        """GROUP_CONCAT_LEGACY / SET_USER_VARIABLE statement hints,
        then ${var} substitution — one pass, original order."""
        from starrocks_spark.plans.sqltester import (
            _freeze_unset_vars, _strip_parens_block, _substitute_vars)
        svh9 = re.search(r"/\*\+\s*set_var\s*\(\s*sql_mode\s*=\s*"
                         r"'GROUP_CONCAT_LEGACY'\s*\)\s*\*/", stmt,
                         re.IGNORECASE)
        if svh9:
            # statement-scoped sql_mode hint (fe SetVarHint)
            old9 = dialect.GROUP_CONCAT_LEGACY
            dialect.GROUP_CONCAT_LEGACY = True
            try:
                return self.execute(stmt[:svh9.start()]
                                    + stmt[svh9.end():])
            finally:
                dialect.GROUP_CONCAT_LEGACY = old9
        # /*+ SET_USER_VARIABLE(@v = expr, ...) */ binds STATEMENT-
        # scoped user variables (fe UserVariableHint); several hints
        # in one statement chain left to right
        hint_vars: dict[str, str] = {}
        while True:
            hm9 = re.search(r"/\*\+\s*set_user_variable\s*\(", stmt,
                            re.IGNORECASE)
            if not hm9:
                break
            body9, after9 = _strip_parens_block(stmt, hm9.end() - 1)
            cm9 = re.match(r"\s*\*/", stmt[after9:])
            if cm9:
                hint_end = after9 + cm9.end()
            else:
                # the FE's hint scanner tolerates trailing junk
                # between the parsed assignments and */ (test_hint
                # records the statement succeeding)
                j9 = stmt.find("*/", after9)
                if j9 < 0:
                    break
                hint_end = j9 + 2
            stmt = stmt[:hm9.start()] + stmt[hint_end:]
            for it in dialect._split_top_level(body9):
                im9 = re.match(r"\s*@(\w+)\s*=\s*(.+)$", it,
                               re.DOTALL)
                if im9:
                    hint_vars[im9.group(1)] = _freeze_unset_vars(
                        _substitute_vars(
                            im9.group(2).strip(),
                            {**self.vars, **hint_vars},
                            self.captures))
        stmt = _substitute_vars(stmt, {**self.vars, **hint_vars},
                                self.captures)
        return stmt

    def _files_preamble(self, stmt):
        """FILES()/$-placeholder preamble: DESC files(), insert-
        context flags, and the files()->temp-view rewrite."""
        from starrocks_spark.plans.sqltester import _strip_parens_block
        if re.search(r"\bfiles\s*\(", stmt, re.IGNORECASE) \
                or re.search(r"\$\d", stmt):
            try:
                dfm = re.match(r"\s*DESC(?:RIBE)?\s+files\s*\(", stmt,
                               re.IGNORECASE)
                self._files_insert_ctx = bool(
                    re.match(r"\s*INSERT\b", stmt, re.IGNORECASE))
                self._files_load_state = None
                if self._files_insert_ctx:
                    # statement-level PROPERTIES ratio must be visible
                    # to the files() source built here in the preamble
                    mr9 = re.search(
                        r'"max_filter_ratio"\s*=\s*"([^"]+)"', stmt)
                    if mr9:
                        self.vars["insert_max_filter_ratio"] = \
                            mr9.group(1)
                    sm9 = re.search(
                        r'"strict_mode"\s*=\s*"([^"]+)"', stmt)
                    hv9 = re.search(
                        r"SET_VAR\s*\(\s*enable_insert_strict\s*=\s*"
                        r"(\w+)", stmt, re.IGNORECASE)
                    self._files_insert_strict = not (
                        (sm9 and sm9.group(1).lower() == "false")
                        or (hv9 and hv9.group(1).lower() == "false"))
                    self._files_push_down = bool(re.search(
                        r'"enable_push_down_schema"\s*=\s*"true"',
                        stmt, re.IGNORECASE))
                if dfm:
                    inner, _ = _strip_parens_block(stmt, dfm.end() - 1)
                    opts = dict(self._FILES_KV_RE.findall(inner))
                    opts["__desc__"] = "1"
                    fdf = self._read_files_df(opts)
                    rows = [(f.name,
                             "json" if f.name in self._files_json_cols
                             else self._files_sr_type(f.dataType),
                             "YES") for f in fdf.schema.fields]
                    df = self.spark.createDataFrame(
                        rows, "Field string, Type string, Null string")
                    return StatementResult(stmt, "select", df)
                self._files_orig = stmt  # verbatim for SHOW CREATE VIEW
                stmt = self._rw_files(stmt)
            except Exception as e:  # noqa: BLE001 — honest skip
                if self.strict:
                    raise
                return StatementResult(stmt, "skipped",
                                       reason=str(e)[:500])
        return stmt

    def _exec_create_view(self, stmt):
        vm2 = re.match(
            r"\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+"
            r"(IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?"
            r"(?:\s*\(([^)]*)\))?"
            r"(?:\s+COMMENT\s+'([^']*)')?"
            r"(?:\s+SECURITY\s+(NONE|INVOKER))?\s+AS\s+(.*)$",
            stmt, re.IGNORECASE | re.DOTALL)
        vname, vbody = vm2.group(3), vm2.group(7)
        vcols2 = ([c.strip().strip("`")
                   for c in vm2.group(4).split(",")]
                  if vm2.group(4) else None)
        if vm2.group(1) is None and vname in self.views:
            if vm2.group(2):  # IF NOT EXISTS → no-op
                return StatementResult(stmt, "noop")
            raise ValueError(
                f"View '{vname}' already exists")
        tv9 = [t for t in self.temp_tables
               if re.search(rf"\b{re.escape(t)}\b", vbody)]
        if tv9:
            raise ValueError(
                f"View based on temporary table "
                f"[{tv9[0]}] is not supported")
        self._refresh_views()
        # materialize through the runner's select path, then
        # re-register as a view over the captured result (the
        # tester's views are over literal/table-func bodies)
        vdf = self._select(vbody)
        if vcols2:
            vdf = vdf.toDF(*vcols2)
        vdf.createOrReplaceTempView(vname)
        self.views.add(vname)
        # verbatim body + comment for SHOW CREATE VIEW /
        # information_schema.tables (AstToSQLBuilder prints
        # the original text including trailing -- comments)
        body_src = vbody
        if "__files_" in vbody \
                and getattr(self, "_files_orig", None):
            om9 = re.match(
                r"\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+"
                r"(?:IF\s+NOT\s+EXISTS\s+)?`?\w+`?"
                r"(?:\s+COMMENT\s+'[^']*')?"
                r"(?:\s+SECURITY\s+(?:NONE|INVOKER))?"
                r"\s+AS\s+(.*)$",
                self._files_orig,
                re.IGNORECASE | re.DOTALL)
            if om9:
                body_src = om9.group(1)
        self.view_meta[vname] = {
            "comment": vm2.group(5) or "",
            "body": body_src,
            "materialize_body": vbody,
            "cols": list(vdf.columns),
            "security": (vm2.group(6) or "none").lower(),
            "dml_seq": getattr(self, "_dml_seq", 0),
        }
        self.view_deps[vname] = {
            t for t in (set(self.defs) | self.views
                        | set(self.mvs))
            if t != vname
            and re.search(rf"\b{re.escape(t)}\b", vbody)}

    def _exec_drop_view(self, stmt):
        name = re.match(r"\s*DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?"
                        r"`?(\w+)`?", stmt, re.IGNORECASE
                        ).group(1)
        self._check_mv_dependency(name)
        self.spark.catalog.dropTempView(name)
        self.views.discard(name)
        self.view_deps.pop(name, None)
        for mv in self.mvs.values():
            if name in mv.base_tables and mv.is_active:
                mv.is_active = False
                mv.inactive_reason = (
                    f"base-view dropped: {name}")


PRE0 = {
    '__STREAMLOAD__': ['streamload'],
    '__FNWAIT__': ['fnwait'],
    '__FNASSERT__': ['fnassert'],
    '__SHELLFILE__': ['shellfile'],
    'SET': ['set_uservar'],
    'CREATE': ['create_dictionary'],
    'REFRESH': ['refresh_dictionary'],
    'CANCEL': ['cancel_refresh_dictionary'],
    'DROP': ['drop_dictionary'],
}

PRE1 = {
    'BEGIN': ['txn_begin'],
    'START': ['txn_begin'],
    'COMMIT': ['txn_commit'],
    'ROLLBACK': ['txn_rollback'],
    'SET': ['set_sql_mode', 'set_sql_dialect', 'set_feature_vars', 'set_partial_update', 'set_binary_encoding', 'set_time_zone'],
    'GRANT': ['grant_select'],
    'REVOKE': ['revoke_select'],
    'ALTER': ['alter_view_security'],
    'RECOVER': ['recover_partition', 'recover_table'],
    'SELECT': ['select_sysvar'],
    'SHOW': ['show_index', 'show_temp_partitions', 'show_variables', 'show_columns', 'show_full_columns', 'show_create_view', 'show_create_table', 'show_partitions'],
    'DROP': ['drop_index_on', 'drop_database'],
    'EXECUTE': ['execute_as'],
    'CREATE': ['db_record', 'create_index_stmt'],
    'USE': ['db_record'],
    'UPDATE': ['update_be_configs'],
    'DESC': ['desc_infoschema_direct', 'desc_infoschema_static', 'desc_table'],
    'DESCRIBE': ['desc_infoschema_direct', 'desc_infoschema_static', 'desc_table'],
}
PRE2 = {
    'CREATE': ['create_temporary'],
    'ADMIN': ['admin_set_config'],
    'DROP': ['drop_temp_table'],
    'ALTER': ['alter_db_rename'],
    'SHOW': ['show_tables'],
}
