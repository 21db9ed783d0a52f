"""Dialect front-end: rewrites fuse-query/ClickHouse-flavoured SQL into
Spark SQL text (SURVEY §3: "the only lifecycle piece we must write is
the dialect front-end"). Covers the reference's surface:

- table functions ``numbers(N)`` / ``numbers_mt(N)`` / ``numbers_local``
  (datasources/system/numbers_table.rs) → ``range(N)`` subqueries
- combinator suffixes ``<agg>If`` / ``<agg>Distinct``
  (aggregate_function_factory.rs:150-196) → FILTER (WHERE) / DISTINCT
- ``uniq`` (exact distinct, aggregate_combinator_distinct.rs) →
  count(DISTINCT …)
- ``argMin``/``argMax`` (aggregate_arg_min.rs) → min_by/max_by
- named casts ``toInt8..64``/``toUInt*``/``toFloat*``/``toString``/…
  (scalars/expressions/expression.rs:16-27) → CAST
- ClickHouse type names in CAST (sql_common.rs:20-55) → Spark types
- ``toTypeName`` → typeof + reference-style name mapping
- ``siphash``/``siphash64`` → xxhash64 (stable 64-bit hash; NOT
  byte-compatible with SipHash — SURVEY §7 risk 5)
- context functions ``database()``/``version()``
  (fusequery/query/src/functions/context_function.rs) → literals
- ``LIMIT n BY cols`` (plan_limit_by.rs) → row_number window rewrite

The rewriter is token-based (no SQL parser dependency): identifiers
followed by balanced parens are treated as call sites and rewritten
bottom-up, so nesting works.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class DialectContext:
    current_db: str = "default"
    version: str = "fuse-query-spark/0.1.0"
    known_dbs: tuple[str, ...] = field(default_factory=tuple)
    # sleep() requests recorded during rewriting; the ENGINE performs
    # them once at execution time. Rewriting itself must stay
    # side-effect-free: EXPLAIN rewrites without executing, and the
    # demote-user retry path rewrites the same statement twice.
    pending_sleep: list = field(default_factory=list)
    # set by rewrite_select when the statement reads a numbers()
    # source — gates the typer's `number` -> UInt64 static fold so a
    # real table column named `number` is never mistyped
    numbers_source: bool = False


_NAMED_CASTS = {
    "toint8": "TINYINT",
    "toint16": "SMALLINT",
    "toint32": "INT",
    "toint64": "BIGINT",
    # unsigned: widen to the next signed type that holds the range
    # (SURVEY §1.2 — Spark has no unsigned types)
    "touint8": "SMALLINT",
    "touint16": "INT",
    "touint32": "BIGINT",
    "touint64": "BIGINT",
    "tofloat32": "FLOAT",
    "tofloat64": "DOUBLE",
    "tostring": "STRING",
    "todate": "DATE",
    "todatetime": "TIMESTAMP",
}

# ClickHouse custom type names usable in CAST(x AS T) — sql_common.rs:20-55
_TYPE_NAMES = {
    "uint8": "SMALLINT",
    "uint16": "INT",
    "uint32": "BIGINT",
    "uint64": "BIGINT",
    "int8": "TINYINT",
    "int16": "SMALLINT",
    "int32": "INT",
    "int64": "BIGINT",
    "float32": "FLOAT",
    "float64": "DOUBLE",
    "utf8": "STRING",
    # sql_common.rs:25-33: Char/Varchar/Text -> Utf8 (the reference's
    # own perf suite uses `cast(number as text)`); Real -> Float64;
    # Time -> Timestamp(ms). Parameterized forms (varchar(255),
    # char(8)) are valid Spark types and pass through untouched
    # (negative lookahead in _CAST_TYPE).
    "text": "STRING",
    "varchar": "STRING",
    "char": "STRING",
    "real": "DOUBLE",
    "time": "TIMESTAMP",
    "datetime": "TIMESTAMP",
}

_COMBINATOR_BASES = ("sum", "count", "avg", "min", "max", "uniq")

_IDENT_CALL = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\s*\(")


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested in parens/quotes."""
    parts, depth, cur, i = [], 0, [], 0
    in_str: str | None = None
    while i < len(s):
        ch = s[i]
        if in_str:
            cur.append(ch)
            if ch == "\\" and i + 1 < len(s):
                cur.append(s[i + 1])
                i += 2
                continue
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _fold_siphash_literal(args: list[str]) -> str | None:
    """Constant-fold SIPHASH over a literal with the reference's exact
    semantics (Rust DefaultHasher = zero-key SipHash-1-3 over the
    value's native width): integer literals hash at the smallest
    unsigned width that holds them (ClickHouse literal typing — 1 is
    UInt8), float literals hash their f64 bit pattern, string literals
    hash bytes + 0xff. Verified against 02_0009_function_siphash64's
    recorded outputs."""
    if len(args) != 1:
        return None
    a = args[0].strip()
    import struct

    from fuse_query_spark.functions.siphash import _to_signed64, rust_hash_str, siphash

    ms = re.match(r"^'([^']*)'$", a)
    if ms:
        return f"CAST({_to_signed64(rust_hash_str(ms.group(1)))} AS BIGINT)"
    # float literals: any form with a '.' or an exponent (1.5, 1., .5,
    # 1e3, -2.5E-1) — ClickHouse types all of these Float64, and the
    # reference hashes the f64 bit pattern
    if re.match(r"^[+-]?(\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+$", a) or re.match(
        r"^[+-]?(\d+\.\d*|\.\d+)$", a
    ):
        bits = struct.unpack("<Q", struct.pack("<d", float(a)))[0]
        return f"CAST({_to_signed64(siphash(struct.pack('<Q', bits)))} AS BIGINT)"
    # integer literals: minimal-width typing like ClickHouse — nonneg →
    # smallest UInt that holds it; negative → smallest Int, hashed as
    # two's-complement bytes at that width
    if re.match(r"^[+-]?\d+$", a):
        v = int(a)
        # out of 64-bit range: the reference would reject the literal
        # at typing; struct.pack would raise here. Fall through to the
        # column path (None) so the error surfaces as Spark's literal
        # handling, not a struct.error crash inside the rewriter.
        if v >= 2**64 or v < -(2**63):
            return None
        if v >= 0:
            fmt = "<B" if v < 2**8 else "<H" if v < 2**16 else "<I" if v < 2**32 else "<Q"
        else:
            fmt = "<b" if v >= -(2**7) else "<h" if v >= -(2**15) else "<i" if v >= -(2**31) else "<q"
        return f"CAST({_to_signed64(siphash(struct.pack(fmt, v)))} AS BIGINT)"
    return None


def _rewrite_call(name: str, args: list[str], ctx: DialectContext) -> str | None:
    """Return replacement SQL for a call site, or None to leave as-is.
    Args arrive already rewritten (bottom-up)."""
    low = name.lower()
    arg_sql = ", ".join(args)
    if low == "uniq":
        return f"count(DISTINCT {arg_sql})"
    if low in ("argmin", "argmax"):
        fn = "min_by" if low == "argmin" else "max_by"
        return f"{fn}({arg_sql})"
    if low in _NAMED_CASTS:
        return f"CAST({arg_sql} AS {_NAMED_CASTS[low]})"
    if low == "totypename":
        return f"fq_typename(typeof({arg_sql}))"
    if low == "not":
        # ClickHouse NOT() accepts numerics (nonzero = true,
        # 00_0000_dummy_select_1.sql: NOT(1) → false); boolean() is
        # Spark's cast-function spelling and a no-op on booleans
        return f"(NOT boolean({arg_sql}))"
    if low == "substring" and len(args) == 1:
        # FOR-without-FROM sugar (02_0005_function_substring.sql:
        # `subString('abcde' for 2)` → chars 1..2); the FROM..FOR and
        # plain forms parse natively in Spark
        a = args[0]
        if not re.search(r"(?i)\bfrom\b", a):
            mfor = re.match(r"(?is)^(.*\S)\s+for\s+(.+)$", a)
            if mfor:
                return f"substring({mfor.group(1)} FROM 1 FOR {mfor.group(2)})"
    if low in ("siphash", "siphash64"):
        folded = _fold_siphash_literal(args)
        if folded is not None:
            return folded
        # column/expression path: stable 64-bit hash, NOT byte-compatible
        # with the reference (SURVEY §7 risk 5). Byte parity for columns
        # is available explicitly via siphash_exact / siphash_exact_str.
        return f"xxhash64({arg_sql})"
    if low == "count" and not args:
        # zero-arg count() is valid in the reference (aggregate_count.rs
        # assert_variadic_arguments (0, 1)); Spark requires an argument
        return "count(*)"
    if low == "database" and not args:
        return f"'{ctx.current_db}'"
    if low == "version" and not args:
        return f"'{ctx.version}'"
    if low == "sleep":
        # reference sleep(n) requires a CONSTANT arg, blocks the caller
        # for n (<3) seconds, then returns UInt8 0; >=3s or a column arg
        # is BadArguments (scalars/udfs/sleep.rs:57-91). The constant-only
        # contract means the honest Spark analogue is a driver-side sleep
        # at statement time — no per-block sleep exists in a declarative
        # plan, and the caller-visible blocking is identical.
        from fuse_query_spark.errors import BadArguments

        lit = (arg_sql or "").strip()
        if not re.match(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$", lit):
            raise BadArguments(
                f"The argument of function sleep must be constant. Got: {lit or '(none)'}"
            )
        seconds = float(lit)
        if seconds < 0:
            raise BadArguments(
                f"Sleep must be between 0 and 3 seconds. Requested: {lit}"
            )
        if seconds >= 3:
            raise BadArguments(
                f"The maximum sleep time is 3 seconds. Requested: {lit}"
            )
        # record, don't sleep: rewriting runs under EXPLAIN and the
        # engine's demote-user retry, where sleeping (or double-
        # sleeping) would be wrong. The engine sleeps once per execute.
        ctx.pending_sleep.append(seconds)
        return "0"
    if low == "example" and not args:
        # UdfExampleFunction: constant boolean true (udfs/udf_example.rs)
        return "true"
    if low == "crashme":
        # CrashMeFunction panics the server (udfs/crash_me.rs:45); we
        # surface a controlled engine error instead of killing the JVM
        from fuse_query_spark.errors import FuseQueryError

        raise FuseQueryError("crash me function")
    # argMin/argMax combinators (aggregate_function_factory.rs:55-90
    # resolves <agg><combinator> for EVERY registered aggregate):
    # If filters rows; Distinct is a semantic no-op for arg-extrema
    # (duplicate (value, key) tuples cannot change the winner).
    if low in ("argminif", "argmaxif") and len(args) >= 3:
        fn = "min_by" if low.startswith("argmin") else "max_by"
        *rest, cond = args
        return f"{fn}({', '.join(rest)}) FILTER (WHERE {cond})"
    if low in ("argmindistinct", "argmaxdistinct"):
        fn = "min_by" if low.startswith("argmin") else "max_by"
        return f"{fn}({arg_sql})"
    for base in _COMBINATOR_BASES:
        if low == base + "if":
            *rest, cond = args if len(args) > 1 else (["1"] + args)
            inner = ", ".join(rest) if rest else "1"
            if base == "uniq":
                return f"count(DISTINCT {inner}) FILTER (WHERE {cond})"
            return f"{base}({inner}) FILTER (WHERE {cond})"
        if low == base + "distinct":
            if base == "uniq" or base == "count":
                return f"count(DISTINCT {arg_sql})"
            return f"{base}(DISTINCT {arg_sql})"
    return None


def _rewrite_calls(sql: str, ctx: DialectContext) -> str:
    """One left-to-right pass; on each call site, rewrite the argument
    list first (recursion), then the call itself."""
    out = []
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch in "'\"`":  # skip string literals + backtick identifiers
            j = i + 1
            while j < len(sql) and sql[j] != ch:
                j += 2 if sql[j] == "\\" else 1  # honor backslash escape
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = _IDENT_CALL.match(sql, i)
        if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] in "_.")):
            name = m.group(0)[:-1].strip().rstrip()
            name = re.match(r"[A-Za-z_][A-Za-z0-9_]*", m.group(0)).group(0)
            # find matching close paren
            depth, j = 1, m.end()
            while j < len(sql) and depth:
                if sql[j] in "'\"":
                    q = sql[j]
                    j += 1
                    while j < len(sql) and sql[j] != q:
                        j += 2 if sql[j] == "\\" else 1
                elif sql[j] == "(":
                    depth += 1
                elif sql[j] == ")":
                    depth -= 1
                j += 1
            inner = sql[m.end() : j - 1]
            if name.lower() == "totypename":
                # infer the reference's type name STATICALLY from the
                # raw argument (before named-cast rewriting widens
                # toUInt8 -> SMALLINT etc. and loses unsignedness);
                # runtime typeof() can never report UInt* because Spark
                # has no unsigned types (SURVEY §1.2)
                from fuse_query_spark.dialect.typer import infer_fq_type

                inferred = infer_fq_type(inner, allow_number=ctx.numbers_source)
                if inferred is not None:
                    out.append(f"'{inferred}'")
                    i = j
                    continue
            inner_rw = _rewrite_calls(inner, ctx)
            args = _split_top_level(inner_rw) if inner_rw.strip() else []
            replacement = _rewrite_call(name, args, ctx)
            if replacement is None:
                # preserve the original spacing between name and paren
                # (this path also covers keywords like FROM/OVER + '(')
                out.append(sql[i : m.end()] + inner_rw + ")")
            else:
                out.append(replacement)
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


_NUMBERS = re.compile(r"\b(?:system\.)?(numbers|numbers_mt|numbers_local)\s*\(\s*(\d+)\s*\)", re.I)
_CAST_TYPE = re.compile(
    # (?!\s*\() — parameterized forms (varchar(255)) are valid Spark
    # types already and must pass through untouched
    r"(\bAS\s+)(" + "|".join(_TYPE_NAMES) + r")\b(?!\s*\()", re.I
)
_LIMIT_BY = re.compile(r"\sLIMIT\s+(\d+)\s+BY\s+(.+?)(\s+LIMIT\s+\d+\s*)?$", re.I | re.S)


def _alias_map(select_list: str) -> dict[str, str]:
    out = {}
    for item in _split_top_level(select_list):
        m = re.match(r"(?is)^(.*?)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$", item.strip())
        if m:
            out[m.group(2)] = m.group(1).strip()
    return out


def _subst_aliases(expr: str, aliases: dict[str, str]) -> str:
    for name, repl in aliases.items():
        expr = re.sub(rf"\b{re.escape(name)}\b", f"({repl})", expr)
    return expr


def _rewrite_limit_by(s: str) -> str:
    """ClickHouse `LIMIT n BY cols`: keep the first n rows per key in
    the query's ORDER BY order (plan_limit_by.rs / stream_limit_by.rs).

    Rewrite: inject row_number() at the FROM level (so the window can
    order by non-projected columns), substituting select-list aliases
    into the partition/order expressions. Falls back to wrapping the
    whole query when it aggregates (GROUP BY), where the window must
    run over the projected result instead.
    """
    m = _LIMIT_BY.search(s)
    if not m:
        return s
    n, cols, trailing = int(m.group(1)), m.group(2).strip(), m.group(3)
    inner = s[: m.start()].strip()
    outer_limit = f" LIMIT {trailing.strip().split()[1]}" if trailing else ""
    om = re.search(r"(?is)\bORDER\s+BY\s+(.+)$", inner)
    order = om.group(1).strip() if om else cols
    inner_no_order = inner[: om.start()].strip() if om else inner
    msel = re.match(r"(?is)^SELECT\s+(.*?)\s+FROM\s+(.*)$", inner_no_order)
    has_group = re.search(r"(?is)\bGROUP\s+BY\b", inner_no_order) is not None
    if msel and not has_group:
        select_list, rest = msel.group(1), msel.group(2)
        aliases = _alias_map(select_list)
        cols_sub = _subst_aliases(cols, aliases)
        order_sub = _subst_aliases(order, aliases)
        return (
            f"SELECT {select_list} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {cols_sub} ORDER BY {order_sub}) AS __fq_rn FROM {rest}) "
            f"WHERE __fq_rn <= {n}"
            + (f" ORDER BY {order}" if om else "")
            + outer_limit
        )
    # aggregate query: window over the projected result; order columns
    # must be part of the projection here
    return (
        f"SELECT * EXCEPT (__fq_rn) FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {cols} ORDER BY {order}) AS __fq_rn FROM ({inner_no_order})) "
        f"WHERE __fq_rn <= {n}"
        + (f" ORDER BY {order}" if om else "")
        + outer_limit
    )


_HAS_ALIAS = re.compile(r"(?is)\sAS\s+[`\"]?[A-Za-z_][A-Za-z0-9_]*[`\"]?\s*$")
_PLAIN_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$|^\*$|^.*\.\*$")


def _alias_rewritten_select_items(s: str, ctx: DialectContext) -> str:
    """Give every top-level select item that the call rewriter will
    change an explicit backtick alias of its ORIGINAL text, so result
    column names match the reference's convention (it names output
    columns by the source expression — e.g. `uniq(x)`)."""
    m = re.match(r"(?is)^(SELECT\s+(?:DISTINCT\s+)?)(.*?)(\s+FROM\s.*|$)", s)
    if not m:
        return s
    head, select_list, tail = m.groups()
    # only handle a depth-balanced select list (a FROM inside a scalar
    # subquery in the list would confuse the split — leave those alone)
    if select_list.count("(") != select_list.count(")"):
        return s
    items = _split_top_level(select_list)
    out_items = []
    # probe rewrites only test whether the item WOULD change (to decide
    # aliasing); run them on a throwaway ctx so side-records like
    # pending_sleep aren't double-counted by the real pass below.
    import dataclasses

    probe_ctx = dataclasses.replace(ctx, pending_sleep=[])
    for item in items:
        it = item.strip()
        rewritten = _rewrite_calls(it, probe_ctx)
        if (
            rewritten != it
            and not _HAS_ALIAS.search(it)
            and not _PLAIN_IDENT.match(it)
            and "`" not in it
        ):
            alias = it.replace("\n", " ").strip()
            out_items.append(f"{it} AS `{alias}`")
        else:
            out_items.append(item)
    return head + ", ".join(out_items) + tail


def _outside_strings(s: str, fn) -> str:
    """Apply fn only to the segments of s outside single/double-quoted
    literals (regex rewrites must never touch string contents).
    Backslash escapes inside a literal are honored: 'a\\'b' is ONE
    literal, so the quote after the backslash must not close it."""
    out, cur, i, in_str = [], [], 0, None
    start = 0
    while i < len(s):
        ch = s[i]
        if in_str is None and ch in "'\"":
            out.append(fn(s[start:i]))
            in_str = ch
            start = i
        elif in_str is not None and ch == "\\":
            i += 2  # skip the escaped character
            continue
        elif in_str is not None and ch == in_str:
            out.append(s[start : i + 1])
            in_str = None
            start = i + 1
        i += 1
    out.append(s[start:] if in_str is not None else fn(s[start:]))
    return "".join(out)


_AGG_CALL = re.compile(
    r"(?i)\b(sum|count|avg|min|max|uniq|argmin|argmax|stddev\w*|var\w*)\s*(if|distinct)?\s*\(",
)


def _having_without_group_is_where(s: str) -> str:
    """ClickHouse: HAVING on a non-aggregating, GROUP-BY-less SELECT
    filters rows like WHERE (03_0006_select_having.sql: `SELECT * FROM
    numbers_mt(3) HAVING number > 1`). Spark rejects that shape, so
    rewrite HAVING → WHERE when there is no GROUP BY and no aggregate
    in the select list (global-agg HAVING keeps its meaning)."""
    if not re.search(r"(?is)\bHAVING\b", s) or re.search(r"(?is)\bGROUP\s+BY\b", s):
        return s
    head = re.split(r"(?is)\bHAVING\b", s)[0]
    if _AGG_CALL.search(head):
        return s
    if re.search(r"(?is)\bWHERE\b", head):
        # fold into the existing WHERE instead of emitting two filters
        return re.sub(r"(?is)\bHAVING\b", "AND", s, count=1)
    return re.sub(r"(?is)\bHAVING\b", "WHERE", s, count=1)


def strip_line_comments(s: str) -> str:
    """Drop `--`-to-end-of-line and `/* ... */` block comments, but
    never inside quoted string literals: `SELECT 'a--b'` must keep its
    literal intact, a `;` hidden in a trailing comment must not reach
    the splitter as statement text, and a backslash-escaped quote
    ('a\\'--b') must not end the literal early. Block comments are
    replaced by one space so `a/*x*/b` stays two tokens; an
    unterminated block comment swallows the rest (MySQL behavior)."""
    out: list[str] = []
    i, n, in_str = 0, len(s), None
    while i < n:
        ch = s[i]
        if in_str is None and ch == "-" and s.startswith("--", i):
            nl = s.find("\n", i)
            if nl == -1:
                break
            i = nl  # the newline itself is kept as whitespace
            continue
        if in_str is None and ch == "/" and s.startswith("/*", i):
            end = s.find("*/", i + 2)
            if s.startswith("/*+", i):
                # optimizer hints (/*+ BROADCAST(t) */) are NOT
                # comments — they must reach spark.sql intact
                stop = n if end == -1 else end + 2
                out.append(s[i:stop])
                i = stop
                continue
            out.append(" ")
            if end == -1:
                break
            i = end + 2
            continue
        if in_str is not None and ch == "\\" and i + 1 < n:
            out.append(ch)
            out.append(s[i + 1])
            i += 2
            continue
        if in_str is None and ch in "'\"":
            in_str = ch
        elif in_str is not None and ch == in_str:
            in_str = None
        out.append(ch)
        i += 1
    return "".join(out)


def rewrite_select(sql: str, ctx: DialectContext | None = None, demote_user: bool = True) -> str:
    """fuse-query dialect SELECT → Spark SQL text."""
    ctx = ctx or DialectContext()
    s = sql.strip().rstrip(";").strip()
    # comments (string-literal-aware — a plain regex would truncate 'a--b')
    s = strip_line_comments(s)
    # does this statement read a numbers() source? (gates the typer's
    # `number` -> UInt64 fold; see DialectContext.numbers_source).
    # Assigned, not |=: a ctx reused across statements must not carry
    # a previous statement's flag.
    ctx.numbers_source = bool(
        re.search(r"(?i)\b(?:numbers|numbers_mt|numbers_local)\s*\(|\bsystem\.numbers\b", s)
    )
    # `user` is a bare identifier in the reference dialect
    # (02_0006_function_argmin_argmax.sql aliases a column `user`), and
    # with no matching column Spark's grammar resolves it — even
    # backtick-quoted — to current_user(). Demote it to a safe
    # identifier; only the values of result columns are part of the
    # output contract, not their names. When the query reads a REAL
    # column named `user` (which Spark resolves fine — column wins over
    # the keyword), the engine retries with demote_user=False.
    if demote_user:
        s = _outside_strings(s, lambda seg: re.sub(r"(?i)\buser\b(?!\s*\()", "usr_", seg))
    s = _having_without_group_is_where(s)

    def _table_rewrites(seg: str) -> str:
        # numbers(N) table functions → range subquery
        seg = _NUMBERS.sub(lambda m: f"(SELECT id AS number FROM range({m.group(2)}))", seg)
        # system.X tables → registered views
        seg = re.sub(r"\bsystem\.(\w+)", r"system__\1", seg)
        # known db-qualified tables → view names
        for db in ctx.known_dbs:
            seg = re.sub(rf"\b{re.escape(db)}\.(\w+)", rf"{db}__\1", seg)
        return seg

    s = _outside_strings(s, _table_rewrites)
    # LIMIT n BY cols → row_number rewrite (before call rewriting; the
    # wrapped query is rewritten recursively)
    s = _rewrite_limit_by(s)
    # alias top-level select items BEFORE call rewriting so the output
    # column keeps the user's original expression text (ClickHouse
    # names `uniq(x)` as `uniq(x)`, not `count(DISTINCT x)`)
    s = _alias_rewritten_select_items(s, ctx)
    # function-call rewrites (bottom-up; string-aware by construction)
    s = _rewrite_calls(s, ctx)
    # ClickHouse type names inside CAST
    s = _outside_strings(
        s, lambda seg: _CAST_TYPE.sub(lambda m: m.group(1) + _TYPE_NAMES[m.group(2).lower()], seg)
    )
    return s
