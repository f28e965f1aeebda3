#!/usr/bin/env python3
"""Dev harness for authoring Spark-dialect SQL twins (driver-side
tooling, like check.py — pyspark/pandas are NOT engine dependencies).

Workflow that produced src/main/scala/graft/queries/SparkDialect.scala:
  1. `python3 tools/check.py` dumps every oracle to
     /tmp/graft_verify/oracle_sql.json + per-query parquet results.
  2. This script auto-rewrites each DuckDB-only oracle through the RULES
     table (list_* -> array fns, `//` -> div, 1-based indexing ->
     element_at, unnest -> explode, backslash-doubling in string
     literals, ...), executes the candidate twin via pyspark, and
     compares the frame against the committed Spark result dump —
     exact values, NaN-aware.
  3. Queries the rules can't translate get a hand twin in
     /tmp/twins/<name>.sql (taken in preference to the auto-rewrite).
  4. Passing twins are embedded in SparkDialect.twins; the ScalaTest
     census (SqlParitySpec, Marquee) then gates every oracle's
     Spark-dialect text against the DataFrame implementation on the
     engine itself.

Usage: python3 tools/sql_dialect_dev.py [query ...]   (default: all
oracles that fail spark.sql analysis, listed one per line on stdin of
a previous probe run — edit `targets` below for a fixed list.)
"""
import json, os, re, sys
import pandas as pd
import numpy as np

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
DUMP = "/tmp/graft_verify"
TW = "/tmp/twins"
os.makedirs(TW, exist_ok=True)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]:
    spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
ev = spark.read.parquet(f"{SF}/events.parquet")
if dict(ev.dtypes)["ts"] == "bigint":
    ev = ev.selectExpr(*[c if c != "ts" else
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz) as ts"
        for c in ev.columns])
else:
    ev = ev.selectExpr(*[c if c != "ts" else
        "cast(ts as timestamp_ntz) as ts" for c in ev.columns])
ev.createOrReplaceTempView("events")

RULES = [
    (r"\bstring_split\(", "split("),
    (r"\blist_distinct\(", "array_distinct("),
    (r"\blist_transform\(", "transform("),
    (r"\blist_filter\(", "filter("),
    (r"\blist_slice\(", "slice("),
    (r"\blist_max\(", "array_max("),
    (r"\blist_min\(", "array_min("),
    (r"\blist_intersect\(", "array_intersect("),
    (r"\blist_sort\(", "array_sort("),
    (r"\barray_to_string\(", "array_join("),
    (r"\bjson_extract_string\(", "get_json_object("),
    (r"\bepoch_us\(([^()]+)\)", r"unix_micros(cast(\1 as timestamp))"),
    (r"\bregexp_matches\(", "regexp_like("),
    (r"\bstrlen\(", "length("),
    (r"\bUNNEST\(GENERATE_SERIES\(", "explode(sequence("),
    (r"\bunnest\(range\(len\(([A-Za-z_0-9.]+)\)\)\)",
     r"explode(sequence(0, size(\1) - 1))"),
    (r"\bunnest\(\[([^\]]*)\]\)", r"explode(array(\1))"),
    (r"\bunnest\(", "explode("),
    (r"\bgenerate_series\(", "sequence("),
    # DuckDB len() is string-or-array; every len() site in the twin set is
    # an array (verified by sweep) -> size()
    (r"\blen\(", "size("),
    (r"AS VARCHAR\)", "AS STRING)"),
    (r"AS HUGEINT\)", "AS DECIMAL(38,0))"),
    (r"//", " div "),
    (r"date_diff\('(\w+)'\s*,", lambda m: f"date_diff({m.group(1).upper()},"),
    (r"\(([^()]*?) IGNORE NULLS\)", r"(\1) IGNORE NULLS"),
    (r'AS "([^"]+)"', r"AS `\1`"),
    (r", 'g'\)", ")"),
    (r"\bmake_timestamp\(", "timestamp_micros("),
    (r"\brange\(size\(([A-Za-z_0-9.]+)\)\)", r"sequence(0, size(\1) - 1)"),
    # cosine dot-product idiom: list_sum over an elementwise product zip
    (r"list_sum\(transform\(list_zip\(([A-Za-z_0-9.]+),\s*([A-Za-z_0-9.]+)\),"
     r"\s*x -> CAST\(x\[1\] AS DOUBLE\) \* CAST\(x\[2\] AS DOUBLE\)\)\)",
     r"aggregate(zip_with(\1, \2, (u, v) -> CAST(u AS DOUBLE) * "
     r"CAST(v AS DOUBLE)), 0D, (s, t) -> s + t)"),
    (r"string_agg\(([A-Za-z_0-9.]+), '([^']*)' ORDER BY \1\)",
     r"array_join(array_sort(collect_list(\1)), '\2')"),
    (r"\bsplit\(([^()]+)\)\[(\d+)\]", r"element_at(split(\1), \2)"),
    # DuckDB arr[i] is 1-based; Spark [] is 0-based -> element_at (also
    # 1-based). ':' guard keeps slice syntax out; leading letter keeps
    # array literals out.
    (r"\b([a-z_][A-Za-z_0-9.]*)\[([^\]\[:]+)\]", r"element_at(\1, \2)"),
    (r"/ 100\.0\b", "/ CAST(100.0 AS DOUBLE)"),
    (r"(\d+)::BIGINT", r"CAST(\1 AS BIGINT)"),
    (r"\blist\(", "collect_list("),
    (r"\blength\((?=win\b)", "size("),
    (r"\bsplit\(([^()]+)\)\[([^\]\[:]+)\]", r"element_at(split(\1), \2)"),
    (r"\b([a-z_][A-Za-z_0-9.]*)\[([^\]\[:]+) : ([^\]\[]+)\]",
     r"slice(\1, \2, (\3) - (\2) + 1)"),
    (r"\[\]", "array()"),
    (r"\bxor\(([^,()]+),\s*([^()]+)\)", r"(\1 ^ \2)"),
    (r"regexp_extract_all\(([A-Za-z_0-9.]+), ('(?:[^'\\]|\\.)*')\)",
     r"regexp_extract_all(\1, \2, 0)"),
    (r"\(dayofweek\(([^()]+)\) \+ 6\) % 7", r"(dayofweek(\1) + 5) % 7"),
]

def _balanced(sql, start):
    """Index just past the ')' matching the '(' at sql[start]."""
    depth = 0
    i = start
    while i < len(sql):
        if sql[i] == '(':
            depth += 1
        elif sql[i] == ')':
            depth -= 1
            if depth == 0:
                return i + 1
        elif sql[i] == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        i += 1
    raise ValueError("unbalanced")

def _split_args(body):
    """Split top-level comma-separated args."""
    args, depth, cur = [], 0, []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "'":
            cur.append(c); i += 1
            while i < len(body) and body[i] != "'":
                cur.append(body[i]); i += 1
            if i < len(body):
                cur.append(body[i])
        elif c in "([":
            depth += 1; cur.append(c)
        elif c in ")]":
            depth -= 1; cur.append(c)
        elif c == "," and depth == 0:
            args.append("".join(cur).strip()); cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args

def _rewrite_range(sql):
    """DuckDB range(a[,b]) (end-exclusive) -> Spark sequence (inclusive)."""
    while True:
        m = re.search(r"\brange\(", sql)
        if not m:
            return sql
        end = _balanced(sql, m.end() - 1)
        args = _split_args(sql[m.end():end - 1])
        if len(args) == 1:
            rep = f"sequence(0, ({args[0]}) - 1)"
        else:
            rep = f"sequence({args[0]}, ({args[1]}) - 1)"
        sql = sql[:m.start()] + rep + sql[end:]

def _rewrite_list_reduce(sql):
    """list_reduce(list_prepend(SEED, X), L) -> aggregate(X, SEED, L)."""
    while True:
        m = re.search(r"\blist_reduce\(list_prepend\(", sql)
        if not m:
            return sql
        outer_end = _balanced(sql, m.start() + len("list_reduce"))
        inner_start = m.start() + len("list_reduce(list_prepend")
        inner_end = _balanced(sql, inner_start)
        inner_args = _split_args(sql[inner_start + 1:inner_end - 1])
        rest = _split_args(sql[inner_end:outer_end - 1].lstrip(", "))
        seed = inner_args[0]
        arr = ", ".join(inner_args[1:])
        lam = ", ".join(rest)
        sql = (sql[:m.start()] +
               f"aggregate({arr}, {seed}, {lam})" + sql[outer_end:])

def _double_backslashes(sql):
    # DuckDB string literals keep backslashes verbatim; Spark's parser
    # consumes them as escapes — double them inside single-quoted strings
    return re.sub(r"'((?:[^'\\]|\\.)*)'",
                  lambda m: "'" + m.group(1).replace("\\", "\\\\") + "'", sql)

def auto(sql):
    sql = _rewrite_list_reduce(sql)
    for pat, rep in RULES:
        sql = re.sub(pat, rep, sql)
    sql = _rewrite_range(sql)
    return _double_backslashes(sql)

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    return df

def eq(a, b):
    if list(a.columns) != list(b.columns):
        return f"cols {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        va, vb = a[c].values, b[c].values
        for i in range(len(va)):
            x, y = va[i], vb[i]
            if isinstance(x, float) and isinstance(y, float):
                if (np.isnan(x) and np.isnan(y)) or x == y:
                    continue
                return f"col {c} row {i}: {x!r} vs {y!r}"
            elif isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
                if np.array_equal(x, y):
                    continue
                return f"col {c} row {i}: {x!r} vs {y!r}"
            elif x != y and not (pd.isna(x) and pd.isna(y)):
                return f"col {c} row {i}: {x!r} vs {y!r}"
    return None

def check(name, sqls):
    path = f"{TW}/{name}.sql"
    hand = os.path.exists(path)
    twin = open(path).read() if hand else auto(sqls[name])
    try:
        got = spark.sql(twin)
        gotp = got.toPandas()
    except Exception as e:
        lines = [l for l in str(e).split("\n") if l.strip()]
        return f"ERR {' | '.join(lines[:2])[:220]}"
    try:
        want = pd.read_parquet(f"{DUMP}/{name}")
    except Exception as e:
        return f"NO-DUMP {e}"
    d = eq(canon(gotp), canon(want))
    if d:
        return f"DIFF {d[:220]}"
    if not hand:
        open(path, "w").write(twin)
    return "ok"

if __name__ == "__main__":
    sqls = json.load(open(f"{DUMP}/oracle_sql.json"))
    targets = sys.argv[1:] or sorted(sqls)
    npass = 0
    for n in targets:
        r = check(n, sqls)
        if r == "ok":
            npass += 1
        print(f"{'PASS' if r == 'ok' else 'FAIL'} {n}" +
              ("" if r == "ok" else f"  {r}"))
    print(f"\n{npass}/{len(targets)} pass")
