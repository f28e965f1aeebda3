#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [query ...]

1. Runs graft.Verify via sbt (writes per-query parquet + oracle_sql.json).
2. Registers the sfDir parquet tables in DuckDB, runs each oracle SQL.
3. Compares Spark output vs DuckDB output: row count, column names/dtypes
   (sorted by name), and exact values (bitwise for floats).

Driver-side-only deps (duckdb/pandas/pyarrow) — dev tooling, not shipped.
"""
import json, math, subprocess, sys, os

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify(sf_dir, out_dir, run=True, only=()):
    if not run:
        return
    names = " ".join(only)
    cmd = ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir} {names}'.strip()]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-2000:])
        sys.exit(1)


def _type_eq(a, b):
    """Structural type equality ignoring nested list field names."""
    import pyarrow as pa
    if pa.types.is_list(a) and pa.types.is_list(b):
        return _type_eq(a.value_type, b.value_type)
    return str(a) == str(b)


def compare(name, spark_dir, con, sql):
    try:
        oracle = con.execute(sql).arrow()
    except Exception as e:
        return f"ORACLE-ERR {e}"
    try:
        spark = pq.read_table(spark_dir)
    except Exception as e:
        return f"SPARK-MISSING {e}"
    sc = sorted(spark.column_names)
    oc = sorted(oracle.column_names)
    if sc != oc:
        return f"COLS spark={sc} oracle={oc}"
    if spark.num_rows != oracle.num_rows:
        return f"ROWS spark={spark.num_rows} oracle={oracle.num_rows}"
    spark = spark.select(sc)
    oracle = oracle.select(sc)
    for col in sc:
        st, ot = spark.schema.field(col).type, oracle.schema.field(col).type
        if not _type_eq(st, ot):
            return f"TYPE {col}: spark={st} oracle={ot}"
    sd, od = spark.to_pylist(), oracle.to_pylist()
    for i, (a, b) in enumerate(zip(sd, od)):
        for col in sc:
            va, vb = a[col], b[col]
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if va != vb:
                    return f"VAL row {i} col {col}: spark={va!r} oracle={vb!r}"
            elif va != vb:
                return f"VAL row {i} col {col}: spark={va!r} oracle={vb!r}"
    return None


def compare_pandas(name, spark_dir, con, sql):
    """Driver-representation replica: the driver compares via pandas, where
    DuckDB .df() renders DECIMAL as float64 but Spark parquet reads back as
    Decimal objects, and ARRAY columns crash sort_values. The pyarrow path
    above cannot see either — this one can.

    Deliberately RE-EXECUTES the oracle SQL: .df() must go through DuckDB's
    own pandas conversion (converting the pyarrow result via .to_pandas()
    would keep decimal128 and mask exactly the divergence this path
    exists to catch). Costs a second oracle run per query — dev-gate
    wall-clock, accepted."""
    import pandas as pd
    try:
        oracle = con.execute(sql).df()
    except Exception as e:
        return f"ORACLE-ERR {e}"
    try:
        spark = pd.read_parquet(spark_dir)
    except Exception as e:
        return f"SPARK-MISSING {e}"
    sc, oc = sorted(spark.columns), sorted(oracle.columns)
    if sc != oc:
        return f"COLS spark={sc} oracle={oc}"
    if len(spark) != len(oracle):
        return f"ROWS spark={len(spark)} oracle={len(oracle)}"
    try:
        spark = spark[sc].sort_values(sc).reset_index(drop=True)
        oracle = oracle[sc].sort_values(sc).reset_index(drop=True)
    except Exception as e:
        return f"SORT-ERR {type(e).__name__}: {e}"
    for col in sc:
        if str(spark[col].dtype) != str(oracle[col].dtype):
            return f"DTYPE {col}: spark={spark[col].dtype} oracle={oracle[col].dtype}"
        for i, (va, vb) in enumerate(zip(spark[col], oracle[col])):
            na, nb = va is None or va != va, vb is None or vb != vb
            if na or nb:
                if na != nb:
                    return f"NULL row {i} col {col}: spark={va!r} oracle={vb!r}"
                continue
            if type(va) is not type(vb):
                return (f"PYTYPE row {i} col {col}: "
                        f"spark={type(va).__name__}({va!r}) oracle={type(vb).__name__}({vb!r})")
            if va != vb:
                return f"VAL row {i} col {col}: spark={va!r} oracle={vb!r}"
    return None


def cap_pandas_check(full):
    """Caps have no oracle, but the driver still pandas-loads + sorts them
    to count rows — ARRAY columns crash that. Replicate."""
    import pandas as pd
    df = pd.read_parquet(full)
    cols = sorted(df.columns)
    df[cols].sort_values(cols)
    return len(df)


def bench_guard(only=()):
    """Perf-regression gate: run graft.Bench with the driver's settings and
    fail loudly when any query exceeds its recorded threshold
    (tools/bench_thresholds.json = best known time x 1.5, floored at 0.6 s
    to absorb scheduling noise on sub-second queries). A reroute that
    silently quadruples a query — the round-3 q_dedup_simhash failure —
    now fails this gate instead of surfacing a round later in the
    driver's BENCH artifact. Queries without a recorded threshold (new
    this round) are reported but never fail; refresh the file whenever a
    real win lowers the floor.

    Thresholds are calibrated on FULL-sequence runs, where earlier
    queries absorb codegen/footer warmup. A filtered subset run pays
    that cold cost itself (measured: ProfQuery run1 is 5-7x run3), so
    subset runs get a 2x allowance — still tight enough to catch a
    genuine reroute blow-up, loose enough not to flag warmup.

    Full (unfiltered) guard runs take the per-query MEDIAN of 3
    consecutive bench processes. Measured round 6: three identical
    back-to-back full runs totalled 49.2 / 57.1 / 76.7 s with 31 of 84
    queries spreading >1.5x run-to-run (q_dedup_simhash 2.27 -> 6.39 s
    with zero code change) — host-load noise of that magnitude makes any
    single-run comparison meaningless, while the median of 3 held every
    unchanged query inside its ceiling. Filtered dev-loop runs stay
    single-shot (fast feedback; the 2x cold allowance absorbs the rest).

    Limits carry a +0.15 s ADDITIVE allowance on top of the 1.5x
    multiplicative headroom: scheduling noise is additive, so a
    multiplicative ceiling pinches sub-second queries hardest. Measured
    round 7: q_sample_group (unchanged code, 0.32 s warm steady-state)
    medianed 0.52 / 0.76 / 0.76 s across three median-of-3 guard runs —
    the 0.75 s ceiling (best 0.50 x 1.5) flagged pure scheduler jitter
    twice while every multi-second query sat comfortably inside its
    limit. +0.15 s is noise-floor-sized at the low end and negligible
    (<8%) for anything over 2 s."""
    thr = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "bench_thresholds.json")))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32")
    cmd = ["sbt", "-batch", ("runMain graft.Bench " + " ".join(only)).strip()]
    runs = []
    for _ in range(1 if only else 3):
        artifact = "/root/repo/BENCH_QUERIES.json"
        if os.path.exists(artifact):  # never reuse a stale run's artifact
            os.remove(artifact)
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True,
                           text=True, env=env)
        # prefer the file artifact Bench writes (immune to log truncation —
        # the round-7 "parsed": null fix); fall back to scraping stdout
        m = None
        try:
            with open(artifact) as f:
                m = json.loads(f.read())
        except Exception:
            pass
        for line in r.stdout.splitlines():
            if m is None and '"queries"' in line:
                m = json.loads(line[line.index("{"):])
        if r.returncode != 0 or m is None:
            print(r.stdout[-3000:]); print(r.stderr[-2000:])
            print("BENCH-GUARD: bench run failed")
            sys.exit(1)
        if m.get("failed"):
            # a throwing query records a near-zero wall time — letting it
            # through would both hide the breakage AND poison the medians
            # file with bogus "fast" entries (round-10 fixture episode)
            print(f"BENCH-GUARD: {len(m['failed'])} queries FAILED inside "
                  f"the bench run: {', '.join(sorted(m['failed']))}")
            sys.exit(1)
        runs.append(m)
        print(f"run {len(runs)}: total {m['value']:.1f}s")
        if not only:
            # keep every individual full run: each is exactly the driver's
            # single-shot shape, so `--compare tools/bench_last_runs/runN.json`
            # reconciles a real driver-shaped run against the medians
            rdir = os.path.join(os.path.dirname(__file__), "bench_last_runs")
            os.makedirs(rdir, exist_ok=True)
            with open(os.path.join(rdir, f"run{len(runs)}.json"), "w") as f:
                json.dump(m, f)
    med = {name: sorted(r["queries"][name] for r in runs)[len(runs) // 2]
           for name in runs[0]["queries"]}
    total = sorted(r["value"] for r in runs)[len(runs) // 2]
    if not only:
        # persist the controlled medians: --compare reconciles a (noisy,
        # single-shot) driver BENCH_r*.json against this file
        out = {"_total": round(total, 3)}
        out.update({k: round(v, 4) for k, v in sorted(med.items())})
        with open(os.path.join(os.path.dirname(__file__),
                               "bench_medians.json"), "w") as f:
            json.dump(out, f, indent=1)
    cold = 2.0 if only else 1.0
    fails = []
    for name, sec in sorted(med.items()):
        lim = thr.get(name)
        if lim is not None:
            lim = round(lim * cold + 0.15, 2)
        if lim is None:
            print(f"new  {name}: {sec:6.2f}s (no threshold yet)")
        elif sec > lim:
            fails.append(name)
            print(f"SLOW {name}: {sec:6.2f}s > {lim}s limit")
        else:
            print(f"ok   {name}: {sec:6.2f}s (limit {lim}s)")
    print(f"\nmedian total {total:.1f}s over {len(runs)} run(s); "
          f"{len(fails)} over threshold")
    if fails:
        print("BENCH-GUARD FAIL: " + ", ".join(fails))
    sys.exit(1 if fails else 0)


def load_bench_artifact(path):
    """Per-query WALL seconds from either a complete Bench artifact
    (BENCH_QUERIES.json — one JSON object with a "queries" map) or a
    driver BENCH_r*.json whose "tail" holds a front-truncated fragment
    of that line (the historical "parsed": null shape).

    The tail fragment is treacherous: the Bench line carries BOTH a wall
    "queries" dict and a "queries_cpu" dict, and front-truncation can
    leave only the cpu dict's pairs. Round 10's artifact did exactly
    that, and the old bare-pair regex silently compared CPU-seconds
    against wall medians — 14 phantom offenders where the true count
    was 3. So: only accept scraped pairs whose dict NAME survived
    truncation and whose sum reconciles with the total; otherwise
    recover the wall dict from a sibling BENCH_QUERIES.json with the
    matching total, and failing that refuse loudly instead of
    returning CPU numbers as wall numbers.

    Returns (queries, total, source_note)."""
    import re
    d = json.load(open(path))
    if isinstance(d.get("queries"), dict):
        return d["queries"], d.get("value"), "artifact 'queries' dict"
    tail = d.get("tail", "")
    mt = re.search(r'"metric"\s*:\s*"total"\s*,\s*"value"\s*:\s*([0-9.eE+]+)',
                   tail)
    total = float(mt.group(1)) if mt else d.get("value")

    def scrape(seg):
        return {m.group(1): float(m.group(2)) for m in
                re.finditer(r'"((?:q|cap|s)_\w+)":([0-9.eE+]+)', seg)}

    qpos = tail.find('"queries":{')
    cpos = tail.find('"queries_cpu":{')
    if qpos >= 0:
        end = cpos if cpos > qpos else len(tail)
        qs = scrape(tail[qpos:end])
        # a complete wall dict sums to ~the total (per-query walls are
        # measured inside the same loop); a cpu dict would sum far higher
        if qs and total and abs(sum(qs.values()) - total) <= max(
                1.0, 0.05 * total):
            return qs, total, "wall 'queries' dict scraped from tail"
    sib = os.path.join(os.path.dirname(os.path.abspath(path)),
                       "BENCH_QUERIES.json")
    if os.path.exists(sib) and total is not None:
        try:
            s = json.load(open(sib))
            if (isinstance(s.get("queries"), dict)
                    and abs(float(s.get("value", -1)) - total) < 1e-6):
                return (s["queries"], s["value"],
                        f"recovered from {sib} (totals match; the "
                        f"artifact tail lost the wall dict to truncation)")
        except (OSError, json.JSONDecodeError, TypeError, ValueError):
            pass
    frag = scrape(tail)
    if frag:
        kind = ("only the 'queries_cpu' dict" if cpos >= 0 or qpos < 0
                else "an ambiguous dict fragment")
        sys.exit(f"bench_compare: {path!r} tail is truncated and {kind} is "
                 f"recoverable — CPU-seconds must NOT be compared against "
                 f"wall medians (round-10 phantom-offender bug). Re-run the "
                 f"bench to produce BENCH_QUERIES.json next to it, or pass "
                 f"that file directly.")
    sys.exit(f"bench_compare: no per-query data recoverable from {path!r}")


def bench_compare(path):
    """Reconcile a driver bench artifact against the guard's controlled
    median-of-3 file (tools/bench_medians.json, written by every full
    `--bench` run) so a 68.5s-vs-45.0s driver artifact reads as one
    computed table instead of a per-round re-derivation.

    Noise envelope: measured on UNCHANGED code — round 6 saw 49.2 /
    57.1 / 76.7 s across three back-to-back full runs with individual
    queries spreading 3.1x (q_agg_bitwise 0.19->0.59), and round 8's
    driver run repeated the pattern. A single-shot driver timing within
    median*3.2 + 0.3s is therefore indistinguishable from host load;
    beyond that envelope the delta needs a plan-level look."""
    try:
        qs, total, source = load_bench_artifact(path)
    except (OSError, json.JSONDecodeError) as e:
        sys.exit(f"bench_compare: cannot read bench artifact {path!r}: {e}\n"
                 f"Pass a BENCH_QUERIES.json / BENCH_r*.json path, or run "
                 f"`check.py --bench` first to produce one.")
    print(f"wall times: {source}")
    # cpu annotation for offenders: cpu≈wall*cores means compute inflation,
    # cpu<<wall means the host starved the run — different diagnoses
    cpu = {}
    sib = os.path.join(os.path.dirname(os.path.abspath(path)),
                       "BENCH_QUERIES.json")
    for cand in (path, sib):
        try:
            c = json.load(open(cand)).get("queries_cpu")
            if isinstance(c, dict):
                cpu = c
                break
        except (OSError, json.JSONDecodeError):
            pass
    med_path = os.path.join(os.path.dirname(__file__), "bench_medians.json")
    try:
        med = json.load(open(med_path))
    except (OSError, json.JSONDecodeError) as e:
        sys.exit(f"bench_compare: cannot read guard medians {med_path!r}: {e}\n"
                 f"Run a full `check.py --bench` to (re)write it.")
    gtotal = med.pop("_total", None)
    noise = investigate = missing = 0
    rows = []
    for name, sec in qs.items():
        m = med.get(name)
        if m is None:
            missing += 1
            continue
        env = m * 3.2 + 0.3
        if sec <= env:
            noise += sec > m
            rows.append((sec / m, name, sec, m, env, "within-noise"))
        else:
            investigate += 1
            rows.append((sec / m, name, sec, m, env, "INVESTIGATE"))
    for ratio, name, sec, m, env, verdict in sorted(rows, reverse=True)[:15]:
        note = ""
        if verdict == "INVESTIGATE" and name in cpu:
            note = (f"; cpu {cpu[name]:.2f}s — "
                    + ("cpu≈wall: compute inflation, not starvation"
                       if cpu[name] >= 0.7 * sec else "cpu<<wall: host load"))
        print(f"{verdict:13s} {name}: driver {sec:5.2f}s vs guard median "
              f"{m:5.2f}s ({ratio:.1f}x; noise envelope {env:.2f}s){note}")
    print(f"\ndriver total {total:.1f}s vs guard median-of-3 total "
          f"{gtotal:.1f}s" if total and gtotal else "")
    print(f"{len(rows)} compared: {investigate} beyond the measured noise "
          f"envelope, {len(rows) - investigate} within it "
          f"({missing} queries absent from the medians file)")
    sys.exit(1 if investigate else 0)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--bench":
        bench_guard(tuple(sys.argv[2:]))
    if len(sys.argv) > 1 and sys.argv[1] == "--compare":
        bench_compare(sys.argv[2] if len(sys.argv) > 2 else os.path.join(
            os.path.dirname(__file__), "..", "BENCH_QUERIES.json"))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3:])
    run_verify(sf_dir, out_dir, run=not os.environ.get("SKIP_VERIFY"), only=sorted(only))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(sqls):
        if only and name not in only:
            continue
        err = compare(name, f"{out_dir}/{name}", con, sqls[name])
        if not err:
            perr = compare_pandas(name, f"{out_dir}/{name}", con, sqls[name])
            err = f"[pandas] {perr}" if perr else None
        if err:
            fail += 1
            print(f"FAIL {name}: {err}")
        else:
            ok += 1
            print(f"ok   {name}")
    # capability (no-oracle) entries: rows-only presence check, via the
    # same pandas load+sort the driver does
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if os.path.isdir(full) and d not in sqls and (not only or d in only):
            try:
                n = cap_pandas_check(full)
                print(f"cap  {d}: rows={n}" + ("" if n > 0 else "  (EMPTY!)"))
            except Exception as e:
                fail += 1
                print(f"FAIL cap {d}: UNREADABLE {type(e).__name__}: {e}")
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
