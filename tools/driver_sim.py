"""Driver-faithful verification harness: the local twin of the round
driver's correctness gate.

Runs exactly what CORRECTNESS_r{N} runs: a PLAIN SparkSession (none of
the engine's session confs — so conf-dependent bugs surface here, not
externally), ``entry()`` as the smoke check, then every oracle-backed
``queries()`` entry side-by-side against DuckDB at sf0.01 with the
driver's own canonicalizer semantics — pandas ``sort_values`` over all
columns (which CRASHES on array/map cells, exactly like the external
harness) and the repr-based cell canonicalization its hash compare
implies. Run from the repo root:

    python tools/driver_sim.py            # full sweep (chunked)
    python tools/driver_sim.py q_a q_b    # just the named queries

Exit 0 = every oracle query hash-matches (the state every round should
end in); any FAIL line names the query to fix.

Sweep safety (VERDICT r13 "What's wrong" #2): a full-catalog sweep in
ONE session accumulates JVM state and OOMs a default-1g driver around
query ~125 at sf0.1. The no-args full sweep therefore CHUNKS itself:
the parent process (no Spark) splits the catalog into
``DRIVER_SIM_CHUNK`` (default 50) query groups and re-execs this file
per group, so every chunk gets a fresh JVM and the sweep finishes in a
default environment with no tribal knowledge. ``--one-session`` forces
the old single-session full sweep for A/B purposes.
"""
import sys, os, math, hashlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def orchestrate() -> int:
    """Parent mode: no SparkSession here — list the catalog, re-exec
    one child per chunk (fresh JVM each), aggregate exit codes."""
    import subprocess

    from os_ex_3_map_reduce_spark.plans.catalog import all_queries

    names = list(all_queries())
    chunk = int(os.environ.get("DRIVER_SIM_CHUNK", "50"))
    env = dict(os.environ)
    # Headroom without changing session semantics (memory is not a SQL
    # conf): the sf0.1 sweep needs more than spark-defaults' 1g even
    # chunked, and the recipe must live in the tool, not in a memory
    # file. Respected only if the caller didn't set their own.
    env.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 6g pyspark-shell")
    bad_chunks = []
    for i in range(0, len(names), chunk):
        sub = names[i : i + chunk]
        print(
            f"=== chunk {i // chunk + 1}/{(len(names) + chunk - 1) // chunk}: "
            f"{len(sub)} queries, fresh JVM ===",
            flush=True,
        )
        rc = subprocess.call([sys.executable, os.path.abspath(__file__), *sub], env=env)
        if rc:
            bad_chunks.append(i // chunk + 1)
    print(
        "SWEEP RESULT:",
        "ALL MATCH" if not bad_chunks else f"FAILING CHUNKS: {bad_chunks}",
        flush=True,
    )
    return 1 if bad_chunks else 0


def run(names: list[str] | None) -> int:
    """Child/inline mode: one plain session, smoke + the named queries
    (or the whole catalog when ``names`` is None)."""
    import duckdb
    from pyspark.sql import SparkSession

    # Deliberately plain session: no nanosAsLong, TZ left at system default.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    # t1 smoke
    rows = e.entry(spark).collect()
    print(f"t1 entry(): {len(rows)} rows; first: {rows[0]}")
    assert len(rows) > 0

    # t2: run EVERY oracle-checked query vs duckdb (driver runs sf0.01;
    # override DRIVER_SIM_SF_DIR to sweep at another scale, e.g. sf0.1
    # for 10x scale-up evidence)
    sf = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    def canon(v):
        import numpy as np

        if v is None:
            return "NULL"
        if isinstance(v, float) and math.isnan(v):
            return "NULL"
        if isinstance(v, np.floating):
            f = float(v)
            return "NULL" if math.isnan(f) else repr(f)
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (np.integer, int)):
            return str(int(v))
        return str(v)

    qs, os_ = e.queries(), e.oracle_sql()
    if names:  # subset mode: only the named queries
        want = set(names)
        unknown = want - set(qs)
        assert not unknown, f"unknown query names: {sorted(unknown)}"
        qs = {n: f for n, f in qs.items() if n in want}
        os_ = {n: s for n, s in os_.items() if n in want}
    fails = []

    def driver_canon(pdf):
        # Mirror the REAL driver: pandas sort_values over all columns.
        # This CRASHES on ndarray/dict cells (TypeError: unhashable type)
        # exactly like CORRECTNESS_r01's two ERR rows — keeping that
        # behavior here means array-typed outputs fail loudly in the sim
        # instead of passing locally and erroring externally.
        cols = sorted(pdf.columns)
        pdf = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        return [tuple(canon(r[c]) for c in cols) for _, r in pdf.iterrows()]

    for name in sorted(os_):
        spdf = qs[name](spark, sf).toPandas()
        opdf = con.execute(os_[name]).df()
        cols = sorted(spdf.columns)
        ok_cols = cols == sorted(opdf.columns)
        try:
            s_rows = driver_canon(spdf)
            o_rows = driver_canon(opdf) if ok_cols else []
        except TypeError as ex:
            print(f"FAIL {name}: driver canonicalizer crash: {ex}")
            fails.append(name)
            continue
        h = lambda rs: hashlib.sha256(repr(rs).encode()).hexdigest()[:12]
        match = ok_cols and s_rows == o_rows
        print(f"{'OK ' if match else 'FAIL'} {name}: spark={len(spdf)} "
              f"oracle={len(opdf)} hash {h(s_rows)} vs {h(o_rows)}", flush=True)
        if not match:
            fails.append(name)

    # rows-only queries (no oracle): the driver still runs them and
    # records a row count — mirror that so an analysis-time crash in one
    # of them surfaces locally, not in CORRECTNESS_r{N}. Catalog policy:
    # every rows-only query MUST return >= 1 row on every SF (each
    # carries self-evidence columns, and an empty evidence set proves
    # nothing), so zero rows is treated as a failure here by design.
    for name in sorted(set(qs) - set(os_)):
        try:
            n = qs[name](spark, sf).count()
            print(f"OK  {name}: rows-only, spark={n}", flush=True)
            if n <= 0:
                fails.append(name)
        except Exception as ex:
            print(f"FAIL {name}: rows-only crash: {type(ex).__name__}: {str(ex)[:160]}")
            fails.append(name)

    print("RESULT:", "ALL MATCH" if not fails else f"FAILURES: {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--one-session"]
    one_session = "--one-session" in sys.argv[1:]
    if argv:  # named subset → inline, exactly the old behavior
        sys.exit(run(argv))
    sys.exit(run(None) if one_session else orchestrate())
