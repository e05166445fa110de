"""Full driver-gate rehearsal.

Runs EVERY registered query against its DuckDB oracle at sf0.01 under a
BARE SparkSession — none of session.py's conf pins — to catch anything
that silently depends on our session (the r01 TIMESTAMP_NTZ failure
mode). The bare session runs with Spark 4's inferTimestampNTZ default
ON, so this rehearsal IS the registry-wide NTZ compatibility gate
(tests/test_driver_session_compat.py keeps only the targeted r01
regression pins — its former registry-wide resolve sweep was strictly
weaker than this full execution and moved here for suite wall-clock,
r06). This is the closest local approximation of the driver's own
CORRECTNESS gate; run before ending a round:

    python scripts/rehearse_driver_gate.py

Expect the final summary line to read `fails: [] errs: []`.

Partitioning-invariance net (run before ending a round): re-run with an
adversarial layout to catch float-sum ordering and any other
partitioning-dependent result the 32-partition pass can't see:

    REHEARSE_SHUFFLE_PARTITIONS=7 REHEARSE_DEFAULT_PARALLELISM=5 \
        python scripts/rehearse_driver_gate.py
"""
import math, sys, traceback
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

_builder = (SparkSession.builder.master("local[32]")
            .config("spark.driver.memory", "48g")
            .config("spark.sql.shuffle.partitions",
                    os.environ.get("REHEARSE_SHUFFLE_PARTITIONS", "32")))
if os.environ.get("REHEARSE_DEFAULT_PARALLELISM"):
    _builder = _builder.config(
        "spark.default.parallelism", os.environ["REHEARSE_DEFAULT_PARALLELISM"]
    )
spark = (_builder
         .appName("rehearsal").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import duckdb
import __spark_entry__ as e
qs, osql = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else float(v)
    if hasattr(v, "item"):
        return canon(v.item())
    return v


def _kind(pa_type):
    """Collapse an Arrow type to the representation class the driver's
    value-hash distinguishes: int / float / decimal / bool / other.
    DuckDB HUGEINT and DECIMAL both export as Arrow decimal128, which a
    dataframe materialization turns into float64 while Spark stays
    int64 — equal values, different hash (the r02 PAA failure class).
    Comparing kinds, not just Python values, makes the rehearsal see
    what the driver sees."""
    import pyarrow as pa
    if pa.types.is_integer(pa_type):
        return "i"
    if pa.types.is_floating(pa_type):
        return "f"
    if pa.types.is_decimal(pa_type):
        return "d"
    if pa.types.is_boolean(pa_type):
        return "b"
    return "o"


def dtype_mismatches(sdf, sql):
    """Numeric columns whose Arrow kind differs between Spark and DuckDB."""
    oschema = con.execute(f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema
    sschema = sdf.limit(0).toArrow().schema
    bad = []
    for f in sschema:
        if f.name not in oschema.names:
            continue
        sk, ok_ = _kind(f.type), _kind(oschema.field(f.name).type)
        if {sk, ok_} <= {"i", "f", "d", "b"} and sk != ok_:
            bad.append((f.name, str(f.type), str(oschema.field(f.name).type)))
    return bad

def _select(names):
    """Subset selection so per-commit iteration stays fast while the
    full 229-query gate remains the pre-push bar (VERDICT r03 task 8).

    --first N          first N names in driver order (the driver's own
                       50-query window is `--first 50`)
    --only a,b,c       explicit names
    --changed-only     names whose builder module .py mtime is newer
                       than the last full-gate stamp
                       (.rehearse_full_gate_stamp, touched on a no-flag
                       full run)
    """
    argv = sys.argv[1:]
    if "--first" in argv:
        n = int(argv[argv.index("--first") + 1])
        return names[:n]
    if "--only" in argv:
        want = set(argv[argv.index("--only") + 1].split(","))
        missing = want - set(names)
        if missing:
            print("unknown names:", sorted(missing))
            sys.exit(2)
        return [n for n in names if n in want]
    if "--changed-only" in argv:
        import stream_processing_project_spark.plans.registry as _reg
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        stamp_path = os.path.join(root, ".rehearse_full_gate_stamp")
        stamp = os.path.getmtime(stamp_path) if os.path.exists(stamp_path) else 0.0
        # builders compose operators/, streaming/, sources/, functions/,
        # plans/common — an edit THERE changes query semantics without
        # touching any builder module's mtime, so any change outside the
        # plans/ query modules conservatively re-selects EVERYTHING (the
        # stale-pass this mode must never produce)
        pkg = os.path.join(root, "stream_processing_project_spark")
        non_plans_changed = False
        for dirpath, _, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                path = os.path.join(dirpath, f)
                rel = os.path.relpath(path, pkg)
                if os.path.getmtime(path) > stamp and not (
                    rel.startswith("plans" + os.sep)
                    and rel != os.path.join("plans", "common.py")
                    and rel != os.path.join("plans", "registry.py")
                ):
                    non_plans_changed = True
        if non_plans_changed:
            print("--changed-only: shared/operator modules changed since "
                  "last full gate — running ALL queries")
            return names
        changed_mods = set()
        for q in _reg.all_queries().values():
            mod = sys.modules[q.builder.__module__]
            if os.path.getmtime(mod.__file__) > stamp:
                changed_mods.add(q.builder.__module__)
        picked = [n for n in names
                  if _reg.get(n).builder.__module__ in changed_mods]
        print(f"--changed-only: {len(picked)} queries from "
              f"{len(changed_mods)} modules changed since last full gate")
        return picked
    return names

_names = _select(list(qs))
fails, errs = [], []
for name, fn in qs.items():
    if name not in _names:
        continue
    try:
        sdf = fn(spark, "/root/testdata/sf0.01")
        cols = sorted(sdf.columns)
        s = sorted([tuple(canon(r[c]) for c in cols) for r in sdf.collect()],
                   key=lambda r: tuple((x is None, str(x)) for x in r))
        if name in osql:
            ocols = [c[0] for c in con.execute(f"SELECT * FROM ({osql[name]}) q LIMIT 0").description]
            idx = [ocols.index(c) for c in sorted(ocols)]
            d = sorted([tuple(canon(r[i]) for i in idx) for r in con.execute(osql[name]).fetchall()],
                       key=lambda r: tuple((x is None, str(x)) for x in r))
            dt = dtype_mismatches(sdf, osql[name])
            ok = s == d and not dt
            if not ok:
                fails.append(name)
            msg = ("OK   " if ok else "FAIL ") + name
            if dt:
                msg += f"  [dtype divergence: {dt}]"
            print(msg, flush=True)
        else:
            print(f"ROWS {name} ({len(s)})", flush=True)
    except Exception:
        errs.append(name)
        print("ERR  " + name, flush=True)
        traceback.print_exc()

print("\n=== SUMMARY ===")
print("total:", len(_names), "fails:", fails, "errs:", errs)
if len(_names) == len(qs) and not fails and not errs:
    # a clean no-flag full run stamps the tree for --changed-only
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".rehearse_full_gate_stamp"), "w") as f:
        f.write("green\n")
sys.exit(1 if (fails or errs) else 0)
