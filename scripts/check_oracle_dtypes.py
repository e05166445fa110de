"""Enumerate oracle output dtypes that diverge from Spark under Arrow.

The driver's value-hash materializes both sides through a dataframe
path, where DuckDB HUGEINT/UHUGEINT/DECIMAL become float64 while the
Spark side stays int64 — equal values, different hashed representation
(the r02 `timeseries_paa_similarity` failure class). This script
DESCRIBEs every registered oracle against the sf0.01 views and prints
any column typed HUGEINT/UHUGEINT/DECIMAL so the oracle can be CAST.

    python scripts/check_oracle_dtypes.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from stream_processing_project_spark.plans import registry
from stream_processing_project_spark.schemas import FIXTURE_TABLES

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")

con = duckdb.connect()
for t in FIXTURE_TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
    )

offenders = {}
errs = []
for name, sql in registry.oracles().items():
    try:
        desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
    except Exception as exc:  # noqa: BLE001
        errs.append(name)
        print(f"ERR  {name}: {exc}")
        continue
    bad = [(c, ty) for c, ty, *_ in desc if any(b in ty.upper() for b in BAD)]
    if bad:
        offenders[name] = bad
        print(f"BAD  {name}: {bad}")

print(f"\n{len(offenders)} offender(s), {len(errs)} describe error(s)")
# a DESCRIBE error means an oracle went UNCHECKED — fail, don't skip
sys.exit(1 if offenders or errs else 0)
