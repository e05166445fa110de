from __future__ import annotations

import pytest

from stream_processing_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # default.parallelism=8: createDataFrame slices tiny literal frames
    # into defaultParallelism partitions, so any nested-loop/cartesian
    # baseline in a test becomes 32×32 = 1024 tasks of pure scheduler
    # overhead (~16 s for 20 pairs, r08 suite audit). 8 keeps the suite
    # multi-partition (partitioning bugs still surface; the 32 and 7/5
    # rehearsal layouts cover the rest) at 64-task cartesians.
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    # spool_parquet writes naive (isAdjustedToUTC=false) micros; the
    # streaming watermark arithmetic only matches the fixtures when the
    # session reads them in UTC. get_spark pins this at build time, but
    # getOrCreate may reuse a pre-existing session whose builder configs
    # were ignored — set it on the live session so the suite never
    # depends on the host timezone.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def register_duck_views(con, sf_dir: str) -> None:
    from stream_processing_project_spark.schemas import FIXTURE_TABLES

    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def spool_parquet(dir_path: str, rows, ddl: str, mode: str = "append") -> None:
    """Spool ONE parquet file of literal rows into a (streaming-source)
    directory WITHOUT running a Spark job. A 1-row
    `createDataFrame(...).coalesce(1).write.parquet(...)` costs 4-8 s of
    plan-compile per distinct schema (measured r06) and the streaming
    tests spool dozens of micro-batch files — pyarrow writes the same
    single file in milliseconds. `ddl` is the same "name type, ..."
    string the matching readStream schema uses (types: long/int/double/
    string/timestamp); timestamp values may be ISO strings or datetimes
    and are written as naive micros — the fixture convention the
    sources already read (explicit schemas coerce NTZ micros to
    TimestampType in the UTC container, exactly like the events
    fixture)."""
    import datetime
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    pa_types = {
        "long": pa.int64(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "string": pa.string(),
        "timestamp": pa.timestamp("us"),
    }
    fields = []
    for part in ddl.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        fields.append((name.strip(), pa_types[typ.strip().lower()]))

    def conv(v, typ):
        if v is None or typ != pa.timestamp("us"):
            return v
        if isinstance(v, str):
            return datetime.datetime.fromisoformat(v)
        return v

    cols = list(zip(*rows)) if rows else [[] for _ in fields]
    arrays = [
        pa.array([conv(v, typ) for v in col], type=typ)
        for col, (_, typ) in zip(cols, fields)
    ]
    if mode == "overwrite" and os.path.isdir(dir_path):
        shutil.rmtree(dir_path)
    os.makedirs(dir_path, exist_ok=True)
    pq.write_table(
        pa.Table.from_arrays(arrays, names=[n for n, _ in fields]),
        os.path.join(dir_path, f"part-{uuid.uuid4().hex}.parquet"),
    )


def spool_df(dir_path: str, df, mode: str = "append") -> None:
    """spool_parquet for a (small) Spark DataFrame: one file, one
    driver-side toPandas instead of a coalesce(1) write job. Timestamp
    columns are cast ns→us so the file carries the micros the fixture
    readers expect (the session reads nanos as LONG)."""
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
    schema = pa.schema(
        [
            pa.field(f.name, pa.timestamp("us"))
            if pa.types.is_timestamp(f.type)
            else f
            for f in tbl.schema
        ]
    )
    tbl = tbl.cast(schema)
    if mode == "overwrite" and os.path.isdir(dir_path):
        shutil.rmtree(dir_path)
    os.makedirs(dir_path, exist_ok=True)
    pq.write_table(tbl, os.path.join(dir_path, f"part-{uuid.uuid4().hex}.parquet"))
