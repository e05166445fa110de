"""Scale curve for dedup_jaccard_prefix on a CLONE-FREE scaled corpus.

The shared /tmp/sfcurve* corpora replicate each document verbatim with
offset ids — correct for aggregate-shaped queries, pathological for a
similarity JOIN: every doc gains 9/99 exact clones, so the TRUE answer
grows quadratically within clone groups (~25M pairs at sf10) no matter
how good the algorithm is. A first attempt reshuffled each replica's
words; that fixed the answer-quadratic problem but hit the fixture's
OTHER pathology — a 31-word vocabulary saturates the trigram domain
(29 791 possible shingles), so document frequency grows LINEARLY with
the corpus and the candidate join is quadratic for ANY exact
similarity algorithm (measured 42x at x10). Real corpora grow
vocabulary with size (Heaps' law), so this builder scales the corpus
the way real corpora grow: each replica gets its own TOKEN NAMESPACE
(every word suffixed with the replica index). Within a replica the
planted near-dup structure is preserved exactly (renaming is a
Jaccard-preserving bijection); across replicas there is zero shingle
overlap; shingle document frequencies stay at base level — so the
true pair count and the candidate volume both scale LINEARLY and the
curve measures the operator.

    python scripts/jaccard_scale_curve.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

BASE = "/root/testdata/sf0.1/documents.parquet"
OUT = "/tmp/jaccurve"


def build(scale: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return
    con = duckdb.connect()
    con.execute(f"CREATE VIEW base AS SELECT * FROM read_parquet('{BASE}')")
    mx = con.execute("SELECT max(doc_id) FROM base").fetchone()[0]
    stride = 10 ** len(str(mx))
    parts = ["SELECT doc_id, text, lang, source, n_chars FROM base"]
    for i in range(1, scale):
        parts.append(f"""
SELECT doc_id + {i * stride} AS doc_id,
       array_to_string(list_transform(string_split(trim(text), ' '),
                                      w -> w || '_{i}'), ' ') AS text,
       lang, source, n_chars
FROM base""")
    union = " UNION ALL ".join(parts)
    con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
    print("built", out, flush=True)


def main() -> None:
    from stream_processing_project_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from stream_processing_project_spark.session import get_spark

    build(10, os.path.join(OUT, "x10"))
    build(100, os.path.join(OUT, "x100"))

    spark = get_spark("jaccard-curve")
    spark.sparkContext.setLogLevel("ERROR")

    def run(path):
        docs = spark.read.parquet(path)
        df = prefix_filter_jaccard_pairs(docs)
        df.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.perf_counter()
        df2 = prefix_filter_jaccard_pairs(spark.read.parquet(path))
        n = df2.count()
        return time.perf_counter() - t0, n

    times = []
    for path in (BASE, f"{OUT}/x10/documents.parquet", f"{OUT}/x100/documents.parquet"):
        t, n = run(path)
        times.append(t)
        print(f"{path}: {t:.2f}s pairs={n}", flush=True)
    print(
        f"ratios: x10/x1={times[1]/times[0]:.1f} x100/x10={times[2]/times[1]:.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
