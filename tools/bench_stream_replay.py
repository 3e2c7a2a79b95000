"""Replay-idempotence artifact for the index-building streaming faces.

`streaming_incremental_dedup` and `streaming_semantic_dedup` claim
exactly-once output under restarts: every trigger overwrites its own
``batch=<id>__dir`` in both the output and the signature/vector index,
and the index read excludes the current batch (path level + row level),
so a crashed-and-replayed trigger reproduces exactly what the
uninterrupted run would have written.

This tool proves that claim end-to-end on the driver's own data:

1. stream the sf documents (resp. embeddings) table through the operator
   one file per trigger (multiple real foreachBatch triggers against a
   growing standing index);
2. snapshot the final output + index as sorted row-content hashes per
   batch directory;
3. CRASH SIMULATION: remove the newest trigger's commit marker from the
   Spark checkpoint (the exact state a crash between the foreachBatch
   body and the commit leaves behind) AND corrupt that trigger's on-disk
   effects — delete its output dir, truncate its index dir to half the
   files (a half-written overwrite);
4. restart the stream from the same checkpoint: Spark replays the
   un-committed batch against the standing index;
5. assert both stores are row-identical to the uninterrupted snapshot,
   batch structure included.

Prints ONE JSON line: per-face batch counts, row counts, and
replay_identical booleans.

Usage: python tools/bench_stream_replay.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CHUNKS = 4


def store_fingerprint(spark, store_dir: str) -> dict[str, str]:
    """Sorted row-content md5 per batch=*__dir (parquet file names and
    footer bytes are run-dependent; row CONTENT is the contract)."""
    out = {}
    for d in sorted(glob.glob(f"{store_dir}/batch=*__dir")):
        rows = spark.read.parquet(d).collect()
        canon = sorted(tuple(str(x) for x in r) for r in rows)
        h = hashlib.md5(repr(canon).encode()).hexdigest()
        out[os.path.basename(d)] = f"{len(rows)}:{h}"
    return out


def crash_after_last_trigger(ckpt: str, out_dir: str, idx_dir: str) -> int:
    """Simulate a crash between the foreachBatch body and the commit of
    the NEWEST batch: drop its commit marker, delete its output dir, and
    half-delete its index dir's parquet files (mid-overwrite state)."""
    commits = sorted(
        (f for f in os.listdir(f"{ckpt}/commits") if f.isdigit()), key=int
    )
    last = commits[-1]
    os.remove(f"{ckpt}/commits/{last}")
    tag = f"batch={int(last):020d}__dir"
    shutil.rmtree(f"{out_dir}/{tag}", ignore_errors=True)
    idx_batch = f"{idx_dir}/{tag}"
    if os.path.isdir(idx_batch):
        files = sorted(glob.glob(f"{idx_batch}/part-*"))
        for f in files[: max(1, len(files) // 2)]:
            os.remove(f)
        succ = f"{idx_batch}/_SUCCESS"
        if os.path.exists(succ):
            os.remove(succ)
    return int(last)


def run_face(spark, make_writer, src_df, order_col, work: str) -> dict:
    """Chunk src -> stream -> snapshot -> crash -> restart -> compare."""
    from pyspark.sql import functions as F

    src = f"{work}/src"
    out_dir = f"{work}/out"
    idx_dir = f"{work}/idx"
    ckpt = f"{work}/ckpt"
    n = src_df.count()
    per = (n + N_CHUNKS - 1) // N_CHUNKS
    ranked = src_df.withColumn(
        "__rk",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy(order_col)
        ),
    )
    for c in range(N_CHUNKS):
        (
            ranked.filter(
                (F.col("__rk") > c * per) & (F.col("__rk") <= (c + 1) * per)
            )
            .drop("__rk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}/chunk={c}")
        )
    # flatten chunk dirs into one source dir, one file per trigger
    flat = f"{work}/src_flat"
    os.makedirs(flat, exist_ok=True)
    for c in range(N_CHUNKS):
        (pf,) = glob.glob(f"{src}/chunk={c}/part-*.parquet")
        shutil.copy(pf, f"{flat}/{c:04d}.parquet")
    schema = src_df.schema

    def start():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(flat)
        )
        writer = make_writer(sdf, idx_dir, out_dir)
        return (
            writer.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def run_to_completion():
        from pyspark.errors.exceptions.captured import StreamingQueryException

        # availableNow terminates on its own, but the finished query can
        # linger in the checkpoint-path registry for a beat after
        # isActive flips — a too-fast restart then fails with
        # "concurrently using <ckpt>/commits"; bounded retry rides it out
        last = None
        for attempt in range(5):
            try:
                q = start()
                q.awaitTermination(600)
                q.stop()
                return
            except StreamingQueryException as e:
                if "concurrently using" not in str(e):
                    raise
                last = e
                time.sleep(2.0)
        raise last

    run_to_completion()
    clean_out = store_fingerprint(spark, out_dir)
    clean_idx = store_fingerprint(spark, idx_dir)

    replayed = crash_after_last_trigger(ckpt, out_dir, idx_dir)
    run_to_completion()
    replay_out = store_fingerprint(spark, out_dir)
    replay_idx = store_fingerprint(spark, idx_dir)

    return {
        "n_rows": n,
        "n_batches": len(clean_idx),
        "replayed_batch": replayed,
        "out_rows": sum(int(v.split(":")[0]) for v in clean_out.values()),
        "replay_output_identical": replay_out == clean_out,
        "replay_index_identical": replay_idx == clean_idx,
    }


def main() -> None:
    from pyspark.sql import functions as F

    from tdigest_spark import streaming as S
    from tdigest_spark.plans import get_spark
    from tdigest_spark.sources import load_table

    spark = get_spark(app_name="stream-replay")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    report: dict = {"sf": SF_DIR.rstrip("/").split("sf")[-1]}

    base = tempfile.mkdtemp(prefix="stream_replay_")
    try:
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        report["incremental_dedup"] = run_face(
            spark,
            lambda sdf, idx, out: S.streaming_incremental_dedup(
                sdf, idx, out, threshold=0.5
            ),
            docs,
            "doc_id",
            f"{base}/inc",
        )

        emb = load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        cents = emb.filter((F.col("vec_id") % 97) == 1).select(
            F.col("vec_id").cast("int").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
        report["semantic_dedup"] = run_face(
            spark,
            lambda sdf, idx, out: S.streaming_semantic_dedup(
                sdf, cents, idx, out, threshold=0.95
            ),
            emb,
            "vec_id",
            f"{base}/sem",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    report["sec_total"] = round(time.time() - t0, 1)
    report["all_identical"] = all(
        report[k]["replay_output_identical"] and report[k]["replay_index_identical"]
        for k in ("incremental_dedup", "semantic_dedup")
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
