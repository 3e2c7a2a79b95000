"""End-to-end dataset assembly (jobs/dataset_assembly_job.run_assembly):
quota -> adaptive gate -> mixture -> token-budget freeze -> chunk ->
pack, over the real sf0.001 documents table.

Pins the stage CONTRACTS (monotone counts, quota cap, budget ceiling,
pack capacity, coverage) and the pipeline-level determinism claim: the
assembled (seq_id, chunk_idx, pack_id, pack_pos) assignment is invariant
to input partitioning.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)

SF = "/root/testdata/sf0.001"

PARAMS = dict(
    quota_col="source",
    quota_k=20,
    gate_q=0.1,
    gate_delta=500.0,
    mixture={"en": 2.4, "de": 0.5},
    default_weight=1.0,
    token_budget=20_000,
    chunk_budget=32,
    pack_budget=128,
    pack_buckets=8,
)


@pytest.fixture(scope="module")
def assembled(spark):
    from dataset_assembly_job import run_assembly

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out, report = run_assembly(spark, docs, **PARAMS)
    rows = out.collect()
    out.unpersist()
    return rows, report


def test_stage_counts_monotone_and_reported(assembled):
    _, r = assembled
    assert r["n_input"] > 0
    assert 0 < r["n_after_quota"] <= r["n_input"]
    assert 0 < r["n_after_gate"] <= r["n_after_quota"]
    # mixture up-weights en 2.4x: count can exceed the gated count
    assert r["n_after_mixture"] >= r["n_after_gate"] * 0.5
    assert 0 < r["n_after_freeze"] <= r["n_after_mixture"]
    assert r["tokens_after_freeze"] <= PARAMS["token_budget"]
    assert r["n_chunks"] >= r["n_after_freeze"]
    assert r["n_packed_chunks"] == r["n_chunks"]  # packing is total
    assert 0 < r["pack_fill"] <= 1.0


def test_quota_respected(spark):
    from dataset_assembly_job import run_assembly

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out, _ = run_assembly(
        spark, docs, quota_col="source", quota_k=5, chunk_budget=64,
        pack_budget=256, pack_buckets=4,
    )
    # reconstruct doc ids from seq_id (no mixture -> seq_id == doc_id)
    kept = {int(r["seq_id"]) for r in out.select("seq_id").collect()}
    out.unpersist()
    per_src = (
        docs.filter(F.col("doc_id").isin(list(kept)))
        .groupBy("source").count().collect()
    )
    assert per_src and all(r["count"] <= 5 for r in per_src)


def test_pack_capacity_and_coverage(assembled):
    rows, _ = assembled
    packs: dict[int, int] = {}
    seen = set()
    for r in rows:
        packs[r["pack_id"]] = packs.get(r["pack_id"], 0) + r["n_chunk_tokens"]
        seen.add((r["seq_id"], r["chunk_idx"]))
        assert 1 <= r["n_chunk_tokens"] <= PARAMS["chunk_budget"]
    # every chunk is <= chunk_budget <= pack_budget here, so no
    # oversized-document exemption applies: every pack fits the budget
    assert packs and all(tok <= PARAMS["pack_budget"] for tok in packs.values())
    # chunk coverage: (seq, idx) pairs are unique
    assert len(seen) == len(rows)


def test_assembly_invariant_to_partitioning(spark, assembled):
    from dataset_assembly_job import run_assembly

    rows, _ = assembled
    docs = spark.read.parquet(f"{SF}/documents.parquet").repartition(17)
    out2, _ = run_assembly(spark, docs, **PARAMS)
    rows2 = out2.collect()
    out2.unpersist()
    key = lambda r: (r["seq_id"], r["chunk_idx"])  # noqa: E731
    a = sorted((key(r), r["pack_id"], r["pack_pos"]) for r in rows)
    b = sorted((key(r), r["pack_id"], r["pack_pos"]) for r in rows2)
    assert a == b
