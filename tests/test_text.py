

def test_regex_token_stats_is_jvm_codegen(spark):
    """BPE-ish token counting must run whole-stage-codegen in the scan
    stage — no Python, no shuffle."""
    from tdigest_spark.operators.text import regex_token_stats
    from tdigest_spark.plans import explain_str

    df = spark.createDataFrame(
        [(1, "Hello world, it's 2024!")], "doc_id long, text string"
    )
    q = regex_token_stats(df).select("doc_id", "n_bpe_tokens", "n_bpe_words")
    plan = explain_str(q, "simple")
    assert "Python" not in plan and "Arrow" not in plan
    assert "Exchange" not in plan


def test_regex_token_stats_counts(spark):
    from tdigest_spark.operators.text import regex_token_stats

    df = spark.createDataFrame(
        [
            (0, "Hello world, it's 2024!  multi  space"),
            (1, ""),
            (2, "tab\there\nnewline"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in regex_token_stats(df).collect()}
    # ['Hello',' world',',',' it',"'s",' 2024','!','  ','multi','  ','space']
    assert rows[0]["n_bpe_tokens"] == 11
    assert rows[0]["n_bpe_words"] == 9
    assert rows[0]["n_bpe_alpha"] == 6
    assert rows[1]["n_bpe_tokens"] == 0 and rows[1]["bpe_chars_per_token"] is None
    assert rows[2]["n_bpe_words"] == 3
