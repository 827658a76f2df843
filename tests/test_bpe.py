"""BPE training against a hand-worked toy corpus (Sennrich-style)."""

from __future__ import annotations

from hridaya_steam_market_tracker_spark.operators.bpe import bpe_segment, bpe_train


def _toy(spark):
    return spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id long, text string",
    )


def test_bpe_train_hand_computed(spark):
    """Corpus low x3, lower x2, newest x1. Hand-worked pair counts:
    round 1 ties (l,o) and (o,w) at 5 -> left-asc tie-break picks
    (l,o); round 2 (lo,w) at 5; round 3 (low,</w>) at 3 (ties with
    (w,e) at 3 -> 'low' < 'w'). Corpus tokens 31 -> 26 -> 21 -> 18."""
    rows = {
        r["round"]: r
        for r in bpe_train(_toy(spark), n_merges=3).collect()
    }
    assert (rows[1]["left"], rows[1]["right"], rows[1]["freq"]) == ("l", "o", 5)
    assert (rows[2]["left"], rows[2]["right"], rows[2]["freq"]) == ("lo", "w", 5)
    assert (rows[3]["left"], rows[3]["right"], rows[3]["freq"]) == ("low", "</w>", 3)
    assert [rows[r]["corpus_tokens_after"] for r in (1, 2, 3)] == [26, 21, 18]


def test_bpe_segment_toy(spark):
    """After 3 merges: doc 1 = 'low</w>' x3 -> 3 tokens, 1 distinct;
    doc 2 = 'low e r </w>' x2 -> 8 tokens, 4 distinct; doc 3 =
    'n e w e s t </w>' -> 7 tokens, 6 distinct (e twice)."""
    docs = _toy(spark)
    merges = bpe_train(docs, n_merges=3)
    seg = {r["doc_id"]: r for r in bpe_segment(docs, merges).collect()}
    assert (seg[1]["n_bpe_tokens"], seg[1]["n_distinct_tokens"]) == (3, 1)
    assert (seg[2]["n_bpe_tokens"], seg[2]["n_distinct_tokens"]) == (8, 4)
    assert (seg[3]["n_bpe_tokens"], seg[3]["n_distinct_tokens"]) == (7, 6)


def test_bpe_train_deterministic(spark):
    docs = _toy(spark)
    a = sorted(map(tuple, bpe_train(docs, n_merges=3).collect()))
    b = sorted(map(tuple, bpe_train(docs, n_merges=3).collect()))
    assert a == b


def test_bigram_lm_hand_computed(spark):
    """Corpus 'a b' + 'a b a': c(<s>,a)=2, c(a,b)=2, c(b,a)=1;
    w1 counts <s>=2, a=2, b=1; V=3. p(a|<s>)=p(b|a)=3/5, p(a|b)=2/4."""
    import math

    from hridaya_steam_market_tracker_spark.operators.lm import (
        bigram_lm_doc_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b a")], "doc_id long, text string"
    )
    micro = lambda p: int(round(math.log(p) * 1e6))
    rows = {r["doc_id"]: r for r in bigram_lm_doc_scores(docs).collect()}
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["score_micro_nats"] == micro(0.6) + micro(0.6)
    assert rows[2]["n_bigrams"] == 3
    assert rows[2]["score_micro_nats"] == micro(0.6) + micro(0.6) + micro(0.5)
    assert abs(rows[2]["perplexity"] - math.exp(
        -(micro(0.6) * 2 + micro(0.5)) / 3e6)) < 1e-5


def test_html_to_text_semantics(spark):
    """Semantic expectations (the oracle only proves cross-engine regex
    parity): scripts/styles/comments vanish, tags separate words,
    entities decode once, whitespace normalizes."""
    from hridaya_steam_market_tracker_spark.operators.text import html_to_text
    from pyspark.sql import functions as F

    html = (
        "<html><head><script>var a = '<p>not text</p>';</script>"
        "<style>p{}</style></head><body><!-- hidden -->"
        "<h1>Hello</h1><p>world &amp; friends</p>"
        "<div>x &lt; y &gt; z</div><span>&quot;q&#39;s&quot;</span>"
        "<p>double &amp;lt; stays</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    out = df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "Hello world & friends x < y > z \"q's\" double &lt; stays"
