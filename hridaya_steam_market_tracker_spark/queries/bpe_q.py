"""BPE training as a driver-value-checked query pair.

The full training trajectory — which pair wins each round, at what
weighted frequency, and the corpus token count after each merge — is
a deterministic function of the corpus (argmax tie-broken on
(freq DESC, left, right); merges applied as left-to-right
non-overlapping string replaces). The oracle replays ALL of it in
DuckDB as an unrolled per-round CTE chain over the same vocabulary
representation, so the driver hash-checks the trained tokenizer
itself, not just row counts — the strongest form of cross-engine
verification this repo applies to iterative algorithms (contrast:
Lloyd kmeans, which is NOT value-checkable — see COVERAGE.md — because
its float averages feed back into assignments; BPE's feedback is
integer counts and exact string rewrites, which is why it CAN be).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

_N_MERGES = 8

# Vocabulary CTE shared by both oracles: lowercase whitespace tokens ->
# separator-joined char representation with the </w> end marker.
_W0 = """
    w0 AS MATERIALIZED (
      SELECT concat(regexp_replace(word, '(.)', '\\1' || chr(31), 'g'), '</w>')
               AS repr,
             CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT t AS word
        FROM (SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                 x -> x <> '') AS ws
              FROM documents),
             unnest(ws) AS u(t)
        WHERE strpos(t, chr(31)) = 0
      ) GROUP BY 1
    )
"""


def _round_stages(r: int) -> str:
    prev = f"w{r - 1}"
    return f"""
    p{r} AS (
      SELECT q.a AS l, q.b AS r2, CAST(sum(w.cnt) AS BIGINT) AS freq
      FROM {prev} w, LATERAL (
        SELECT s.sp[k.k] AS a, s.sp[k.k + 1] AS b
        FROM (SELECT string_split(w.repr, chr(31)) AS sp) s,
             LATERAL (SELECT unnest(range(1, len(s.sp))) AS k) k
      ) q
      GROUP BY 1, 2
    ),
    m{r} AS (SELECT l, r2, freq FROM p{r}
             ORDER BY freq DESC, l ASC, r2 ASC LIMIT 1),
    w{r} AS MATERIALIZED (
      SELECT replace(w.repr, m.l || chr(31) || m.r2, m.l || m.r2) AS repr, w.cnt
      FROM {prev} w CROSS JOIN m{r} m
    ),
    t{r} AS (
      SELECT CAST(sum(len(string_split(repr, chr(31))) * cnt) AS BIGINT) AS tok
      FROM w{r}
    )"""


def _train_oracle(n: int) -> str:
    stages = ",\n".join([_W0] + [_round_stages(r) for r in range(1, n + 1)])
    rows = "\n    UNION ALL\n".join(
        f'    SELECT {r} AS round, l AS "left", r2 AS "right", freq, '
        f"t{r}.tok AS corpus_tokens_after FROM m{r} CROSS JOIN t{r}"
        for r in range(1, n + 1)
    )
    return f"WITH {stages}\n{rows}"


def _segment_oracle(n: int) -> str:
    stages = ",\n".join([_W0] + [_round_stages(r) for r in range(1, n + 1)])
    reps = "\n".join(
        f"    rep{r} AS (SELECT doc_id, replace(repr, m.l || chr(31) || m.r2, "
        f"m.l || m.r2) AS repr FROM rep{r - 1} CROSS JOIN m{r} m),"
        for r in range(1, n + 1)
    )
    return f"""WITH {stages},
    seg AS (
      SELECT doc_id, t AS w
      FROM (SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                               x -> x <> '') AS ws
            FROM documents),
           unnest(ws) AS u(t)
      WHERE strpos(t, chr(31)) = 0
    ),
    rep0 AS (
      SELECT doc_id,
             concat(regexp_replace(w, '(.)', '\\1' || chr(31), 'g'), '</w>') AS repr
      FROM seg
    ),
{reps}
    toks AS (
      SELECT doc_id, unnest(string_split(repr, chr(31))) AS tok FROM rep{n}
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe_tokens,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
    FROM toks GROUP BY doc_id
    """


@register(
    "bpe_train_merges",
    oracle=_train_oracle(_N_MERGES),
    doc=(
        "TRAINED BPE tokenizer (Sennrich 2016), value-checked round by "
        "round: 8 merge rounds over the documents vocabulary — corpus "
        "aggregated ONCE into (word, count), then each round is a pair "
        "explode + weighted argmax on the vocab table only, with the "
        "winning pair flowing back as a broadcast one-row cross join "
        "(no driver collect) and the vocab localCheckpoint-ed so plan "
        "depth stays constant. The oracle replays the full trajectory "
        "as unrolled SQL stages; corpus_tokens_after recounts the "
        "vocabulary after each merge, so overlapping-pair effects are "
        "truthful."
    ),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hridaya_steam_market_tracker_spark.operators.bpe import bpe_train

    docs = table(spark, sf_dir, "documents")
    return bpe_train(docs, n_merges=_N_MERGES)


@register(
    "bpe_doc_token_stats",
    oracle=_segment_oracle(_N_MERGES),
    doc=(
        "BPE segmentation with the freshly trained merges: per document, "
        "total and distinct BPE token counts after applying all 8 merges "
        "in training order — the merge table broadcasts as a sorted "
        "struct array and the replace chain runs scan-stage via "
        "aggregate(). The oracle re-trains AND re-segments in SQL, so "
        "the whole tokenize pipeline is hash-checked end to end."
    ),
)
def bpe_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hridaya_steam_market_tracker_spark.operators.bpe import bpe_segment, bpe_train

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=_N_MERGES)
    return bpe_segment(docs, merges)
