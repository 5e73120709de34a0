"""Distributed BPE merge learning (north-star extension, SURVEY.md §2b
"token counting" tier, taken to its logical end: training the tokenizer).

Byte-pair-encoding training is the canonical "simple algorithm, awkward
at scale" tokenizer step: count adjacent symbol pairs over the corpus,
merge the most frequent pair, repeat. The scale-correct Spark decomposition:

- ONE corpus-scale pass builds the word-frequency table (explode ->
  map-side-combined count) — after that, training runs on the compact
  weighted vocab (vocab-sized at any corpus size; this is why real BPE
  trainers operate on word counts, not raw text).
- Each merge iteration is a pair-count aggregation over the vocab plus a
  1-row argmax; only the single best pair reaches the driver (the
  kmeans-style driver-coordinated loop: scalars move, rows don't).
- Merge application uses non-overlapping left-to-right string replace on
  a space-delimited symbol string — IDENTICAL greedy semantics in Spark
  `replace` and DuckDB `replace`, so the oracle unrolls the same 3
  iterations exactly (ties broken by (count DESC, sym_a, sym_b)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import read_table
from .registry import register

_BPE_ITERS = 3


def _bpe_sql() -> str:
    ctes = [
        """wordcnt AS (
    SELECT tok AS word, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
),
w0 AS (
    SELECT word, cnt,
           ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq
    FROM wordcnt
)"""
    ]
    for i in range(1, _BPE_ITERS + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""
p{i} AS (
    SELECT s[i] AS a, s[i + 1] AS b, sum(cnt) AS c
    FROM (SELECT cnt, s, unnest(range(1, len(s))) AS i
          FROM (SELECT cnt, string_split(trim(seq), ' ') AS s FROM {prev}))
    GROUP BY 1, 2
),
b{i} AS (SELECT a, b, c FROM p{i} ORDER BY c DESC, a ASC, b ASC LIMIT 1),
w{i} AS (
    SELECT word, cnt,
           replace(seq, ' ' || b{i}.a || ' ' || b{i}.b || ' ',
                   ' ' || b{i}.a || b{i}.b || ' ') AS seq
    FROM {prev} CROSS JOIN b{i}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS iteration, a AS sym_a, b AS sym_b, a || b AS merged, "
        f"CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, _BPE_ITERS + 1)
    )
    return f"WITH {','.join(ctes)}\n{unions}"


@register("bpe_train_merges", _bpe_sql())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 BPE merges over the corpus; one row per merge
    (iteration, sym_a, sym_b, merged, pair_count).

    The corpus is touched ONCE (word counts); every iteration then
    aggregates adjacent-pair counts over the cached vocab table and
    collects a single (a, b, count) row. Merge application is a literal
    string replace on the delimited symbol sequence — greedy
    non-overlapping left-to-right in both engines, so e.g. 'aaa' under
    merge (a,a) becomes [aa, a] identically."""
    d = read_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "word",
            "cnt",
            F.concat(
                F.lit(" "),
                F.array_join(F.split(F.col("word"), ""), " "),
                F.lit(" "),
            ).alias("seq"),
        )
        .cache()
    )

    out_schema = (
        "iteration int, sym_a string, sym_b string, merged string, "
        "pair_count long"
    )
    merges = []
    for it in range(1, _BPE_ITERS + 1):
        syms = F.split(F.trim(F.col("seq")), " ")
        staged = words.select("cnt", syms.alias("s"))
        # sequence(1, 0) would generate a DESCENDING [1, 0] — guard
        # single-symbol words to an empty index list instead.
        idx = F.when(
            F.size("s") >= 2, F.sequence(F.lit(1), F.size("s") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pair_counts = (
            staged.select("cnt", "s", F.explode(idx).alias("i"))
            .select(
                F.element_at("s", F.col("i")).alias("a"),
                F.element_at("s", F.col("i") + 1).alias("b"),
                "cnt",
            )
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("c"))
        )
        best = (
            pair_counts.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:  # degenerate corpus (empty / all 1-char words)
            break
        a, b, c = best[0].a, best[0].b, best[0].c
        merges.append((it, a, b, a + b, int(c)))
        nxt = words.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f" {a} {b} "),
                F.lit(f" {a}{b} "),
            ),
        ).cache()
        words.unpersist()
        words = nxt
    return spark.createDataFrame(merges, out_schema)
