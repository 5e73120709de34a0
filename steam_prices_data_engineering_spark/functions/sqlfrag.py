"""Shared DuckDB-SQL fragments for the shingle/MinHash oracle family.

Single source of truth for the cross-engine hash arithmetic: the token
hash, the shingle-hash composition, and the MinHash signature/band
builders. The Spark twins live in `functions/text.py`
(token_hash/token_hash_array/shingle_hash_array) and
`operators/dedup.py` (hashed_shingle_table, minhash signature stages);
an oracle that inlines its own copy of these formulas WILL drift the
first time a parameter changes, so every consumer (registry, corpus_eval,
graph_ops, llm_text, trainset/decontam) must compose from here.
"""

from __future__ import annotations

from collections.abc import Iterator

SHINGLE_HASH_PRIME = 2_147_483_647  # 2^31 - 1 (== functions.text)

def sql_token_hash_scalar(expr: str) -> str:
    """The token hash as a scalar expression over `expr` (the
    functions/text.py:token_hash twin for non-lambda contexts — DuckDB
    cannot invoke a bare lambda outside list_transform/list_filter)."""
    return (
        f"CAST(length({expr}) * 961 + ascii(substr({expr}, 1, 1)) * 31 "
        f"+ ascii(right({expr}, 1)) AS BIGINT)"
    )


# DuckDB lambda mirroring functions/text.py:token_hash.
SQL_TOKEN_HASH = f"x -> {sql_token_hash_scalar('x')}"


def sql_token_hashes(text_expr: str = "text") -> str:
    """list of token hashes for a text column (token_hash_array twin)."""
    return f"list_transform(string_split({text_expr}, ' '), {SQL_TOKEN_HASH})"


def sql_shingle_hashes(th_expr: str = "th") -> str:
    """3-gram shingle hashes composed from a token-hash list column
    (shingle_hash_array twin): empty when fewer than 3 tokens."""
    p = SHINGLE_HASH_PRIME
    return (
        f"CASE WHEN len({th_expr}) < 3 THEN [] "
        f"ELSE list_transform(range(1, len({th_expr}) - 1), "
        f"i -> ((({th_expr}[i] * 8191 + {th_expr}[i + 1]) % {p}) * 8191 "
        f"+ {th_expr}[i + 2]) % {p}) END"
    )


def sql_ngram_hashes(th_expr: str, n: int) -> str:
    """Word n-gram hashes from a token-hash list column for ANY n — the
    parametric twin of functions/text.py:ngram_hash_array (same fold,
    same constants; sql_ngram_hashes(th, 3) == sql_shingle_hashes(th)
    element-for-element). Binds lambda var `i` internally — never feed a
    column named `i` (the CLAUDE.md lambda-shadowing gotcha)."""
    p = SHINGLE_HASH_PRIME
    acc = f"{th_expr}[i]"
    for j in range(1, n):
        acc = f"(({acc}) * 8191 + {th_expr}[i + {j}]) % {p}"
    return (
        f"CASE WHEN len({th_expr}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({th_expr}) - {n - 2}), "
        f"i -> {acc}) END"
    )


def sql_shinglehash_ctes(source: str = "documents") -> str:
    """The tokhash -> shinglehash CTE pair over `source` (any relation
    with doc_id + text), ending in (doc_id, hs) with hs = distinct
    shingle hashes."""
    return f"""tokhash AS (
    SELECT doc_id, {sql_token_hashes()} AS th FROM {source}
),
shinglehash AS (
    SELECT doc_id, list_distinct({sql_shingle_hashes()}) AS hs FROM tokhash
)"""


def sql_minhash_sig_cols() -> Iterator[str]:
    """One `... AS s<i>` column per MinHash permutation (NULL when the doc
    has no shingles)."""
    from ..operators.dedup import MINHASH_PARAMS, MINHASH_PRIME

    for i, (a, b) in enumerate(MINHASH_PARAMS, start=1):
        yield (
            f"CASE WHEN len(hs) = 0 THEN NULL ELSE "
            f"list_min(list_transform(hs, x -> (x * {a} + {b}) % {MINHASH_PRIME})) END AS s{i}"
        )


def sql_minhash_band_expr() -> str:
    """band_key expression switching on band_idx (matches the Spark band
    struct concat in operators/dedup.py)."""
    from ..operators.dedup import MINHASH_BAND_ROWS, MINHASH_PARAMS

    n_bands = len(MINHASH_PARAMS) // MINHASH_BAND_ROWS
    cases = []
    for bi in range(n_bands):
        lo = bi * MINHASH_BAND_ROWS + 1
        parts = " || '_' || ".join(
            f"CAST(s{j} AS VARCHAR)" for j in range(lo, lo + MINHASH_BAND_ROWS)
        )
        cases.append(f"WHEN {bi} THEN {parts}")
    return "CASE band_idx " + " ".join(cases) + " END"


def sql_minhash_band_values() -> str:
    """VALUES list of band indices for the band cross join."""
    from ..operators.dedup import MINHASH_BAND_ROWS, MINHASH_PARAMS

    n_bands = len(MINHASH_PARAMS) // MINHASH_BAND_ROWS
    return ", ".join(f"({i})" for i in range(n_bands))


def sql_minhash_sig_band_ctes(source: str = "documents") -> str:
    """tokhash -> shinglehash -> sig -> banded: the full signature+band
    CTE chain ending in banded(doc_id, band_idx, band_key); `sig` also
    carries hs for exact-Jaccard verification."""
    return f"""{sql_shinglehash_ctes(source)},
sig AS (
    SELECT doc_id, hs, {", ".join(sql_minhash_sig_cols())}
    FROM shinglehash
),
banded AS (
    SELECT doc_id, band_idx, {sql_minhash_band_expr()} AS band_key
    FROM sig CROSS JOIN (VALUES {sql_minhash_band_values()}) b(band_idx)
    WHERE s1 IS NOT NULL
)"""


def sql_exact_jaccard(left_hs: str, right_hs: str) -> str:
    """Exact Jaccard over two distinct-shingle-hash list columns (0.0 for
    two empty sets). Callers wrap with dround_sql(…, 6) BEFORE any
    threshold comparison — the Spark twin (operators/dedup.py:_jaccard via
    minhash_lsh_pairs) rounds before its >= threshold filter, and an
    unrounded oracle comparison drifts on boundary values."""
    return (
        f"CASE WHEN len(list_distinct(list_cat({left_hs}, {right_hs}))) > 0 "
        f"THEN CAST(len(list_intersect({left_hs}, {right_hs})) AS DOUBLE) / "
        f"len(list_distinct(list_cat({left_hs}, {right_hs}))) ELSE 0.0 END"
    )


def sql_hex6_to_int(hexexpr: str) -> str:
    """First 6 chars of an already-lowercase-hex string expression parsed
    to an integer in [0, 16^6) (Spark twin: functions/text.py:hex6_to_int).
    Split out of `sql_md5_hex6_to_int` so a query that also needs the FULL
    digest string hashes once and parses the prefix from a staged column."""
    return (
        f"list_sum(list_transform(range(1, 7), i -> "
        f"(CASE WHEN ascii(substr({hexexpr}, i, 1)) <= 57 "
        f"THEN ascii(substr({hexexpr}, i, 1)) - 48 "
        f"ELSE ascii(substr({hexexpr}, i, 1)) - 87 END) "
        f"* CAST(pow(16.0, 6 - i) AS BIGINT)))"
    )


def sql_hex_slice_to_int(hexexpr: str, start: int, width: int) -> str:
    """Chars [start, start+width) (1-based) of an already-lowercase-hex
    string expression parsed to a BIGINT (Spark twin:
    functions/text.py:hex_slice_to_int). Generalizes sql_hex6_to_int so a
    32-char md5 digest can be ordered as FOUR 8-char (32-bit) numeric
    slices — a numeric total order that is collation-proof by
    construction (VERDICT r9 Next-round #2). width <= 15 keeps the value
    inside BIGINT."""
    if not (1 <= width <= 15):
        raise ValueError(f"width {width} not in [1, 15]")
    stop = start + width
    return (
        f"list_sum(list_transform(range({start}, {stop}), i -> "
        f"(CASE WHEN ascii(substr({hexexpr}, i, 1)) <= 57 "
        f"THEN ascii(substr({hexexpr}, i, 1)) - 48 "
        f"ELSE ascii(substr({hexexpr}, i, 1)) - 87 END) "
        f"* CAST(pow(16.0, {stop - 1} - i) AS BIGINT)))"
    )


def sql_md5_hex6_to_int(expr: str) -> str:
    """First 6 lowercase-hex chars of md5(expr) parsed to an integer in
    [0, 16^6) — the cross-engine uniform-hash primitive (DuckDB has no
    strtol; Spark's twin is functions/text.py:md5_hex6_to_int via conv).
    Both engines emit identical lowercase-hex md5, so the digit-sum here
    equals Spark's conv(substr(md5, 1, 6), 16, 10) exactly."""
    return sql_hex6_to_int(f"md5({expr})")


# Quality-score feature arithmetic (functions/text.py:quality_score twin):
# like the hash fragments above, the weights live in ONE place so the
# doc_quality_scores oracle and every downstream calibration/drift oracle
# cannot drift from each other.
def sql_quality_feat_ctes(source: str = "documents") -> str:
    """t -> feat CTE pair ending in feat(doc_id, n_tokens, diversity,
    avg_tok_len, stop_ratio) over `source` (any relation with
    doc_id + text)."""
    return f"""t AS (
    SELECT doc_id, string_split(text, ' ') AS sp FROM {source}
),
feat AS (
    SELECT doc_id,
           CAST(len(sp) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(sp)) AS DOUBLE) / len(sp) AS diversity,
           CAST(list_sum(list_transform(sp, x -> length(x))) AS DOUBLE) / len(sp) AS avg_tok_len,
           CAST(len(list_filter(sp, x -> x IN ('the', 'a'))) AS DOUBLE) / len(sp) AS stop_ratio
    FROM t
)"""


SQL_QUALITY_EXPR = (
    "0.5 * diversity + 0.3 * (1 - stop_ratio)"
    " + 0.2 * least(n_tokens / 100.0, 1.0)"
)
