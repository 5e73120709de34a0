"""Round-10 tier semantics, each against an independent mirror (pure
Python, or a property the construction must satisfy) — the DuckDB
oracle parity layer is tools/check_oracle.py; these tests pin intent.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from steam_prices_data_engineering_spark.plans import registry
from steam_prices_data_engineering_spark.sources.tables import (
    TABLE_SCHEMAS,
    read_table,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dedup_membership_probe
# ---------------------------------------------------------------------------


def test_membership_probe_roles_and_tombstone_exclusion(spark):
    """Probe docs are exactly the tombstoned bucket-0 docs that hit the
    index; every reported match is LIVE (bucket >= 1) — a probe must
    never be answered by its own dead entry or another tombstoned doc —
    and the hit/verify accounting nests (verified <= band hits,
    best_jaccard >= 0.5 iff any verified)."""
    from steam_prices_data_engineering_spark.plans.trainset import (
        knuth_hash,
    )

    rows = registry.queries()["dedup_membership_probe"](
        spark, SF
    ).collect()
    assert rows, "fixture has tombstoned near-dups; probe must hit"
    buckets = {
        r.doc_id: r.bk
        for r in read_table(spark, SF, "documents")
        .select("doc_id", (knuth_hash() % 10).alias("bk"))
        .collect()
    }
    for r in rows:
        assert buckets[r.probe_doc] == 0, "probe side must be bucket 0"
        assert r.n_verified <= r.n_band_hits
        if r.n_verified:
            assert buckets[r.best_match] >= 1, "match must be live"
            assert r.best_jaccard >= 0.5
        else:
            assert r.best_match is None and r.best_jaccard is None


def test_membership_probe_matches_bruteforce_verify(spark):
    """For every probe doc, the verified-match census must equal the
    brute-force jaccard >= 0.5 census RESTRICTED to its band hits, and
    the best match must be the (max rounded jaccard, min doc_id)
    argmax — the two-phase keeper discipline."""
    from collections import defaultdict

    from steam_prices_data_engineering_spark.operators.dedup import (
        hashed_shingle_table,
        minhash_banded,
        minhash_sig_table,
    )
    from steam_prices_data_engineering_spark.plans.trainset import (
        knuth_hash,
    )

    d = read_table(spark, SF, "documents")
    buckets = {
        r.doc_id: r.bk
        for r in d.select("doc_id", (knuth_hash() % 10).alias("bk"))
        .collect()
    }
    hs = {
        r.doc_id: set(r.hs)
        for r in hashed_shingle_table(d).collect()
    }
    band_members = defaultdict(set)
    for r in minhash_banded(
        minhash_sig_table(hashed_shingle_table(d))
    ).collect():
        band_members[(r.band_idx, r.band_key)].add(r.doc_id)

    want = {}
    for key, members in band_members.items():
        probes = [m for m in members if buckets[m] == 0]
        lives = [m for m in members if buckets[m] >= 1]
        for p in probes:
            for live in lives:
                want.setdefault(p, set()).add(live)

    got = {
        r.probe_doc: r
        for r in registry.queries()["dedup_membership_probe"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(want)
    for p, lives in want.items():
        ver = {}
        for live in lives:
            u = hs[p] | hs[live]
            j = len(hs[p] & hs[live]) / len(u) if u else 0.0
            j = math.floor(j * 1e6 + 0.5) / 1e6
            if j >= 0.5:
                ver[live] = j
        r = got[p]
        assert r.n_band_hits == len(lives)
        assert r.n_verified == len(ver)
        if ver:
            best_j = max(ver.values())
            best_doc = min(k for k, v in ver.items() if v == best_j)
            assert r.best_match == best_doc
            assert abs(r.best_jaccard - best_j) < 1e-9


# ---------------------------------------------------------------------------
# ivf_pq_nprobe_curve
# ---------------------------------------------------------------------------


def test_nprobe_curve_monotone_and_exhaustive_at_full_probe(spark):
    """The operating curve's defining properties: scanned count and
    ROUTING recall are monotone non-decreasing in nprobe (candidate
    sets nest), and probing all 8 cells scans the whole corpus and
    routes every true neighbor (cand_recall == 1). The end-to-end ADC
    recall is NOT asserted monotone — PQ quantization distortion can
    push true neighbors out of the ADC top-10 as candidates widen
    (that is exactly what the table is for)."""
    rows = sorted(
        registry.queries()["ivf_pq_nprobe_curve"](spark, SF).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    for a, b in zip(rows, rows[1:]):
        assert a.n_scanned <= b.n_scanned
        assert a.cand_hits <= b.cand_hits
    full = rows[-1]
    assert full.scan_frac == 1.0
    assert full.cand_recall_at_10 == 1.0
    for r in rows:
        assert 0 <= r.adc_hits <= 10
        assert r.cand_hits >= r.adc_hits or r.cand_hits >= 0


# ---------------------------------------------------------------------------
# layout_zorder_vs_linear_eval
# ---------------------------------------------------------------------------


def test_layout_eval_invariants(spark):
    """Both layouts partition the SAME rows, so true matches agree;
    zone-map completeness: every matching row lives in a scanned file
    (rows_scanned >= rows_matched); file censuses are bounded by the
    64-file model."""
    rows = {
        r.layout: r
        for r in registry.queries()["layout_zorder_vs_linear_eval"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {"linear", "zorder"}
    lin, zo = rows["linear"], rows["zorder"]
    assert lin.rows_matched == zo.rows_matched
    for r in (lin, zo):
        assert r.files_scanned <= r.n_files <= 64
        assert r.rows_scanned >= r.rows_matched
        assert r.scan_amplification >= 1.0 or r.rows_matched == 0


def test_layout_eval_zorder_wins_on_2d_probe(spark):
    """The reason the operator exists: on a 2-D band probe the z-order
    layout must scan no MORE rows than the single-column linear sort
    (which can only prune on l_partkey). Pinned at sf0.001 and the
    property the 100 TB re-layout decision rides on."""
    rows = {
        r.layout: r
        for r in registry.queries()["layout_zorder_vs_linear_eval"](
            spark, SF
        ).collect()
    }
    assert rows["zorder"].rows_scanned <= rows["linear"].rows_scanned


# ---------------------------------------------------------------------------
# repeated_ngram_loop_gate
# ---------------------------------------------------------------------------


def test_loop_gate_flags_degenerate_doc(spark, tmp_path):
    """A manufactured loop doc ('spam ham ' cycled) must surface with
    the exact trigram census and flag; a normal doc must not flag.
    Cross-engine parity on the same hostile fixture (includes a NULL
    text and a 2-token doc — both must vanish, not NULL-propagate)."""
    loop_text = " ".join(["spam", "ham"] * 10)  # 20 tokens, 18 trigrams
    rows = [
        (1, loop_text, "en", "web", 1),
        (2, "alpha beta gamma delta epsilon zeta", "en", "web", 1),
        (3, None, "en", "web", 1),
        (4, "tiny doc", "en", "web", 1),
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: r
        for r in registry.queries()["repeated_ngram_loop_gate"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {1, 2}  # NULL text and <3 tokens vanish
    loop = got[1]
    # 18 trigram slots, only 2 distinct patterns (spam-ham-spam,
    # ham-spam-ham), each 9x
    assert loop.n_trigrams == 18
    assert loop.n_distinct_trigrams == 2
    assert loop.top_trigram_count == 9
    assert abs(loop.dup_trigram_frac - 16 / 18) < 1e-6
    assert loop.loop_flag
    normal = got[2]
    assert normal.n_trigrams == normal.n_distinct_trigrams == 4
    assert not normal.loop_flag

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    duck = sorted(
        tuple(r)
        for r in con.execute(
            registry.oracle_sql()["repeated_ngram_loop_gate"]
        ).fetchall()
    )
    assert duck == sorted(
        tuple(r)
        for r in registry.queries()["repeated_ngram_loop_gate"](
            spark, str(tmp_path)
        ).collect()
    )


# ---------------------------------------------------------------------------
# minhash_merge_maintenance
# ---------------------------------------------------------------------------


def test_minhash_merge_invariant_holds_everywhere(spark):
    """sig(A∪B) == least(sigA, sigB) must hold for EVERY permutation of
    EVERY pair — recompute and merge run different code paths, so 8/8
    pins the incremental-maintenance implementation; exact jaccard per
    pair is mirrored in python."""
    from steam_prices_data_engineering_spark.operators.dedup import (
        hashed_shingle_table,
    )

    rows = registry.queries()["minhash_merge_maintenance"](
        spark, SF
    ).collect()
    assert rows
    hs = {
        r.doc_id: set(r.hs)
        for r in hashed_shingle_table(
            read_table(spark, SF, "documents")
        ).collect()
    }
    for r in rows:
        assert r.n_perm == 8
        assert r.n_merge_ok == 8, (r.doc_a, r.doc_b)
        a, b = hs[r.doc_a], hs[r.doc_b]
        u = a | b
        want = len(a & b) / len(u) if u else 0.0
        assert abs(r.exact_jaccard - want) < 1e-6
        assert abs(r.est_jaccard - r.n_sig_match / 8) < 1e-9


def test_minhash_merge_on_neardup_pair(spark, tmp_path):
    """On a manufactured near-dup pair (large overlap) the invariant
    still holds AND the 8-perm estimate is driven by real signature
    collisions — plus cross-engine parity on the fixture."""
    base = " ".join(f"w{i}" for i in range(40))
    variant = base + " extra tail tokens here"
    # knuth(doc_id) % 64 pairs min/max per bucket; ids 0 and 64 land in
    # DIFFERENT buckets generally — instead use two ids and rely on the
    # per-bucket (min, max) pairing among the docs present.
    rows = [
        (1, base, "en", "web", 1),
        (2, variant, "en", "web", 1),
    ]
    spark.createDataFrame(rows, TABLE_SCHEMAS["documents"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = registry.queries()["minhash_merge_maintenance"](
        spark, str(tmp_path)
    ).collect()
    paired = [r for r in got if {r.doc_a, r.doc_b} == {1, 2}]
    if paired:  # same knuth bucket — strongest case
        r = paired[0]
        assert r.n_merge_ok == 8
        assert r.exact_jaccard > 0.8
    for r in got:
        assert r.n_merge_ok == 8
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    duck = sorted(
        tuple(r)
        for r in con.execute(
            registry.oracle_sql()["minhash_merge_maintenance"]
        ).fetchall()
    )
    assert duck == sorted(tuple(r) for r in got)


# ---------------------------------------------------------------------------
# ams_innerprod_join_size
# ---------------------------------------------------------------------------


def test_ams_innerprod_matches_python_replay(spark):
    """Exact inner product AND the 16-estimator sketch replayed in pure
    Python from the same md5 sign family."""
    import hashlib

    r = registry.queries()["ams_innerprod_join_size"](
        spark, SF
    ).collect()[0]

    def day_counts(table, col):
        return {
            x.day: x.n
            for x in read_table(spark, SF, table)
            .filter(F.col(col).isNotNull())
            .groupBy(
                F.floor(F.col(col).cast("long") / 86400)
                .cast("long")
                .alias("day")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    a = day_counts("orders", "o_orderdate")
    b = day_counts("lineitem", "l_shipdate")
    exact = sum(na * b.get(d, 0) for d, na in a.items())
    assert r.exact_join_rows == exact
    assert r.n_days_a == len(a) and r.n_days_b == len(b)

    def sign(i, day):
        h = int(
            hashlib.md5(f"amsj|{i}|{day}".encode()).hexdigest()[:6], 16
        )
        return 1 - 2 * (h % 2)

    est = sum(
        sum(n * sign(i, d) for d, n in a.items())
        * sum(n * sign(i, d) for d, n in b.items())
        for i in range(16)
    )
    assert r.ams_x16 == est
    assert abs(r.ams_est - est / 16.0) < 1e-6


# ---------------------------------------------------------------------------
# bloom_fpr_operating_curve
# ---------------------------------------------------------------------------


def test_bloom_curve_matches_python_replay(spark):
    """False-positive census replayed in pure Python from the same md5
    draws; theoretical column equals the closed form; more bits per key
    never increases the measured FPR on this deterministic fixture."""
    import hashlib

    rows = sorted(
        registry.queries()["bloom_fpr_operating_curve"](
            spark, SF
        ).collect(),
        key=lambda r: r.bits_per_key,
    )
    pks = [
        r.pk
        for r in read_table(spark, SF, "part")
        .filter(F.col("p_partkey").isNotNull())
        .select(F.col("p_partkey").cast("long").alias("pk"))
        .collect()
    ]
    members = [p for p in pks if p % 2 == 0]
    probes = [p for p in pks if p % 2 != 0]

    def draw(j, pk):
        return int(
            hashlib.md5(f"bfp|{j}|{pk}".encode()).hexdigest()[:6], 16
        )

    for r in rows:
        bpe, k = r.bits_per_key, r.k_hashes
        m = len(members) * bpe
        assert r.m_bits == m
        member_bits = {
            draw(j, p) % m for p in members for j in range(k)
        }
        fp = sum(
            1
            for p in probes
            if all(draw(j, p) % m in member_bits for j in range(k))
        )
        assert r.n_false_pos == fp, bpe
        assert abs(
            r.theoretical_fpr
            - math.pow(1.0 - math.exp(-float(k) / bpe), float(k))
        ) < 1e-6
    for lo, hi in zip(rows, rows[1:]):
        assert hi.measured_fpr <= lo.measured_fpr + 1e-9


# ---------------------------------------------------------------------------
# dp_budget_ledger
# ---------------------------------------------------------------------------


def test_dp_ledger_adv_terms_pinned_cross_engine():
    """The three schedule epsilons are CONSTANTS, so their
    nano-quantized advanced-composition terms floor identically in
    Spark (JVM Math.exp) and DuckDB (libm exp) — pin all three so a
    platform/libm change fails loudly instead of hash-reding (the
    floor sits ~1e7 from the nearest boundary; a 1-ULP exp difference
    cannot move it)."""
    for centi in (10, 15, 20):
        eps = centi / 100.0
        py = math.floor(eps * (math.exp(eps) - 1.0) * 1e9 + 0.5)
        duck = duckdb.execute(
            f"SELECT CAST(floor(({centi} / 100.0) * "
            f"(exp({centi} / 100.0) - 1.0) * 1000000000.0 + 0.5) "
            "AS BIGINT)"
        ).fetchone()[0]
        assert duck == py, centi


def test_dp_ledger_matches_python(spark):
    """Full ledger mirror in pure Python over the fixture's day grain:
    schedule, cumulative sums, the advanced bound and the breach flag."""
    got = sorted(
        registry.queries()["dp_budget_ledger"](spark, SF).collect(),
        key=lambda r: r.day,
    )
    days = sorted(
        (r.day, r.n)
        for r in read_table(spark, SF, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.floor(F.col("ts").cast("long") / 86400)
            .cast("long")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert [r.day for r in got] == [d for d, _ in days]
    eps_sum = sq_sum = adv_nano_sum = 0
    for k, ((day, n), r) in enumerate(zip(days, got), start=1):
        centi = 10 + 5 * (day % 3)
        eps_sum += centi
        sq_sum += centi * centi
        eps = centi / 100.0
        adv_nano_sum += math.floor(eps * (math.exp(eps) - 1.0) * 1e9 + 0.5)
        adv = (
            math.sqrt(2.0 * (sq_sum / 10000.0) * math.log(1_000_000.0))
            + adv_nano_sum / 1e9
        )
        assert r.n_rows == n
        assert r.k == k
        assert abs(r.eps_release - eps) < 1e-9
        assert abs(r.eps_basic - eps_sum / 100.0) < 1e-9
        assert abs(r.eps_advanced - adv) < 1e-5
        assert r.over_budget == (adv > 3.0)
