"""Every registry query must match its DuckDB oracle at sf0.001
(fast) — the driver runs the same contract at sf0.01."""

from __future__ import annotations

import pytest

from clara_ocr_spark.oracle import compare, duck_connect
from clara_ocr_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def duck(sf001):
    con = duck_connect(sf001)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf001, duck, name):
    fn, sql = REGISTRY[name]
    if sql is None:
        assert fn(spark, sf001).count() >= 0
        return
    compare(spark, sf001, fn, sql, con=duck)


#: documents-reading queries re-checked over an adversarial corpus the
#: sf tables don't contain: empty / whitespace-only / single-token /
#: control-char / unicode / repeated docs — the rows that are COMMON
#: at web scale and where engine defaults diverge silently (DuckDB
#: array_to_string([]) is NULL vs Spark's '', NULL grams vs sentinel
#: signatures, ANSI 0/0 vs NULL jaccard).
EDGE_QUERIES = [
    "token_stats", "bpe_token_stats", "quality_scores", "deskew_search",
    "decontaminate", "tfidf_top_terms", "inverted_index",
    "doc_fingerprints", "minhash_signatures", "lsh_band_buckets",
    "repetition_filter", "lm_quality_scores", "stratified_sample",
    "pii_redact", "dedup_exact", "simhash", "lang_id_confusion",
    "df_stopwords", "url_canonical_groups", "dedup_canonicalize",
    "ngram_jaccard_pairs", "dup_clusters", "simhash_near_dup",
    "dedup_keep_first", "top_sources_by_chars", "grouping_sets_metrics",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from clara_ocr_spark.oracle import TABLES

    docs = [
        (0, "", "en", "src0", 0),
        (1, "   ", "en", "src0", 3),
        (2, "one", "zh", "src1", 3),
        (3, "tab\tsep and\nnewline words here", "en", "src1", 30),
        (4, "héllo wörld ação coração métrica über naïve few more words",
         "pt", "src2", 59),
        (5, "dup dup dup dup dup dup dup dup", "en", "src2", 31),
        (97, "the quick brown fox jumps over the lazy dog again and again",
         "en", "src0", 60),
        (194, "the quick brown fox jumps over the lazy dog again and again",
         "en", "src1", 60),
    ]
    d = str(tmp_path_factory.mktemp("edge_sf"))
    for t in TABLES:
        if t != "documents":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet",
                os.path.join(d, f"{t}.parquet"),
            )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": [r[1] for r in docs],
                "lang": [r[2] for r in docs],
                "source": [r[3] for r in docs],
                "n_chars": pa.array([r[4] for r in docs], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duck_connect(edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_query_matches_oracle_on_edge_corpus(spark, edge_dir, edge_duck, name):
    fn, sql = REGISTRY[name]
    compare(spark, edge_dir, fn, sql, con=edge_duck)
