"""Pin the driver contract: entry() smoke + Spark/DuckDB oracle parity
for a fast representative subset (the full battery runs via
tools/check_oracles.py)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"

FAST_ORACLE_QUERIES = [
    "ocr_extract",
    "ocr_media_text",
    "explode_tokens",
    "restitch_docs",
    "ctc_dedupe_analog",
    "drop_score_filter",
    "resume_anti_join",
    "reading_order_topk",
    "q1_pricing_summary",
    "q3_top_orders",
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_lsh_pairs",
    "dedup_cluster_keepers",
    "ngram_jaccard_pairs",
    "dedup_embedding_cosine",
    "embedding_cosine_topk",
    "quality_score",
    "quality_repetition",
    "token_count",
    "doc_fingerprint",
    "html_main_content",
    "pdf_pages_text",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in em.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_oracle_has_a_query():
    qs, os_ = em.queries(), em.oracle_sql()
    assert set(os_) <= set(qs)
    # the battery is substantial: ≥20 operators, ≥80% oracle-covered
    assert len(qs) >= 20
    assert len(os_) / len(qs) >= 0.7


@pytest.mark.parametrize("name", FAST_ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    sdf = em.queries()[name](spark, SF).toPandas()
    odf = duck.execute(em.oracle_sql()[name]).fetchdf()
    a, b = _normalize(sdf), _normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b)


def test_entry_smoke(spark):
    df = em.entry(spark)
    assert df.count() > 0
    fields = [f.name for f in df.schema["spans"].dataType.elementType.fields]
    assert fields == ["kind", "text", "media_ref", "offset"]


def test_all_query_outputs_are_canonicalizable(spark):
    """Round 1's only red row was a list-typed column the driver's
    pandas canonicalizer cannot hash. Guard the whole battery: every
    queries() output schema must be flat scalar types (no arrays, maps,
    structs, or binary)."""
    from pyspark.sql.types import (
        ArrayType, BinaryType, MapType, StructType,
    )

    banned = (ArrayType, MapType, StructType, BinaryType)
    for name, fn in em.queries().items():
        df = fn(spark, SF)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, banned), (
                f"{name}.{f.name} is {f.dataType.simpleString()} — "
                "not hashable by the driver's canonicalizer"
            )
