"""JSONL/CSV ingestion: explicit-schema reads, corrupt-record quarantine,
round-trip fidelity (sources/files.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.sources.files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_corrupt,
    to_parquet,
    write_jsonl,
)

SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def test_jsonl_roundtrip_exact(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back, quarantine = split_corrupt(read_jsonl(spark, out, SCHEMA))
    assert quarantine.count() == 0
    a = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in docs.collect()}
    b = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in back.collect()}
    assert a == b


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "ok two", "lang": "en", "source": "s", "n_chars": 6}\n'
        '{"doc_id": 3, "text": "unterminated\n'
    )
    clean, quarantine = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2
    assert "this is not json at all" in bad


def test_csv_roundtrip_with_quoting(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "plain words", "en", "s1", 11),
            (2, "commas, quotes \" and, more", "en", "s2", 26),
            (3, "", "fr", "s3", 0),
        ],
        SCHEMA,
    )
    out = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", "true").csv(out)
    back, quarantine = split_corrupt(read_csv(spark, out, SCHEMA))
    assert quarantine.count() == 0
    got = {r.doc_id: r.text for r in back.collect()}
    assert got[1] == "plain words"
    assert got[2] == "commas, quotes \" and, more"


def test_csv_malformed_row_quarantined(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok,en,s,2\n"
        "not-a-number,broken,en,s,not-an-int\n"
    )
    clean, quarantine = split_corrupt(read_csv(spark, str(p), SCHEMA))
    assert [r.doc_id for r in clean.collect()] == [1]
    assert quarantine.count() == 1


def test_ingest_to_parquet_enables_pushdown(spark, tmp_path):
    """The convert-then-query path must give back parquet's pushed filters
    — the reason ingestion ends in to_parquet."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    jdir, pdir = str(tmp_path / "j"), str(tmp_path / "p")
    write_jsonl(docs, jdir)
    clean, _ = split_corrupt(read_jsonl(spark, jdir, SCHEMA))
    to_parquet(clean, pdir)
    q = spark.read.parquet(pdir).filter(F.col("doc_id") < 10).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "doc_id" in plan.split(
        "PushedFilters: [", 1
    )[1].split("]", 1)[0]


def test_orc_roundtrip_exact_and_pushdown(spark, tmp_path):
    from cassandra_analytics_example_spark.sources.files import (
        read_orc,
        write_orc,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out)
    back = read_orc(spark, out)
    a = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in docs.collect()}
    b = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in back.collect()}
    assert a == b
    # ORC scans must push filters like parquet does
    q = back.filter(F.col("doc_id") < 10).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "doc_id" in plan.split(
        "PushedFilters: [", 1
    )[1].split("]", 1)[0]
