"""Tests for the Spark 4 Python UDTF surface (functions/udtfs.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from ons_utils_spark.functions.udtfs import (
    register_sentence_split,
    sentence_split_udtf,
)


def test_sentence_split_direct(spark_session):
    split = sentence_split_udtf()
    rows = split(F.lit('One fish. Two fish!   Red fish?')).collect()
    assert [r['sentence'] for r in rows] == \
        ['One fish.', 'Two fish!', 'Red fish?']
    assert [r['idx'] for r in rows] == [0, 1, 2]
    assert rows[0]['n_chars'] == len('One fish.')


def test_sentence_split_sql_lateral(spark_session):
    register_sentence_split(spark_session)
    spark_session.createDataFrame(
        [(1, 'A b. C d.'), (2, None), (3, '')],
        'doc_id long, text string',
    ).createOrReplaceTempView('__udtf_docs')
    rows = spark_session.sql("""
        SELECT doc_id, t.sentence, t.idx
        FROM __udtf_docs, LATERAL sentence_split(text) t
    """).collect()
    # NULL/empty text rows expand to nothing
    assert {(r['doc_id'], r['idx']) for r in rows} == {(1, 0), (1, 1)}
    assert sorted(r['sentence'] for r in rows) == ['A b.', 'C d.']
