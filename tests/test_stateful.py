"""Tests for the custom stateful streaming operator."""
import time

import pytest
from pyspark.sql import functions as F

from ons_utils_spark.streaming.stateful import running_totals


def test_batch_fallback(spark_session):
    df = spark_session.createDataFrame(
        [('a', 1.0), ('a', 2.0), ('b', 5.0)], 'k string, value double'
    )
    out = running_totals(df, 'k')
    assert out.columns == ['key', 'n_events', 'total']
    rows = {r['key']: (r['n_events'], r['total']) for r in out.collect()}
    assert rows == {'a': (2, 3.0), 'b': (1, 5.0)}


@pytest.mark.slow
def test_streaming_state_accumulates(spark_session):
    stream = (
        spark_session.readStream.format('rate')
        .option('rowsPerSecond', 100).load()
        .withColumn('k', (F.col('value') % 2).cast('string'))
    )
    out = running_totals(stream.select('k', 'value'), key_col='k')
    q = (
        out.writeStream.format('memory').queryName('rt_test')
        .outputMode('update').start()
    )
    try:
        deadline = time.time() + 30
        ok = False
        while time.time() < deadline:
            time.sleep(3)
            rows = spark_session.sql(
                'SELECT key, max(n_events) AS n FROM rt_test GROUP BY key'
            ).collect()
            # state accumulated over >1 micro-batch for both keys
            if len(rows) == 2 and all(r['n'] > 100 for r in rows):
                ok = True
                break
        assert ok, f'state did not accumulate: {rows}'
    finally:
        q.stop()
