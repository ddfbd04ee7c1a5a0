"""Driver-environment simulation: verify the reader conf pins.

The external correctness harness builds its OWN SparkSession, whose
timezone and parquet-inference confs we don't control.
``sources.readers.read_parquet`` pins what matters
(inferTimestampNTZ=false, session timeZone=UTC) at read time, so
results must match the zone-naive DuckDB oracles from ANY host
session. This script proves it by running the date/timestamp-
sensitive queries from a deliberately hostile session
(America/New_York, library defaults otherwise).

Run standalone (NOT under pytest — the shared test session would be
reused and defeat the simulation):

    python tools/driver_sim_check.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SENSITIVE = (
    'q14_promo_share', 'q_rolling_revenue', 'q_json_tumbling',
    'q_sessionize', 'q_calendar_gaps', 'q_first_touch',
    'q12_late_shipments', 'q7_nation_volume', 'q_lag_orders',
    'q_sliding_events', 'q_session_windows', 'q_latest_events',
    # round-4 timestamp-heavy additions (epoch_us duration math,
    # event-time interval join, per-key time-ordered recurrence)
    'q_scd2_history', 'q_interval_join', 'q_ewma',
    # round-5 session-2: event-time window framing (rolling z-score)
    'q_rolling_anomaly',
    # round-15: CDXJ timestamp parsing (to_timestamp under the
    # read-time UTC pin)
    'q_cdx_parse',
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    spark = (
        SparkSession.builder.appName('driver-sim')
        .master('local[8]')
        .config('spark.sql.shuffle.partitions', '8')
        .config('spark.sql.session.timeZone', 'America/New_York')
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel('ERROR')

    import __spark_entry__ as entry_mod
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in ('region', 'nation', 'customer', 'supplier', 'part',
              'orders', 'lineitem', 'events', 'documents',
              'embeddings'):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    failures = []
    for name in SENSITIVE:
        sdf = qs[name](spark, sf)
        cols = sorted(sdf.columns)
        srows = sorted(
            str(tuple(str(r[c]) for c in cols)) for r in sdf.collect())
        cur = con.execute(osql[name])
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in sorted(ocols)]
        orows = sorted(
            str(tuple(str(r[i]) for i in idx)) for r in cur.fetchall())
        status = 'MATCH' if srows == orows else 'VALUE-DIFF'
        print(f'{status:10s} {name}')
        if srows != orows:
            failures.append(name)
    if failures:
        raise SystemExit(f'FAILURES under hostile session: {failures}')
    print('all date-sensitive queries match from a non-UTC session')
    spark.stop()


if __name__ == '__main__':
    main()
