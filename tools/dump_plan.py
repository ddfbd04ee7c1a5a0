"""Dump `.explain('formatted')` for named queries to files.

    python tools/dump_plan.py <outdir> <suffix> q_pagerank q_hits ...

Writes <outdir>/<query>_<suffix>.txt per query. Executes each query
through collect() first so the AQE final plan (join strategies,
codegen annotations) is what gets dumped, matching what the bench
actually runs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ons_utils_spark import get_spark  # noqa: E402
from ons_utils_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark('dump-plan', master='local[8]',
                      shuffle_partitions=8,
                      extra_confs={'spark.driver.memory': '8g'})
    spark.sparkContext.setLogLevel('ERROR')
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), 'formatted')
        path = os.path.join(outdir, f'{name}_{suffix}.txt')
        with open(path, 'w') as fh:
            fh.write(f'# {name} — explain(formatted), sf_dir={sf_dir}\n')
            fh.write(plan)
        n_ex = plan.count('Exchange')
        print(f'{name}: {n_ex} Exchange nodes -> {path}')
    spark.stop()


if __name__ == '__main__':
    main()
