"""Every registered query must hash-match its DuckDB oracle twin
(the local mirror of the driver's t2 correctness gate). Queries
without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from transit_data_pipeline_spark.operators.registry import all_specs

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    from compare import compare

    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # plan executes
        return
    problems = compare(df, spec.oracle, duck)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    df = entry_mod.entry(spark)
    assert df.count() >= 0
