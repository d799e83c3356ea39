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
        rows = df.collect()  # plan executes
        if "meets_threshold" in df.columns:
            # D7 acceptance gate (ref train_delay_model.py:584): the
            # operator computes acc_10min >= threshold; assert it here
            # so a quiet model/seed/fixture regression turns the suite
            # red instead of silently flipping the returned flag.
            assert rows and all(r.meets_threshold for r in rows), (
                f"{name}: acceptance gate failed: "
                + "; ".join(str(r.asDict()) for r in rows)
            )
        if "meets_mae" in df.columns:
            # MAE gate (reference publishes 4.38 min; our bound is
            # mae_bound in mlops.py — see its derivation note there):
            # the hit-rate gate alone could be satisfied by the
            # band-center calibration constant — the MAE bound proves
            # the GBT tracks the label, not just the band.
            assert rows and all(r.meets_mae for r in rows), (
                f"{name}: MAE gate failed: "
                + "; ".join(str(r.asDict()) for r in rows)
            )
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
