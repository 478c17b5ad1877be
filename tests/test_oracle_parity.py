"""Oracle-differential tests: every registered query vs DuckDB at sf0.001.

Local mirror of the driver's t2 correctness gate (sf0.01); sf0.001 keeps the
suite fast. Queries without an oracle get a rows-sanity check.
"""

from __future__ import annotations

import pytest

from feature_datalake_sl_mandic_spark import registry
from feature_datalake_sl_mandic_spark.oracle import compare
from tests.conftest import SF_SMALL

SPECS = registry.load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_parity(name, spark, duck):
    spec = SPECS[name]
    spdf = spec.fn(spark, SF_SMALL).toPandas()
    if spec.oracle is None:
        assert len(spdf) >= 0  # rows-only check (driver does the same)
        return
    dkdf = duck.execute(spec.oracle).df()
    errs = [e for e in compare(spdf, dkdf, name) if "WARNING" not in e]
    assert not errs, "\n".join(errs)


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
