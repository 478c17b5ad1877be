"""Empty-input robustness: EVERY registered query must execute against a
zero-row lake (schema-correct, no data) without raising — the day-one state
of a fresh deployment and the steady state of a filtered-to-nothing
partition. Division-by-zero on an empty vertex set, numpy axis errors on an
empty collected query set, and schema-inference failures on an empty export
were all real bugs this sweep caught.
"""

from __future__ import annotations

import os

import pytest

from feature_datalake_sl_mandic_spark import catalog, registry
from tests.conftest import SF_SMALL

SPECS = registry.load_all()


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in catalog.TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        if os.path.exists(src):
            catalog.load_table(spark, SF_SMALL, t).limit(0).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_survives_empty_lake(name, spark, empty_sf_dir):
    # Media queries synthesize their own payloads (sf_dir unused), so they
    # return their fixed row counts; everything else must return >= 0 rows
    # without raising.
    n = SPECS[name].fn(spark, empty_sf_dir).count()
    assert n >= 0
