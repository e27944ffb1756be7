"""The local correctness gate: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 compare (row count + schema + order-insensitive
value multiset) at sf0.001 for speed; `SPARK_GRAFT_TEST_SF` overrides.
"""

from __future__ import annotations

import os

import pytest

from fs2_kafka_streams_spark.queries import load_all
from fs2_kafka_streams_spark.testing import duck_connect, run_compare

from tests.conftest import SF_SMOKE

SF = os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMOKE)

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    res = run_compare(spark, SF, REGISTRY[name], con=duck)
    assert res.ok, f"{name}: {res.detail}"


def test_array_output_column_is_rejected(spark):
    """Regression: the driver canonicalizer crashes on top-level array cells
    (round-1 q25/q29). The local gate must fail such schemas, not stringify
    them."""
    from fs2_kafka_streams_spark.queries import QuerySpec

    spec = QuerySpec(
        name="_bad_array_out",
        build=lambda sp, _sf: sp.range(3).selectExpr(
            "id", "array(id, id + 1) AS arr"
        ),
        oracle="SELECT 1",
    )
    res = run_compare(spark, SF, spec)
    assert not res.ok and "canonicalizer" in res.detail
