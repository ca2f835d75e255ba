

def test_relationship_violations_counts_orphans(spark):
    from nomba_data_pipeline_spark.plans.quality import (
        QualitySpec,
        relationship_violations,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "fk int")
    # one orphan (99); NULL fk passes (pair with not_null to forbid)
    assert relationship_violations(child, "fk", parent, "fk") == 1
    spec = QualitySpec(relationships={"fk": ("p", "fk")})
    import pytest

    with pytest.raises(AssertionError, match="relationship:fk->p.fk"):
        spec.assert_ok(child, model="c", resolve=lambda name: parent)
    # without a resolver the referential check is skipped (standalone use)
    assert spec.assert_ok(child, model="c") == 4
    # clean child passes with the resolver
    ok = child.filter("fk IS NULL OR fk IN (10, 20)")
    assert spec.assert_ok(ok, model="c", resolve=lambda name: parent) == 3
