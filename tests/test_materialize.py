"""materialize.materialize: the cluster-reliability knob (VERDICT r10
item 4 / ADVICE r10). Three strategies, identical rows; default is the
local checkpoint the r10-opt sites used inline."""

from __future__ import annotations

import pytest

from gene_level_metadata_pipeline_spark.materialize import materialize


def _frame(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, s string"
    )


def test_default_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE", raising=False)
    out = materialize(_frame(spark))
    # a localCheckpoint truncates the plan to an ExistingRDD scan
    assert "ExistingRDD" in out._jdf.queryExecution().toString()
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]


def test_persist_keeps_lineage_disk_only(spark, monkeypatch):
    from pyspark import StorageLevel

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    out = materialize(_frame(spark))
    assert out.storageLevel == StorageLevel.DISK_ONLY
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    out.unpersist()


def test_reliable_checkpoints_to_dir(spark, monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "reliable")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path))
    out = materialize(_frame(spark), eager=True)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    # the reliable checkpoint wrote RDD blocks under the given dir
    assert any(tmp_path.rglob("rdd-*")), "no checkpoint files written"


def test_invalid_mode_raises(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "bogus")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MATERIALIZE"):
        materialize(_frame(spark))


def test_scale_conf_materialize_recommendation():
    from tools.scale_conf import materialize_recommendation

    assert materialize_recommendation(1)["SPARK_GRAFT_MATERIALIZE"] == "local"
    assert (
        materialize_recommendation(8)["SPARK_GRAFT_MATERIALIZE"] == "persist"
    )
    big = materialize_recommendation(1000)
    assert big["SPARK_GRAFT_MATERIALIZE"] == "reliable"
    assert "SPARK_GRAFT_CHECKPOINT_DIR" in big
