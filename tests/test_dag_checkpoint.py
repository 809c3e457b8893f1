"""PipelineDAG checkpoint barriers (dag.py add_checkpoint).

Beyond-reference extension — the reference's DAG (mini_etl/core/dag.py)
has no durability; these lock the restartability contract:

1. first run materializes, second run RESTORES (upstream not re-read —
   proven by mutating the source data between runs);
2. any upstream structural/expression change, or a version bump,
   invalidates the fingerprint and recomputes;
3. crash shapes degrade to recompute, never to wrong data: data without
   marker, corrupt marker, marker from another graph;
4. the restored node is a plain parquet scan — upstream lineage is cut.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mini_etl_spark import operators as ops
from mini_etl_spark.dag import PipelineDAG


def _write_src(spark, path, values):
    spark.createDataFrame([(i,) for i in values], ["v"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _dag(spark, src, out, sink_rows, condition="v >= 0", version="1"):
    return (
        PipelineDAG("ckpt_dag", spark=spark)
        .add_source("src", lambda s: s.read.parquet(src))
        .add_transform("flt", ops.filter_rows(condition))
        .add_checkpoint("stage1", version=version)
        .add_transform("dbl", lambda df: df.withColumn("v2", F.col("v") * 2))
        .add_sink("out", lambda df: sink_rows.extend(
            sorted(r["v"] for r in df.collect())
        ))
        .add_edge("src", "flt").add_edge("flt", "stage1")
        .add_edge("stage1", "dbl").add_edge("dbl", "out")
    )


def test_materialize_then_restore_skips_upstream(spark, tmp_path):
    src = str(tmp_path / "src")
    ckdir = str(tmp_path / "ck")
    _write_src(spark, src, [1, 2, 3])

    rows: list = []
    stats = _dag(spark, src, None, rows).run(spark, checkpoint_dir=ckdir)
    assert stats["checkpoints_materialized"] == ["stage1"]
    assert rows == [1, 2, 3]

    # mutate the source: a restore must NOT see the new data
    _write_src(spark, src, [7, 8])
    rows2: list = []
    stats2 = _dag(spark, src, None, rows2).run(spark, checkpoint_dir=ckdir)
    assert stats2["checkpoints_restored"] == ["stage1"]
    assert rows2 == [1, 2, 3]  # old data — upstream genuinely skipped


def test_expression_change_invalidates(spark, tmp_path):
    src = str(tmp_path / "src")
    ckdir = str(tmp_path / "ck")
    _write_src(spark, src, [1, 2, 3])
    rows: list = []
    _dag(spark, src, None, rows, condition="v >= 0").run(
        spark, checkpoint_dir=ckdir
    )
    rows2: list = []
    stats = _dag(spark, src, None, rows2, condition="v >= 2").run(
        spark, checkpoint_dir=ckdir
    )
    assert stats["checkpoints_materialized"] == ["stage1"]
    assert rows2 == [2, 3]


def test_version_bump_invalidates(spark, tmp_path):
    src = str(tmp_path / "src")
    ckdir = str(tmp_path / "ck")
    _write_src(spark, src, [1, 2])
    _dag(spark, src, None, [], version="1").run(spark, checkpoint_dir=ckdir)
    _write_src(spark, src, [5])
    rows: list = []
    stats = _dag(spark, src, None, rows, version="2").run(
        spark, checkpoint_dir=ckdir
    )
    assert stats["checkpoints_materialized"] == ["stage1"]
    assert rows == [5]  # recomputed against the new data


def test_corrupt_or_missing_marker_recomputes(spark, tmp_path):
    src = str(tmp_path / "src")
    ckdir = tmp_path / "ck"
    _write_src(spark, src, [1, 2])
    _dag(spark, src, None, []).run(spark, checkpoint_dir=str(ckdir))
    marker = ckdir / "stage1" / "_FINGERPRINT.json"
    assert marker.exists()

    # corrupt marker: recompute, don't crash
    marker.write_text("{not json")
    stats = _dag(spark, src, None, []).run(spark, checkpoint_dir=str(ckdir))
    assert stats["checkpoints_materialized"] == ["stage1"]

    # data without marker (crash between write and publish): recompute
    marker.unlink()
    stats = _dag(spark, src, None, []).run(spark, checkpoint_dir=str(ckdir))
    assert stats["checkpoints_materialized"] == ["stage1"]

    # marker for a DIFFERENT fingerprint: recompute
    marker.write_text(json.dumps({"fingerprint": "deadbeef"}))
    stats = _dag(spark, src, None, []).run(spark, checkpoint_dir=str(ckdir))
    assert stats["checkpoints_materialized"] == ["stage1"]


def test_restore_cuts_lineage_to_plain_scan(spark, tmp_path):
    src = str(tmp_path / "src")
    ckdir = str(tmp_path / "ck")
    _write_src(spark, src, [1, 2, 3])
    dag = _dag(spark, src, None, [])
    dag.run(spark, checkpoint_dir=ckdir)
    outputs = _dag(spark, src, None, []).build(spark, checkpoint_dir=ckdir)
    files = outputs["stage1"].inputFiles()
    assert files and all("ck/stage1" in f for f in files)  # checkpoint scan
    plan = outputs["stage1"]._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" not in plan       # upstream filter graph is cut


def test_checkpoint_without_dir_fails_loudly(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_src(spark, src, [1])
    with pytest.raises(ValueError, match="checkpoint_dir"):
        _dag(spark, src, None, []).run(spark)


def test_explicit_path_overrides_dir(spark, tmp_path):
    src = str(tmp_path / "src")
    explicit = str(tmp_path / "elsewhere")
    _write_src(spark, src, [4])
    rows: list = []
    dag = (
        PipelineDAG("p", spark=spark)
        .add_source("src", lambda s: s.read.parquet(src))
        .add_checkpoint("c", path=explicit)
        .add_sink("out", lambda df: rows.extend(r["v"] for r in df.collect()))
        .add_edge("src", "c").add_edge("c", "out")
    )
    dag.run(spark)
    assert rows == [4]
    assert (tmp_path / "elsewhere" / "_FINGERPRINT.json").exists()


def test_validation_requires_single_input(spark):
    dag = (
        PipelineDAG("v", spark=spark)
        .add_source("a", lambda s: s.range(1))
        .add_source("b", lambda s: s.range(1))
        .add_checkpoint("c")
        .add_sink("out", lambda df: None)
        .add_edge("a", "c").add_edge("b", "c").add_edge("c", "out")
    )
    assert any("checkpoint" in e and "exactly one input" in e
               for e in dag.validate())


def test_captured_list_change_invalidates(spark, tmp_path):
    """A closure capturing a LIST (the `df.drop(*cols)` shape) must
    change the fingerprint when the list's contents change — the ADVICE
    gap where list/dict closure values were skipped and a stale
    checkpoint silently restored."""
    src = str(tmp_path / "src")
    ckdir = str(tmp_path / "ck")
    _write_src(spark, src, [1, 2, 3])

    def dag_with(cols, rows):
        return (
            PipelineDAG("ckpt_list", spark=spark)
            .add_source("src", lambda s: s.read.parquet(src))
            .add_transform(
                "sel", lambda df: df.withColumns(
                    {c: F.col("v") * (i + 10) for i, c in enumerate(cols)}
                )
            )
            .add_checkpoint("stage1")
            .add_sink("out", lambda df: rows.extend(sorted(df.columns)))
            .add_edge("src", "sel").add_edge("sel", "stage1")
            .add_edge("stage1", "out")
        )

    rows: list = []
    dag_with(["a"], rows).run(spark, checkpoint_dir=ckdir)
    assert rows == ["a", "v"]
    rows2: list = []
    stats = dag_with(["a", "b"], rows2).run(spark, checkpoint_dir=ckdir)
    assert stats["checkpoints_materialized"] == ["stage1"]
    assert rows2 == ["a", "b", "v"]


def test_set_and_dict_fingerprints_are_order_stable(spark):
    """Canonical tokens for unordered containers sort by value, never by
    hash-randomized iteration order — two same-content closures built in
    different insertion orders tokenize identically."""
    def make(vals):
        s = vals
        return lambda df: (df, s)

    a = PipelineDAG._callable_token(make(frozenset(["xx", "yy", "zz"])))
    b = PipelineDAG._callable_token(make(frozenset(["zz", "yy", "xx"])))
    assert a == b and "xx" in a
    c = PipelineDAG._callable_token(make({"k1": [1, 2], "k2": {"n": 3}}))
    d = PipelineDAG._callable_token(make({"k2": {"n": 3}, "k1": [1, 2]}))
    assert c == d and c != PipelineDAG._callable_token(
        make({"k2": {"n": 4}, "k1": [1, 2]})
    )


def test_opaque_closure_logged_not_fingerprinted(caplog):
    import logging

    class Opaque:
        pass

    o = Opaque()
    with caplog.at_level(logging.INFO, logger="mini_etl_spark.dag"):
        tok = PipelineDAG._callable_token(lambda df: (df, o))
    assert tok is not None
    assert any("opaque" in r.message for r in caplog.records)


def test_force_rematerializes_once(spark, tmp_path):
    """force=True skips the restore check for one run (picking up data
    the fingerprint cannot see) and republishes a fresh marker, so the
    NEXT non-forced run restores the new materialization."""
    src = str(tmp_path / "src")
    ckdir = str(tmp_path / "ck")
    _write_src(spark, src, [1, 2])
    _dag(spark, src, None, []).run(spark, checkpoint_dir=ckdir)
    _write_src(spark, src, [7])

    def forced(rows):
        return (
            PipelineDAG("ckpt_dag", spark=spark)
            .add_source("src", lambda s: s.read.parquet(src))
            .add_transform("flt", ops.filter_rows("v >= 0"))
            .add_checkpoint("stage1", force=True)
            .add_transform("dbl", lambda df: df.withColumn("v2", F.col("v") * 2))
            .add_sink("out", lambda df: rows.extend(
                sorted(r["v"] for r in df.collect())
            ))
            .add_edge("src", "flt").add_edge("flt", "stage1")
            .add_edge("stage1", "dbl").add_edge("dbl", "out")
        )

    rows: list = []
    stats = forced(rows).run(spark, checkpoint_dir=ckdir)
    assert stats["checkpoints_materialized"] == ["stage1"]
    assert rows == [7]
    # back to normal: the forced materialization restores
    rows2: list = []
    stats2 = _dag(spark, src, None, rows2).run(spark, checkpoint_dir=ckdir)
    assert stats2["checkpoints_restored"] == ["stage1"]
    assert rows2 == [7]
