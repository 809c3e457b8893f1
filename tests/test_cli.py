"""CLI tests (⇐ reference tests/test_cli.py:18-50, click CliRunner)."""

from __future__ import annotations

import pandas as pd
from click.testing import CliRunner

from mini_etl_spark.cli import main


def test_help():
    result = CliRunner().invoke(main, ["--help"])
    assert result.exit_code == 0
    assert "run" in result.output and "validate" in result.output


def test_version():
    result = CliRunner().invoke(main, ["--version"])
    assert result.exit_code == 0


def test_info():
    result = CliRunner().invoke(main, ["info"])
    assert result.exit_code == 0
    assert "pyspark" in result.output


def test_init_and_validate(tmp_path):
    cfg = tmp_path / "sample.yaml"
    result = CliRunner().invoke(main, ["init", "-o", str(cfg)])
    assert result.exit_code == 0 and cfg.exists()
    # init refuses to overwrite
    again = CliRunner().invoke(main, ["init", "-o", str(cfg)])
    assert again.exit_code == 1
    result = CliRunner().invoke(main, ["validate", str(cfg)])
    assert result.exit_code == 0
    assert "valid" in result.output


def test_validate_bad_config(tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("name: x\nsource: {type: fax}\nsink: {type: csv, path: y}\n")
    result = CliRunner().invoke(main, ["validate", str(cfg)])
    assert result.exit_code == 1


def test_run_dry_run(tmp_path, sample_pdf):
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"name: dry\nsource: {{type: csv, path: '{src}'}}\n"
        f"sink: {{type: csv, path: '{tmp_path}/out'}}\n"
    )
    result = CliRunner().invoke(main, ["run", str(cfg), "--dry-run"])
    assert result.exit_code == 0
    assert "dry run" in result.output


def test_run_full_pipeline(tmp_path, sample_pdf, spark):
    """Full (non-dry) CLI run: compiles config, executes on Spark, writes
    output readable back — the complete declarative path end-to-end."""
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    out = tmp_path / "out"
    cfg = tmp_path / "full.yaml"
    cfg.write_text(
        f"name: full\n"
        f"source: {{type: csv, path: '{src}'}}\n"
        f"transformers:\n"
        f"  - {{type: filter, condition: 'value > 150'}}\n"
        f"sink: {{type: parquet, path: '{out}', mode: overwrite}}\n"
    )
    result = CliRunner().invoke(main, ["run", str(cfg), "--explain"])
    assert result.exit_code == 0, result.output
    assert "done: 49 rows" in result.output
    assert spark.read.parquet(str(out)).count() == 49


def test_run_audit_and_stats(tmp_path, sample_pdf, spark):
    """--audit surfaces the plan audit (pushdown/joins/exchanges) for config
    pipelines; --stats-json/--stats-html leave inspectable run artifacts."""
    src = tmp_path / "in.parquet"
    spark.createDataFrame(sample_pdf).write.parquet(str(src))
    out = tmp_path / "out"
    cfg = tmp_path / "audited.yaml"
    cfg.write_text(
        f"name: audited\n"
        f"source: {{type: parquet, path: '{src}'}}\n"
        f"transformers:\n"
        f"  - {{type: filter, condition: 'value > 150'}}\n"
        f"sink: {{type: parquet, path: '{out}', mode: overwrite}}\n"
    )
    sj, sh = tmp_path / "stats.json", tmp_path / "stats.html"
    result = CliRunner().invoke(
        main,
        ["run", str(cfg), "--audit", "--stats-json", str(sj), "--stats-html", str(sh)],
    )
    assert result.exit_code == 0, result.output
    assert "audit:" in result.output
    assert "pushed_filters" in result.output  # predicate reached the scan
    import json

    history = json.loads(sj.read_text())
    assert len(history) == 1 and history[0]["rows"] == 49
    assert "audited" in sh.read_text() and "<table>" in sh.read_text()


def test_run_audit_dry_run(tmp_path, sample_pdf):
    """--audit composes with --dry-run: plan is audited, nothing executes."""
    src = tmp_path / "in.csv"
    sample_pdf.to_csv(src, index=False)
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"name: dryaudit\nsource: {{type: csv, path: '{src}'}}\n"
        f"sink: {{type: csv, path: '{tmp_path}/out'}}\n"
    )
    result = CliRunner().invoke(main, ["run", str(cfg), "--dry-run", "--audit"])
    assert result.exit_code == 0, result.output
    assert "audit:" in result.output and "dry run" in result.output


def test_profile_command(spark):
    result = CliRunner().invoke(
        main,
        [
            "profile",
            "/root/testdata/sf0.001/orders.parquet",
            "--columns",
            "o_orderkey,o_orderstatus",
        ],
    )
    assert result.exit_code == 0, result.output
    import json as _json

    lines = [_json.loads(l) for l in result.output.strip().splitlines()]
    assert "layout" in lines[0] and lines[0]["layout"]["n_files"] >= 1
    by_col = {l["column"]: l for l in lines[1:]}
    assert set(by_col) == {"o_orderkey", "o_orderstatus"}
    assert by_col["o_orderkey"]["null_count"] == 0
    assert by_col["o_orderkey"]["row_count"] == by_col["o_orderkey"]["distinct_count"]


def test_cli_card(tmp_path, spark):
    from click.testing import CliRunner

    from mini_etl_spark.cli import main

    src = tmp_path / "d"
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string").write.parquet(str(src))
    out = tmp_path / "card.md"
    res = CliRunner().invoke(main, ["card", str(src), "--name", "toy", "--out", str(out)])
    assert res.exit_code == 0, res.output
    card = out.read_text()
    assert "# Data card: toy" in card and "- rows: 2" in card
    res2 = CliRunner().invoke(main, ["card", str(src)])
    assert res2.exit_code == 0 and "## Columns" in res2.output


def test_cli_index_append_all_kinds(spark, tmp_path):
    """`index-append` grows all three persisted indexes from the shell:
    screening/serving results afterward equal a fresh rebuild over the
    concatenated input (the append differentials proper live in
    tests/test_bloom.py / test_functions.py — here the CLI wiring)."""
    import json as js

    from mini_etl_spark.functions import bloom as bl
    from mini_etl_spark.functions import similarity as sim
    from mini_etl_spark.functions.dedup_index import minhash_index_write

    runner = CliRunner()

    # bloom
    bench_a = spark.createDataFrame(
        [(1, "alpha bench one two three")], ["doc_id", "text"]
    )
    bench_b = spark.createDataFrame(
        [(2, "beta bench four five six")], ["doc_id", "text"]
    )
    bpath = str(tmp_path / "bloom_idx")
    bl.decontamination_index_write(bench_a, bpath, n=3)
    binput = str(tmp_path / "bench_b.parquet")
    bench_b.write.parquet(binput)
    res = runner.invoke(
        main, ["index-append", bpath, "--kind", "bloom", "--input", binput]
    )
    assert res.exit_code == 0, res.output
    rep = js.loads(res.output.strip().splitlines()[-1])
    assert rep["kind"] == "bloom" and rep["appends"] == 1

    # minhash
    docs = spark.createDataFrame(
        [(i, f"document number {i} with words {i}") for i in range(10)],
        ["doc_id", "text"],
    )
    mpath = str(tmp_path / "mh_idx")
    minhash_index_write(docs.filter("doc_id < 8"), mpath,
                        num_hashes=16, bands=4)
    minput = str(tmp_path / "mh_batch.parquet")
    docs.filter("doc_id >= 8").write.parquet(minput)
    res = runner.invoke(
        main, ["index-append", mpath, "--kind", "minhash", "--input", minput]
    )
    assert res.exit_code == 0, res.output
    assert js.loads(res.output.strip().splitlines()[-1])["appended_docs"] == 2

    # ivf
    import numpy as np

    rng = np.random.default_rng(2)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)],
        "vec_id bigint, embedding array<float>",
    )
    ipath = str(tmp_path / "ivf_idx")
    cents = sim.random_unit_centroids(dim=8, k=4, seed=1)
    sim.build_ivf_index(vecs.filter("vec_id < 30"), ipath, centroids=cents)
    iinput = str(tmp_path / "ivf_batch.parquet")
    vecs.filter("vec_id >= 30").write.parquet(iinput)
    res = runner.invoke(
        main, ["index-append", ipath, "--kind", "ivf", "--input", iinput]
    )
    assert res.exit_code == 0, res.output
    rep = js.loads(res.output.strip().splitlines()[-1])
    assert rep["appended"] == 10 and "skew_ratio" in rep


def test_cli_index_append_defaults_and_idempotency(spark, tmp_path):
    """The r10 regression class: `index-append --kind ivf` with DEFAULT
    options against an index built with NON-default column names — the
    index's own _IVF.json record resolves the columns, never the CLI
    defaults. Also: re-running the exact same CLI append (crash-retry
    shape) is a no-op for both the ivf and minhash kinds."""
    import json as js

    import numpy as np

    from mini_etl_spark.functions import similarity as sim
    from mini_etl_spark.functions.dedup_index import (
        minhash_index_write,
    )

    runner = CliRunner()

    rng = np.random.default_rng(7)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(30)],
        "item_key bigint, emb array<float>",
    )
    ipath = str(tmp_path / "ivf_custom")
    cents = sim.random_unit_centroids(dim=6, k=3, seed=3)
    sim.build_ivf_index(
        vecs.filter("item_key < 20"), ipath, centroids=cents,
        vec_col="emb", id_col="item_key",
    )
    iinput = str(tmp_path / "ivf_batch.parquet")
    vecs.filter("item_key >= 20").write.parquet(iinput)
    res = runner.invoke(
        main, ["index-append", ipath, "--kind", "ivf", "--input", iinput]
    )
    assert res.exit_code == 0, res.output
    assert js.loads(res.output.strip().splitlines()[-1])["appended"] == 10
    # crash-retry: the identical invocation appends nothing
    res = runner.invoke(
        main, ["index-append", ipath, "--kind", "ivf", "--input", iinput]
    )
    assert res.exit_code == 0, res.output
    assert js.loads(res.output.strip().splitlines()[-1])["appended"] == 0
    # serving resolves the recorded columns too — no names passed
    q = [float(x) for x in rng.standard_normal(6)]
    got = sim.ivf_topk_indexed(spark, ipath, q, k=5).collect()
    assert len(got) == 5 and "item_key" in got[0].asDict()
    # a conflicting explicit name fails loudly, not with UNRESOLVED_COLUMN
    import pytest as pt

    with pt.raises(ValueError, match="records"):
        sim.ivf_topk_indexed(spark, ipath, q, k=5, id_col="doc_id")

    # minhash: re-running the same CLI append duplicates no postings
    docs = spark.createDataFrame(
        [(i, f"doc {i} body words {i}") for i in range(10)],
        ["doc_id", "text"],
    )
    mpath = str(tmp_path / "mh_idx")
    minhash_index_write(docs.filter("doc_id < 8"), mpath,
                        num_hashes=16, bands=4)
    minput = str(tmp_path / "mh_batch.parquet")
    docs.filter("doc_id >= 8").write.parquet(minput)
    for expect in (2, 0):
        res = runner.invoke(
            main,
            ["index-append", mpath, "--kind", "minhash", "--input", minput],
        )
        assert res.exit_code == 0, res.output
        rep = js.loads(res.output.strip().splitlines()[-1])
        assert rep["appended_docs"] == expect
    sigs = spark.read.parquet(f"{mpath}/signatures")
    assert sigs.count() == 10
    assert sigs.select("doc_id").distinct().count() == 10


def test_cli_index_build_then_append_lifecycle(spark, tmp_path):
    """Full build-once/append-many lifecycle from the shell: `index-build`
    creates each of the three persisted indexes, `index-append` (all
    defaults — the indexes record their own parameters) grows them, and
    the library probes serve from the grown index."""
    import json as js

    import numpy as np

    from mini_etl_spark.functions import similarity as sim
    from mini_etl_spark.functions.bloom import bloom_decontaminate_indexed
    from mini_etl_spark.functions.dedup_index import minhash_index_filter

    runner = CliRunner()

    # --- minhash ---
    docs = spark.createDataFrame(
        [(i, f"document number {i} carries words {i} {i}") for i in range(8)],
        ["doc_id", "text"],
    )
    corpus = str(tmp_path / "docs.parquet")
    docs.write.parquet(corpus)
    mpath = str(tmp_path / "mh")
    res = runner.invoke(main, [
        "index-build", mpath, "--kind", "minhash", "--input", corpus,
    ])
    assert res.exit_code == 0, res.output
    assert js.loads(res.output.strip().splitlines()[-1])["indexed_docs"] == 8
    batch = spark.createDataFrame(
        [(100, "document number 3 carries words 3 3"),  # near-dup of doc 3
         (101, "wholly novel content nothing shared")],
        ["doc_id", "text"],
    )
    bpq = str(tmp_path / "batch.parquet")
    batch.write.parquet(bpq)
    kept = minhash_index_filter(batch, mpath, threshold=0.5)
    assert {r.doc_id for r in kept.collect()} == {101}
    res = runner.invoke(main, [
        "index-append", mpath, "--kind", "minhash", "--input", bpq,
    ])
    assert res.exit_code == 0, res.output
    assert js.loads(res.output.strip().splitlines()[-1])["appended_docs"] == 2

    # --- bloom ---
    blpath = str(tmp_path / "bl")
    res = runner.invoke(main, [
        "index-build", blpath, "--kind", "bloom", "--input", corpus,
        "--n", "3",
    ])
    assert res.exit_code == 0, res.output
    rep = js.loads(res.output.strip().splitlines()[-1])
    assert rep["state"] == "ready" and rep["n"] == 3
    screened = bloom_decontaminate_indexed(docs, blpath)
    assert screened.count() == 0  # the corpus IS the benchmark here

    # --- ivf ---
    rng = np.random.default_rng(11)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)],
        "vec_id bigint, embedding array<float>",
    )
    vpq = str(tmp_path / "vecs.parquet")
    vecs.write.parquet(vpq)
    ipath = str(tmp_path / "ivf")
    res = runner.invoke(main, [
        "index-build", ipath, "--kind", "ivf", "--input", vpq,
        "--cells", "4",
    ])
    assert res.exit_code == 0, res.output
    rep = js.loads(res.output.strip().splitlines()[-1])
    assert rep["indexed_vectors"] == 40 and rep["cells"] == 4
    q = [float(x) for x in rng.standard_normal(8)]
    assert len(sim.ivf_topk_indexed(spark, ipath, q, k=5).collect()) == 5
