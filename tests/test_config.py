"""Config compiler tests (⇐ reference tests/test_config.py:19-80):
YAML parse, env substitution, validation errors, end-to-end build+run."""

from __future__ import annotations

import os

import pytest

from mini_etl_spark.config import ConfigLoader, SAMPLE_CONFIG

YAML_CONFIG = """\
name: test_pipeline
source:
  type: csv
  path: "{src}"
transformers:
  - type: filter
    condition: "value > 50"
  - type: rename
    columns: {{value: amount}}
sink:
  type: csv
  path: "{out}"
  mode: overwrite
"""


@pytest.fixture
def csv_file(sample_pdf, tmp_path):
    p = tmp_path / "in.csv"
    sample_pdf.to_csv(p, index=False)
    return p


def test_yaml_load_build_run(spark, csv_file, tmp_path):
    cfg_path = tmp_path / "p.yaml"
    out = tmp_path / "out"
    cfg_path.write_text(YAML_CONFIG.format(src=csv_file, out=out))
    loader = ConfigLoader()
    config = loader.load(cfg_path)
    assert config.name == "test_pipeline"
    assert config.validate() == []
    pipeline = loader.build_pipeline(config)
    stats = pipeline.run(spark)
    assert stats["rows"] == 100  # all sample values are 100..199 > 50
    back = spark.read.option("header", True).csv(str(out))
    assert "amount" in back.columns


def test_orc_config_pipeline(spark, csv_file, tmp_path):
    """orc source/sink are first-class config vocabulary."""
    orc_in = tmp_path / "in_orc"
    spark.read.option("header", True).csv(str(csv_file)).write.orc(str(orc_in))
    out = tmp_path / "out_orc"
    cfg_path = tmp_path / "orc.yaml"
    cfg_path.write_text(
        f"name: orc_pipe\n"
        f"source: {{type: orc, path: '{orc_in}'}}\n"
        f"sink: {{type: orc, path: '{out}', mode: overwrite}}\n"
    )
    loader = ConfigLoader()
    config = loader.load(cfg_path)
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["rows"] == 100
    assert spark.read.orc(str(out)).count() == 100


def test_env_substitution(tmp_path, monkeypatch):
    monkeypatch.setenv("MY_DATA_DIR", "/data/land")
    cfg = tmp_path / "e.yaml"
    cfg.write_text(
        "name: env\nsource: {type: csv, path: '${MY_DATA_DIR}/x.csv'}\n"
        "sink: {type: null}\n"
    )
    config = ConfigLoader().load(cfg)
    assert config.source.options["path"] == "/data/land/x.csv"


def test_env_substitution_unknown_left_alone(tmp_path):
    cfg = tmp_path / "e.yaml"
    cfg.write_text(
        "name: env\nsource: {type: csv, path: '$NOT_SET_XYZ/x.csv'}\nsink: {type: null}\n"
    )
    config = ConfigLoader().load(cfg)
    assert config.source.options["path"] == "$NOT_SET_XYZ/x.csv"


def test_validation_errors():
    loader = ConfigLoader()
    config = loader.parse(
        {
            "name": "",
            "source": {"type": "carrier-pigeon"},
            "sink": {"type": "csv", "path": "x"},
            "transformers": [{"type": "teleport"}],
        }
    )
    errors = config.validate()
    assert any("name" in e for e in errors)
    assert any("carrier-pigeon" in e for e in errors)
    assert any("teleport" in e for e in errors)


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        ConfigLoader().load("/nonexistent/pipeline.yaml")


def test_nested_pipeline_key(tmp_path):
    cfg = tmp_path / "n.yaml"
    cfg.write_text(
        "pipeline:\n  name: nested\n  source: {type: csv, path: x.csv}\n"
        "  sink: {type: null}\n"
    )
    config = ConfigLoader().load(cfg)
    assert config.name == "nested"
    assert config.validate() == []


def test_sample_config_is_valid():
    import yaml

    config = ConfigLoader().parse(yaml.safe_load(SAMPLE_CONFIG))
    assert config.validate() == []


def test_json_config(tmp_path):
    cfg = tmp_path / "c.json"
    cfg.write_text(
        '{"name": "j", "source": {"type": "parquet", "path": "x"},'
        ' "sink": {"type": "null"}}'
    )
    config = ConfigLoader().load(cfg)
    assert config.validate() == []


def test_aggregate_transformer_builds(spark, csv_file, tmp_path):
    loader = ConfigLoader()
    config = loader.parse(
        {
            "name": "agg",
            "source": {"type": "csv", "path": str(csv_file)},
            "transformers": [
                {"type": "aggregate", "group_by": "category",
                 "agg": {"value": ["sum", "mean"]}},
                {"type": "sort", "by": "category"},
            ],
            "sink": {"type": "parquet", "path": str(tmp_path / "agg_out")},
        }
    )
    stats = loader.build_pipeline(config).run(spark)
    assert stats["rows"] == 5  # categories A..E


def test_training_pipeline_config_vocab(spark, tmp_path):
    """The training-data extensions are first-class config vocabulary:
    a YAML pipeline can score, scrub, split, and sample a corpus."""
    src = tmp_path / "docs"
    spark.createDataFrame(
        [(i, f"doc {i} mail a{i}@ex.com " + ("common words here " * 3)) for i in range(200)],
        "doc_id bigint, text string",
    ).write.parquet(str(src))
    out = tmp_path / "out_docs"
    cfg_path = tmp_path / "t.yaml"
    cfg_path.write_text(
        f"""
name: corpus_prep
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: redact_pii
    column: text
  - type: text_features
  - type: repetition_features
  - type: hash_split
    key: doc_id
    weights: {{train: 0.8, holdout: 0.2}}
  - type: sample
    key: doc_id
    fraction: 0.5
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg_path)
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    back = spark.read.parquet(str(out))
    assert stats["rows"] == back.count()
    assert 60 <= stats["rows"] <= 140  # ~50% deterministic sample
    cols = set(back.columns)
    assert {"quality", "lang_id", "rep_bigram_ratio", "split"} <= cols
    assert back.filter("text like '%@ex.com%'").count() == 0  # PII gone
    assert back.filter("text like '%<EMAIL>%'").count() == stats["rows"]
    splits_seen = {r.split for r in back.select("split").distinct().collect()}
    assert splits_seen <= {"train", "holdout"}


def test_chunk_pack_config_vocab(spark, tmp_path):
    """Chunking and sequence packing run from YAML config."""
    src = tmp_path / "docs2"
    spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i % 5 + 1) * 3))) for i in range(40)],
        "doc_id bigint, text string",
    ).write.parquet(str(src))
    out = tmp_path / "chunks_out"
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(
        f"""
name: chunker
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: chunk
    window: 6
    stride: 4
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg_path)
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    back = spark.read.parquet(str(out))
    assert set(back.columns) == {"doc_id", "chunk_id", "chunk_text", "n_tokens"}
    assert back.filter("n_tokens > 6").count() == 0
    assert stats["rows"] == back.count() > 40  # docs split into >1 chunk

    out2 = tmp_path / "bins_out"
    cfg2 = tmp_path / "p.yaml"
    cfg2.write_text(
        f"""
name: packer
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: pack_sequences
    max_tokens: 16
    group_size: 10
sink: {{type: parquet, path: '{out2}', mode: overwrite}}
"""
    )
    config2 = loader.load(cfg2)
    assert config2.validate() == []
    loader.build_pipeline(config2).run(spark)
    bins = spark.read.parquet(str(out2))
    assert bins.count() == 40
    from pyspark.sql import functions as F

    assert (
        bins.groupBy("bin_id").agg(F.sum("n_tokens").alias("s"))
        .filter("s > 16").count() == 0
    )


def test_text_source_config(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    (src / "d1.txt").write_text("alpha beta\ngamma\n")
    out = tmp_path / "out_text"
    cfg = tmp_path / "txt.yaml"
    cfg.write_text(
        f"name: txt_pipe\n"
        f"source: {{type: text, path: '{src}', line_col: text}}\n"
        f"transformers: [{{type: filter, condition: \"text like '%a%'\"}}]\n"
        f"sink: {{type: parquet, path: '{out}', mode: overwrite}}\n"
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["rows"] == 2  # 'alpha beta' + 'gamma'


def test_expect_transformer_gates_pipeline(spark, tmp_path):
    """Declarative data-quality gate: 'expect' fails the run on violations
    and passes clean data through unchanged."""
    src = tmp_path / "gated"
    spark.createDataFrame(
        [(1, 50.0), (2, 60.0), (3, 70.0)], "id int, score double"
    ).write.parquet(str(src))
    out = tmp_path / "gated_out"
    cfg = tmp_path / "e.yaml"
    cfg.write_text(
        f"""
name: gated
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: expect
    rules:
      id: {{not_null: true, unique: true}}
      score: {{min: 0.0, max: 100.0}}
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["rows"] == 3 and stats["errors"] == 0

    bad_cfg = tmp_path / "bad.yaml"
    bad_cfg.write_text(
        f"""
name: gated_bad
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: expect
    rules:
      score: {{max: 55.0}}
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    from mini_etl_spark.schema import SchemaValidationError

    with pytest.raises(Exception) as exc:
        loader.build_pipeline(loader.load(bad_cfg)).run(spark)
    assert "violations" in str(exc.value)


def test_corpus_scoring_config_vocab(spark, tmp_path):
    """lm_score / hashed_vectors / mix run from YAML config."""
    src = tmp_path / "docs3"
    spark.createDataFrame(
        [(i, "web" if i % 2 == 0 else "code",
          "common words here " * 3 + f"doc {i}") for i in range(40)],
        "doc_id bigint, source string, text string",
    ).write.parquet(str(src))
    out = tmp_path / "scored_out"
    cfg = tmp_path / "s.yaml"
    cfg.write_text(
        f"""
name: scorer
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: mix
    budgets: {{web: 60, code: 40}}
  - type: lm_score
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    back = spark.read.parquet(str(out))
    assert {"doc_id", "n_tokens", "lm_score"} <= set(back.columns)
    assert 0 < stats["rows"] < 40  # budgets bind

    out2 = tmp_path / "vec_out"
    cfg2 = tmp_path / "v.yaml"
    cfg2.write_text(
        f"""
name: vectorizer
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: hashed_vectors
    dim: 16
sink: {{type: parquet, path: '{out2}', mode: overwrite}}
"""
    )
    config2 = loader.load(cfg2)
    assert config2.validate() == []
    loader.build_pipeline(config2).run(spark)
    vecs = spark.read.parquet(str(out2))
    assert vecs.count() == 40
    assert vecs.selectExpr("size(embedding) AS s").filter("s != 16").count() == 0


def test_cap_and_span_removal_config_vocab(spark, tmp_path):
    src = tmp_path / "docs5"
    rows = [(i, "w x common passage tokens here live y z", f"s{i % 2}")
            for i in range(6)]
    rows[0] = (0, "alpha beta common passage tokens here live gamma", "s0")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).write.parquet(str(src))
    out = tmp_path / "cap_out"
    cfg = tmp_path / "cap.yaml"
    cfg.write_text(
        f"""
name: caps
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: remove_spans
    width: 3
  - type: cap_per_group
    group: source
    cap: 2
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    got = spark.read.parquet(str(out)).collect()
    assert len(got) == 4  # 2 per source after the cap
    # the shared passage survives in at most the earliest doc (0); every
    # later doc had it excised before the cap ran
    survivors = [
        r.doc_id for r in got
        if "common passage tokens here live" in r.clean_text
    ]
    assert survivors in ([], [0])


def test_semantic_dedup_config_vocab(spark, tmp_path):
    src = tmp_path / "docs4"
    base = "spark shuffles data across the cluster nodes tonight "
    rows = [(i, base * 5 + f"tail{i}") for i in range(3)]
    rows += [(3, "different words about cooking pasta"),
             (4, "legal text governing license terms")]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(str(src))
    out = tmp_path / "sem_out"
    cfg = tmp_path / "sd.yaml"
    cfg.write_text(
        f"""
name: semdedup
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: semantic_dedup
    dim: 32
    cells: 4
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    kept = sorted(r.doc_id for r in spark.read.parquet(str(out)).collect())
    assert kept == [0, 3, 4]


def test_bpe_and_quantize_config_vocab(spark, tmp_path):
    """bpe_encode (corpus-fit) and quantize run from YAML config."""
    src = tmp_path / "docs_bpe"
    spark.createDataFrame(
        [(i, "the quick brown fox jumps " * 2 + f"doc {i}") for i in range(20)],
        "doc_id bigint, text string",
    ).write.parquet(str(src))
    out = tmp_path / "bpe_out"
    cfg = tmp_path / "b.yaml"
    cfg.write_text(
        f"""
name: tokenizer
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: bpe_encode
    num_merges: 30
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    back = spark.read.parquet(str(out))
    assert back.count() == 20
    row = back.filter("doc_id = 0").first()
    assert any(len(s.replace("</w>", "")) > 1 for s in row.bpe_tokens)

    vec_src = tmp_path / "vecs_q"
    spark.createDataFrame(
        [(i, [float(i), float(i) * 2.0, 7.0]) for i in range(10)],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(str(vec_src))
    out2 = tmp_path / "q_out"
    cfg2 = tmp_path / "q.yaml"
    cfg2.write_text(
        f"""
name: quantizer
source: {{type: parquet, path: '{vec_src}'}}
transformers:
  - type: quantize
    levels: 16
sink: {{type: parquet, path: '{out2}', mode: overwrite}}
"""
    )
    config2 = loader.load(cfg2)
    assert config2.validate() == []
    loader.build_pipeline(config2).run(spark)
    codes = {r.vec_id: r.codes for r in spark.read.parquet(str(out2)).collect()}
    assert len(codes) == 10
    assert codes[0][0] == 0 and codes[9][0] == 15  # endpoints hit the rails
    assert all(c[2] == 0 for c in codes.values())  # constant dim -> 0


def test_xml_and_weighted_sample_config_vocab(spark, tmp_path):
    """XML source/sink and the weighted_sample transformer run from YAML."""
    src = tmp_path / "docs_xml"
    spark.createDataFrame(
        [(i, f"s{i % 3}", float(1 + i)) for i in range(40)],
        "doc_id bigint, source string, score double",
    ).write.format("xml").option("rowTag", "doc").option(
        "rootTag", "docs"
    ).save(str(src))
    out = tmp_path / "xml_out"
    cfg = tmp_path / "x.yaml"
    cfg.write_text(
        f"""
name: xml_sample
source: {{type: xml, path: '{src}', row_tag: doc}}
transformers:
  - type: weighted_sample
    key: doc_id
    weight: score
    n: 10
sink: {{type: xml, path: '{out}', mode: overwrite, row_tag: doc}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    back = spark.read.format("xml").option("rowTag", "doc").load(str(out))
    assert back.count() == 10
    assert set(back.columns) == {"doc_id", "source", "score"}


def test_url_config_vocab(spark, tmp_path):
    """parse_urls / url_blocklist run from YAML config."""
    src = tmp_path / "pages"
    spark.createDataFrame(
        [(i, f"https://www.site{i % 4}.example.com:443/p/{i}?utm_source=x&q={i}")
         for i in range(12)],
        "page_id bigint, url string",
    ).write.parquet(str(src))
    out = tmp_path / "url_out"
    cfg = tmp_path / "u.yaml"
    cfg.write_text(
        f"""
name: url-curation
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: url_blocklist
    blocked: [site0.example.com, site1.example.com]
  - type: parse_urls
    normalize: true
sink: {{type: parquet, path: '{out}', mode: overwrite}}
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    back = spark.read.parquet(str(out))
    hosts = {r["url_host"] for r in back.select("url_host").distinct().collect()}
    assert hosts == {"www.site2.example.com", "www.site3.example.com"}
    norm = back.select("url_norm").first()[0]
    assert ":443" not in norm and "utm_" not in norm


def test_temperature_mix_and_shards_config_vocab(spark, tmp_path):
    """temperature_mix transformer + shards sink run from YAML."""
    src = tmp_path / "docs_mix"
    spark.createDataFrame(
        [(i, "web" if i < 60 else "code", f"text {i}") for i in range(80)],
        "doc_id bigint, source string, text string",
    ).write.parquet(str(src))
    out = tmp_path / "shards_out"
    cfg = tmp_path / "mix.yaml"
    cfg.write_text(
        f"""
name: mix_and_shard
source: {{type: parquet, path: '{src}'}}
transformers:
  - type: temperature_mix
    budget: 40
    alpha: 0.0
    repeat: false
sink:
  type: shards
  path: '{out}'
  num_shards: 4
  key: doc_id
  format: jsonl
"""
    )
    loader = ConfigLoader()
    config = loader.load(cfg)
    assert config.validate() == []
    loader.build_pipeline(config).run(spark)
    back = spark.read.json(str(out))
    # alpha=0, budget 40 → 20 docs per source
    assert back.count() == 40
    from mini_etl_spark.sinks.shards import read_shard_manifest

    m = read_shard_manifest(str(out))
    assert m["total_rows"] == 40 and m["num_shards"] == 4


def test_outliers_transformer(spark, tmp_path):
    """outliers config node: drop (default), keep, and flag modes over
    the median/MAD detector."""
    import yaml

    from mini_etl_spark.config import ConfigLoader

    rows = [(i, "g", 100.0 + (i % 10)) for i in range(100)]
    rows += [(900, "g", 5000.0)]
    src = tmp_path / "in"
    spark.createDataFrame(rows, "id long, grp string, x double").write.parquet(str(src))

    def _run(mode):
        cfg = {
            "name": f"out_{mode}",
            "source": {"type": "parquet", "path": str(src)},
            "transformers": [
                {"type": "outliers", "column": "x", "group": "grp", "mode": mode}
            ],
            "sink": {"type": "parquet", "path": str(tmp_path / f"out_{mode}"),
                     "mode": "overwrite"},
        }
        p = tmp_path / f"{mode}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        loader = ConfigLoader()
        config = loader.load(str(p))
        assert config.validate() == []
        loader.build_pipeline(config).run(spark)
        return spark.read.parquet(str(tmp_path / f"out_{mode}"))

    dropped = _run("drop")
    assert dropped.count() == 100 and dropped.filter("id = 900").count() == 0
    kept = _run("keep")
    assert [r.id for r in kept.collect()] == [900]
    flagged = _run("flag")
    assert flagged.count() == 101
    assert flagged.filter("is_outlier").count() == 1
    import pytest as _p
    with _p.raises(ValueError, match="drop|keep|flag"):
        _run("bogus")


def test_outliers_drop_keeps_null_valued_rows(spark, tmp_path):
    """r5 review: a NULL measurement is not an outlier - drop mode must
    keep the row (is_outlier coalesces to False), not silently filter it."""
    import yaml

    from mini_etl_spark.config import ConfigLoader

    rows = [(i, "g", 100.0 + (i % 10)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string, x double")
    df = df.union(
        spark.createDataFrame([(999, "g", None)], "id long, grp string, x double")
    )
    src = tmp_path / "in"
    df.write.parquet(str(src))
    cfg = {
        "name": "out_null",
        "source": {"type": "parquet", "path": str(src)},
        "transformers": [
            {"type": "outliers", "column": "x", "group": "grp", "mode": "drop"}
        ],
        "sink": {"type": "parquet", "path": str(tmp_path / "out"), "mode": "overwrite"},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    loader = ConfigLoader()
    config = loader.load(str(p))
    loader.build_pipeline(config).run(spark)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 51  # nothing dropped, incl. the NULL-valued row
    assert out.filter("id = 999").count() == 1


def test_shards_sink_tokens_per_shard_yaml(spark, tmp_path):
    """The declarative shards sink in token-balance mode end to end."""
    import yaml

    from mini_etl_spark.config import ConfigLoader
    from mini_etl_spark.sinks.shards import read_shard_manifest

    src = tmp_path / "docs"
    spark.createDataFrame(
        [(i, "tok " * (5 + i % 20)) for i in range(200)], "doc_id long, text string"
    ).write.parquet(str(src))
    cfg = {
        "name": "tok_shards",
        "source": {"type": "parquet", "path": str(src)},
        "transformers": [],
        "sink": {"type": "shards", "path": str(tmp_path / "out"),
                 "tokens_per_shard": 400, "format": "jsonl"},
    }
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(cfg))
    loader = ConfigLoader()
    config = loader.load(str(p))
    assert config.validate() == []
    stats = loader.build_pipeline(config).run(spark)
    assert stats["errors"] == 0
    man = read_shard_manifest(str(tmp_path / "out"), spark)
    assert man["tokens_per_shard"] == 400
    assert sum(man["shards"].values()) == 200
    assert man["num_shards"] >= 2
