"""Filesystem sources: text dirs become the reference's three-datapoint
ingest shape; binary dirs become media rows; both feed the build pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import index_build
from embeddingsearch_spark.sources import files


def _write(p, name, content, binary=False):
    p.mkdir(exist_ok=True)
    f = p / name
    if binary:
        f.write_bytes(content)
    else:
        f.write_text(content)
    return str(f)


def test_read_text_dir_shape(spark, tmp_path):
    d = tmp_path / "docs"
    _write(d, "a.md", "Title A\nbody line 1\nbody line 2\n")
    _write(d, "b.md", "only one line no newline")
    df = files.read_text_dir(
        spark, str(d), searchdomain="docs", models=["mock:modelA", "mock:modelB"]
    )
    rows = {
        (r.entity.split("/")[-1], r.datapoint): r.text for r in df.collect()
    }
    assert len(rows) == 6  # 2 files x 3 datapoints
    assert rows[("a.md", "title")] == "Title A"
    assert rows[("a.md", "text")] == "body line 1\nbody line 2\n"
    assert rows[("a.md", "filename")].endswith("a.md")
    assert rows[("b.md", "title")] == "only one line no newline"
    assert rows[("b.md", "text")] == ""
    assert df.select("models").first().models == ["mock:modelA", "mock:modelB"]


def test_text_dir_feeds_index_build(spark, tmp_path):
    d = tmp_path / "docs"
    _write(d, "a.md", "Title A\nsome body\n")
    _write(d, "b.md", "Title B\nsome body\n")  # same body text as a.md
    ingest = files.read_text_dir(spark, str(d), searchdomain="docs")
    built = index_build.build_index(ingest, None, dim=8)
    idx = built.index_flat
    assert idx.count() == 6
    # shared body text embedded once (dedup before embedding, E4)
    assert built.n_embedded == 5  # 2 filenames + 2 titles + 1 shared body
    assert idx.select("searchdomain").distinct().first().searchdomain == "docs"


def test_read_binary_dir_modalities(spark, tmp_path):
    d = tmp_path / "media"
    _write(d, "x.png", b"\x89PNG fake", binary=True)
    _write(d, "y.wav", b"RIFF fake", binary=True)
    _write(d, "z.bin", b"\x00\x01", binary=True)
    df = files.read_binary_dir(spark, str(d))
    got = {r.path.split("/")[-1]: r for r in df.collect()}
    assert got["x.png"].modality == "image"
    assert got["y.wav"].modality == "audio"
    assert got["z.bin"].modality == "unknown"
    assert bytes(got["x.png"].content) == b"\x89PNG fake"
    assert got["y.wav"].size_bytes == len(b"RIFF fake")


def test_read_jsonl_entities(spark, tmp_path):
    import json

    from embeddingsearch_spark.operators.index_build import build_index
    from embeddingsearch_spark.schemas import INGEST_DATAPOINTS
    from embeddingsearch_spark.sources.files import read_jsonl_entities

    path = str(tmp_path / "entities.jsonl")
    ents = [
        {
            "Name": f"e{i}",
            "Probmethod": "Mean",
            "Searchdomain": "sd",
            "Attributes": {"lang": "en"},
            "Datapoints": [
                {
                    "Name": "title",
                    "Text": f"title {i}",
                    "Probmethod_embedding": "Mean",
                    "SimilarityMethod": "Cosine",
                    "Model": ["mock:a", "mock:b"],
                },
                {
                    "Name": "text",
                    "Text": f"body of {i}",
                    "Probmethod_embedding": "Max",
                    "SimilarityMethod": "Cosine",
                    "Model": ["mock:a"],
                },
            ],
        }
        for i in range(4)
    ]
    with open(path, "w") as f:
        for e in ents:
            f.write(json.dumps(e) + "\n")

    df = read_jsonl_entities(spark, path)
    assert [f.name for f in df.schema] == [
        f.name for f in INGEST_DATAPOINTS
    ]
    rows = df.collect()
    assert len(rows) == 8  # 4 entities × 2 datapoints
    by = {(r.entity, r.datapoint): r for r in rows}
    assert by[("e0", "text")].dp_probmethod == "Max"
    assert by[("e0", "title")].models == ["mock:a", "mock:b"]
    assert by[("e3", "title")].attributes == {"lang": "en"}

    # end-to-end: the parsed rows drive the batch index build
    idx = build_index(df).index_flat
    # one index row per (datapoint, model): 4 × (2 + 1)
    assert idx.count() == 12
