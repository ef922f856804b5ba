"""Filesystem document sources (S8, reference example.py:52-71): a
directory of text files becomes INGEST_DATAPOINTS rows with the reference's
three datapoints per file — `filename` (the path), `title` (first line),
`text` (the remainder) — ready for `build_index` / the streaming indexer.

Declared deviation: the reference's `readline()` keeps the title's trailing
newline in the embedded string; we strip it (canonical text, documented).

Binary media directories load through `read_binary_dir` → the multimodal
media shape (modality inferred from extension, content opaque BINARY).

At 100 TB: both readers are plain Spark file sources — splittable file
listing, per-file rows produced scan-side, no driver-side walking (the
reference's os.listdir loop becomes the cluster's distributed listing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MODALITY_BY_EXT = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_text_dir(
    spark: SparkSession,
    path: str,
    searchdomain: str = "default",
    models: list[str] | None = None,
    entity_probmethod: str = "Mean",
    dp_probmethod: str = "Mean",
    simmethod: str = "Cosine",
    path_glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """One INGEST_DATAPOINTS row per (file, datapoint) with the reference's
    filename/title/text datapoint shape. Entity name = file path."""
    reader = spark.read.format("text").option("wholetext", "true")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path).select(
        F.input_file_name().alias("path"), F.col("value")
    )

    nl = F.instr("value", "\n")
    title = F.rtrim(F.substring_index("value", "\n", 1))
    body = F.when(nl == 0, F.lit("")).otherwise(
        F.expr("substring(value, instr(value, '\n') + 1)")
    )
    dps = F.array(
        F.struct(F.lit("filename").alias("datapoint"), F.col("path").alias("text")),
        F.struct(F.lit("title").alias("datapoint"), title.alias("text")),
        F.struct(F.lit("text").alias("datapoint"), body.alias("text")),
    )
    model_arr = F.array(*[F.lit(m) for m in (models or ["mock:modelA"])])
    return (
        raw.select(F.col("path"), F.explode(dps).alias("dp"))
        .select(
            F.lit(searchdomain).alias("searchdomain"),
            F.col("path").alias("entity"),
            F.lit(entity_probmethod).alias("entity_probmethod"),
            F.lit(None).cast("map<string,string>").alias("attributes"),
            F.col("dp.datapoint").alias("datapoint"),
            F.lit(dp_probmethod).alias("dp_probmethod"),
            F.lit(simmethod).alias("simmethod"),
            F.col("dp.text").alias("text"),
            model_arr.alias("models"),
        )
    )


def read_binary_dir(
    spark: SparkSession,
    path: str,
    path_glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Media files as (media_id-less) rows: path, modality (by extension),
    content BINARY, length + mtime metadata — the binaryFile source."""
    reader = spark.read.format("binaryFile")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality = F.lit("unknown")
    for e, m in _MODALITY_BY_EXT.items():
        modality = F.when(ext == e, F.lit(m)).otherwise(modality)
    return raw.select(
        F.col("path"),
        modality.alias("modality"),
        F.col("content"),
        F.col("length").alias("size_bytes"),
        F.col("modificationTime").alias("modified_at"),
    )


# the reference's ingest wire format (JSONModels.cs:3-19): one JSON object
# per entity, datapoints nested
_JSON_ENTITY = """
    Name STRING, Probmethod STRING, Searchdomain STRING,
    Attributes MAP<STRING, STRING>,
    Datapoints ARRAY<STRUCT<
        Name: STRING, Text: STRING, Probmethod_embedding: STRING,
        SimilarityMethod: STRING, Model: ARRAY<STRING>>>
"""


def read_jsonl_entities(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines of reference-shaped entities (the `PUT /Entities` body,
    JSONModels.cs:3-19, one object per line) → INGEST_DATAPOINTS rows
    (one per datapoint, nested fields flattened). The explicit schema
    skips Spark's inference pass — one read, not two — and malformed
    lines surface as nulls rather than schema drift. Feed the result to
    `operators/index_build.build_index` or the streaming indexer."""
    raw = spark.read.schema(_JSON_ENTITY).json(path)
    return raw.select(
        F.col("Searchdomain").alias("searchdomain"),
        F.col("Name").alias("entity"),
        F.col("Probmethod").alias("entity_probmethod"),
        F.col("Attributes").alias("attributes"),
        F.explode("Datapoints").alias("dp"),
    ).select(
        "searchdomain",
        "entity",
        "entity_probmethod",
        "attributes",
        F.col("dp.Name").alias("datapoint"),
        F.col("dp.Probmethod_embedding").alias("dp_probmethod"),
        F.col("dp.SimilarityMethod").alias("simmethod"),
        F.col("dp.Text").alias("text"),
        F.col("dp.Model").alias("models"),
    )
