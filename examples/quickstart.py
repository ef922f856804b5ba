"""End-to-end quickstart — the engine equivalent of the reference's
example indexer flow (reference src/Indexer/Scripts/example.py +
example.csx probe: index a directory of text documents, then search).

Run:  python examples/quickstart.py [docs_dir]

With no argument a tiny demo corpus is generated. The flow is the
reference's: each file becomes an entity with filename/title/text
datapoints, embedded per model (deterministic local embedder standing in
for the HTTP provider), then a probe query is ranked against every
entity with the two-level scoring cascade.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEMO_DOCS = {
    "dna_repair.md": "DNA repair\nCells mend broken strands using "
    "specialized enzyme complexes that detect damage.\n",
    "volcanoes.md": "Volcanoes\nMagma rises through the crust and erupts "
    "as lava, ash and gas.\n",
    "sourdough.md": "Sourdough baking\nWild yeast and lactic bacteria "
    "leaven the dough slowly.\n",
}


def main(docs_dir: str | None = None, query: str = "DNA damage") -> None:
    from embeddingsearch_spark.api import Engine
    from embeddingsearch_spark.session import get_spark
    from embeddingsearch_spark.sources.files import read_text_dir

    if docs_dir is None:
        tmp = tempfile.mkdtemp(prefix="es_quickstart_")
        for name, content in DEMO_DOCS.items():
            (Path(tmp) / name).write_text(content)
        docs_dir = tmp

    spark = get_spark("quickstart", master="local[4]", shuffle_partitions=4)
    engine = Engine(spark, dim=32)

    ingest = read_text_dir(
        spark,
        docs_dir,
        searchdomain="docs",
        models=["mock:modelA", "mock:modelB"],
        entity_probmethod="Mean",
        dp_probmethod="Mean",
        simmethod="Cosine",
    )
    result = engine.index_entities(ingest)
    print(
        f"indexed: {result.n_requested} (text, model) pairs, "
        f"{result.n_embedded} embedded, {result.n_cache_hits} cache hits"
    )
    engine.stats().show(truncate=False)

    print(f"query: {query!r}")
    top = engine.search(query, searchdomain="docs", topn=3)
    top.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
