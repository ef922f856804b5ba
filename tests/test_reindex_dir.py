"""Snapshot-diff directory reindex (T4 Changed/Deleted semantics,
reference Calls.cs:313-435): create+modify+delete reconciled in one pass,
unchanged files skipped, final index identical to a fresh build of the
directory's current state."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from embeddingsearch_spark.api import Engine


def _write(d: Path, name: str, text: str) -> None:
    (d / name).write_text(text)


def _entities(eng, searchdomain="default"):
    return {
        r["entity"]
        for r in eng.index_flat.filter(
            F.col("searchdomain") == searchdomain
        ).select("entity").distinct().collect()
    }


def _index_state(eng):
    return sorted(
        map(
            tuple,
            eng.index_flat.select(
                "entity", "datapoint", "model", "text_hash"
            ).collect(),
        )
    )


def test_reindex_create_modify_delete(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    _write(d, "a.txt", "title a\nbody a")
    _write(d, "b.txt", "title b\nbody b")
    _write(d, "c.txt", "title c\nbody c")

    eng = Engine(spark, dim=8)
    r1 = eng.reindex_dir(str(d))
    assert r1 == {"upserted_entities": 3, "deleted_entities": 0}
    assert len(_entities(eng)) == 3

    eng.materialize_query("probe")

    # modify a, delete b, create e — c untouched
    _write(d, "a.txt", "title a\nbody a CHANGED")
    (d / "b.txt").unlink()
    _write(d, "e.txt", "title e\nbody e")

    r2 = eng.reindex_dir(str(d))
    # a changed + e new = 2 upserts; b = 1 delete; c skipped
    assert r2 == {"upserted_entities": 2, "deleted_entities": 1}

    ents = _entities(eng)
    assert not any(e.endswith("b.txt") for e in ents)
    assert len(ents) == 3

    # converged: identical to a fresh build of the current directory
    fresh = Engine(spark, dim=8)
    fresh.reindex_dir(str(d))
    assert _index_state(eng) == _index_state(fresh)

    # materialized rankings repaired to match a fresh full search
    cached = sorted(
        map(tuple, eng.read_results("probe").select("entity", "rank").collect())
    )
    full = sorted(
        map(tuple, eng.search("probe").select("entity", "rank").collect())
    )
    assert cached == full


def test_reindex_noop_on_unchanged_dir(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    _write(d, "a.txt", "title\nbody")
    eng = Engine(spark, dim=8)
    eng.reindex_dir(str(d))
    before = _index_state(eng)
    r = eng.reindex_dir(str(d))
    assert r == {"upserted_entities": 0, "deleted_entities": 0}
    assert _index_state(eng) == before
