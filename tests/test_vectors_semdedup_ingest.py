"""Write-set semantics of the incremental SemDeDup tier
(queries/vectors.py::embedding_semdedup_ingest) on constructed
geometry — the four contracts the hash oracle alone cannot isolate:

1. the output is the DELTA write-set only (base flags immutable);
2. a delta matching a KEPT base cluster-mate is dropped (arrival
   order wins, regardless of id ordering);
3. a delta matching only a DROPPED base vector SURVIVES — the
   comparison set is the kept set, not the corpus (the property that
   separates ingest semantics from re-running the batch);
4. delta x delta in the same cluster is min-id-wins, and a delta id
   landing on the centroid stride is NOT a centroid (frozen-on-base
   blocking).

Unit vectors in the plane at chosen angles; threshold 0.4 == cos(66°)
boundary kept far from every constructed pair.
"""

from __future__ import annotations

import math
import os

import pytest


def _unit(theta_deg: float) -> list[float]:
    t = math.radians(theta_deg)
    return [float(math.cos(t)), float(math.sin(t)), 0.0]


E3 = [0.0, 0.0, 1.0]

# KNN_INGEST_MOD = 5 (delta = multiples of 5); IVF_CENT_MOD/REM = 97/3
# (centroids = base ids ≡ 3 mod 97).
ROWS = [
    # base
    (1, _unit(0)),      # cluster A anchor — KEPT (smallest id in A)
    (2, _unit(60)),     # cos(1,2)=0.5 >= 0.4 -> DROPPED in base
    (3, _unit(60)),     # centroid A (id % 97 == 3); dup of 2 -> dropped
    (197, E3),          # centroid B (197 % 97 == 3); alone -> kept
    # delta (ids % 5 == 0)
    (5, _unit(10)),     # cos vs kept 1 = cos10 ≈ .98 -> dropped via kept base
    (10, _unit(115)),   # cos vs kept 1 = cos115 < 0; cos vs DROPPED 2 ≈ .57
    #                     -> SURVIVES (kept-set comparison only)
    (15, _unit(12)),    # dropped (vs kept base 1, and vs delta 5)
    (20, _unit(118)),   # cos vs kept 1 < 0; cos vs delta 10 = cos3 ≈ .998
    #                     -> dropped solely by the smaller KEPT delta 10
    (100, _unit(170)),  # 100 % 97 == 3 BUT delta -> must NOT be a centroid;
    #                     nearest frozen centroid is B (e3) -> kept alone
]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("semdedup_sf"))
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in ROWS],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_semdedup_ingest_write_set_semantics(spark, sf_dir):
    from musicflow_spark.queries.vectors import embedding_semdedup_ingest

    out = {
        r["vec_id"]: r
        for r in embedding_semdedup_ingest(spark, sf_dir).collect()
    }
    # (1) write-set only: exactly the delta ids, no base row touched
    assert set(out) == {5, 10, 15, 20, 100}
    # (2) arrival order wins: 5 matches kept base 1 -> dropped
    assert out[5]["keep"] is False
    # (3) kept-set comparison: 10 matches only the DROPPED base 2
    assert out[10]["keep"] is True
    # (4a) delta x delta min-id-wins: 20 matches only kept delta 10
    assert out[20]["keep"] is False
    assert out[15]["keep"] is False
    # (4b) frozen blocking: delta 100 (centroid stride) is no centroid;
    # it assigns to B and survives alone
    assert out[100]["keep"] is True and out[100]["cluster_id"] == 197
    # every delta in the plane assigned to the frozen A centroid
    assert {out[i]["cluster_id"] for i in (5, 10, 15, 20)} == {3}


def test_semdedup_ingest_oracle_agrees_on_constructed_geometry(spark, sf_dir):
    """The DuckDB oracle reproduces the same write-set on the
    constructed geometry (the hash gate runs only on the fixture
    corpus; this pins the replay on the adversarial case)."""
    import duckdb

    from musicflow_spark.queries.vectors import (
        _embedding_semdedup_ingest_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}/*.parquet'"
    )
    rows = con.execute(_embedding_semdedup_ingest_oracle_sql()).fetchall()
    got = {int(v): (int(c), bool(k)) for v, c, k in rows}
    assert got == {
        5: (3, False),
        10: (3, True),
        15: (3, False),
        20: (3, False),
        100: (197, True),
    }
