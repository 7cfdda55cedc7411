"""Enrichment property of DSIR importance RESAMPLING
(queries/sampling.py::corpus_dsir_sample): on a corpus where the
target domain has a distinguishable feature distribution, the picked
pool over-represents target-like documents, while uniform sampling
reproduces the corpus mix.  (The sf fixture's languages share most
of their synthetic vocabulary, so the REGISTERED query's weights
barely separate there — a data property, which is why the property
is pinned on constructed vocabulary instead.)
"""

from __future__ import annotations

import os

import pytest

EN_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
XX_VOCAB = ["uno", "dos", "tres", "cuatro", "cinco", "seis"]
N_EN, N_XX, DOC_LEN = 10, 30, 24


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsir_sf"))
    rows = []
    for i in range(N_EN):
        toks = [EN_VOCAB[(i + j) % len(EN_VOCAB)] for j in range(DOC_LEN)]
        rows.append((i, " ".join(toks), "en"))
    for i in range(N_XX):
        toks = [XX_VOCAB[(i + j) % len(XX_VOCAB)] for j in range(DOC_LEN)]
        rows.append((N_EN + i, " ".join(toks), "xx"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def _en_share(picked) -> float:
    tot = sum(r["pick_count"] for r in picked)
    en = sum(r["pick_count"] for r in picked if r["lang"] == "en")
    return en / tot


def test_dsir_sample_enriches_target_domain(spark, sf_dir):
    from pyspark.sql import functions as F

    from musicflow_spark.operators.sampling import weighted_systematic_sample
    from musicflow_spark.queries.sampling import (
        DSIR_SAMPLE_K,
        corpus_dsir_sample,
    )
    from musicflow_spark.sources.catalog import read_table

    corpus_share = N_EN / (N_EN + N_XX)  # 0.25
    dsir = corpus_dsir_sample(spark, sf_dir).collect()
    assert dsir, "resampler picked nothing"
    uni = weighted_systematic_sample(
        read_table(spark, sf_dir, "documents").withColumn("one", F.lit(1)),
        "one",
        k=DSIR_SAMPLE_K,
    ).collect()
    # uniform stride-PPS reproduces the corpus mix (every weight 1)
    assert abs(_en_share(uni) - corpus_share) <= 0.05
    # DSIR weights enrich the target domain well past both baselines
    assert _en_share(dsir) > corpus_share + 0.1, _en_share(dsir)
    assert _en_share(dsir) > _en_share(uni)


def test_dsir_weights_order_by_target_likeness(spark, sf_dir):
    """Every target-vocabulary doc outweighs every off-target doc —
    the per-token ratio grid separates cleanly when the vocabularies
    actually differ."""
    from pyspark.sql import functions as F

    from musicflow_spark.queries.sampling import DSIR_SCALE, _dsir_scored

    scored = _dsir_scored(spark, sf_dir).select(
        "doc_id", "lang", F.expr("imp_sum_micro div n_toks").alias("avg")
    )
    rows = scored.collect()
    min_en = min(r["avg"] for r in rows if r["lang"] == "en")
    max_xx = max(r["avg"] for r in rows if r["lang"] == "xx")
    assert min_en > max_xx
    # and the en per-token ratio is genuinely > 1 (positive nats)
    assert min_en > 0 > max_xx
