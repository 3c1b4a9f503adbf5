"""Property pins for the int8-shortlist + exact-rerank ANN path."""

from __future__ import annotations

from spark_etl_pipeline_spark.plans import registry
from tests.conftest import SF_CORRECTNESS

registry.load_all()


def test_quantized_rerank_recall_vs_exact_ivf(spark):
    """The compressed-domain shortlist must not lose what the exact
    IVF scan finds: with a 10-candidate shortlist over ~N/k-vector
    cells, rerank recall@3 vs the full-precision cell scan is 1.0 on
    this corpus (64-dim vectors quantize at <0.4% relative error, so
    the true top-3 always survives into a 10-deep shortlist). Any
    quantizer or shortlist regression shows up as a lost neighbor."""
    sf = SF_CORRECTNESS
    exact = registry.REGISTRY["sim_ivf_kmeans"].builder(spark, sf).toPandas()
    quant = (
        registry.REGISTRY["sim_ivf_quantized_rerank"].builder(spark, sf).toPandas()
    )
    e = set(zip(exact.query_id, exact.neighbor_id))
    q = set(zip(quant.query_id, quant.neighbor_id))
    assert len(e) == len(q) > 0
    assert e == q  # recall@3 == 1.0, same neighbors

    # And the reranked cosine must be the EXACT cosine: for the common
    # pairs, quantized-path cos equals exact-path cos bit-for-bit.
    em = {(r.query_id, r.neighbor_id): r.cos for r in exact.itertuples()}
    qm = {(r.query_id, r.neighbor_id): r.cos for r in quant.itertuples()}
    for k in em:
        assert em[k] == qm[k]


def test_approx_score_close_to_exact(spark):
    """Quantization error bound in practice: |approx_cos - cos| stays
    small (< 0.02) across every shortlisted pair — the compressed score
    is a usable ranking signal, not just a prefilter."""
    quant = (
        registry.REGISTRY["sim_ivf_quantized_rerank"]
        .builder(spark, SF_CORRECTNESS)
        .toPandas()
    )
    assert ((quant.approx_cos - quant.cos).abs() < 0.02).all()
