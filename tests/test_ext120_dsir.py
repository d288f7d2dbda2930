"""DSIR importance scoring (ext120): directionality on a planted corpus
— target-like documents must outscore target-unlike ones, and the
per-source selection summary must reflect it."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, text, lang, src, len(text)) for i, (text, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_dsir_prefers_target_like_documents(spark, tmp_path):
    """English target docs speak 'alpha beta gamma'; raw docs that share
    that vocabulary score higher than docs of 'omega psi chi' words,
    regardless of their own lang label."""
    en = "alpha beta gamma alpha beta gamma alpha beta"
    other = "omega psi chi omega psi chi omega psi"
    rows = (
        [(en, "en", "tgt")] * 4
        + [(en + " delta", "de", "lookalike")] * 2
        + [(other, "de", "unlike")] * 4
    )
    _write_docs(spark, tmp_path, rows)
    reg = load_all()
    per_doc = {
        r.doc_id: r
        for r in reg["dsir_importance_topk"][0](spark, str(tmp_path)).collect()
    }
    rates = {
        r.source: r
        for r in reg["dsir_source_selection_rates"][0](
            spark, str(tmp_path)
        ).collect()
    }
    # the lookalike source scores positive on average, the unlike one
    # negative, and the target slice itself is the most positive
    assert rates["lookalike"].mean_dsir_micro > 0
    assert rates["unlike"].mean_dsir_micro < 0
    assert (
        rates["tgt"].mean_dsir_micro >= rates["lookalike"].mean_dsir_micro
    )
    # selection counts follow the sign
    assert rates["lookalike"].n_selected == 2
    assert rates["unlike"].n_selected == 0
    # top-k is dominated by target-vocabulary docs (none of the 'unlike'
    # docs can outrank a lookalike)
    unlike_scores = [
        r.dsir_micro for r in per_doc.values() if r.source == "unlike"
    ]
    lookalike_scores = [
        r.dsir_micro for r in per_doc.values() if r.source == "lookalike"
    ]
    assert lookalike_scores and min(lookalike_scores) > max(
        unlike_scores or [-(10**18)]
    )
