"""Boundary tests for queries_ext25: language-ID marker scoring, argmax
tie-break, charset probe, and the 'und' fallback."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

REGISTRY = load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _run(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    fn, _ = REGISTRY["doc_language_id"]
    return {
        (r["lang"], r["predicted_lang"]): r["n_docs"]
        for r in fn(spark, str(tmp_path)).collect()
    }


def test_language_id_marker_scoring(spark, tmp_path):
    rows = [
        (1, "the cat and the dog is in that house", "en", "s", 36),
        (2, "el perro que vive en la casa de los gatos", "es", "s", 41),
        (3, "der hund und die katze ist nicht das problem", "de", "s", 44),
        (4, "le chat et les chiens dans une maison pour tous", "fr", "s", 47),
        (5, "数据分析引擎", "zh", "s", 6),
    ]
    got = _run(spark, tmp_path, rows)
    assert got == {
        ("en", "en"): 1,
        ("es", "es"): 1,
        ("de", "de"): 1,
        ("fr", "fr"): 1,
        ("zh", "zh"): 1,
    }


def test_language_id_und_fallback_and_tiebreak(spark, tmp_path):
    rows = [
        # no marker fires -> 'und'
        (1, "spark parquet shuffle broadcast", "en", "s", 31),
        # 'de' (es marker) and 'und' (de marker)... one hit each for es
        # ('de') and fr ('des') is avoided; craft an exact tie: 'la' (es)
        # and 'le' (fr) once each -> alphabetical tie-break picks 'es'.
        (2, "la le", "fr", "s", 5),
    ]
    got = _run(spark, tmp_path, rows)
    assert got[("en", "und")] == 1
    assert got[("fr", "es")] == 1
