"""Translation pre-processing stage (cognee/tasks/translation/
translate_content.py + detect_language.py semantics): detection, provider
double, original preservation, and content_sha lineage through chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

import uuid

from cognee_spark.functions.ids import NAMESPACE_OID
from cognee_spark.operators.translation import translate_chunks


def _frame(spark, rows):
    return spark.createDataFrame(rows, "chunk_id string, text string")


def test_marker_detection_and_confidence(spark):
    rows = [
        ("c_es", "el servicio de datos que corre en la nube procesa la consulta"),
        ("c_en", "the service runs queries over big tables"),
        ("c_short", "tiny"),
    ]
    out = {r.chunk_id: r for r in translate_chunks(_frame(spark, rows)).collect()}
    assert out["c_es"].detected_language == "es"
    assert out["c_es"].language_confidence == 0.99
    assert out["c_es"].requires_translation is True
    assert out["c_en"].detected_language == "en"
    assert out["c_en"].requires_translation is False
    # short text: unknown / 0.0 / never translated (skip_detection_for_short_text)
    assert out["c_short"].detected_language == "unknown"
    assert out["c_short"].language_confidence == 0.0
    assert out["c_short"].requires_translation is False
    assert out["c_short"].text == "tiny"


def test_dictionary_translation_preserves_original(spark):
    rows = [("c1", "la consulta de la tabla grande es datos")]
    r = translate_chunks(_frame(spark, rows)).first()
    # word-level dictionary map; unknown words pass through
    assert r.text == "the query of the table big is data"
    assert r.original_text == "la consulta de la tabla grande es datos"
    assert r.translation_provider == "dict"
    # TranslatedContent id rule: uuid5(chunk_id + '-TranslatedContent')
    assert r.translated_content_id == str(
        uuid.uuid5(NAMESPACE_OID, "c1-TranslatedContent")
    )


def test_metadata_language_mode_and_no_dict_passthrough(spark):
    """lang_col mode: the row's own language column drives detection at
    confidence 1.0 (the reference's explicit source_language); a language
    without a provider dictionary passes text through unchanged (reference
    TranslationError → chunk kept untranslated)."""
    rows = [
        ("c_de", "der dienst ist groß", "de"),
        ("c_zh", "数据 查询 服务", "zh"),
        ("c_en", "already english", "en"),
    ]
    chunks = spark.createDataFrame(rows, "chunk_id string, text string, lang string")
    out = {r.chunk_id: r for r in translate_chunks(chunks, lang_col="lang").collect()}
    assert out["c_de"].language_confidence == 1.0
    assert out["c_de"].text == "the dienst is big"
    assert out["c_zh"].requires_translation is True  # wants translation...
    assert out["c_zh"].text == "数据 查询 服务"  # ...but the double has no zh dict
    assert out["c_en"].requires_translation is False
    assert out["c_en"].translated_content_id is None


def test_langid_translate_chunk_lineage_keeps_original_sha(spark):
    """The pipeline shape the reference runs (detect → translate → chunk):
    downstream chunks carry the translated text but the content_sha of the
    ORIGINAL bytes — identity/dedup keys must not change because a
    translation pass ran."""
    from cognee_spark.operators.chunking import chunk_documents

    original = "la consulta de la tabla grande es datos y la fila es grande"
    docs = spark.createDataFrame(
        [("d1", original)], "document_id string, content string"
    ).withColumn("content_sha", F.sha2("content", 256))
    sha_before = docs.first().content_sha

    translated = translate_chunks(
        docs, text_col="content", id_col="document_id"
    )
    r = translated.first()
    assert r.requires_translation and r.content != original
    assert r.content_sha == sha_before  # untouched by translation

    chunks = chunk_documents(
        translated.select("document_id", "content", "content_sha"),
        max_chunk_size=6,
    )
    rows = chunks.collect()
    assert len(rows) >= 2  # the translated text actually got chunked
    joined = " ".join(c.text for c in sorted(rows, key=lambda c: c.chunk_index))
    assert joined.split() == "the query of the table big is data and the row is big".split()
    assert all(c.content_sha == sha_before for c in rows)
