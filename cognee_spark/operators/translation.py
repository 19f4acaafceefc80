"""Translation pre-processing — the reference's translation task
(cognee/tasks/translation/translate_content.py:17-180,
detect_language.py:88-160): per chunk, detect the language, skip chunks
already in the target language, translate the rest with a pluggable
provider, PRESERVE the original text and attach LanguageMetadata /
TranslatedContent datapoints (uuid5(chunk_id, kind) ids). Detection failures
and short texts pass through untranslated (detect_language.py:112-125
skip_detection_for_short_text).

Spark re-expression for a multilingual 100 TB corpus:

- detection is a pure codegen column: the textstats marker heuristic when
  only text is available, or the row's own language column when the source
  carries one (the reference's explicit source_language parameter) —
  confidence 1.0 for metadata, 0.99/0.5 for marker-hit/fallback.
- the translation provider is the same transport-seam pattern as
  LLMExtractor (operators/llm.py): production swaps a batched model/service
  client; the deterministic double here is per-language word dictionaries
  applied as a codegen transform(split(text)) — word-level lookup, unknown
  words pass through — so tests and the DuckDB oracle replay it exactly and
  ZERO Python runs per row.
- lineage: content_sha (and any passenger column) rides through UNCHANGED —
  identity keys on the ORIGINAL bytes, exactly like the reference keeps
  original_text on the TranslatedContent datapoint; the translated text is
  what downstream chunking/extraction consumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cognee_spark.functions.ids import uuid5_col
from cognee_spark.operators.textstats import LANG_MARKERS

DEFAULT_TARGET_LANGUAGE = "en"
MIN_TEXT_LENGTH_FOR_DETECTION = 12  # reference config.min_text_length_for_detection

# Deterministic provider double: per-language word→target dictionaries
# (lowercase-exact match on whitespace tokens; everything else passes
# through). Production providers (LLM/Google/Azure in the reference,
# translate_content.py:92 get_translation_provider) plug in behind
# translate_chunks(provider_dicts=...) with the same shape.
TRANSLATION_DICTS: dict[str, dict[str, str]] = {
    "es": {
        "el": "the", "la": "the", "los": "the", "las": "the", "que": "that",
        "de": "of", "y": "and", "es": "is", "en": "in", "a": "to",
        "datos": "data", "consulta": "query", "tabla": "table", "fila": "row",
        "columna": "column", "grande": "big",
    },
    "fr": {
        "le": "the", "la": "the", "les": "the", "des": "some", "une": "a",
        "est": "is", "et": "and", "de": "of", "données": "data",
        "requête": "query", "ligne": "row", "colonne": "column", "grand": "big",
    },
    "de": {
        "der": "the", "die": "the", "das": "the", "und": "and", "ist": "is",
        "ein": "a", "daten": "data", "abfrage": "query", "tabelle": "table",
        "zeile": "row", "spalte": "column", "groß": "big",
    },
}


def detected_language_col(
    text: Column, lang_col: Column | None = None
) -> tuple[Column, Column]:
    """(detected_language, language_confidence) as codegen columns.

    With ``lang_col`` (source metadata) detection is that value at
    confidence 1.0 — the reference's explicit source_language path. Otherwise
    the textstats marker heuristic: first matching marker at 0.99, 'en'
    fallback at 0.5, and texts shorter than MIN_TEXT_LENGTH_FOR_DETECTION
    are 'unknown' at 0.0 (detect_language.py:112-125)."""
    if lang_col is not None:
        return lang_col, F.lit(1.0)
    lang = F.lit("en")
    conf = F.lit(0.5)
    for marker_lang, pattern in reversed(LANG_MARKERS):
        hit = text.rlike(pattern)
        lang = F.when(hit, F.lit(marker_lang)).otherwise(lang)
        conf = F.when(hit, F.lit(0.99)).otherwise(conf)
    short = F.length(F.trim(text)) < MIN_TEXT_LENGTH_FOR_DETECTION
    return (
        F.when(short, F.lit("unknown")).otherwise(lang),
        F.when(short, F.lit(0.0)).otherwise(conf),
    )


def _dict_lookup(word: Column, mapping: dict[str, str]) -> Column:
    """map[lower(word)] or the word itself — one map literal, codegen."""
    entries: list[Column] = []
    for k, v in mapping.items():
        entries.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.element_at(F.create_map(*entries), F.lower(word)), word)


def translated_text_col(
    text: Column,
    detected: Column,
    provider_dicts: dict[str, dict[str, str]] | None = None,
) -> Column:
    """Word-level dictionary translation of ``text`` for the detected
    language; languages without a dictionary pass through unchanged (the
    provider double's honest boundary — the reference raises
    TranslationError and keeps the chunk untranslated,
    translate_content.py:170-173)."""
    dicts = TRANSLATION_DICTS if provider_dicts is None else provider_dicts
    words = F.split(text, " ")
    out = text
    for lang, mapping in dicts.items():
        translated = F.array_join(
            F.transform(words, lambda w: _dict_lookup(w, mapping)), " "
        )
        out = F.when(detected == lang, translated).otherwise(out)
    return out


def translate_chunks(
    chunks: DataFrame,
    target_language: str = DEFAULT_TARGET_LANGUAGE,
    text_col: str = "text",
    id_col: str = "chunk_id",
    lang_col: str | None = None,
    confidence_threshold: float = 0.8,
    preserve_original: bool = True,
    provider_dicts: dict[str, dict[str, str]] | None = None,
) -> DataFrame:
    """The translate_content task as one narrow codegen projection.

    Per row: detect → requires_translation = (detected != target AND
    detected != 'unknown' AND confidence >= threshold) → ``text`` becomes
    the translation for rows that require it (everything downstream chunks /
    extracts the translated text, translate_content.py:154-156) — original
    bytes preserved in ``original_text`` and every passenger column
    (content_sha lineage!) rides through untouched. Adds
    ``translated_content_id`` = uuid5(chunk_id + '-TranslatedContent') for
    translated rows (models.TranslatedContent id rule) and
    ``translation_provider`` = 'dict' (the double's provider tag).

    No shuffle, no Python: the whole stage is a projection that fuses into
    the source scan at any corpus size.
    """
    text = F.col(text_col)
    detected, confidence = detected_language_col(
        text, F.col(lang_col) if lang_col is not None else None
    )
    requires = (
        (detected != F.lit(target_language))
        & (detected != F.lit("unknown"))
        & (confidence >= F.lit(float(confidence_threshold)))
    )
    translated = translated_text_col(text, detected, provider_dicts)
    passengers = [c for c in chunks.columns if c not in (text_col,)]
    cols = [
        *passengers,
        detected.alias("detected_language"),
        confidence.alias("language_confidence"),
        requires.alias("requires_translation"),
        F.when(requires, translated).otherwise(text).alias(text_col),
    ]
    if preserve_original:
        cols.append(text.alias("original_text"))
    out = chunks.select(*cols)
    return out.withColumn(
        "translated_content_id",
        F.when(
            F.col("requires_translation"),
            uuid5_col(F.concat_ws("-", F.col(id_col).cast("string"), F.lit("TranslatedContent"))),
        ),
    ).withColumn(
        "translation_provider",
        F.when(F.col("requires_translation"), F.lit("dict")),
    )
