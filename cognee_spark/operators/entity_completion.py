"""Config-driven regex entity extraction — the reference's
RegexEntityExtractor (cognee/tasks/entity_completion/entity_extractors/
regex_entity_extractor.py:12-73 + regex_entity_config.py:14-80) as one
whole-stage-codegen projection.

The reference compiles each configured pattern on the driver and runs
``pattern.finditer(text)`` per chunk in Python, building one ``Entity``
per match with ``is_a`` pointing at a per-config ``EntityType`` and a
templated description. Here every (pattern × chunk) is a
``regexp_extract_all`` column; the union of configured types explodes
into entity rows with the engine's deterministic ids — a billion chunks
scan at codegen speed with zero Python in the row path.

Parity notes:
- match semantics: ``finditer`` yields non-overlapping leftmost matches
  in order; ``regexp_extract_all(..., 0)`` has the same contract, so the
  multiset of matches per chunk is identical for the shipped config
  (backreference- and lookaround-free patterns).
- the reference validates each config entry's required fields at load
  (regex_entity_config.py:23-30) and rejects bad patterns — both are
  driver-side raises here too (a config is dictionary-sized).
- invalid/empty input text yields no entities rather than an error
  (extractor.extract_entities:63-67); a NULL text column behaves the
  same way here.
- the LLM extractor twin (llm_entity_extractor.py) shares this module's
  output shape; its transport is the engine's existing batched
  ``operators/llm.py`` seam with kind="extract_entities", so only the
  deterministic config path lives here.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_spark.functions.ids import id_for_col

# regex_entity_config.json — the reference's shipped default config,
# verbatim patterns (Spark's Java regex and the reference's `re` agree on
# these constructs).
DEFAULT_REGEX_ENTITY_CONFIG = [
    {
        "entity_name": "EMAIL",
        "entity_description": "Entity type for email entities",
        "regex": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
        "description_template": "Email address: {}",
    },
    {
        "entity_name": "PHONE",
        "entity_description": "Entity type for phone entities",
        "regex": r"\+?\d{1,4}[\s-]?\(?\d{2,4}\)?[\s-]?\d{3,4}[\s-]?\d{3,4}",
        "description_template": "Phone number: {}",
    },
    {
        "entity_name": "URL",
        "entity_description": "Entity type for url entities",
        "regex": r"https?:\/\/(www\.)?[a-zA-Z0-9-]+(\.[a-zA-Z]{2,})+(\/\S*)?",
        "description_template": "URL: {}",
    },
    {
        "entity_name": "DATE",
        "entity_description": "Entity type for date entities",
        "regex": r"(\d{4}[-/]\d{2}[-/]\d{2})|(\d{2}[-/]\d{2}[-/]\d{4})",
        "description_template": "Date: {}",
    },
    {
        "entity_name": "TIME",
        "entity_description": "Entity type for time entities",
        "regex": r"(1[0-2]|0?[1-9]):[0-5][0-9](\s?[APap][Mm])?|([01]?[0-9]|2[0-3]):[0-5][0-9]",
        "description_template": "Time: {}",
    },
]

_REQUIRED_FIELDS = ("entity_name", "entity_description", "regex", "description_template")


def _validate_config(config: list[dict]) -> None:
    """regex_entity_config.py:23-38 — missing fields and bad patterns are
    config errors, raised at plan time (the config is dictionary-sized)."""
    for entry in config:
        missing = [f for f in _REQUIRED_FIELDS if f not in entry]
        if missing:
            raise ValueError(
                "Missing required fields in entity configuration: "
                + ", ".join(missing)
            )
        try:
            _re.compile(entry["regex"])
        except _re.error as err:
            raise ValueError(
                f"Invalid regex pattern for entity '{entry['entity_name']}': {err}"
            ) from err


def extract_regex_entities(
    chunks: DataFrame,
    config: list[dict] | None = None,
    text_col: str = "text",
    id_col: str = "chunk_id",
) -> DataFrame:
    """Every configured pattern's matches, one entity row per occurrence.

    Output: (<id_col>, entity_type, name, description, entity_id, type_id)
    — ``entity_id`` is the engine's deterministic Entity id (so repeated
    extraction upserts) and ``type_id`` the EntityType id, matching the
    reference's ``Entity(name=match, is_a=EntityType(...))`` shape.
    Match ORDER within a chunk is the reference's per-type finditer order,
    preserved as array position before the explode.
    """
    config = DEFAULT_REGEX_ENTITY_CONFIG if config is None else config
    _validate_config(config)
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    per_type = [
        F.struct(
            F.lit(entry["entity_name"]).alias("entity_type"),
            F.regexp_extract_all(text, F.lit(entry["regex"]), 0).alias("matches"),
            F.lit(entry["description_template"]).alias("template"),
        )
        for entry in config
    ]
    exploded = (
        chunks.select(F.col(id_col), F.explode(F.array(*per_type)).alias("_t"))
        .select(
            id_col,
            F.col("_t.entity_type").alias("entity_type"),
            F.col("_t.template").alias("template"),
            F.posexplode("_t.matches").alias("match_pos", "name"),
        )
    )
    tpl = F.col("template")
    return exploded.select(
        id_col,
        "entity_type",
        "match_pos",
        "name",
        # description_template.format(match): "<prefix>{}<suffix>" fills the
        # slot; a template without a slot passes through (str.format parity)
        F.when(
            tpl.contains("{}"),
            F.concat(
                F.substring_index(tpl, "{}", 1),
                F.col("name"),
                F.substring_index(tpl, "{}", -1),
            ),
        ).otherwise(tpl).alias("description"),
        id_for_col("Entity", F.col("name")).alias("entity_id"),
        id_for_col("EntityType", F.col("entity_type")).alias("type_id"),
    )
