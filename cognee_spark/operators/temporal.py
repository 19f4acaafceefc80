"""Temporal graph extraction — E7 of SURVEY.md §2.3.

The reference's temporal pipeline (cognee/tasks/temporal_graph/
extract_events_and_entities.py:13-37, models.py Timestamp/Event,
generate_event_datapoint.py:5-47, add_entities_to_event.py:9-60) extracts
Event datapoints with normalized timestamps from chunk text via an LLM,
enriches descriptions with "Time data: ..." context, and attaches entities
to events with typed edges.

Spark re-expression, deterministic stand-in for the LLM (same seam as the
NL extractor — swap is config):

- extract_events: Arrow-batched sentence scanner for date expressions
  (ISO dates, "from YYYY to YYYY" ranges, "in/since/until YYYY"); each hit
  becomes an Event row with reference-normalized timestamps (missing month/
  day default to 1, missing time to 0 — models.py:5-17) and a deterministic
  id_for("Event", name) id.
- events_to_datapoints: 'at' vs 'during' temporal shape + the reference's
  description enrichment ("\\n---\\nTime data: X to Y"), pure codegen.
- event_entity_edges: CamelCase tokens in the event sentence become
  involved entities (Entity.id_for ids) — the deterministic stand-in for
  the entity-attribution LLM call.
- events_in_interval: QueryInterval filtering (temporal search pre-filter),
  a pushdown-friendly native range predicate.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cognee_spark.functions.ids import id_for_col

_DATE_ISO = re.compile(r"\b(\d{4})-(\d{2})-(\d{2})\b")
_RANGE_YEARS = re.compile(r"\bfrom\s+(\d{4})\s+to\s+(\d{4})\b", re.IGNORECASE)
_IN_YEAR = re.compile(r"\b(?:in|since|until|by)\s+([12]\d{3})\b", re.IGNORECASE)
_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")
_CAMEL = re.compile(r"\b([A-Z][a-z0-9]+(?:[A-Z][a-z0-9]+)+)\b")


def _ts(year: int, month: int = 1, day: int = 1) -> str:
    """Reference timestamp normalization: unknown parts default to 1/0
    (models.py:5-17). Rendered as the reference's timestamp_str."""
    return f"{year:04d}-{month:02d}-{day:02d} 00:00:00"


def extract_events_py(text: str) -> list[dict]:
    """Sentence-level event extraction (pure kernel; oracle-auditable)."""
    out: list[dict] = []
    for sentence in _SENTENCE_SPLIT.split(text or ""):
        sentence = sentence.strip()
        if not sentence:
            continue
        time_from = time_to = None
        if m := _RANGE_YEARS.search(sentence):
            time_from, time_to = _ts(int(m.group(1))), _ts(int(m.group(2)))
        else:
            isos = _DATE_ISO.findall(sentence)
            if len(isos) >= 2:
                time_from = _ts(int(isos[0][0]), int(isos[0][1]), int(isos[0][2]))
                time_to = _ts(int(isos[1][0]), int(isos[1][1]), int(isos[1][2]))
            elif len(isos) == 1:
                time_from = _ts(int(isos[0][0]), int(isos[0][1]), int(isos[0][2]))
            elif m := _IN_YEAR.search(sentence):
                time_from = _ts(int(m.group(1)))
        if time_from is None:
            continue
        name = sentence.rstrip(".!?")
        out.append(
            {
                "name": name,
                "description": name,
                "time_from": time_from,
                "time_to": time_to,
            }
        )
    return out


_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("time_from", T.StringType(), True),
        T.StructField("time_to", T.StringType(), True),
        T.StructField("chunk_id", T.StringType(), True),
        T.StructField("content_sha", T.StringType(), True),
    ]
)


def extract_events(chunks: DataFrame, text_col: str = "text") -> DataFrame:
    """chunks(chunk_id, text, content_sha) → raw event rows (narrow stage)."""
    passengers = [c for c in ("chunk_id", "content_sha") if c in chunks.columns]
    src = chunks.select(F.col(text_col).alias("text"), *passengers)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                for ev in extract_events_py(rec.text):
                    for col in passengers:
                        ev[col] = getattr(rec, col)
                    rows.append(ev)
            yield pd.DataFrame(rows, columns=[f.name for f in _EVENT_SCHEMA])

    return src.mapInPandas(run, _EVENT_SCHEMA)


def events_to_datapoints(events: DataFrame) -> DataFrame:
    """Event datapoints with deterministic ids and the reference's temporal
    description enrichment (generate_event_datapoint.py:24-47)."""
    during = F.col("time_from").isNotNull() & F.col("time_to").isNotNull()
    at = F.col("time_from").isNotNull() & F.col("time_to").isNull()
    temporal_info = F.when(
        during,
        F.concat(F.lit("\n---\nTime data: "), F.col("time_from"), F.lit(" to "), F.col("time_to")),
    ).when(at, F.concat(F.lit("\n---\nTime data: "), F.col("time_from")))
    return events.select(
        id_for_col("Event", F.col("name")).alias("event_id"),
        "name",
        F.concat(F.coalesce("description", F.lit("Event")), F.coalesce(temporal_info, F.lit("")))
        .alias("description"),
        F.when(during, F.lit("during")).when(at, F.lit("at")).alias("temporal_kind"),
        F.to_timestamp("time_from").alias("time_from"),
        F.to_timestamp("time_to").alias("time_to"),
        *(c for c in ("chunk_id", "content_sha") if c in events.columns),
    ).dropDuplicates(["event_id"])


def event_entity_edges(events: DataFrame) -> DataFrame:
    """(event_id, relationship, entity_id, entity_name) involvement edges —
    deterministic stand-in for add_entities_to_event.py:9-60. CamelCase
    tokens in the event sentence are the involved entities; token split +
    rlike stays in codegen."""
    return (
        events.select(
            id_for_col("Event", F.col("name")).alias("event_id"),
            F.explode(F.split("name", "[^A-Za-z0-9]+")).alias("entity_name"),
        )
        .where(F.col("entity_name").rlike("^[A-Z][a-z0-9]+([A-Z][a-z0-9]+)+$"))
        .distinct()
        .select(
            "event_id",
            F.lit("involves").alias("relationship"),
            id_for_col("Entity", F.col("entity_name")).alias("entity_id"),
            "entity_name",
        )
    )


def events_in_interval(
    events: DataFrame,
    starts_at: str | None = None,
    ends_at: str | None = None,
    time_col: str = "time_from",
) -> DataFrame:
    """QueryInterval filter (models.py QueryInterval: open-ended bounds)."""
    out = events
    if starts_at is not None:
        out = out.where(F.col(time_col) >= F.to_timestamp(F.lit(starts_at)))
    if ends_at is not None:
        out = out.where(F.col(time_col) < F.to_timestamp(F.lit(ends_at)))
    return out
