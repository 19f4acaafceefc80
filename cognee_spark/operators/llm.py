"""LLM-backed NL graph extraction — E1/E10 of SURVEY.md §2.3/§2.9.

The reference's core extractor is an LLM structured-output call with schema
validation and retry (cognee/infrastructure/llm/extraction/knowledge_graph/
extract_content_graph.py:15-47 via LLMGateway.acreate_structured_output,
LLMGateway.py:74), producing KnowledgeGraph{nodes, edges} objects
(cognee/shared/data_models.py:49-77); dangling edges are filtered before
materialization (extract_graph_from_data.py:188-196).

Spark re-expression: ``LLMExtractor`` is a DataFrame-in/DataFrame-out kernel
(registrable in ``cognee_spark.registry.NL_EXTRACTORS``) whose mapInPandas
body groups chunk rows into REQUEST BATCHES, renders each batch as one JSON
request, calls a pluggable ``transport`` callable (an HTTP POST in
production; deterministic doubles in tests), validates the response against
the KnowledgeGraph row schema, and emits standard EXTRACTION_SCHEMA rows —
so the noisy-extractor path feeds the SAME linking/canonicalization stages
as the deterministic kernels.

Failure semantics (each observable via Spark accumulators →
``stage_metrics()`` → the stage checkpoint row):

- transport exception: retried with exponential backoff up to
  ``max_retries``; a batch that still fails is DROPPED and counted
  (``skipped_batches`` — the reference raises per-chunk and its task runner
  skips the datapoint)
- unparseable response / schema-invalid node or edge entries: dropped
  per-entry and counted (``skipped_rows`` — instructor's validation-retry
  collapses to drop-and-count in a deterministic batch engine)
- dangling edges (an endpoint not among the chunk's returned nodes):
  dropped in-kernel when ``filter_dangling`` (counted), mirroring
  extract_graph_from_data.py:188-196. Even with filter_dangling=False the
  downstream alias-map inner join drops them before triples materialize.

Transport contract (the serving seam — swap is config, not rewrite):
    transport(request_json: str) -> response_json: str
  request:  {"model": ..., "batch": [{"chunk_id": ..., "text": ...}, ...]}
  response: {"results": [{"chunk_id": ..., "nodes": [{"name", "type"}],
                          "edges": [{"source", "target",
                                     "relationship_name"}]}, ...]}
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from cognee_spark.operators.extraction import (
    EXTRACTION_SCHEMA,
    _append_rows,
    _columnar,
    _widen,
)


class LLMExtractor:
    """Batched, retrying, schema-validating NL extractor over a transport.

    Instances are callables with the NL-extractor kernel signature
    ``(chunks_df) -> extractions_df`` so they plug into
    ``run_pipeline(nl_extractor=...)`` / ``registry.NL_EXTRACTORS``
    unchanged. After the stage's write action, ``stage_metrics()`` returns
    the failure counters for the checkpoint row.
    """

    def __init__(
        self,
        transport: Callable[[str], str],
        model: str = "kg-extractor",
        batch_size: int = 100,
        max_retries: int = 3,
        backoff_sec: float = 0.05,
        filter_dangling: bool = True,
    ):
        self.transport = transport
        self.model = model
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_sec = backoff_sec
        self.filter_dangling = filter_dangling
        self._acc: dict = {}

    def stage_metrics(self) -> dict:
        """Accumulator snapshot — call AFTER the stage's action has run."""
        return {name: int(acc.value) for name, acc in self._acc.items()}

    def __call__(self, chunks: DataFrame) -> DataFrame:
        sc = chunks.sparkSession.sparkContext
        acc = {
            name: sc.accumulator(0)
            for name in (
                "llm_requests", "llm_retries", "skipped_batches",
                "skipped_rows", "dangling_edges_dropped",
            )
        }
        self._acc = acc
        transport = self.transport
        model = self.model
        batch_size = self.batch_size
        max_retries = self.max_retries
        backoff_sec = self.backoff_sec
        filter_dangling = self.filter_dangling

        src = _widen(chunks.select("chunk_id", "text", "content_sha", "repo", "path", "lang"))

        def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                cols = _columnar()
                for start in range(0, len(pdf), batch_size):
                    sub = pdf.iloc[start : start + batch_size]
                    meta = {
                        rec.chunk_id: rec for rec in sub.itertuples(index=False)
                    }
                    request = json.dumps(
                        {
                            "model": model,
                            "batch": [
                                {"chunk_id": c, "text": t}
                                for c, t in zip(sub["chunk_id"], sub["text"])
                            ],
                        }
                    )
                    response = None
                    for attempt in range(max_retries + 1):
                        acc["llm_requests"].add(1)
                        try:
                            response = transport(request)
                            break
                        except Exception:
                            if attempt < max_retries:
                                acc["llm_retries"].add(1)
                                time.sleep(backoff_sec * (2**attempt))
                    if response is None:
                        acc["skipped_batches"].add(1)
                        continue
                    for chunk_id, rows, n_bad, n_dangling in _parse_response(
                        response, filter_dangling
                    ):
                        acc["skipped_rows"].add(n_bad)
                        acc["dangling_edges_dropped"].add(n_dangling)
                        rec = meta.get(chunk_id)
                        if rec is None:
                            continue  # hallucinated chunk id → no lineage row
                        _append_rows(
                            cols, rows, "nl",
                            rec.repo, rec.path, rec.lang, rec.chunk_id, rec.content_sha,
                        )
                yield pd.DataFrame(cols)

        return src.mapInPandas(run, EXTRACTION_SCHEMA)


def _parse_response(response: str, filter_dangling: bool):
    """Validate one transport response → [(chunk_id, rows, n_bad, n_dangling)].

    An unparseable envelope yields nothing (the caller already counted the
    batch as delivered; per-chunk rows simply don't materialize — the same
    outcome as the reference's per-datapoint failure skip)."""
    from cognee_spark.operators.extraction import _edge, _mention

    try:
        payload = json.loads(response)
        results = payload["results"]
        assert isinstance(results, list)
    except (ValueError, KeyError, AssertionError):
        return
    for entry in results:
        if not isinstance(entry, dict) or not isinstance(entry.get("chunk_id"), str):
            continue
        rows: list[dict] = []
        n_bad = 0
        n_dangling = 0
        node_names: set[str] = set()
        for node in entry.get("nodes") or []:
            if (
                isinstance(node, dict)
                and isinstance(node.get("name"), str) and node["name"]
                and isinstance(node.get("type"), str) and node["type"]
            ):
                if node["name"] not in node_names:
                    node_names.add(node["name"])
                    rows.append(_mention(node["name"], node["type"]))
            else:
                n_bad += 1
        for edge in entry.get("edges") or []:
            if not (
                isinstance(edge, dict)
                and isinstance(edge.get("source"), str) and edge["source"]
                and isinstance(edge.get("target"), str) and edge["target"]
                and isinstance(edge.get("relationship_name"), str)
                and edge["relationship_name"]
            ):
                n_bad += 1
                continue
            if filter_dangling and (
                edge["source"] not in node_names or edge["target"] not in node_names
            ):
                n_dangling += 1
                continue
            rows.append(_edge(edge["source"], edge["relationship_name"], edge["target"]))
        yield entry["chunk_id"], rows, n_bad, n_dangling


# --- deterministic serving doubles (tests / offline runs) ---------------------
#
# ``reference_transport`` answers every request with exactly what the
# deterministic grammar extractor (extraction.extract_nl) would produce, so a
# pipeline run through the full LLM path — batching, retry, validation —
# must emit byte-identical triples to the default kernel (and therefore
# passes the same golden-parquet oracle). Production swaps in an HTTP POST;
# nothing else changes.


def reference_transport(request: str) -> str:
    from cognee_spark.operators.extraction import extract_nl

    batch = json.loads(request)["batch"]
    results = []
    for item in batch:
        nodes, edges = [], []
        for row in extract_nl(item["text"]):
            if row["row_kind"] == "mention":
                nodes.append({"name": row["name"], "type": row["kind"]})
            else:
                edges.append(
                    {
                        "source": row["name"],
                        "target": row["dst"],
                        "relationship_name": row["rel"],
                    }
                )
        results.append({"chunk_id": item["chunk_id"], "nodes": nodes, "edges": edges})
    return json.dumps({"results": results})


# --- production HTTP transports ------------------------------------------------
#
# The reference serves extraction through an OpenAI-compatible endpoint
# (LLMGateway.acreate_structured_output → instructor/litellm →
# POST {base_url}/chat/completions). Two stdlib-only transports cover the
# seam: ``HttpTransport`` speaks the native batch contract verbatim (own
# serving tier), ``OpenAIChatTransport`` wraps each batch as one
# chat.completions call with JSON response_format (reference parity). Both
# are plain picklable objects — they ship to executors inside the
# mapInPandas closure — and both raise on any network/HTTP/envelope fault
# so LLMExtractor's retry ladder owns ALL failure policy.


class HttpTransport:
    """POST the native request JSON to ``url`` and return the response body.

    Stateless and picklable; each python worker opens its own connections.
    Non-2xx responses and socket errors raise (urllib.error.HTTPError /
    URLError), which LLMExtractor retries with backoff and then counts as a
    skipped batch — no failure policy lives here."""

    def __init__(self, url: str, timeout: float = 30.0,
                 headers: dict[str, str] | None = None):
        self.url = url
        self.timeout = timeout
        self.headers = dict(headers or {})

    def __call__(self, request: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=request.encode("utf-8"),
            headers={"Content-Type": "application/json", **self.headers},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read().decode("utf-8")


class OpenAIChatTransport:
    """One native batch request → one OpenAI ``chat.completions`` call.

    Mirrors the reference's serving shape (LLMGateway.py:74 structured
    output over an OpenAI-compatible endpoint): the batch JSON rides as the
    user message, ``response_format={"type": "json_object"}`` +
    ``temperature=0`` ask for deterministic JSON, and the assistant
    message content IS the native response envelope
    (``{"results": [...]}``), which LLMExtractor validates row-by-row as
    usual — a model that answers off-schema is counted, not trusted."""

    SYSTEM_PROMPT = (
        "You are a knowledge-graph extractor. The user message is a JSON "
        'object {"model": ..., "batch": [{"chunk_id", "text"}, ...]}. '
        "For every batch item extract entity nodes and relationship edges "
        "from its text and respond with ONLY a JSON object of the form "
        '{"results": [{"chunk_id": ..., "nodes": [{"name", "type"}, ...], '
        '"edges": [{"source", "target", "relationship_name"}, ...]}, ...]} '
        "covering every chunk_id in the batch."
    )

    def __init__(self, base_url: str, model: str = "gpt-4o-mini",
                 api_key: str | None = None, timeout: float = 60.0):
        self.url = base_url.rstrip("/") + "/chat/completions"
        self.model = model
        self.api_key = api_key
        self.timeout = timeout

    def __call__(self, request: str) -> str:
        import urllib.request

        body = json.dumps(
            {
                "model": self.model,
                "messages": [
                    {"role": "system", "content": self.SYSTEM_PROMPT},
                    {"role": "user", "content": request},
                ],
                "response_format": {"type": "json_object"},
                "temperature": 0,
            }
        )
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            self.url, data=body.encode("utf-8"), headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            envelope = json.loads(resp.read().decode("utf-8"))
        # KeyError/IndexError here = malformed completion envelope → the
        # retry ladder treats it like any other transport fault.
        return envelope["choices"][0]["message"]["content"]


class TransientFaultTransport:
    """Wrap a transport so the FIRST attempt at every ``every_n``-th distinct
    request raises (deterministic by request digest) — retry must recover.
    State is per python-worker process, which is exactly the retry scope."""

    def __init__(self, inner: Callable[[str], str], every_n: int = 3):
        self.inner = inner
        self.every_n = every_n
        self._seen: set[str] = set()

    def __call__(self, request: str) -> str:
        digest = hashlib.md5(request.encode()).hexdigest()
        if digest not in self._seen:
            self._seen.add(digest)
            if int(digest, 16) % self.every_n == 0:
                raise ConnectionError("injected transient fault")
        return self.inner(request)


class FailingBatchTransport:
    """Every ``every_n``-th request PERMANENTLY fails (all retries) — those
    batches must be dropped and counted, everything else unaffected."""

    def __init__(self, inner: Callable[[str], str], every_n: int = 5):
        self.inner = inner
        self.every_n = every_n

    def __call__(self, request: str) -> str:
        if int(hashlib.md5(request.encode()).hexdigest(), 16) % self.every_n == 0:
            raise TimeoutError("injected permanent fault")
        return self.inner(request)


class NoisyTransport:
    """Corrupt the structured output deterministically: in every
    ``every_n``-th response, the first node entry loses its name (schema
    violation → dropped+counted) and a dangling edge to an unknown node is
    appended (→ filtered+counted)."""

    def __init__(self, inner: Callable[[str], str], every_n: int = 4):
        self.inner = inner
        self.every_n = every_n

    def __call__(self, request: str) -> str:
        response = self.inner(request)
        if int(hashlib.md5(request.encode()).hexdigest(), 16) % self.every_n != 0:
            return response
        payload = json.loads(response)
        for entry in payload["results"]:
            if entry["nodes"]:
                entry["nodes"][0] = {"type": entry["nodes"][0].get("type")}
            entry["edges"].append(
                {
                    "source": "HallucinatedEntity",
                    "target": "AnotherHallucination",
                    "relationship_name": "imagines",
                }
            )
            break
        return json.dumps(payload)
