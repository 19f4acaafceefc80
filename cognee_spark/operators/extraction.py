"""Mention-detection + relation extraction — E1/E2/E6/E8 of SURVEY.md §2.3.

Two deterministic extractors, both vectorized over Arrow batches (one Python
invocation per ~10k rows, never per-row):

- **code mode** (python/go/js/java): a line-scanning fact extractor over the
  full file content, producing the enola fact kinds — module, class, method,
  function, dependency, route — and raw relations (imports, calls,
  has_method, exposes). Mirrors cognee's external-binary fact source +
  mapping (cognee/tasks/code_graph/enola.py:76-186,
  extract_code_graph.py:90-154); resolution happens later as Spark joins.

- **nl mode** (markdown / prose): statement-pattern extraction into the
  KnowledgeGraph{nodes, edges} IR (cognee/shared/data_models.py:49-77) — the
  deterministic stand-in for the LLM structured-output call
  (extract_content_graph.py:15-47). A real LLM endpoint slots in behind the
  same batch signature (`extract_nl(texts) -> rows`); swap is config, not
  rewrite.

Output is a single tall "extractions" frame (row_kind ∈ {mention, edge}) so
one parse of the input yields both the mentions and raw_edges tables — the
stage writes it once and derives both with narrow filters, avoiding a second
scan of `content` at 100 TB.

Dangling-edge filtering (extract_graph_from_data.py:188-196) is NOT done here:
it is a semi-join against mentions in the linking stage, where Catalyst can
broadcast or shuffle as the sizes dictate.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- shared helpers -----------------------------------------------------------


def module_from_path(path: str) -> str:
    """src/pkg0/mod3.py → pkg0.mod3 (the file's module identity)."""
    p = path
    if p.startswith("src/"):
        p = p[4:]
    p = re.sub(r"\.[A-Za-z0-9]+$", "", p)
    return p.replace("/", ".")


# row: (row_kind, name, kind, rel, dst, description)
#   mention: name=qualified entity name, kind=entity kind, rel/dst empty
#   edge:    name=src entity name, rel=relation, dst=target (possibly bare)


def _mention(name: str, kind: str) -> dict:
    return {"row_kind": "mention", "name": name, "kind": kind, "rel": None, "dst": None}


def _edge(src: str, rel: str, dst: str) -> dict:
    return {"row_kind": "edge", "name": src, "kind": None, "rel": rel, "dst": dst}


# --- code extractors -----------------------------------------------------------

_PY_EXT_IMPORT = re.compile(r"^import\s+([\w.]+)\s*$")
_PY_FROM_IMPORT = re.compile(r"^from\s+([\w.]+)\s+import\b")
_PY_DEF = re.compile(r"^def\s+(\w+)\s*\(")
_PY_CLASS = re.compile(r"^class\s+(\w+)\b")
_PY_METHOD = re.compile(r"^\s+def\s+(\w+)\s*\(")
_PY_ROUTE = re.compile(r"""^@app\.\w+\(["']([^"']+)["']\)""")
_CALL = re.compile(r"\breturn\s+(\w+)\s*\(")

_GO_FUNC = re.compile(r"^func\s+(\w+)\s*\(")
_GO_METHOD = re.compile(r"^func\s+\(\w+\s+\*?(\w+)\)\s+(\w+)\s*\(")
_GO_TYPE = re.compile(r"^type\s+(\w+)\s+struct\b")
_GO_IMPORT = re.compile(r'^\s+"([^"]+)"')

_JS_REQUIRE = re.compile(r"""require\(['"]([^'"]+)['"]\)""")
_JS_IMPORT = re.compile(r"""^import\b.*\bfrom\s+['"]\./([^'"]+)['"]""")
_JS_FUNC = re.compile(r"^(?:export\s+)?function\s+(\w+)\s*\(")
_JS_CLASS = re.compile(r"^(?:export\s+)?class\s+(\w+)\b")
_JS_METHOD = re.compile(r"^\s+(\w+)\s*\(\)\s*\{")
_JS_ROUTE = re.compile(r"""^app\.\w+\(['"]([^'"]+)['"],\s*(\w+)\)""")

_JAVA_IMPORT = re.compile(r"^import\s+([\w.]+);")
_JAVA_CLASS = re.compile(r"^public\s+class\s+(\w+)\b")
_JAVA_FUNC = re.compile(r"^\s+public\s+static\s+\w+\s+(\w+)\s*\(")
_JAVA_METHOD = re.compile(r"^\s+public\s+void\s+(\w+)\s*\(\)")


def extract_code(repo: str, path: str, lang: str, content: str) -> list[dict]:
    """One file's facts + raw relations. Names are module-qualified; call
    targets stay bare for the join-based resolution ladder."""
    module = module_from_path(path)
    rows = [_mention(module, "module")]
    pending_route: str | None = None
    current_fn: str | None = None
    current_class: str | None = None

    def declare_function(short: str) -> None:
        nonlocal current_fn, current_class, pending_route
        current_fn = f"{module}.{short}"
        current_class = None
        rows.append(_mention(current_fn, "function"))
        if pending_route is not None:
            rows.append(_mention(pending_route, "route"))
            rows.append(_edge(current_fn, "exposes", pending_route))
            pending_route = None

    def declare_class(short: str) -> None:
        nonlocal current_class, current_fn
        current_class = f"{module}.{short}"
        current_fn = None
        rows.append(_mention(current_class, "class"))

    def declare_method(short: str) -> None:
        if current_class is None:
            return
        qualified = f"{current_class}.{short}"
        rows.append(_mention(qualified, "method"))
        rows.append(_edge(current_class, "has_method", qualified))

    def import_raw(target: str) -> None:
        rows.append(_edge(module, "imports_raw", target))

    def dependency(dep: str) -> None:
        rows.append(_mention(dep, "dependency"))
        rows.append(_edge(module, "depends_on_external", dep))

    for line in content.splitlines():
        if lang == "python":
            if m := _PY_EXT_IMPORT.match(line):
                dependency(m.group(1))
            elif m := _PY_FROM_IMPORT.match(line):
                import_raw(m.group(1))
            elif m := _PY_ROUTE.match(line):
                pending_route = m.group(1)
            elif m := _PY_CLASS.match(line):
                declare_class(m.group(1))
            elif m := _PY_DEF.match(line):
                declare_function(m.group(1))
            elif m := _PY_METHOD.match(line):
                declare_method(m.group(1))
        elif lang == "go":
            if m := _GO_METHOD.match(line):
                # method receiver binds to the struct type
                cls = f"{module}.{m.group(1)}"
                rows.append(_mention(f"{cls}.{m.group(2)}", "method"))
                rows.append(_edge(cls, "has_method", f"{cls}.{m.group(2)}"))
                current_fn = None
                continue
            if m := _GO_FUNC.match(line):
                declare_function(m.group(1))
            elif m := _GO_TYPE.match(line):
                declare_class(m.group(1))
            elif m := _GO_IMPORT.match(line):
                target = m.group(1)
                if target.startswith(repo + "/"):
                    import_raw(target[len(repo) + 1 :].replace("/", "."))
                else:
                    dependency(target)
        elif lang == "js":
            if m := _JS_ROUTE.match(line):
                rows.append(_mention(m.group(1), "route"))
                rows.append(_edge(f"{module}.{m.group(2)}", "exposes", m.group(1)))
            elif m := _JS_IMPORT.match(line):
                import_raw(m.group(1).replace("/", "."))
            elif m := _JS_REQUIRE.search(line):
                dependency(m.group(1))
            elif m := _JS_CLASS.match(line):
                declare_class(m.group(1))
            elif m := _JS_FUNC.match(line):
                declare_function(m.group(1))
            elif current_class and (m := _JS_METHOD.match(line)):
                declare_method(m.group(1))
        elif lang == "java":
            if m := _JAVA_IMPORT.match(line):
                import_raw(m.group(1))
            elif m := _JAVA_CLASS.match(line):
                declare_class(m.group(1))
            elif m := _JAVA_FUNC.match(line):
                # static functions are module-level symbols (enola semantics)
                current_fn = f"{module}.{m.group(1)}"
                rows.append(_mention(current_fn, "function"))
                continue
            elif m := _JAVA_METHOD.match(line):
                declare_method(m.group(1))

        if (m := _CALL.search(line)) and current_fn is not None:
            callee = m.group(1)
            if callee not in ("x",):
                rows.append(_edge(current_fn, "calls", callee))
    return rows


# --- NL extractor ---------------------------------------------------------------

_NL_VERBS = "uses|depends on|calls into|extends"
_NL_STATEMENT = re.compile(
    rf"(?m)^([A-Za-z][\w' -]*?)\s+({_NL_VERBS})\s+([A-Za-z][\w' -]*?)\.\s*$"
)


def extract_nl(text: str) -> list[dict]:
    """chunk text → KnowledgeGraph-shaped mention/edge rows.

    The deterministic stand-in for the per-chunk LLM structured-output call
    (generate_graph_prompt.txt semantics: entities + typed relations). Names
    keep their surface form; linking normalizes downstream.
    """
    rows: list[dict] = []
    for m in _NL_STATEMENT.finditer(text):
        subj, verb, obj = m.group(1).strip(), m.group(2), m.group(3).strip()
        pred = verb.replace(" ", "_")
        rows.append(_mention(subj, "entity"))
        rows.append(_mention(obj, "entity"))
        rows.append(_edge(subj, pred, obj))
    return rows


# --- Spark stage -----------------------------------------------------------------

EXTRACTION_SCHEMA = T.StructType(
    [
        T.StructField("row_kind", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("rel", T.StringType(), True),
        T.StructField("dst", T.StringType(), True),
        T.StructField("mode", T.StringType(), False),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("chunk_id", T.StringType(), True),
        T.StructField("content_sha", T.StringType(), True),
    ]
)

CODE_LANGS = ("python", "go", "js", "java")


def extract_from_files(files: DataFrame) -> DataFrame:
    """Code-mode extraction over whole files.

    Input: (repo, path, lang, content, content_sha). Narrow stage — no
    shuffle; the expensive parse happens once per file inside Arrow batches.
    """
    src = files.where(F.col("lang").isin(*CODE_LANGS)).select(
        "repo", "path", "lang", "content", "content_sha"
    )
    src = _widen(src)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = _columnar()
            for rec in pdf.itertuples(index=False):
                rows = extract_code(rec.repo, rec.path, rec.lang, rec.content)
                _append_rows(cols, rows, "code", rec.repo, rec.path, rec.lang, None, rec.content_sha)
            yield pd.DataFrame(cols)

    return src.mapInPandas(run, EXTRACTION_SCHEMA)


def _columnar() -> dict[str, list]:
    return {f.name: [] for f in EXTRACTION_SCHEMA}


def _append_rows(cols, rows, mode, repo, path, lang, chunk_id, content_sha) -> None:
    """Columnar batch assembly: one list-extend per column instead of one dict
    per output row — the pandas-DataFrame construction is the fixed cost of
    the extraction hot path."""
    n = len(rows)
    cols["row_kind"].extend(r["row_kind"] for r in rows)
    cols["name"].extend(r["name"] for r in rows)
    cols["kind"].extend(r["kind"] for r in rows)
    cols["rel"].extend(r["rel"] for r in rows)
    cols["dst"].extend(r["dst"] for r in rows)
    cols["mode"].extend([mode] * n)
    cols["repo"].extend([repo] * n)
    cols["path"].extend([path] * n)
    cols["lang"].extend([lang] * n)
    cols["chunk_id"].extend([chunk_id] * n)
    cols["content_sha"].extend([content_sha] * n)


def _widen(src: DataFrame) -> DataFrame:
    """Ensure a Python-parse stage gets at least 2x-default-parallelism tasks.

    A compacted upstream table can scan into a handful of splits; the CPU-heavy
    Arrow-UDF stage downstream would then run that narrow regardless of
    cluster size. One round-robin repartition (no key, no skew) unlocks full
    parallelism; 2x cores keeps content-length variance from turning into
    whole-stage stragglers and overlaps Python parse with JVM Arrow encode.
    Skipped when the scan is already wide enough.

    Width is probed from the scan's FILE LISTING (``inputFiles`` — a metadata
    walk on the already-analyzed plan), never ``rdd.getNumPartitions()``: the
    RDD conversion forces plan re-analysis + split planning per invocation,
    which at a 100 TB scan is a driver-side stall before any task runs. Files
    under-count splits (maxPartitionBytes can split one file), so this can
    only over-widen — an extra round-robin shuffle of a table that was
    already wide enough, never a narrow stage."""
    cores = src.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(src.inputFiles())
    except Exception:  # non-file source (e.g. in-memory test frames)
        n_files = 0
    if n_files >= 2 * cores:
        return src
    return src.repartition(2 * cores)


def extract_from_chunks(chunks: DataFrame) -> DataFrame:
    """NL-mode extraction over document chunks (text + lineage columns)."""
    src = _widen(chunks.select("chunk_id", "text", "content_sha", "repo", "path", "lang"))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = _columnar()
            for rec in pdf.itertuples(index=False):
                rows = extract_nl(rec.text)
                _append_rows(
                    cols, rows, "nl", rec.repo, rec.path, rec.lang, rec.chunk_id, rec.content_sha
                )
            yield pd.DataFrame(cols)

    return src.mapInPandas(run, EXTRACTION_SCHEMA)


def mentions_of(extractions: DataFrame) -> DataFrame:
    return extractions.where(F.col("row_kind") == "mention").drop("row_kind", "rel", "dst")


def raw_edges_of(extractions: DataFrame) -> DataFrame:
    return (
        extractions.where(F.col("row_kind") == "edge")
        .withColumnRenamed("name", "src")
        .drop("row_kind", "kind")
    )
