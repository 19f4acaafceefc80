"""E10 transport seam over REAL HTTP — round-5 verdict item 8.

An in-process ``ThreadingHTTPServer`` on 127.0.0.1 serves both transport
shapes (the native batch contract and an OpenAI-style ``/chat/completions``
endpoint, cf. LLMGateway.py:74), and LLMExtractor drives it from Spark
python workers via mapInPandas — proving the seam's contract crosses a
process/socket boundary, not just an in-process double: request
serialization, headers, status-code faults, retry, and response parsing.

No external network: everything binds to loopback on an ephemeral port.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from cognee_spark.operators.extraction import extract_from_chunks
from cognee_spark.operators.llm import (
    HttpTransport,
    LLMExtractor,
    OpenAIChatTransport,
    reference_transport,
)

from tests.test_llm import chunks  # noqa: F401  (module-scoped corpus fixture)


class _StubHandler(BaseHTTPRequestHandler):
    """Three routes: /native (batch contract), /flaky (503 on the first
    attempt of every distinct body, then native), /v1/chat/completions
    (OpenAI envelope around the native contract, auth-checked)."""

    server_version = "kg-stub/1"

    def log_message(self, *args):  # keep pytest output clean
        pass

    def _read(self) -> str:
        return self.rfile.read(int(self.headers["Content-Length"])).decode("utf-8")

    def _send(self, code: int, body: str):
        payload = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        body = self._read()
        state = self.server.stub_state
        if self.path == "/native":
            self._send(200, reference_transport(body))
        elif self.path == "/flaky":
            with state["lock"]:
                first = body not in state["seen"]
                state["seen"].add(body)
            if first:
                state["faults"] += 1
                self._send(503, '{"error": "try again"}')
            else:
                self._send(200, reference_transport(body))
        elif self.path == "/v1/chat/completions":
            if self.headers.get("Authorization") != "Bearer test-key":
                self._send(401, '{"error": "missing auth"}')
                return
            envelope = json.loads(body)
            state["chat_requests"].append(envelope)
            native_request = envelope["messages"][-1]["content"]
            completion = {
                "id": "cmpl-stub",
                "object": "chat.completion",
                "model": envelope["model"],
                "choices": [
                    {
                        "index": 0,
                        "finish_reason": "stop",
                        "message": {
                            "role": "assistant",
                            "content": reference_transport(native_request),
                        },
                    }
                ],
            }
            self._send(200, json.dumps(completion))
        else:
            self._send(404, '{"error": "no such route"}')


@pytest.fixture(scope="module")
def stub_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    server.stub_state = {
        "lock": threading.Lock(),
        "seen": set(),
        "faults": 0,
        "chat_requests": [],
    }
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server
    server.shutdown()
    thread.join(timeout=5)


def _base(server) -> str:
    host, port = server.server_address
    return f"http://{host}:{port}"


def _rows(df):
    return {
        (r.row_kind, r.name, r.kind, r.rel, r.dst, r.chunk_id)
        for r in df.collect()
    }


def test_http_transport_matches_deterministic_kernel(spark, chunks, stub_server):  # noqa: F811
    """Native contract over a real socket from executor python workers:
    byte-identical rows to the deterministic kernel, zero faults."""
    llm = LLMExtractor(HttpTransport(_base(stub_server) + "/native"), batch_size=16)
    expected = _rows(extract_from_chunks(chunks))
    assert expected, "corpus must produce extraction rows for this test to bite"
    assert _rows(llm(chunks)) == expected
    m = llm.stage_metrics()
    assert m["llm_requests"] > 0
    assert m["skipped_batches"] == m["skipped_rows"] == m["llm_retries"] == 0


def test_http_503_is_retried_to_convergence(spark, chunks, stub_server):  # noqa: F811
    """Every distinct request 503s once server-side; urllib raises HTTPError,
    the retry ladder recovers, output is unchanged and retries are visible."""
    llm = LLMExtractor(
        HttpTransport(_base(stub_server) + "/flaky"), batch_size=16,
        max_retries=3, backoff_sec=0.01,
    )
    assert _rows(llm(chunks)) == _rows(extract_from_chunks(chunks))
    m = llm.stage_metrics()
    assert m["llm_retries"] >= 1
    assert m["skipped_batches"] == 0
    assert stub_server.stub_state["faults"] >= 1


def test_openai_chat_transport_round_trip(spark, chunks, stub_server):  # noqa: F811
    """OpenAI-shaped serving (reference parity): auth header, messages +
    response_format envelope out, assistant-content envelope back — and the
    extractor output is still bit-identical to the deterministic kernel."""
    llm = LLMExtractor(
        OpenAIChatTransport(
            _base(stub_server) + "/v1", model="kg-test", api_key="test-key"
        ),
        batch_size=16,
    )
    assert _rows(llm(chunks)) == _rows(extract_from_chunks(chunks))
    sent = stub_server.stub_state["chat_requests"]
    assert sent, "stub saw no chat.completions traffic"
    env = sent[0]
    assert env["model"] == "kg-test"
    assert env["response_format"] == {"type": "json_object"}
    assert env["temperature"] == 0
    assert env["messages"][0]["role"] == "system"
    json.loads(env["messages"][-1]["content"])  # user content is the native batch JSON


def test_missing_auth_is_a_counted_skip(spark, chunks, stub_server):  # noqa: F811
    """A 401 (no api_key configured) exhausts retries and lands as skipped
    batches + zero rows — fail-soft with counters, exactly like the
    reference's per-datapoint skip, never a crash or silent success."""
    llm = LLMExtractor(
        OpenAIChatTransport(_base(stub_server) + "/v1", api_key=None),
        batch_size=1000, max_retries=1, backoff_sec=0.01,
    )
    out = llm(chunks)
    assert out.count() == 0
    m = llm.stage_metrics()
    assert m["skipped_batches"] >= 1
