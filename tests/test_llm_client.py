"""Batched-HTTP LLM enrichment client (operators/llm_client.py): transport
injection keeps every test hermetic; one test additionally drives the
real urllib transport against a local HTTP server so the retry counting
is observed server-side (across Spark's worker processes).
"""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1)


class OkTransport:
    """200 + [{"generated_text": ...}] echoing a prompt prefix."""

    def __call__(self, endpoint, payload, timeout_sec):
        return 200, [{"generated_text": "ok:" + payload["inputs"][-20:]}]


class ErrorDictTransport:
    """The reference's app.py:80-81 branch: HTTP 200 carrying an error
    dict.  Counts calls to prove the branch is NOT retried."""

    def __init__(self):
        self.calls = {}

    def __call__(self, endpoint, payload, timeout_sec):
        self.calls[payload["inputs"]] = self.calls.get(payload["inputs"], 0) + 1
        assert self.calls[payload["inputs"]] == 1, "error dict must not retry"
        return 200, {"error": "model overloaded"}


class FlakyTransport:
    """503 twice per document, then success (per-task instance state;
    the input is coalesced to one partition)."""

    def __init__(self, fail_first=2):
        self.fail_first = fail_first
        self.seen = {}

    def __call__(self, endpoint, payload, timeout_sec):
        k = payload["inputs"]
        self.seen[k] = self.seen.get(k, 0) + 1
        if self.seen[k] <= self.fail_first:
            return 503, {"error": "loading"}
        return 200, [{"generated_text": f"recovered after {self.seen[k]}"}]


class DeadTransport:
    def __call__(self, endpoint, payload, timeout_sec):
        from pdf_extraction_spark.operators.llm_client import TransportError

        raise TransportError("connection refused")


class BadRequestTransport:
    def __call__(self, endpoint, payload, timeout_sec):
        return 400, {"error": "bad payload"}


def _enrich(spark, texts, transport, **kw):
    from pdf_extraction_spark.operators.llm_client import enrich_llm_http

    kw.setdefault("endpoint", "http://example.invalid/model")
    kw.setdefault("backoff_sec", 0.01)
    return enrich_llm_http(
        _docs(spark, texts), "doc_id", "text", transport=transport, **kw
    ).collect()


def test_success_and_shared_contract_with_stub(spark):
    """Client and stub are interchangeable: same schema, same prompt
    assembly, exactly one of (generated_text, error) non-null."""
    from pdf_extraction_spark.operators.llm_stub import enrich_llm

    texts = ["alpha body", "beta body", ""]
    rows = _enrich(spark, texts, OkTransport(), task="extract the title")
    stub = enrich_llm(
        _docs(spark, texts), "doc_id", "text", task="extract the title"
    ).collect()

    # same column set AND order (tuple(asDict()) would only compare keys)
    assert rows[0].__fields__ == stub[0].__fields__
    # value contract: doc_id + prompt align row-for-row, and both sides
    # fill exactly one of (generated_text, error)
    by_id_client = {r["doc_id"]: r for r in rows}
    by_id_stub = {s["doc_id"]: s for s in stub}
    assert by_id_client.keys() == by_id_stub.keys()
    for k in by_id_client:
        assert by_id_client[k]["prompt"] == by_id_stub[k]["prompt"]
        assert (by_id_stub[k]["generated_text"] is None) != (
            by_id_stub[k]["error"] is None
        )
    for r in rows:
        assert (r["generated_text"] is None) != (r["error"] is None)
        assert r["generated_text"].startswith("ok:")


def test_error_dict_branch_not_retried(spark):
    rows = _enrich(spark, ["doc a", "doc b"], ErrorDictTransport(), max_retries=5)
    for r in rows:
        assert r["generated_text"] is None
        assert r["error"] == "api error: model overloaded"


def test_retry_then_success(spark):
    rows = _enrich(spark, ["x", "y"], FlakyTransport(fail_first=2), max_retries=3)
    for r in rows:
        assert r["error"] is None
        assert r["generated_text"] == "recovered after 3"


def test_retry_exhaustion_contained_per_row(spark):
    rows = _enrich(spark, ["x"], DeadTransport(), max_retries=2)
    (r,) = rows
    assert r["generated_text"] is None
    assert r["error"] == "transport error: connection refused (after 3 attempts)"


def test_4xx_not_retried(spark):
    rows = _enrich(spark, ["x"], BadRequestTransport(), max_retries=5)
    (r,) = rows
    assert r["generated_text"] is None
    assert r["error"].startswith("http 400:")


def test_max_input_chars_rejects_locally(spark):
    rows = _enrich(
        spark, ["tiny", "L" * 5000], OkTransport(), max_input_chars=1000
    )
    by_id = {int(r["doc_id"]): r for r in rows}
    assert by_id[0]["error"] is None
    # F16 truncation caps the prompt's PDF content at 3000 chars; the
    # oversize guard fires on the assembled prompt length
    assert by_id[1]["generated_text"] is None
    assert by_id[1]["error"].startswith("input too long:")


@pytest.fixture()
def http_server():
    """Local inference-API fake: 503 on each document's first request,
    then success; counts land server-side so retries are observed across
    Spark worker processes."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen: dict[str, int] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["content-length"]))
            )
            key = body["inputs"]
            with lock:
                seen[key] = seen.get(key, 0) + 1
                n = seen[key]
            if n == 1:
                out, code = {"error": "model loading"}, 503
            else:
                out, code = [{"generated_text": f"gen#{n}"}], 200
            data = json.dumps(out).encode()
            self.send_response(code)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/model", seen
    srv.shutdown()


def test_real_urllib_transport_against_local_server(spark, http_server):
    from pdf_extraction_spark.operators.llm_client import enrich_llm_http

    endpoint, seen = http_server
    rows = enrich_llm_http(
        _docs(spark, ["one", "two", "three"]),
        "doc_id",
        "text",
        endpoint=endpoint,
        max_retries=2,
        backoff_sec=0.01,
        timeout_sec=5.0,
        requests_per_sec=50.0,
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["error"] is None
        assert r["generated_text"] == "gen#2"
    assert all(n == 2 for n in seen.values())  # one 503 + one success each
