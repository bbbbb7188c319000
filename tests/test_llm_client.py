"""OpenAIChatClient against an in-process OpenAI-compatible mock server."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from radzero_tpu.preprocess.keyphrases import LLMKeyPhraseExtractor, extract_key_phrases
from radzero_tpu.preprocess.llm_client import OpenAIChatClient


class _Handler(BaseHTTPRequestHandler):
    fail_first = 0  # transport failures before succeeding
    fail_code = 500
    requests_seen = []

    def do_POST(self):  # noqa: N802
        cls = type(self)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls.requests_seen.append(body)
        if cls.fail_first > 0:
            cls.fail_first -= 1
            self.send_response(cls.fail_code)
            self.end_headers()
            return
        user = body["messages"][1]["content"]
        phrases = ["There is consolidation of the left lower lobe"]
        if "normal" in user:
            phrases = ["There is no acute cardiopulmonary process"]
        resp = {"choices": [{"message": {"role": "assistant",
                                         "content": json.dumps(phrases)}}]}
        data = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture
def mock_server():
    _Handler.fail_first = 0
    _Handler.fail_code = 500
    _Handler.requests_seen = []
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def test_chat_client_roundtrip(mock_server):
    client = OpenAIChatClient(mock_server, model="test-model", max_tokens=64)
    raw = client("sys prompt", "Report: consolidation.")
    assert json.loads(raw) == ["There is consolidation of the left lower lobe"]
    sent = _Handler.requests_seen[-1]
    assert sent["model"] == "test-model"
    assert sent["messages"][0] == {"role": "system", "content": "sys prompt"}


def test_chat_client_transport_retry(mock_server):
    _Handler.fail_first = 2
    client = OpenAIChatClient(mock_server, transport_retries=3, backoff_s=0.01)
    raw = client("s", "u")
    assert "consolidation" in raw


def test_chat_client_4xx_fails_fast(mock_server):
    """Non-429 client errors (bad auth, malformed request) are not
    retryable: fail immediately instead of burning backoff."""
    _Handler.fail_first = 5
    _Handler.fail_code = 401
    try:
        client = OpenAIChatClient(mock_server, transport_retries=5, backoff_s=10.0)
        import time

        t0 = time.perf_counter()
        with pytest.raises(RuntimeError, match="non-retryable"):
            client("s", "u")
        assert time.perf_counter() - t0 < 5.0  # no 10s backoff sleeps
        assert _Handler.fail_first == 4  # exactly one request sent
    finally:
        _Handler.fail_code = 500


def test_chat_client_no_sleep_after_final_attempt(mock_server):
    _Handler.fail_first = 10  # always 500
    client = OpenAIChatClient(mock_server, transport_retries=2, backoff_s=0.2)
    import time

    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="failed after"):
        client("s", "u")
    # one sleep (0.2s) between the two attempts, none after the last
    assert time.perf_counter() - t0 < 2.0


def test_end_to_end_extraction_with_http_client(mock_server, tmp_path):
    """LLMKeyPhraseExtractor over the HTTP client, resumable batches,
    concurrent requests — the full stage-3 flow against a live endpoint."""
    client = OpenAIChatClient(mock_server)
    extractor = LLMKeyPhraseExtractor(complete=client)
    records = [
        {"dicom_id": "a", "findings": "consolidation", "impression": ""},
        {"dicom_id": "b", "findings": "normal study", "impression": "normal"},
    ] * 3
    out = extract_key_phrases(records, extractor, str(tmp_path), batch_size=4,
                              concurrency=4)
    assert len(out) == 6
    assert out[0]["key_phrases"] == ["There is consolidation of the left lower lobe"]
    assert out[1]["key_phrases"] == ["There is no acute cardiopulmonary process"]
    # resumability: re-run consumes the batch files, no new requests
    seen = len(_Handler.requests_seen)
    out2 = extract_key_phrases(records, extractor, str(tmp_path), batch_size=4)
    assert [r["key_phrases"] for r in out2] == [r["key_phrases"] for r in out]
    assert len(_Handler.requests_seen) == seen
