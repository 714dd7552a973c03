"""S8 REST API contract tests (reference ``api/main.py`` parity).

Spins the stdlib server on an ephemeral port in a thread and drives it
with http.client — no Spark, no third-party web stack.
"""

from __future__ import annotations

import http.client
import json
import threading
import urllib.parse

import pytest

from indian_address_parser_spark.serving.api import serve

ADDR = "PLOT NO752 FIRST FLOOR, BLOCK H-3, NEW DELHI, 110041"


@pytest.fixture(scope="module")
def server():
    srv = serve("127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _request(server, method, path, body=None):
    conn = http.client.HTTPConnection(*server, timeout=10)
    headers = {"Content-Type": "application/json"} if body is not None else {}
    conn.request(method, path, json.dumps(body) if body is not None else None, headers)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    headers = dict(resp.getheaders())
    conn.close()
    return resp.status, data, headers


class TestHealth:
    @pytest.mark.parametrize("path", ["/", "/health"])
    def test_health(self, server, path):
        status, body, headers = _request(server, "GET", path)
        assert status == 200
        assert body == {"status": "healthy", "model_loaded": False, "version": "2.1.0"}
        assert float(headers["X-Response-Time-Ms"]) >= 0


class TestParse:
    def test_parse_response_contract(self, server):
        status, body, _ = _request(server, "POST", "/parse", {"address": ADDR})
        assert status == 200
        assert body["success"] is True and body["error"] is None
        assert body["inference_time_ms"] > 0
        result = body["result"]
        assert result["raw_address"] == ADDR
        # the 12 ParsedAddress computed accessors are all present
        for key in (
            "house_number", "floor", "block", "gali", "colony", "area",
            "subarea", "sector", "khasra", "pincode", "city", "state",
        ):
            assert key in result
        assert result["pincode"] == "110041"
        assert result["floor"] == "FIRST FLOOR"
        labels = [e["label"] for e in result["entities"]]
        assert "PINCODE" in labels and "FLOOR" in labels
        for e in result["entities"]:
            assert set(e) == {"label", "value", "start", "end", "confidence"}

    def test_parse_matches_library_parse(self, server):
        """The HTTP surface must return EXACTLY what core.parse computes —
        no drift between the serving path and the Spark extraction path."""
        from indian_address_parser_spark.core.parse import parse_address

        _, body, _ = _request(server, "POST", "/parse", {"address": ADDR})
        normalized, spans = parse_address(ADDR)
        assert body["result"]["normalized_address"] == normalized
        assert [(e["label"], e["value"], e["start"], e["end"])
                for e in body["result"]["entities"]] == [
            (sp.label, sp.value, sp.start, sp.end) for sp in spans
        ]

    def test_return_confidence_false_strips_scores(self, server):
        _, body, _ = _request(
            server, "POST", "/parse", {"address": ADDR, "return_confidence": False}
        )
        assert all(e["confidence"] == 1.0 for e in body["result"]["entities"])

    def test_short_address_422(self, server):
        status, body, _ = _request(server, "POST", "/parse", {"address": "abc"})
        assert status == 422
        assert body["detail"][0]["loc"] == ["body", "address"]

    def test_whitespace_stripped_before_length_check(self, server):
        """ParseRequest's str_strip_whitespace runs before min_length=5:
        a 5-char address padded with spaces parses; an all-space body of
        any length is a 422."""
        status, body, _ = _request(server, "POST", "/parse", {"address": "  110041 X  "})
        assert status == 200
        assert body["result"]["raw_address"] == "110041 X"
        status, _, _ = _request(server, "POST", "/parse", {"address": " " * 40})
        assert status == 422

    def test_get_parse_drops_query_string(self, server):
        """FastAPI's {address:path} param excludes the query string."""
        quoted = urllib.parse.quote(ADDR)
        status, body, _ = _request(server, "GET", f"/parse/{quoted}?debug=1")
        assert status == 200
        assert body["raw_address"] == ADDR

    def test_get_parse_returns_bare_parsed_address(self, server):
        quoted = urllib.parse.quote(ADDR)
        status, body, _ = _request(server, "GET", f"/parse/{quoted}")
        assert status == 200
        # bare ParsedAddress: no success/inference wrapper
        assert "success" not in body and body["raw_address"] == ADDR
        assert body["pincode"] == "110041"

    def test_unknown_route_404(self, server):
        status, _, _ = _request(server, "GET", "/nope")
        assert status == 404


class TestBatch:
    def test_batch_contract(self, server):
        addrs = [ADDR, "H.NO. 123, GALI NO. 5, LAJPAT NAGAR, DELHI"]
        status, body, _ = _request(
            server, "POST", "/parse/batch", {"addresses": addrs}
        )
        assert status == 200
        assert body["success"] is True and len(body["results"]) == 2
        assert body["total_inference_time_ms"] >= body["avg_inference_time_ms"] > 0
        assert body["results"][1]["gali"] is not None

    def test_batch_limit_422(self, server):
        """Pydantic's max_length=100 on BatchParseRequest rejects with 422
        BEFORE the reference handler's own (dead) 400 branch runs."""
        status, body, _ = _request(
            server, "POST", "/parse/batch", {"addresses": ["X Y Z 12345"] * 101}
        )
        assert status == 422
        assert body["detail"][0]["loc"] == ["body", "addresses"]

    def test_batch_non_string_item_422(self, server):
        """list[str] schema: a non-string element is a 422, not a 500."""
        status, body, _ = _request(
            server, "POST", "/parse/batch", {"addresses": [ADDR, 42]}
        )
        assert status == 422
        assert body["detail"][0]["loc"] == ["body", "addresses"]

    def test_batch_empty_422(self, server):
        status, _, _ = _request(server, "POST", "/parse/batch", {"addresses": []})
        assert status == 422


class TestModelPath:
    def test_npz_checkpoint_loads_bertcrf(self, tmp_path):
        from indian_address_parser_spark.operators.bert_crf_np import (
            make_random_checkpoint,
        )
        from indian_address_parser_spark.serving.api import load_parser

        d = str(tmp_path / "ckpt")
        make_random_checkpoint(d, ["H", "NO", "12", "DELHI"], seed=3)
        parser = load_parser(d)
        assert parser.model_loaded is True
        normalized, spans = parser.parse("H NO 12 DELHI 110001")
        assert normalized  # tagger + refine ran end-to-end
        srv = serve("127.0.0.1", 0, model_path=d)
        try:
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            status, body, _ = _request(srv.server_address, "GET", "/health")
            assert status == 200 and body["model_loaded"] is True
        finally:
            srv.shutdown()

    def test_missing_model_path_falls_back_to_rules(self):
        from indian_address_parser_spark.serving.api import RulesParser, load_parser

        assert isinstance(load_parser("/nonexistent/dir"), RulesParser)
