"""S8 — REST parsing API, stdlib-only (reference ``api/main.py``).

The reference serves its parser over FastAPI/uvicorn with four routes;
this mirrors the JSON contract byte-for-byte on ``http.server`` (no
third-party web framework is available in this container, and a serving
endpoint must not drag Spark into the request path anyway):

- ``GET /`` and ``GET /health`` → HealthResponse
  (``api/main.py:114-126``)
- ``POST /parse`` → ParseResponse with ``inference_time_ms``
  (``api/main.py:130-179``; request validation per ``schemas.py:154-168``:
  address length 5..500, optional ``return_confidence``)
- ``POST /parse/batch`` → BatchParseResponse with total/avg timing,
  max 100 addresses (``api/main.py:183-222``)
- ``GET /parse/<address>`` → bare ParsedAddress (``api/main.py:226-239``)

Every response carries the reference's ``X-Response-Time-Ms`` timing
header (``api/main.py:104-110``). Model loading follows the reference's
startup fallback (``api/main.py:39-58``): ``MODEL_PATH`` pointing at a
converted npz checkpoint loads the numpy BERT-CRF tagger; otherwise
rules-only — which is byte-parity with the reference's own shipped
behavior, since its trained weights are stripped from the repo.

Scale note: this is the reference's SINGLE-NODE serving surface, kept
single-node on purpose — batch/set-scale parsing goes through the Spark
operators (``operators/extract.py``). The handler is threaded
(ThreadingHTTPServer) and the parser is loaded once per process, like
the reference's lifespan hook.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from indian_address_parser_spark.core.parse import flatten_fields, parse_address
from indian_address_parser_spark.core.schemas import Span

VERSION = "2.1.0"  # reference api/main.py:125 — contract parity

# ParsedAddress computed-accessor order (reference schemas.py:93-151);
# values come from the shared flatten_fields, renamed where the ER
# pipeline uses a different column name.
_ACCESSOR_TO_FLAT = (
    ("house_number", "house_no"),
    ("floor", "floor"),
    ("block", "block"),
    ("gali", "gali"),
    ("colony", "colony"),
    ("area", "area"),
    ("subarea", "subarea"),
    ("sector", "sector"),
    ("khasra", "khasra"),
    ("pincode", "pincode"),
    ("city", "city"),
    ("state", "state"),
)


class RulesParser:
    """Rules-only parser — the reference API's fallback (and, with its
    weights stripped, actual) serving mode."""

    model_loaded = False

    def parse(self, raw: str) -> tuple[str, list[Span]]:
        return parse_address(raw)


class BertCrfParser:
    """Numpy BERT-CRF serving path over a converted npz checkpoint."""

    model_loaded = True

    def __init__(self, model_path: str):
        from indian_address_parser_spark.core import refine
        from indian_address_parser_spark.core.parse import preprocess
        from indian_address_parser_spark.operators.tagger import BertCrfTagger

        self._tagger = BertCrfTagger(model_path)
        self._refine = refine.refine
        self._preprocess = preprocess

    def parse(self, raw: str) -> tuple[str, list[Span]]:
        if not raw or not raw.strip():
            return "", []
        normalized = self._preprocess(raw)
        spans = self._tagger.tag_batch([normalized])[0]
        return normalized, self._refine(normalized, spans)


def load_parser(model_path: str | None = None):
    """Reference startup fallback (api/main.py:44-58): model dir with a
    loadable checkpoint → model parser; anything else → rules-only."""
    model_path = model_path or os.environ.get("MODEL_PATH", "")
    if model_path and os.path.exists(os.path.join(model_path, "weights.npz")):
        return BertCrfParser(model_path)
    return RulesParser()


def parsed_address_dict(
    raw: str, normalized: str, spans: list[Span], confidence: bool = True
) -> dict:
    """ParsedAddress JSON: raw/normalized, entities, computed accessors."""
    entities = [
        {
            "label": sp.label,
            "value": sp.value,
            "start": sp.start,
            "end": sp.end,
            "confidence": sp.confidence if confidence else 1.0,
        }
        for sp in spans
    ]
    flat = flatten_fields(spans)
    out = {"raw_address": raw, "normalized_address": normalized, "entities": entities}
    for accessor, flat_key in _ACCESSOR_TO_FLAT:
        out[accessor] = flat[flat_key]
    return out


def _validation_error(loc: str, msg: str) -> dict:
    # FastAPI/pydantic 422 body shape
    return {"detail": [{"loc": ["body", loc], "msg": msg, "type": "value_error"}]}


def make_handler(parser):
    class Handler(BaseHTTPRequestHandler):
        server_version = "indian-address-parser-spark"

        def log_message(self, *args):  # quiet; tests assert bodies, not logs
            pass

        # -- plumbing ----------------------------------------------------
        def _send(self, code: int, body: dict, started: float) -> None:
            data = json.dumps(body).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Access-Control-Allow-Origin", "*")  # CORS parity
            self.send_header(
                "X-Response-Time-Ms",
                f"{(time.perf_counter() - started) * 1000:.2f}",
            )
            self.end_headers()
            self.wfile.write(data)

        def _read_json(self):
            length = int(self.headers.get("Content-Length", "0"))
            try:
                return json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                return None

        # -- routes ------------------------------------------------------
        def do_GET(self):
            started = time.perf_counter()
            # split the query string off the RAW request target first (an
            # encoded %3F inside the address must survive), then unquote —
            # same order as any RFC-3986 server, incl. the reference's
            path = urllib.parse.unquote(self.path.split("?", 1)[0])
            if path in ("/", "/health"):
                self._send(
                    200,
                    {
                        "status": "healthy",
                        "model_loaded": parser.model_loaded,
                        "version": VERSION,
                    },
                    started,
                )
                return
            if path.startswith("/parse/"):
                address = path[len("/parse/"):]
                try:
                    normalized, spans = parser.parse(address)
                    self._send(
                        200, parsed_address_dict(address, normalized, spans), started
                    )
                except Exception as e:  # reference returns 500 with detail
                    self._send(500, {"detail": str(e)}, started)
                return
            self._send(404, {"detail": "Not Found"}, started)

        def do_POST(self):
            started = time.perf_counter()
            body = self._read_json()
            if body is None:
                self._send(422, _validation_error("", "invalid JSON"), started)
                return
            if self.path == "/parse":
                self._handle_parse(body, started)
            elif self.path == "/parse/batch":
                self._handle_batch(body, started)
            else:
                self._send(404, {"detail": "Not Found"}, started)

        def _handle_parse(self, body: dict, started: float) -> None:
            address = body.get("address")
            # ParseRequest (schemas.py:154-168): str_strip_whitespace=True
            # runs BEFORE the 5..500 length constraint, and the stripped
            # value is what the handler parses
            if isinstance(address, str):
                address = address.strip()
            if not isinstance(address, str) or not (5 <= len(address) <= 500):
                self._send(
                    422,
                    _validation_error(
                        "address", "address must be a string of length 5..500"
                    ),
                    started,
                )
                return
            confidence = bool(body.get("return_confidence", True))
            try:
                t0 = time.perf_counter()
                normalized, spans = parser.parse(address)
                ms = (time.perf_counter() - t0) * 1000
                self._send(
                    200,
                    {
                        "success": True,
                        "result": parsed_address_dict(
                            address, normalized, spans, confidence
                        ),
                        "error": None,
                        "inference_time_ms": round(ms, 3),
                    },
                    started,
                )
            except Exception as e:
                self._send(500, {"detail": str(e)}, started)

        def _handle_batch(self, body: dict, started: float) -> None:
            addresses = body.get("addresses")
            # BatchParseRequest (schemas.py:171-176): pydantic validates
            # list[str] with min_length=1, max_length=100 BEFORE the
            # handler body runs — so >100 items and non-string items are
            # both 422s (the handler's own "max 100 → 400" branch at
            # api/main.py:206 is dead code behind the schema). Items are
            # NOT whitespace-stripped (no str_strip_whitespace here).
            if (
                not isinstance(addresses, list)
                or not addresses
                or len(addresses) > 100
                or not all(isinstance(a, str) for a in addresses)
            ):
                self._send(
                    422,
                    _validation_error(
                        "addresses", "a list of 1..100 strings is required"
                    ),
                    started,
                )
                return
            confidence = bool(body.get("return_confidence", True))
            try:
                t0 = time.perf_counter()
                results = []
                for addr in addresses:
                    normalized, spans = parser.parse(addr)
                    results.append(
                        parsed_address_dict(addr, normalized, spans, confidence)
                    )
                total_ms = (time.perf_counter() - t0) * 1000
                self._send(
                    200,
                    {
                        "success": True,
                        "results": results,
                        "total_inference_time_ms": round(total_ms, 3),
                        "avg_inference_time_ms": round(total_ms / len(addresses), 3),
                    },
                    started,
                )
            except Exception as e:
                self._send(500, {"detail": str(e)}, started)

    return Handler


def serve(host: str = "0.0.0.0", port: int = 8080, model_path: str | None = None):
    """Build the server (bound, not yet serving). Port 0 picks a free port."""
    parser = load_parser(model_path)
    srv = ThreadingHTTPServer((host, port), make_handler(parser))
    srv.parser = parser  # introspection for CLIs/tests
    return srv
