"""Serve the S8 REST parsing API (reference ``api/main.py`` contract).

Usage:
    python jobs/serve_api.py [--port 8080] [--model-path /path/to/npz_ckpt]

Environment parity with the reference: ``PORT`` and ``MODEL_PATH`` are
honored when flags are absent (``api/main.py:44,254``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=int(os.environ.get("PORT", "8080")))
    ap.add_argument("--model-path", default=os.environ.get("MODEL_PATH"))
    args = ap.parse_args()

    from indian_address_parser_spark.serving.api import serve

    srv = serve(args.host, args.port, args.model_path)
    mode = "bert-crf" if srv.parser.model_loaded else "rules-only"
    print(f"serving on {srv.server_address} ({mode})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
