#!/usr/bin/env python
"""HTTP serving twin of the reference's web server (main.cpp:898-945).

The reference serves GET / (index.html) and POST / with a JSON body
{"query", "snippet_len", "n_results", "query_type"} answered by the
assembled search-result object (readme.md:205-223). This is that surface
over the pyarrow ServingEngine — stdlib ``http.server`` only (no new
dependencies), threaded like httplib's default server (the engine's caches
are lock-guarded, tests pin 16-thread rank-identity):

- GET  /  → a minimal query page (functional twin of index.html:93-128 —
  a form POSTing the same JSON);
- POST /  → validation + dispatch exactly as main.cpp:909-943:
  snippet_len <= 0 / n_results <= 0 / any exception → HTTP 400 with
  {"message": ...} (report_error, main.cpp:845-851); query_type is the
  reference's enum int (0 conj, 1 disj, 2 semantic, 3 rerank).
- Optional ``"highlight": true`` in the POST body applies the browser-side
  P14 emphasis (index.html:93-104, ported in functions/highlight.py) to
  each result's snippet SERVER-side; absent/false keeps the reference's
  exact response (the reference never highlights on the server).

Run:  python scripts/serve_http.py --index IDX [--port 8080]
      [--transcripts T.parquet] [--embeddings E.parquet]
Test: tests/test_http_server.py drives a thread-served instance end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOME_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>WebSearchEngine (PySpark rebuild)</title></head>
<body>
<h3>WebSearchEngine &mdash; PySpark rebuild</h3>
<form onsubmit="return go()">
  <input id="q" size="60" placeholder="query">
  <select id="t"><option value="0">conjunctive</option>
    <option value="1">disjunctive</option>
    <option value="2">semantic</option>
    <option value="3">reranking</option></select>
  <button>search</button>
</form>
<pre id="out"></pre>
<script>
async function go() {
  const body = {query: document.getElementById('q').value,
                query_type: parseInt(document.getElementById('t').value),
                n_results: 10, snippet_len: 120};
  const r = await fetch('/', {method: 'POST', body: JSON.stringify(body)});
  document.getElementById('out').textContent =
      JSON.stringify(await r.json(), null, 2);
  return false;
}
</script>
</body></html>
"""


def _json_default(o):
    # numpy scalars ride along in assembled results; .item() unwraps them
    return o.item() if hasattr(o, "item") else str(o)


def make_handler(engine):
    from websearchengine_spark.operators.query_api import QueryType

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet (stderr stays clean)
            pass

        def _send(self, status: int, payload: str, ctype: str) -> None:
            body = payload.encode("utf-8")
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, msg: str) -> None:
            # report_error (main.cpp:845-851): 400 + {"message": msg}
            self._send(400, json.dumps({"message": msg}), "application/json")

        def _read_body(self) -> bytes:
            """Request body per HTTP/1.1: Content-Length when present, else
            chunked transfer coding. BaseHTTPRequestHandler leaves chunk
            decoding to the handler — without this, a legal chunked POST
            (the reference's httplib accepts it) read as an empty body."""
            te = (self.headers.get("Transfer-Encoding") or "").lower()
            if "chunked" in te:
                chunks = []
                while True:
                    size_line = self.rfile.readline(1026).split(b";", 1)[0]
                    size = int(size_line.strip() or b"0", 16)
                    if size == 0:
                        # trailer section ends at the blank line
                        while self.rfile.readline(1026).strip():
                            pass
                        return b"".join(chunks)
                    chunks.append(self.rfile.read(size))
                    self.rfile.read(2)  # CRLF after each chunk
            return self.rfile.read(int(self.headers.get("Content-Length", "0")))

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, HOME_PAGE, "text/html")
            else:
                self._send(404, json.dumps({"message": "not found"}),
                           "application/json")

        def do_POST(self):
            if self.path != "/":
                self._send(404, json.dumps({"message": "not found"}),
                           "application/json")
                return
            try:
                post = json.loads(self._read_body() or b"{}")
                query = str(post["query"])
                snippet_len = int(post["snippet_len"])
                if snippet_len <= 0:
                    self._error("Invalid value for snippet_len")
                    return
                n_results = int(post["n_results"])
                if n_results <= 0:
                    self._error("Invalid value for n_results")
                    return
                result = engine.search(
                    query,
                    query_type=QueryType(int(post["query_type"])),
                    n_results=n_results,
                    snippet_len=snippet_len,
                )
                if post.get("highlight") and result.get("data"):
                    from websearchengine_spark.functions.highlight import (
                        highlight_snippet,
                    )

                    # copy, never mutate: `result` may live in the engine's
                    # LRU result cache (C1) — in-place edits would poison it
                    result = dict(result)
                    result["data"] = [
                        # only rewrite a snippet that exists — an index with
                        # no texts sidecar yields snippet-less items and the
                        # response shape must not change
                        {
                            **item,
                            "snippet": highlight_snippet(
                                str(item["snippet"]), query
                            ),
                        }
                        if "snippet" in item
                        else item
                        for item in result["data"]
                    ]
                self._send(
                    200,
                    json.dumps(result, default=_json_default),
                    "application/json",
                )
            except Exception as e:  # main.cpp:940-942: any error → 400
                self._error(str(e))

    return Handler


def make_server(engine, host: str = "localhost", port: int = 0):
    """ThreadingHTTPServer bound to (host, port); port 0 picks a free one
    (tests). Caller runs ``serve_forever`` (blocking) or a thread."""
    return ThreadingHTTPServer((host, port), make_handler(engine))


def main() -> int:
    from websearchengine_spark.operators.serving import ServingEngine

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--index", required=True, help="block index directory")
    ap.add_argument("--transcripts", default=None,
                    help="raw transcripts parquet (snippet fallback when the "
                         "index has no texts sidecar)")
    ap.add_argument("--embeddings", default=None,
                    help="embeddings parquet enabling semantic/rerank types")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--parallel-workers", type=int, default=0,
                    help="process-pool size for within-query parallel decode "
                         "of dense cold queries (0 = single-process)")
    args = ap.parse_args()
    engine = ServingEngine(
        args.index,
        transcripts_path=args.transcripts,
        embeddings_path=args.embeddings,
        parallel_workers=args.parallel_workers,
    )
    srv = make_server(engine, args.host, args.port)
    print(f"Server is running on http://{args.host}:{srv.server_address[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
