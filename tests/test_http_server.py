"""HTTP server twin (scripts/serve_http.py — reference main.cpp:898-945):
GET / page, POST / JSON search with the reference's validation/error shape,
answers identical to the engine it fronts, thread-served."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def http_env(spark, fixture, tmp_path_factory):
    import os
    import sys

    from websearchengine_spark.operators.serving import ServingEngine
    from websearchengine_spark.plans.block_index import build_block_index

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts"),
    )
    import serve_http

    base = tmp_path_factory.mktemp("http")
    idx = str(base / "idx")
    tdf = spark.createDataFrame(fixture.transcripts)
    build_block_index(tdf, idx, resume=False, n_buckets=4, num_partitions=4,
                      store_texts=True)
    engine = ServingEngine(idx)
    srv = serve_http.make_server(engine, port=0)  # free port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield {"url": f"http://localhost:{srv.server_address[1]}", "engine": engine}
    srv.shutdown()


def _post(url: str, body: dict):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_get_home_page(http_env):
    with urllib.request.urlopen(http_env["url"] + "/", timeout=30) as r:
        body = r.read().decode()
    assert r.status == 200 and "<form" in body and "query_type" in body


def test_post_search_matches_engine(http_env):
    from websearchengine_spark.operators.query_api import QueryType

    for qt in (0, 1):  # conjunctive, disjunctive
        status, got = _post(http_env["url"], {
            "query": "the data", "query_type": qt,
            "n_results": 5, "snippet_len": 60,
        })
        assert status == 200
        exp = http_env["engine"].search(
            "the data", query_type=QueryType(qt), n_results=5, snippet_len=60
        )
        # `time`/`cached` vary per call; the ranked payload must be equal
        assert got["count"] == exp["count"]
        assert [
            (d["rank"], d["score"], d["freqs"], d["conv_id"],
             d["turn_idx"], d["snippet"])
            for d in got["data"]
        ] == [
            (d["rank"], d["score"], [list(p) for p in d["freqs"]],
             d["conv_id"], d["turn_idx"], d["snippet"])
            for d in exp["data"]
        ]
        assert got["data"][0]["rank"] == 1 and "time" in got


def test_post_validation_errors_reference_shape(http_env):
    # main.cpp:913-925: non-positive snippet_len / n_results → 400 {"message"}
    for body, msg in (
        ({"query": "x", "query_type": 0, "n_results": 5, "snippet_len": 0},
         "Invalid value for snippet_len"),
        ({"query": "x", "query_type": 0, "n_results": 0, "snippet_len": 60},
         "Invalid value for n_results"),
    ):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(http_env["url"], body)
        assert ei.value.code == 400
        assert json.loads(ei.value.read())["message"] == msg
    # semantic without an embeddings table → engine error surfaces as 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(http_env["url"], {"query": "x", "query_type": 2,
                                "n_results": 5, "snippet_len": 60})
    assert ei.value.code == 400
    # malformed JSON → 400 (main.cpp:940-942)
    req = urllib.request.Request(http_env["url"], data=b"{not json",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # unknown path → 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(http_env["url"] + "/nope", timeout=30)
    assert ei.value.code == 404


def test_post_chunked_body_equals_content_length(http_env):
    """A legal Transfer-Encoding: chunked POST (no Content-Length — the
    reference's httplib accepts these) must parse the body, not read it as
    empty and 400. Answer must equal the Content-Length twin."""
    import http.client

    body = {"query": "the data", "snippet_len": 80, "n_results": 5,
            "query_type": 0}
    raw = json.dumps(body).encode()
    host, port = http_env["url"].split("//")[1].split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.putrequest("POST", "/")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.putheader("Content-Type", "application/json")
        conn.endheaders()
        for part in (raw[:7], raw[7:]):  # two chunks exercise the loop
            conn.send(b"%x\r\n" % len(part) + part + b"\r\n")
        conn.send(b"0\r\n\r\n")
        resp = conn.getresponse()
        out = json.loads(resp.read())
    finally:
        conn.close()
    assert resp.status == 200
    st, twin = _post(http_env["url"], body)
    assert st == 200
    assert out["data"] == twin["data"] and out["count"] == twin["count"]


def test_post_highlight_opt_in(http_env):
    """P14 server-side: highlight=true bolds query terms in snippets exactly
    as functions/highlight.py (the index.html:93-104 port); the cached
    un-highlighted result must stay pristine (no cache poisoning)."""
    from websearchengine_spark.functions.highlight import highlight_snippet

    body = {"query": "the data", "query_type": 1,
            "n_results": 5, "snippet_len": 60}
    _, plain_before = _post(http_env["url"], body)
    _, hl = _post(http_env["url"], {**body, "highlight": True})
    assert hl["data"], "fixture query should match"
    assert [d["snippet"] for d in hl["data"]] == [
        highlight_snippet(d["snippet"], "the data") for d in plain_before["data"]
    ]
    assert any("<b>" in d["snippet"] for d in hl["data"])
    # a plain request AFTER a highlighted one (cache-hit path) is unchanged
    _, plain_after = _post(http_env["url"], body)
    assert [d["snippet"] for d in plain_after["data"]] == [
        d["snippet"] for d in plain_before["data"]
    ]


def test_concurrent_posts_consistent(http_env):
    from concurrent.futures import ThreadPoolExecutor

    def one(i):
        q = ["the data", "spark", "value row"][i % 3]
        return _post(http_env["url"], {
            "query": q, "query_type": 1, "n_results": 5, "snippet_len": 60,
        })

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(24)))
    by_q: dict = {}
    for i, (status, got) in enumerate(results):
        assert status == 200
        key = i % 3
        ranked = [(d["rank"], d["score"]) for d in got["data"]]
        assert by_q.setdefault(key, ranked) == ranked  # stable under threads
