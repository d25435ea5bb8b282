"""HTTP binding for the serving path — the reference's Django endpoints
(``SearchEngineServer/api/views.py:34-88``, ``urls.py``) re-expressed
(NOT copied) as a dependency-free WSGI app over ``SearchService``.

Endpoint contract, matched to the reference handler by handler:

``POST /search``  body ``{"query", "top_k"=20, "retrieval_method"=
"bm25", "diversity"?}`` → JSON array of result dicts (url, url_hash,
title, description, icon_url, score[, topics]) — ``raw_text`` never
leaves the server (views.py:52-53 deletes it before responding).
``diversity`` triggers MMR reranking with relevance_importance =
1 − diversity over the full result list (views.py:55-57), keyed on
PRESENCE like the reference (``'diversity' in data``). Unsupported
method → 400 ``{"error": "Retrieval method not supported"}``; bad JSON
body → 400 ``{"error": "Invalid JSON"}``; any other verb → 405
``{"error": "Invalid request method"}`` (views.py:59-61).

``POST /summarize``  body ``{"url_hash"}`` → ``{"summary": ...}``;
empty or unknown url_hash → 404 ``{"error": "Document not found"}``
(views.py:66-88); bad JSON → 400; other verbs → 405.

``POST /phrase``  body ``{"phrase", "top_k"=20}`` → same result-dict
array, scored by phrase occurrence count — an EXTENSION endpoint (no
reference counterpart; its index is position-free). 400 when the
service doesn't support it or the index lacks the positional layer.

``retrieval_method: "bm25f"`` on /search is likewise an EXTENSION
value (body + in-link anchor-text fields): 400 when the index was
built without ``anchor=True`` or the service can't run it.

The Spark session lives in the long-running server process exactly as
the reference keeps its unpickled index in the Django worker: queries
are driver-coordinated jobs, only top-k rows are collected. For
interactive-latency serving without a Spark job per request, point the
same app at ``plans.hot.HotSearchService`` — the app only needs
``search()`` and ``summarize()``. A service raising ValueError (bad
request parameters, e.g. the hot tier refusing tfidf) maps to 400;
other exceptions map to 500 like Django's unhandled-exception path.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

_STATUS = {200: "200 OK", 400: "400 Bad Request", 404: "404 Not Found",
           405: "405 Method Not Allowed",
           500: "500 Internal Server Error"}


def _json_response(start_response, status: int, payload) -> list[bytes]:
    body = json.dumps(payload).encode("utf-8")
    start_response(_STATUS[status], [
        ("Content-Type", "application/json"),
        ("Content-Length", str(len(body)))])
    return [body]


def _read_json(environ) -> dict:
    try:
        n = int(environ.get("CONTENT_LENGTH") or 0)
    except ValueError:
        n = 0
    raw = environ["wsgi.input"].read(n) if n else b""
    return json.loads(raw.decode("utf-8"))


def make_wsgi_app(service) -> Callable[[dict, Callable], Iterable[bytes]]:
    """WSGI app over anything with the ``SearchService`` surface
    (``search(query, top_k, retrieval_method, diversity)`` and
    ``summarize(url_hash)``)."""

    def handle_search(data: dict) -> tuple[int, object]:
        query = data.get("query", "")
        top_k = int(data.get("top_k", 20))
        method = str(data.get("retrieval_method", "bm25")).lower()
        # bm25|tfidf = the reference's set (views.py:41-48); bm25f is an
        # EXTENSION value — a service without the anchor field (or the
        # hot tier) raises ValueError, which the app maps to 400
        if method not in ("bm25", "tfidf", "bm25f"):
            return 400, {"error": "Retrieval method not supported"}
        diversity = (float(data.get("diversity", 0))
                     if "diversity" in data else None)
        docs = service.search(query, top_k=top_k, retrieval_method=method,
                              diversity=diversity)
        return 200, docs

    def handle_summarize(data: dict) -> tuple[int, object]:
        url_hash = data.get("url_hash", "")
        if not url_hash:
            return 404, {"error": "Document not found"}
        summary = service.summarize(url_hash)
        if summary is None:
            return 404, {"error": "Document not found"}
        return 200, {"summary": summary}

    def handle_phrase(data: dict) -> tuple[int, object]:
        # EXTENSION endpoint (not in the reference API): exact-phrase
        # retrieval over the positional layer; 400 when the index was
        # built without it (service raises ValueError)
        fn = getattr(service, "phrase_search", None)
        if fn is None:  # e.g. the hot tier — positional scans need Spark
            return 400, {"error": "Phrase search not supported"}
        phrase = data.get("phrase", "")
        top_k = int(data.get("top_k", 20))
        return 200, fn(phrase, top_k=top_k)

    routes = {"/search": handle_search, "/summarize": handle_summarize,
              "/phrase": handle_phrase}

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "")
        handler = routes.get(path.rstrip("/") or path)
        if handler is None:
            return _json_response(start_response, 404,
                                  {"error": "Not found"})
        if environ.get("REQUEST_METHOD") != "POST":
            return _json_response(start_response, 405,
                                  {"error": "Invalid request method"})
        try:
            data = _read_json(environ)
        except (json.JSONDecodeError, UnicodeDecodeError):
            return _json_response(start_response, 400,
                                  {"error": "Invalid JSON"})
        try:
            status, payload = handler(data)
        except ValueError as exc:
            # a service rejecting the request's parameters (e.g. the hot
            # tier refusing tfidf/diversity) is the caller's error
            return _json_response(start_response, 400,
                                  {"error": str(exc)})
        except Exception as exc:  # parity: Django turns these into 500s
            return _json_response(start_response, 500,
                                  {"error": str(exc)})
        return _json_response(start_response, status, payload)

    return app


def serve(service, host: str = "127.0.0.1", port: int = 8000):
    """Blocking stdlib server (wsgiref) — the single-process analog of
    the reference's ``manage.py runserver``. Returns the server object
    when ``port=0`` callers want the bound port for tests; call
    ``serve_forever()`` on it."""
    from wsgiref.simple_server import WSGIServer, make_server

    class _QuietServer(WSGIServer):
        def handle_error(self, request, client_address):  # no stderr spam
            pass

    return make_server(host, port, make_wsgi_app(service),
                       server_class=_QuietServer)
