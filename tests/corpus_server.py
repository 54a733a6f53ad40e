"""Loopback HTTP server over the synthetic corpus — test infrastructure
for driving the production ``HttpFetcher`` end-to-end (the sandbox
analogue of the reference's live integration suites,
src/tests/integration/torrent_freak-integration.test.ts:76-79).

Acts as a fetch gateway: ``GET /<urlquoted-original-url>`` serves the
corpus html for that URL. Supports failure injection (N transient 500s
per URL, permanent 500s) and records every request's (monotonic time,
url, host) so tests can assert per-host request serialization and
politeness delay from the SERVER's point of view.
"""

from __future__ import annotations

import threading
import time
import urllib.parse
from collections import Counter
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class CorpusHTTPServer:
    def __init__(
        self,
        url_to_html: dict[str, bytes],
        fail_first: dict[str, int] | None = None,
        always_fail: set[str] | None = None,
    ):
        self.url_to_html = url_to_html
        self.fail_first = dict(fail_first or {})
        self.always_fail = set(always_fail or ())
        self.hits: list[tuple[float, str, str]] = []  # (t, url, host)
        self.counts: Counter = Counter()
        # concurrency accounting: current and max simultaneous in-flight
        # requests per host (arrival → response written), so tests can
        # assert the fetcher's per-host pool bound from the server side
        self.inflight: Counter = Counter()
        self.max_inflight: Counter = Counter()
        self.latency_sec = 0.0  # injected response latency (concurrency tests)
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                url = urllib.parse.unquote(self.path.lstrip("/"))
                host = urllib.parse.urlparse(url).netloc
                with outer._lock:
                    outer.hits.append((time.monotonic(), url, host))
                    outer.counts[url] += 1
                    outer.inflight[host] += 1
                    outer.max_inflight[host] = max(
                        outer.max_inflight[host], outer.inflight[host]
                    )
                    n_prior = outer.counts[url] - 1
                    transient = n_prior < outer.fail_first.get(url, 0)
                try:
                    self._serve(url, transient)
                finally:
                    with outer._lock:
                        outer.inflight[host] -= 1

            def _serve(self, url: str, transient: bool) -> None:
                if outer.latency_sec:
                    time.sleep(outer.latency_sec)
                if url in outer.always_fail or transient:
                    self._respond(500, b"injected failure")
                    return
                body = outer.url_to_html.get(url)
                if body is None:
                    self._respond(404, b"not found")
                    return
                self._respond(200, body)

            def _respond(self, status: int, body: bytes) -> None:
                self.send_response(status)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet test output
                pass

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def gateway(self) -> str:
        h, p = self._server.server_address[:2]
        return f"http://{h}:{p}/"

    def start(self) -> "CorpusHTTPServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def per_host_hit_times(self) -> dict[str, list[float]]:
        out: dict[str, list[float]] = {}
        with self._lock:
            for t, _url, host in self.hits:
                out.setdefault(host, []).append(t)
        return out

    def per_host_hits(self) -> dict[str, list[tuple[float, str]]]:
        """host → [(arrival time, url), ...] in arrival order."""
        out: dict[str, list[tuple[float, str]]] = {}
        with self._lock:
            for t, url, host in self.hits:
                out.setdefault(host, []).append((t, url))
        return out


class WarcGatewayServer(CorpusHTTPServer):
    """Fetch gateway backed by WARC segments + CDX index: the production
    shape — a smart proxy resolving URLs to archived records via byte
    ranges (never scanning segments). ``cdx``: url → (file, offset,
    length). Inherits the hit/in-flight accounting of CorpusHTTPServer."""

    def __init__(self, cdx: dict[str, tuple[str, int, int]], **kw):
        from ethos_spark.sources.warc import read_warc_record

        class _Lazy(dict):
            def get(self, url, default=None):
                loc = cdx.get(url)
                if loc is None:
                    return default
                _u, payload = read_warc_record(*loc)
                return payload

        super().__init__(_Lazy(), **kw)
