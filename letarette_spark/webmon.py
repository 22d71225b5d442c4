"""lrmon-analog web status surface (reference: cmd/lrmon — server.go,
handlers.go, state.go, plots.go, search.go) over the monitoring registry.

The reference runs a small HTTP dashboard that subscribes to the NATS
status/metrics topics and shows per-index status, the five expvar
counters, user-configured metric plots (sum/delta/avg aggregated per
period over a sliding window, rendered as SVG), and a live search form.
Here the same surface is served with the standard library only
(ThreadingHTTPServer): shard owners feed the StatusMonitor / metric
quotes exactly as they would feed the NATS topics, and an optional
Searcher (or shard-searcher list) backs the /search endpoint.

Endpoints:
    /                     HTML dashboard (statuses, metrics, plots, search)
    /status.json          {version, checkpoint, checkpoint_name, indexes}
    /metrics.json         {index_id: {metric: value, "_ts": epoch}}
    /search?q=&spaces=&limit=   live search -> SearchResult JSON
    /plot/add?index=&metric=&method=&period=&window=[&type=]   302 -> /
    /plot/remove?id=      302 -> /
    /plot/<id>.json       aggregated buckets
    /plot/<id>.svg        polyline rendering

Metric quotes travel the same way as the reference wire format:
`pack_metrics`/`unpack_metrics` are the analog of lrmon's PackedJSON —
zlib-compressed JSON, base64 encoded (state.go:190-213, the inverse of
letarette's metrics publisher).
"""

from __future__ import annotations

import base64
import json
import threading
import time
import zlib
from dataclasses import asdict, dataclass, field
from html import escape
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from letarette_spark.monitoring import (
    STATUS_NAMES,
    VERSION,
    StatusMonitor,
)

__all__ = [
    "MonitorServer",
    "pack_metrics",
    "unpack_metrics",
]


def pack_metrics(values: dict) -> str:
    """protocol.Metrics.PackedJSON analog: base64(zlib(json))
    (state.go:190-213 unpacks exactly this)."""
    raw = json.dumps(values, sort_keys=True).encode()
    return base64.standard_b64encode(zlib.compress(raw)).decode()


def unpack_metrics(packed: str) -> dict:
    return json.loads(zlib.decompress(base64.standard_b64decode(packed)))


@dataclass
class _Plot:
    """One configured plot (plots.go:114-135): aggregation `method` over
    `period`-second buckets, keeping samples no older than `window`."""

    plot_id: str
    index: str
    metric: str
    method: str  # sum | delta | avg
    period: float
    window: float
    plot_type: str = "line"


@dataclass
class _MetricsState:
    """Per-index metric quotes + raw samples for plotting."""

    latest: dict = field(default_factory=dict)  # index -> {metric: value}
    latest_ts: dict = field(default_factory=dict)  # index -> epoch
    # (index, metric) -> list[(ts, value)], pruned to the max plot window
    samples: dict = field(default_factory=dict)


class MonitorServer:
    """The dashboard server. Feed it like the NATS topics would:

        mon = MonitorServer(StatusMonitor("self"), searcher=searcher)
        mon.feed_status(index_status(idx))
        mon.feed_metrics("idx1", pack_metrics({"querys.served": 12}))
        mon.start()          # binds 127.0.0.1:<port or ephemeral>
        ... mon.url ...
        mon.stop()
    """

    MAX_SAMPLES = 4096  # per (index, metric): bounded driver memory

    def __init__(
        self,
        monitor: StatusMonitor | None = None,
        searcher=None,
        shard_searchers: list | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self.monitor = monitor or StatusMonitor(self_id="lrmon")
        self.searcher = searcher
        self.shard_searchers = shard_searchers
        self._host, self._port = host, port
        self._metrics = _MetricsState()
        self._plots: dict[str, _Plot] = {}
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # ---------------------------------------------------------- feeding
    def feed_status(self, status, now: float | None = None) -> None:
        # serialized against status_payload: the StatusMonitor's dict is
        # plain (no lock of its own) and the ThreadingHTTPServer reads it
        # from request threads while the driver feeds it — an unlocked
        # insert during iteration raises RuntimeError mid-request
        with self._lock:
            self.monitor.update(status, now=now)

    def feed_metrics(
        self, index_id: str, packed: str, now: float | None = None
    ) -> None:
        """Accept a packed metrics quote (handleMetricsUpdate,
        state.go:174-188) and record samples for any configured plots."""
        values = unpack_metrics(packed)
        ts = time.time() if now is None else now
        with self._lock:
            self._metrics.latest[index_id] = values
            self._metrics.latest_ts[index_id] = ts
            for metric, v in values.items():
                if not isinstance(v, (int, float)):
                    continue
                key = (index_id, metric)
                buf = self._metrics.samples.setdefault(key, [])
                buf.append((ts, float(v)))
                if len(buf) > self.MAX_SAMPLES:
                    del buf[: len(buf) - self.MAX_SAMPLES]

    # ---------------------------------------------------------- plots
    def add_plot(
        self,
        index: str,
        metric: str,
        method: str,
        period: float,
        window: float,
        plot_type: str = "line",
    ) -> str:
        if method not in ("sum", "delta", "avg"):
            raise ValueError(f"unknown method {method!r}")
        # a plot with period <= 0 (or NaN/inf bounds) would persist and
        # make its data/SVG endpoints 500 forever (ZeroDivisionError in
        # the bucket index) — reject at creation like the method check
        if not (period > 0 and period < float("inf")):
            raise ValueError(f"period must be a positive finite number, got {period!r}")
        if not (window > 0 and window < float("inf")):
            raise ValueError(f"window must be a positive finite number, got {window!r}")
        plot_id = f"{index}:{metric}:{method}:{period}:{window}:{plot_type}"
        with self._lock:
            self._plots[plot_id] = _Plot(
                plot_id, index, metric, method, period, window, plot_type
            )
        return plot_id

    def remove_plot(self, plot_id: str) -> None:
        with self._lock:
            self._plots.pop(plot_id, None)

    def plot_data(self, plot_id: str, now: float | None = None) -> dict:
        """Aggregate the sample buffer into period buckets within the
        window (margaid.AggregatedBy/CappedByAge, plots.go:54-67):
        sum/avg fold the bucket; delta is last-minus-first."""
        now = time.time() if now is None else now
        with self._lock:
            plot = self._plots.get(plot_id)
            if plot is None:
                raise KeyError(plot_id)
            samples = list(
                self._metrics.samples.get((plot.index, plot.metric), ())
            )
        lo = now - plot.window
        buckets: dict[int, list[float]] = {}
        for ts, v in samples:
            if ts < lo:
                continue
            buckets.setdefault(int((ts - lo) // plot.period), []).append(v)
        points = []
        for b in sorted(buckets):
            vs = buckets[b]
            if plot.method == "sum":
                y = sum(vs)
            elif plot.method == "avg":
                y = sum(vs) / len(vs)
            else:  # delta
                y = vs[-1] - vs[0]
            points.append(
                {"t": round(lo + b * plot.period, 3), "value": round(y, 6)}
            )
        return {
            "id": plot.plot_id,
            "index": plot.index,
            "metric": plot.metric,
            "method": plot.method,
            "period": plot.period,
            "window": plot.window,
            "points": points,
        }

    def plot_svg(self, plot_id: str, now: float | None = None) -> str:
        data = self.plot_data(plot_id, now=now)
        pts = data["points"]
        w, h, pad = 480, 160, 24
        if pts:
            ys = [p["value"] for p in pts]
            ts = [p["t"] for p in pts]
            y0, y1 = min(ys), max(ys)
            t0, t1 = min(ts), max(ts)
            ys_span = (y1 - y0) or 1.0
            ts_span = (t1 - t0) or 1.0
            coords = " ".join(
                f"{pad + (p['t'] - t0) / ts_span * (w - 2 * pad):.1f},"
                f"{h - pad - (p['value'] - y0) / ys_span * (h - 2 * pad):.1f}"
                for p in pts
            )
            line = f'<polyline fill="none" stroke="black" points="{coords}"/>'
            label = f"{y0:g}..{y1:g}"
        else:
            line, label = "", "no samples"
        title = escape(
            f"{data['index']} {data['metric']} "
            f"({data['method']}/{data['period']:g}s over {data['window']:g}s)"
        )
        return (
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}">'
            f'<text x="{pad}" y="14" font-size="11">{title}</text>'
            f'<text x="{w - pad}" y="14" font-size="11" text-anchor="end">'
            f"{escape(label)}</text>{line}</svg>"
        )

    # ---------------------------------------------------------- queries
    def _do_search(self, q: str, spaces: list[str] | None, limit: int) -> dict:
        if self.shard_searchers:
            from letarette_spark.query.sharded import sharded_search

            res = sharded_search(
                self.shard_searchers, q, spaces=spaces, page_limit=limit
            )
        elif self.searcher is not None:
            res = self.searcher.search(q, spaces=spaces, limit=limit)
        else:
            raise RuntimeError("no searcher attached")
        return asdict(res)

    def status_payload(self, now: float | None = None) -> dict:
        with self._lock:
            code = self.monitor.checkpoint(now=now)
            return {
                "version": VERSION,
                "checkpoint": code,
                "checkpoint_name": STATUS_NAMES.get(code, "?"),
                "indexes": {
                    s.index_id: asdict(s) for s in self.monitor._status.values()
                },
            }

    def metrics_payload(self) -> dict:
        with self._lock:
            return {
                idx: dict(vals, _ts=self._metrics.latest_ts.get(idx))
                for idx, vals in self._metrics.latest.items()
            }

    # ---------------------------------------------------------- html
    def _dashboard(self) -> str:
        st = self.status_payload()
        rows = "".join(
            "<tr><td>{id}</td><td>{shard}</td><td>{docs}</td><td>{upd}</td>"
            "<td>{status}</td></tr>".format(
                id=escape(i),
                shard=f"{s['shard_index'] + 1}/{s['shardgroup_size']}",
                docs=s["doc_count"],
                upd=s["last_update"],
                status=escape(STATUS_NAMES.get(s["status"], "?")),
            )
            for i, s in sorted(st["indexes"].items())
        )
        mrows = "".join(
            f"<tr><td>{escape(idx)}</td><td><code>{escape(json.dumps(vals, sort_keys=True))}"
            "</code></td></tr>"
            for idx, vals in sorted(self.metrics_payload().items())
        )
        with self._lock:
            plots = "".join(
                f'<div><img src="/plot/{escape(pid)}.svg" alt="{escape(pid)}"/>'
                f' <a href="/plot/remove?id={escape(pid)}">remove</a></div>'
                for pid in self._plots
            )
        return f"""<!DOCTYPE html><html><head><title>letarette status</title>
</head><body>
<h1>letarette status</h1>
<p>version {escape(st["version"])} — cluster checkpoint:
<b>{escape(st["checkpoint_name"])}</b> ({st["checkpoint"]})</p>
<h2>Indexes</h2>
<table border="1"><tr><th>index</th><th>shard</th><th>docs</th>
<th>last update</th><th>status</th></tr>{rows}</table>
<h2>Metrics</h2>
<table border="1"><tr><th>index</th><th>values</th></tr>{mrows}</table>
<h2>Plots</h2>{plots}
<form action="/plot/add" method="get">
index <input name="index" size="8"/> metric <input name="metric" size="12"/>
method <select name="method"><option>avg</option><option>sum</option>
<option>delta</option></select>
period <input name="period" value="10" size="4"/>s
window <input name="window" value="600" size="5"/>s
<input type="submit" value="add plot"/></form>
<h2>Search</h2>
<form action="/search" method="get">
<input name="q" size="40"/> limit <input name="limit" value="10" size="3"/>
<input type="submit" value="search"/></form>
</body></html>"""

    # ---------------------------------------------------------- server
    def _handler_class(self):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype):
                data = body if isinstance(body, bytes) else body.encode()
                self.send_response(code)
                self.send_header("content-type", ctype)
                self.send_header("content-length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _redirect(self, location):  # handlers.go:36-39
                self.send_response(302)
                self.send_header("location", location)
                self.end_headers()

            def do_GET(self):
                try:
                    self._route()
                except Exception as e:  # errorResponse (handlers.go:32-34)
                    self._send(500, f"Error: {e}", "text/plain")

            def _route(self):
                parsed = urlparse(self.path)
                path = parsed.path
                q = parse_qs(parsed.query)

                def param(name, default=None):
                    v = q.get(name, [default])
                    return v[0]

                if path == "/":
                    self._send(200, outer._dashboard(), "text/html")
                elif path == "/status.json":
                    self._send(
                        200, json.dumps(outer.status_payload()),
                        "application/json",
                    )
                elif path == "/metrics.json":
                    self._send(
                        200, json.dumps(outer.metrics_payload()),
                        "application/json",
                    )
                elif path == "/search":
                    query = param("q")
                    if not query:  # requireParam (handlers.go:52-58)
                        self._send(500, 'Error: expected parameter "q"',
                                   "text/plain")
                        return
                    spaces = [s for s in q.get("spaces", []) if s] or None
                    res = outer._do_search(
                        query, spaces, int(param("limit", "10"))
                    )
                    self._send(200, json.dumps(res), "application/json")
                elif path == "/plot/add":
                    missing = [
                        p for p in ("index", "metric", "method", "period",
                                    "window")
                        if not param(p)
                    ]
                    if missing:
                        self._send(
                            500, f'Error: expected parameter "{missing[0]}"',
                            "text/plain",
                        )
                        return
                    outer.add_plot(
                        param("index"), param("metric"), param("method"),
                        float(param("period")), float(param("window")),
                        param("type", "line"),
                    )
                    self._redirect("/")
                elif path == "/plot/remove":
                    outer.remove_plot(param("id", ""))
                    self._redirect("/")
                elif path.startswith("/plot/") and path.endswith(".json"):
                    pid = path[len("/plot/"):-len(".json")]
                    self._send(
                        200, json.dumps(outer.plot_data(pid)),
                        "application/json",
                    )
                elif path.startswith("/plot/") and path.endswith(".svg"):
                    pid = path[len("/plot/"):-len(".svg")]
                    self._send(200, outer.plot_svg(pid), "image/svg+xml")
                else:
                    self._send(404, "not found", "text/plain")

        return Handler

    def start(self) -> str:
        """Bind and serve on a daemon thread; returns the base URL."""
        self._httpd = ThreadingHTTPServer(
            (self._host, self._port), self._handler_class()
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.url

    @property
    def url(self) -> str:
        assert self._httpd is not None, "not started"
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
