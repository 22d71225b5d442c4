"""Web status surface (cmd/lrmon analog): packed-metrics wire format,
status/metrics/search endpoints, plot aggregation (sum/delta/avg over
period buckets within a window), and the redirect/error conventions of
the reference's handlers (handlers.go:26-58)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from letarette_spark.monitoring import (
    STATUS_IN_SYNC,
    STATUS_INCOMPLETE_SHARDGROUP,
    IndexStatus,
    StatusMonitor,
)
from letarette_spark.query.executor import Hit, SearchResult
from letarette_spark.webmon import MonitorServer, pack_metrics, unpack_metrics


def _status(index_id, shard_index=0, size=1, docs=100):
    return IndexStatus(
        index_id=index_id, version="1.0.0", doc_count=docs,
        last_update=1700000000.0, shardgroup_size=size,
        shard_index=shard_index, status=STATUS_IN_SYNC,
    )


class StubSearcher:
    def __init__(self):
        self.calls = []

    def search(self, query, spaces=None, limit=10, **kw):
        self.calls.append((query, spaces, limit))
        return SearchResult(
            hits=[Hit(space="docs", doc_id="d1", rowid=1, score=-1.5,
                      snippet="hello <b>world</b>")],
            total_hits=1, capped=False,
        )


def test_pack_metrics_roundtrip():
    values = {"docrequests": 12, "serveddocs": 7, "queryqueue": 0}
    packed = pack_metrics(values)
    assert isinstance(packed, str)
    # base64 text, substantially encoded (not plain JSON)
    assert "docrequests" not in packed
    assert unpack_metrics(packed) == values


@pytest.fixture()
def server():
    mon = MonitorServer(
        StatusMonitor(self_id="self", shardgroup_size=1, shard_index=0),
        searcher=StubSearcher(),
    )
    mon.start()
    yield mon
    mon.stop()


def _get(url, expect=200):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.read().decode(), dict(r.headers)
    except urllib.error.HTTPError as e:
        assert e.code == expect
        return e.code, e.read().decode(), dict(e.headers)


def test_status_and_metrics_endpoints(server):
    server.feed_status(_status("idx-a", docs=42))
    server.feed_metrics("idx-a", pack_metrics({"serveddocs": 5}), now=1000.0)

    code, body, _ = _get(server.url + "/status.json")
    st = json.loads(body)
    assert code == 200
    assert st["checkpoint_name"] == "in sync"
    assert st["indexes"]["idx-a"]["doc_count"] == 42

    code, body, _ = _get(server.url + "/metrics.json")
    m = json.loads(body)
    assert m["idx-a"]["serveddocs"] == 5
    assert m["idx-a"]["_ts"] == 1000.0


def test_checkpoint_incomplete_shardgroup():
    mon = MonitorServer(
        StatusMonitor(self_id="self", shardgroup_size=2, shard_index=0)
    )
    # nobody covers shard 1 -> incomplete shard group (status.go:211-221)
    st = mon.status_payload(now=0.0)
    assert st["checkpoint"] == STATUS_INCOMPLETE_SHARDGROUP
    mon.feed_status(_status("other", shard_index=1, size=2), now=0.0)
    st = mon.status_payload(now=1.0)
    assert st["checkpoint"] == STATUS_IN_SYNC


def test_search_endpoint(server):
    code, body, _ = _get(server.url + "/search?q=hello+world&limit=3")
    assert code == 200
    res = json.loads(body)
    assert res["total_hits"] == 1
    assert res["hits"][0]["doc_id"] == "d1"
    assert server.searcher.calls == [("hello world", None, 3)]

    # requireParam behavior (handlers.go:52-58): missing q -> 500
    code, body, _ = _get(server.url + "/search", expect=500)
    assert code == 500 and "expected parameter" in body


def test_plot_lifecycle_and_aggregation(server):
    # samples at controlled timestamps: two per 10s bucket
    for ts, v in [(100, 1.0), (105, 3.0), (110, 10.0), (115, 20.0)]:
        server.feed_metrics("idx-a", pack_metrics({"queryqueue": v}), now=ts)

    pid = server.add_plot("idx-a", "queryqueue", "avg", period=10.0,
                          window=40.0)
    data = server.plot_data(pid, now=120.0)
    assert [p["value"] for p in data["points"]] == [2.0, 15.0]

    sid = server.add_plot("idx-a", "queryqueue", "sum", 10.0, 40.0)
    assert [p["value"] for p in server.plot_data(sid, now=120.0)["points"]] \
        == [4.0, 30.0]
    did = server.add_plot("idx-a", "queryqueue", "delta", 40.0, 40.0)
    assert [p["value"] for p in server.plot_data(did, now=120.0)["points"]] \
        == [19.0]

    # window capping (CappedByAge): old samples fall out
    assert server.plot_data(pid, now=200.0)["points"] == []

    # HTTP views of the same plot
    code, body, _ = _get(server.url + f"/plot/{pid}.json")
    assert code == 200 and json.loads(body)["method"] == "avg"
    code, body, _ = _get(server.url + f"/plot/{pid}.svg")
    assert code == 200 and body.startswith("<svg")

    server.remove_plot(pid)
    code, body, _ = _get(server.url + f"/plot/{pid}.json", expect=500)
    assert code == 500


def test_plot_rejects_degenerate_period_and_window(server):
    """period<=0 / NaN / inf would create a persistent plot whose data
    and SVG endpoints ZeroDivisionError forever — rejected at creation
    like an unknown method."""
    import pytest as _pytest

    for period, window in [(0.0, 60.0), (-5.0, 60.0), (10.0, 0.0),
                           (float("nan"), 60.0), (10.0, float("inf"))]:
        with _pytest.raises(ValueError):
            server.add_plot("idx-a", "queryqueue", "avg", period, window)
    # via HTTP: errorResponse, not a poisoned dashboard
    code, body, _ = _get(
        server.url + "/plot/add?index=idx-a&metric=m&method=avg"
        "&period=0&window=60", expect=500,
    )
    assert code == 500 and "period" in body


def test_status_feed_concurrent_with_reads(server):
    """feed_status inserts into the status dict while request threads
    iterate it — both sides now hold the server lock, so a feed storm
    during payload reads never raises 'dict changed size'."""
    import threading

    from letarette_spark.monitoring import IndexStatus

    stop = threading.Event()
    errs = []

    def feeder():
        i = 0
        while not stop.is_set():
            i += 1
            try:
                server.feed_status(
                    IndexStatus(index_id=f"dyn-{i % 50}", version="v1",
                                doc_count=i, last_update=float(i),
                                shardgroup_size=1, shard_index=0,
                                status=43),
                    now=float(i),
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)

    t = threading.Thread(target=feeder)
    t.start()
    try:
        for _ in range(300):
            payload = server.status_payload()
            assert "indexes" in payload
    finally:
        stop.set()
        t.join()
    assert errs == []


def test_plot_add_via_http_redirects(server):
    req = urllib.request.Request(
        server.url + "/plot/add?index=idx-a&metric=serveddocs&method=sum"
        "&period=5&window=60"
    )
    # urllib follows the 302; the landing page is the dashboard
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert "letarette status" in r.read().decode()
    assert any(p.metric == "serveddocs" for p in server._plots.values())

    # missing param -> 500, reference wording
    code, body, _ = _get(server.url + "/plot/add?index=x", expect=500)
    assert "expected parameter" in body

    bad = urllib.request.Request(server.url + "/nope")
    try:
        urllib.request.urlopen(bad)
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_dashboard_renders(server):
    server.feed_status(_status("idx-a"))
    server.feed_metrics("idx-a", pack_metrics({"serveddocs": 5}))
    server.add_plot("idx-a", "serveddocs", "avg", 10, 60)
    code, body, _ = _get(server.url + "/")
    assert code == 200
    assert "idx-a" in body and "in sync" in body and "/plot/" in body
