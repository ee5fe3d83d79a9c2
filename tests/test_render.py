"""JS-render enrichment stage (pipeline/render.py — reference
crawler/js_renderer.py:11-36 as a mapInPandas stage).  The container
has no browser, so the contract is pinned through an injected fake
renderer; the real playwright factory is import-gated and its gate is
tested directly."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from data_integration_system_spark.pipeline.render import (
    RENDERED_SCHEMA,
    render_pages,
)


def _fetched(spark):
    rows = [
        ("http://a.com/ok", 0, b"<html>raw</html>", "text/html; charset=utf-8", "utf-8"),
        ("http://a.com/fail", 1, b"<html>old</html>", "text/html", ""),
        ("http://b.com/doc.pdf", 1, b"%PDF-1.4", "application/pdf", ""),
        ("http://b.com/none", 2, None, "", ""),
    ]
    return spark.createDataFrame(
        rows, "url string, depth long, content binary, content_type string, charset string"
    )


def test_render_pages_contract(spark):
    """HTML rows render (content replaced, rendered=true); a failing
    render and every non-HTML row pass through byte-identical with
    rendered=false; url/depth/charset survive untouched."""

    def factory():
        def render(url: str) -> str | None:
            if url.endswith("/fail"):
                return None
            return f"<html>DOM of {url}</html>"

        return render

    out = render_pages(_fetched(spark), render_fn_factory=factory)
    assert out.schema == RENDERED_SCHEMA
    got = {r.url: r for r in out.collect()}
    assert len(got) == 4

    ok = got["http://a.com/ok"]
    assert ok.rendered and bytes(ok.content) == b"<html>DOM of http://a.com/ok</html>"
    assert ok.depth == 0 and ok.charset == "utf-8"

    fail = got["http://a.com/fail"]
    assert not fail.rendered and bytes(fail.content) == b"<html>old</html>"

    pdf = got["http://b.com/doc.pdf"]
    assert not pdf.rendered and bytes(pdf.content) == b"%PDF-1.4"

    none = got["http://b.com/none"]
    assert not none.rendered and none.content is None


def test_render_pages_throwing_renderer_is_data(spark):
    """A renderer that RAISES (not just returns None) must still yield
    errors-as-data rows, never fail the stage."""

    def factory():
        def render(url: str) -> str | None:
            raise RuntimeError("browser crashed")

        return render

    out = render_pages(_fetched(spark), render_fn_factory=factory).collect()
    assert len(out) == 4
    assert not any(r.rendered for r in out)
    by_url = {r.url: r for r in out}
    assert bytes(by_url["http://a.com/ok"].content) == b"<html>raw</html>"


def test_render_pages_pool_bound(spark):
    """In-flight renders per partition never exceed pool_size — the
    reference's 2-page pool semantics (js_renderer.py:5).  The fake
    runs in a separate Python worker process, so the bound is pinned
    STRUCTURALLY: the render fn reports, per row, how many renders its
    worker had in flight when it started; the max over all rows must
    not exceed the pool size."""

    def factory():
        import time

        lock = threading.Lock()
        state = {"cur": 0, "peak": 0}

        def render(url: str) -> str | None:
            with lock:
                state["cur"] += 1
                state["peak"] = max(state["peak"], state["cur"])
                peak = state["peak"]
            time.sleep(0.05)
            with lock:
                state["cur"] -= 1
            return f"<html>peak={peak}</html>"

        return render

    rows = [(f"http://one.com/p{i}", 0, b"x", "text/html", "") for i in range(8)]
    df = spark.createDataFrame(
        rows, "url string, depth long, content binary, content_type string, charset string"
    ).coalesce(1)  # one partition => one shared pool
    out = render_pages(df, render_fn_factory=factory, pool_size=2).collect()
    assert len(out) == 8
    peaks = [int(bytes(r.content).split(b"peak=")[1].split(b"<")[0]) for r in out]
    assert max(peaks) <= 2
    assert max(peaks) == 2  # the pool actually parallelizes, too


def test_render_pages_default_factory_is_import_gated(spark):
    """Without playwright installed, the default factory must fail at
    STAGE CONSTRUCTION with a clear ImportError (not mid-job on the
    executors).  If playwright ever lands in the container this test
    flips to exercising the real factory's construction path."""
    try:
        import playwright  # noqa: F401

        pytest.skip("playwright installed; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="playwright"):
        render_pages(_fetched(spark))


def test_render_pages_repartitions_by_domain(spark):
    """The stage shares fetch's politeness shape: a domain's rows land
    in one partition (repartition on domain_of)."""

    def factory():
        def render(url: str) -> str | None:
            return "<html>x</html>"

        return render

    rows = [
        (f"http://{d}.com/p{i}", 0, b"x", "text/html", "")
        for d in ("a", "b", "c", "d")
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "url string, depth long, content binary, content_type string, charset string"
    )
    out = render_pages(df, render_fn_factory=factory)
    # every input row accounted for, all rendered
    assert out.filter(F.col("rendered")).count() == 16
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan


def test_crashed_page_is_retired_not_repooled():
    """ADVICE r8: after a goto exception the broken page must NOT go
    back into the pool (one crashed page would poison 1/pool_size of
    all later renders on a long-lived executor) — it is closed and a
    fresh browser.new_page() takes its slot; if even replacement fails
    the old page returns so the pool never shrinks."""
    import queue

    from data_integration_system_spark.pipeline.render import _render_with_pool

    class Page:
        def __init__(self, broken=False):
            self.broken, self.closed = broken, False

        def goto(self, url, **kw):
            if self.broken:
                raise RuntimeError("crash")

        def content(self):
            return "<html>ok</html>"

        def close(self):
            self.closed = True

    class Browser:
        def __init__(self, fail=False):
            self.fail = fail

        def new_page(self):
            if self.fail:
                raise RuntimeError("browser gone")
            return Page()

    bad = Page(broken=True)
    pages: queue.Queue = queue.Queue()
    pages.put(bad)
    state = {"pages": pages, "browser": Browser()}
    assert _render_with_pool(state, "http://x", 1000) is None
    assert bad.closed  # retired, not leaked
    replacement = pages.get_nowait()
    assert replacement is not bad and not replacement.broken
    pages.put(replacement)
    assert _render_with_pool(state, "http://x", 1000) == "<html>ok</html>"

    # replacement failure: the old page returns, pool size stable
    bad2 = Page(broken=True)
    pages2: queue.Queue = queue.Queue()
    pages2.put(bad2)
    state2 = {"pages": pages2, "browser": Browser(fail=True)}
    assert _render_with_pool(state2, "http://x", 1000) is None
    assert pages2.get_nowait() is bad2


def test_default_factory_forwards_pool_size(monkeypatch):
    """ADVICE r8: render_pages(pool_size=8) must hand 8 to the
    playwright pool — the bare-factory form silently capped the
    browser pool at 2 while 8 threads contended for it."""
    from data_integration_system_spark.pipeline import render as r

    seen = {}

    def fake_renderer(pool_size=r.DEFAULT_POOL_SIZE, timeout_s=r.DEFAULT_TIMEOUT_S):
        seen["pool_size"] = pool_size
        return lambda url: None

    monkeypatch.setattr(r, "playwright_renderer", fake_renderer)
    factory = r._default_factory(8)
    factory()
    assert seen["pool_size"] == 8


def test_close_worker_states_closes_every_worker_thread():
    """ADVICE r10: per-thread renderer state (a browser per worker)
    must be torn down ON its owning thread when the partition's pool
    winds down — thread-local death doesn't close chromium
    subprocesses.  Pin the barrier mechanics directly: every worker
    thread that created state gets exactly one close, ON that thread,
    and threads without state are a no-op."""
    import threading as t
    from concurrent.futures import ThreadPoolExecutor

    from data_integration_system_spark.pipeline.render import _close_worker_states

    pool_size = 4
    created: set[int] = set()
    closed: list[int] = []
    lock = t.Lock()
    tls = t.local()

    def render(url):
        tls.state = True
        with lock:
            created.add(t.get_ident())
        return None

    def close_thread_state():
        if getattr(tls, "state", None) is None:
            return
        del tls.state
        with lock:
            closed.append(t.get_ident())

    render.close_thread_state = close_thread_state
    with ThreadPoolExecutor(max_workers=pool_size) as pool:
        # create state on however many threads the pool actually spins up
        list(pool.map(render, range(16)))
        _close_worker_states(pool, pool_size, render)
    assert set(closed) == created          # every state-owning thread closed
    assert len(closed) == len(set(closed))  # exactly once each (no double close)


def test_close_worker_states_ignores_plain_renderers():
    """Fake renderers without close_thread_state (every other test
    here) must pass through untouched — no tasks submitted."""
    from concurrent.futures import ThreadPoolExecutor

    from data_integration_system_spark.pipeline.render import _close_worker_states

    with ThreadPoolExecutor(max_workers=2) as pool:
        _close_worker_states(pool, 2, lambda url: None)  # must not raise


def test_render_pages_tears_down_thread_states(spark, tmp_path):
    """End-to-end through the Spark stage (local mode shares the FS):
    a thread-affine fake records which worker threads rendered and
    which got a close — after the stage completes, every rendering
    thread must have been closed exactly once."""
    mark_dir = str(tmp_path)

    def factory(mark_dir=mark_dir):
        import os
        import threading as t

        tls = t.local()

        def render(url: str) -> str | None:
            tls.state = True
            return f"<html>tid={t.get_ident()}</html>"

        def close_thread_state():
            if getattr(tls, "state", None) is None:
                return
            del tls.state
            open(os.path.join(mark_dir, f"closed_{t.get_ident()}"), "a").write("x")

        render.close_thread_state = close_thread_state
        return render

    rows = [(f"http://one.com/p{i}", 0, b"x", "text/html", "") for i in range(8)]
    df = spark.createDataFrame(
        rows, "url string, depth long, content binary, content_type string, charset string"
    ).coalesce(1)
    out = render_pages(df, render_fn_factory=factory, pool_size=2).collect()
    import os

    rendered_tids = {
        int(bytes(r.content).split(b"tid=")[1].split(b"<")[0]) for r in out
    }
    closed_tids = {
        int(f.split("_")[1]) for f in os.listdir(mark_dir) if f.startswith("closed_")
    }
    assert rendered_tids <= closed_tids  # every rendering thread torn down
