"""The live-HTTP SSE leg (streaming/sse_http.py): backoff/reconnect
semantics and the capture-file contract, with an injected fake stream —
zero network, zero Spark. The replay grammar itself is pinned in
test_sse_source.py; these tests prove the bytes the tail writes are
exactly the bytes the replay scanner's torn-tail contract expects."""

from __future__ import annotations

import threading

import pytest

from wikistream_lakehouse_spark.streaming.sse_http import (
    CaptureTail,
    ensure_capture_tail,
)
from wikistream_lakehouse_spark.streaming.sse_source import (
    _scan_complete,
    parse_sse_frames,
)

FRAME_A = b"event: message\nid: 1\ndata: {\"x\": 1}\n\n"
FRAME_B = b"event: message\nid: 2\ndata: {\"x\": 2}\n\n"


def _tail(tmp_path, chunks_per_connection, **kw):
    """CaptureTail whose get_stream pops one connection's chunk list per
    call; a connection list of Exception instances raises instead."""
    cap = str(tmp_path / "capture.sse")
    conns = list(chunks_per_connection)

    def get_stream():
        if not conns:
            raise StopIteration("no more scripted connections")
        conn = conns.pop(0)
        if isinstance(conn, Exception):
            raise conn
        return iter(conn)

    sleeps: list[float] = []
    t = CaptureTail(
        "http://fake/stream", cap, get_stream=get_stream,
        sleep=sleeps.append, **kw,
    )
    return t, cap, sleeps, conns


def test_run_once_appends_chunks_with_torn_tail_visible(tmp_path):
    # one connection delivers a complete frame plus HALF of the next —
    # exactly what a live socket does
    torn = FRAME_B[:10]
    t, cap, _, _ = _tail(tmp_path, [[FRAME_A, torn]])
    n = t.run_once()
    assert n == len(FRAME_A) + len(torn)
    raw = open(cap, "rb").read()
    assert raw == FRAME_A + torn
    # the replay scanner consumes ONLY the complete frame; the torn
    # tail stays unconsumed until the rest arrives
    end = _scan_complete(cap, 0)
    assert end == len(FRAME_A)
    assert parse_sse_frames(raw[:end]) == [
        {"event": "message", "id": "1", "data": '{"x": 1}'}
    ]


def test_reconnect_completes_the_torn_frame(tmp_path):
    t, cap, _, _ = _tail(
        tmp_path, [[FRAME_A, FRAME_B[:10]], [FRAME_B[10:]]]
    )
    t.run_once()
    t.run_once()
    end = _scan_complete(cap, 0)
    raw = open(cap, "rb").read()
    assert end == len(raw) == len(FRAME_A) + len(FRAME_B)
    assert [e["id"] for e in parse_sse_frames(raw[:end])] == ["1", "2"]


def test_backoff_doubles_capped_and_resets_after_clean_pass(tmp_path):
    # three failing connections, one clean pass, two more failures —
    # the reference's loop: 1, 2, 4 … cap, reset to 1 after success
    boom = [ConnectionError("down")] * 3 + [[FRAME_A]] + [
        ConnectionError("down")
    ] * 2
    t, cap, sleeps, conns = _tail(tmp_path, boom, max_backoff=4.0)

    stop_after = {"n": 0}

    def should_stop() -> bool:
        stop_after["n"] += 1
        return not conns  # stop when the script is exhausted

    t.run_forever(should_stop=should_stop)
    assert sleeps == [1.0, 2.0, 4.0, 1.0, 2.0]
    assert t.reconnects == 5
    assert open(cap, "rb").read() == FRAME_A


def test_stop_ends_the_thread_and_start_is_idempotent(tmp_path):
    release = threading.Event()

    def slow_stream():
        yield FRAME_A
        release.wait(5)  # hold the connection open like a live feed
        yield FRAME_B

    cap = str(tmp_path / "capture.sse")
    t = CaptureTail("http://fake/stream", cap, get_stream=slow_stream)
    assert t.start() is t and t.start() is t  # idempotent
    for _ in range(500):
        if t.bytes_written or open(cap, "rb").read():
            break
        threading.Event().wait(0.01)
    t.stop()
    release.set()
    t._thread.join(5)
    assert not t._thread.is_alive()
    assert open(cap, "rb").read().startswith(FRAME_A)


def test_ensure_capture_tail_is_one_writer_per_capture(tmp_path):
    cap = str(tmp_path / "capture.sse")
    hold = threading.Event()

    def stream():
        hold.wait(5)
        return iter([])

    t1 = ensure_capture_tail(
        "http://fake/a", cap, get_stream=lambda: stream()
    )
    try:
        t2 = ensure_capture_tail(
            "http://fake/a", cap, get_stream=lambda: stream()
        )
        assert t2 is t1  # same url+path: reuse, never a second writer
        with pytest.raises(ValueError, match="already bound"):
            ensure_capture_tail(
                "http://fake/OTHER", cap, get_stream=lambda: stream()
            )
    finally:
        hold.set()
        t1.stop()
    # DEAD tails keep the binding too (ADVICE r12 low): a capture file
    # holds one stream for its lifetime — a restart for a DIFFERENT url
    # must refuse, not silently mix stream B into A's capture
    t1._thread.join(5)
    assert not t1._thread.is_alive()
    with pytest.raises(ValueError, match="already bound"):
        ensure_capture_tail(
            "http://fake/OTHER", cap, get_stream=lambda: iter([])
        )
    # while a dead tail for the SAME url restarts cleanly
    t3 = ensure_capture_tail(
        "http://fake/a", cap, get_stream=lambda: iter([])
    )
    try:
        assert t3 is not t1 and t3.url == "http://fake/a"
    finally:
        t3.stop()


def test_http_option_requires_url():
    from wikistream_lakehouse_spark.streaming.sse_source import (
        SseReplayDataSource,
    )

    ds = SseReplayDataSource(options={"path": "/tmp/x", "http": "true"})
    with pytest.raises(ValueError, match="url"):
        ds.streamReader(None)
