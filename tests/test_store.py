"""Unit tests for the store layer's build-once concurrency contract
(no Spark needed — _materialize is pure threading + filesystem)."""

from __future__ import annotations

import threading

import pytest

from via_spark import store


def _key(tag):
    return ("test-app", tag)


def test_materialize_build_once_under_concurrency(tmp_path):
    """N concurrent callers for one key → exactly one build; every
    caller gets the same path."""
    calls = []
    barrier = threading.Barrier(8)

    def write(path):
        calls.append(path)

    def ask(results, i):
        barrier.wait()
        results[i] = store._materialize(_key("ok"), "via_test_", write)

    results = [None] * 8
    threads = [threading.Thread(target=ask, args=(results, i)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    try:
        assert len(calls) == 1
        assert len(set(results)) == 1 and results[0] is not None
    finally:
        store._STORES.pop(_key("ok"), None)


def test_materialize_waiters_get_builders_error_without_rebuilding():
    """ADVICE r14 #1: when the in-flight build fails, blocked waiters
    re-raise the ORIGINAL error instead of each re-running the failed
    (expensive) build; a fresh caller afterwards may retry."""
    calls = []
    release = threading.Event()
    n_waiters = 4
    waiting = threading.Barrier(2)  # builder's write() ↔ main thread

    def failing_write(path):
        calls.append(path)
        waiting.wait()  # signal the main thread we are mid-build
        release.wait()
        raise RuntimeError("boom: fixpoint diverged")

    errors = []

    def build():
        try:
            store._materialize(_key("bad"), "via_test_", failing_write)
        except RuntimeError as exc:
            errors.append(str(exc))

    builder = threading.Thread(target=build)
    builder.start()
    waiters = [threading.Thread(target=build) for _ in range(n_waiters)]
    waiting.wait()  # builder inside write(); now enqueue the waiters
    for t in waiters:
        t.start()
    # waiters must be blocked on the in-flight event, not building
    import time

    time.sleep(0.2)
    assert len(calls) == 1
    release.set()
    builder.join()
    for t in waiters:
        t.join()
    assert len(calls) == 1, "a waiter re-ran the failed build"
    assert len(errors) == 1 + n_waiters
    assert all("boom" in e for e in errors)
    # the key is not poisoned: a fresh caller can retry (and succeed)
    try:
        path = store._materialize(_key("bad"), "via_test_", lambda p: None)
        assert path
    finally:
        store._STORES.pop(_key("bad"), None)


def test_prewarm_marker_not_in_cleanup_paths():
    """ADVICE r14 #4: the prewarmed marker lives in _WARMED, never in
    _STORES (whose values are rmtree'd at exit)."""
    assert all(isinstance(v, str) and v for v in store._STORES.values())
    marker = ("app", "prewarmed", "/x")
    store._WARMED.add(marker)
    try:
        assert marker not in store._STORES
    finally:
        store._WARMED.discard(marker)
