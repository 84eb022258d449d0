"""Per-document wall-clock watchdog (trafilatura_spark/watchdog.py).

The reference bounds per-document exceptions (core.dart:333-335); at
10^12 documents time must be bounded too — speculation re-runs a
deterministic stall into the same stall.  These tests pin:

- a pathological pure-Python loop inside a cascade tier is interrupted
  by SIGALRM well inside its budget (status='timeout', not a hang);
- the monotonic tier-boundary backstop fires where SIGALRM cannot be
  armed (non-main thread);
- default options (budget = 0) are byte-identical no-ops;
- the Spark stage emits timeout rows and the metrics count them
  (extraction_metrics.timeout_docs + the job's progress table).
"""

import threading
import time

import pytest

from trafilatura_spark.core import bare_extraction
from trafilatura_spark.settings import Options
from trafilatura_spark.watchdog import DocTimeout, check_deadline, doc_budget

ARTICLE = ("<html><head><title>t</title></head><body><article>"
           + "".join(f"<p>Paragraph {i} with plenty of real sentence "
                     "content so gates pass comfortably.</p>"
                     for i in range(6))
           + "</article></body></html>")


def test_doc_budget_disabled_is_noop():
    with doc_budget(0):
        check_deadline()  # no budget armed -> never raises
    with doc_budget(-1):
        time.sleep(0.01)
        check_deadline()


def test_check_deadline_fires_after_expiry():
    with pytest.raises(DocTimeout):
        with doc_budget(0.01):
            time.sleep(0.05)
            check_deadline()
    # deadline is disarmed on exit
    check_deadline()


def test_sigalrm_interrupts_pathological_loop_mid_tier(monkeypatch):
    """A tier stuck in a pure-Python loop (no boundary checks reachable)
    is killed by the alarm well inside the test's patience — the
    'adversarial page wedges a task forever' scenario."""
    import trafilatura_spark.core as core

    def stuck_tier(tree, options, backup_factory=None):
        deadline = time.monotonic() + 10.0  # bounded only for test safety
        n = 0
        while time.monotonic() < deadline:
            n += 1
        return None, "", 0

    monkeypatch.setattr(core, "extract_content", stuck_tier)
    t0 = time.monotonic()
    res = bare_extraction(ARTICLE, Options(doc_timeout_sec=0.2))
    elapsed = time.monotonic() - t0
    assert res.status == "timeout" and res.tier == "none"
    assert res.spans == []
    assert elapsed < 2.0, f"watchdog did not fire in time: {elapsed:.2f}s"


def test_timeout_pierces_broad_exception_guards(monkeypatch):
    """DocTimeout must NOT be catchable by the cascade's swallow-to-null
    ``except Exception`` guards (parse_html fallback, try_readability,
    justext_rescue): a tier that wraps its own work in a broad handler —
    exactly what every tier seam does — would otherwise convert the
    one-shot alarm into a tier-level null, leave NO timer armed, and let
    a later stall run unbounded while the doc is miscounted."""
    import trafilatura_spark.core as core

    def guarded_stuck_tier(tree, options, backup_factory=None):
        try:
            deadline = time.monotonic() + 10.0  # bounded only for safety
            while time.monotonic() < deadline:
                pass
        except Exception:
            # the swallow the cascade seams perform (core.dart:333-335
            # analogue); DocTimeout(BaseException) must fly past it
            pass
        return None, "", 0

    monkeypatch.setattr(core, "extract_content", guarded_stuck_tier)
    t0 = time.monotonic()
    res = bare_extraction(ARTICLE, Options(doc_timeout_sec=0.2))
    elapsed = time.monotonic() - t0
    assert res.status == "timeout" and res.tier == "none"
    assert elapsed < 2.0, f"broad handler swallowed the alarm: {elapsed:.2f}s"


def test_boundary_check_backstop_in_non_main_thread(monkeypatch):
    """Where SIGALRM cannot be armed (non-main thread) the monotonic
    check at the next tier boundary still converts the overrun into a
    timeout row instead of completing as 'ok'."""
    import trafilatura_spark.core as core

    def slow_tier(tree, options, backup_factory=None):
        time.sleep(0.15)  # returns on its own; boundary check catches it
        from trafilatura_spark.dom import Node
        return Node("body"), "", 0

    monkeypatch.setattr(core, "extract_content", slow_tier)
    out = {}

    def run():
        out["res"] = bare_extraction(ARTICLE, Options(doc_timeout_sec=0.05))

    t = threading.Thread(target=run)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive()
    assert out["res"].status == "timeout"


def test_zero_budget_default_unchanged():
    base = bare_extraction(ARTICLE, Options())
    assert base.status == "ok"
    # generous budget: identical result
    budgeted = bare_extraction(ARTICLE, Options(doc_timeout_sec=30.0))
    assert budgeted.status == "ok"
    assert [ (s["kind"], s["text"]) for s in budgeted.spans ] == \
        [ (s["kind"], s["text"]) for s in base.spans ]


def test_extract_documents_emits_and_counts_timeout_rows(spark):
    """Spark-stage plumbing: an (effectively) zero budget times out every
    document through mapInPandas, and extraction_metrics counts them in
    its own column — distinct from error_docs."""
    from trafilatura_spark.operators.pipeline import (extract_documents,
                                                      extraction_metrics)
    from trafilatura_spark.sources.corpus import single_html_span

    docs = spark.createDataFrame(
        [(f"d{i}", single_html_span(ARTICLE)) for i in range(12)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    ex = extract_documents(docs, Options(doc_timeout_sec=1e-7))
    rows = ex.collect()
    assert len(rows) == 12
    assert all(r["status"] == "timeout" and r["tier"] == "none" for r in rows)
    m = extraction_metrics(ex).agg(
        {"timeout_docs": "sum", "error_docs": "sum", "docs": "sum"}).first()
    assert m["sum(timeout_docs)"] == 12 and m["sum(error_docs)"] == 0
    # and a sane budget on the same input: zero timeouts
    ok = extract_documents(docs, Options(doc_timeout_sec=30.0)).collect()
    assert all(r["status"] == "ok" for r in ok)


def test_job_doc_timeout_flag_counts_in_progress(spark, tmp_path):
    """--doc-timeout rides the CLI into Options; timeout counts land in
    the per-bucket progress table's timeout_docs column."""
    from trafilatura_spark.job import main as job_main
    from trafilatura_spark.sources.corpus import single_html_span

    docs = spark.createDataFrame(
        [(f"d{i}", single_html_span(ARTICLE)) for i in range(10)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    inp = str(tmp_path / "in")
    docs.write.parquet(inp)
    out, prog = str(tmp_path / "out"), str(tmp_path / "prog")
    rc = job_main(["--input", inp, "--output", out, "--progress", prog,
                   "--run-id", "to1", "--buckets", "4", "--wave-size", "4",
                   "--doc-timeout", "1e-7"])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.filter("status = 'timeout'").count() == 10
    p = spark.read.parquet(prog)
    assert p.agg({"timeout_docs": "sum"}).first()[0] == 10
    assert p.agg({"error_docs": "sum"}).first()[0] == 0


def test_late_alarm_in_restore_cannot_poison_deadline(monkeypatch):
    """Signal delivery happens between any two bytecodes: the one-shot
    alarm can land INSIDE doc_budget's finally block, aborting the
    restore statements mid-way.  Simulate it by making the restore-side
    setitimer call raise DocTimeout; the module-global deadline must be
    restored regardless, or every later document in the worker would
    instantly 'time out' against the stale past deadline."""
    import signal as _signal
    import trafilatura_spark.watchdog as wd

    real = _signal.setitimer
    calls = {"n": 0}

    def fake(which, *a):
        calls["n"] += 1
        if calls["n"] == 2:  # the restore call inside the finally
            raise wd.DocTimeout()
        return real(which, *a)

    monkeypatch.setattr(wd.signal, "setitimer", fake)
    import pytest
    with pytest.raises(wd.DocTimeout):
        with wd.doc_budget(5.0):
            pass
    monkeypatch.undo()
    # the SIMULATION leaves the entry timer pending (a real one-shot
    # alarm is spent by the time it raises) — disarm before asserting
    _signal.setitimer(_signal.ITIMER_REAL, 0)
    assert wd._deadline is None
    check_deadline()  # must not raise
    # the inner finally still restored the handler despite the abort
    assert _signal.getsignal(_signal.SIGALRM) is _signal.SIG_DFL


def test_worker_recovers_after_timeout_doc(monkeypatch):
    """A timeout row must be an isolated event: the very next document in
    the same worker (same module globals, same signal state) extracts
    normally.  Covers the clear_budget belt-and-suspenders in
    bare_extraction's DocTimeout handler."""
    import trafilatura_spark.core as core
    import trafilatura_spark.watchdog as wd

    original = core.extract_content
    state = {"stall": True}

    def stuck_once(tree, options, backup_factory=None):
        if state["stall"]:
            state["stall"] = False
            deadline = time.monotonic() + 10.0  # bounded only for safety
            while time.monotonic() < deadline:
                pass
        return original(tree, options, backup_factory)

    monkeypatch.setattr(core, "extract_content", stuck_once)
    first = bare_extraction(ARTICLE, Options(doc_timeout_sec=0.2))
    assert first.status == "timeout"
    assert wd._deadline is None
    second = bare_extraction(ARTICLE, Options(doc_timeout_sec=0.2))
    assert second.status == "ok", second.status
