"""Notifier (S12): digest rendering + swallowed-failure send semantics."""

from __future__ import annotations

from job_etl_spark.pipeline.notifier import SmtpConfig, render_digest, send_digest


class _Row(dict):
    def asDict(self):
        return dict(self)


def _top():
    return [
        _Row(hash_key="h1", job_title_std="Data Engineer", source="mock_api", rank_score=91.5),
        _Row(hash_key="h2", job_title_std="ML <Engineer>", source="mock_api", rank_score=88.0),
    ]


def test_render_contains_stats_and_escaped_rows():
    text, html = render_digest({"normalized": 30, "rejected": 0}, _top())
    assert "normalized: 30" in text and "Data Engineer" in text
    assert "ML &lt;Engineer&gt;" in html  # HTML-escaped (reference escapes too)
    assert "91.5" in html


def test_dry_run_never_touches_network():
    out = send_digest("subject", {"a": 1}, _top(), config=None, dry_run=True)
    assert out["sent"] is False and out["error"] is None and "rendered_text" in out


def test_send_failure_is_swallowed():
    cfg = SmtpConfig(host="127.0.0.1", port=1, recipients=("x@example.com",))
    out = send_digest("subject", {}, _top(), config=cfg, dry_run=False)
    assert out["sent"] is False and out["error"]  # connection refused, captured
