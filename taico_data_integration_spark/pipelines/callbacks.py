"""Pipeline completion callbacks — the engine's seam for the reference's
email-notification step (S15, dags/data_source_pipeline.py:165-176: an
EmailOperator fires on pipeline completion with a result summary).

Sending email is an orchestration concern, not an engine one, so the engine
exposes the hook, not an SMTP client: a deployment plugs an email/Slack/
PagerDuty sender into ``on_success``/``on_failure`` and receives the same
summary payload the reference's notifier rendered."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

Handler = Callable[[str, dict], None]


def _noop(pipeline: str, summary: dict) -> None:  # pragma: no cover
    return None


@dataclass
class PipelineCallbacks:
    """on_success(pipeline_name, summary) fires when a pipeline run reports
    ok; on_failure fires when it reports not-ok OR raises (the exception is
    re-raised after the callback — callbacks observe, never swallow)."""

    on_success: Handler = _noop
    on_failure: Handler = _noop
    fired: list[tuple[str, str]] = field(default_factory=list)

    def report(self, pipeline: str, summary: dict) -> dict:
        if summary.get("ok"):
            self.fired.append((pipeline, "success"))
            self.on_success(pipeline, summary)
        else:
            self.fired.append((pipeline, "failure"))
            self.on_failure(pipeline, summary)
        return summary

    def guard(self, pipeline: str, fn: Callable[[], dict]) -> dict:
        """Run ``fn``; route its summary (or its exception) to callbacks."""
        try:
            summary = fn()
        except Exception as e:
            self.fired.append((pipeline, "failure"))
            self.on_failure(pipeline, {"ok": False, "error": repr(e)})
            raise
        return self.report(pipeline, summary)


def summary_text(pipeline: str, summary: dict[str, Any]) -> str:
    """Render the summary the way the reference's email body did: one line
    per component with its status."""
    lines = [f"pipeline {pipeline}: {'OK' if summary.get('ok') else 'FAILED'}"]
    for key, r in sorted(summary.get("results", {}).items()):
        if isinstance(r, dict):
            lines.append(f"  {key}: {r.get('status', r)}")
        else:
            lines.append(f"  {key}: {r}")
    return "\n".join(lines)
