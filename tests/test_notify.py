"""Failure-notification wrapper (reference srm_tools/error_notifier.py:9-63):
subject/body format, success/failure hooks, notify-then-reraise."""

import pytest

from srm_etl_spark.notify import build_failure_message, invoke_on


def test_success_path_notifies_nothing():
    sent, hooks = [], []
    out = invoke_on(lambda: 42, "derive", sent.append, on_success=lambda: hooks.append("ok"))
    assert out == 42 and sent == [] and hooks == ["ok"]


def test_failure_notifies_with_reference_format_and_reraises():
    sent, hooks = [], []

    def boom():
        raise ValueError("the scrape 404ed")

    with pytest.raises(ValueError, match="404ed"):
        invoke_on(boom, "entities", sent.append, env_name="staging",
                  on_failure=lambda: hooks.append("cleanup"))
    assert hooks == ["cleanup"]
    (msg,) = sent
    assert msg["subject"] == "ETL Task - staging : entities Failed"
    assert msg["body"].startswith("Operation `entities` encountered an error:")
    assert "ValueError: the scrape 404ed" in msg["body"]  # full traceback


def test_reraise_false_swallows_after_notify():
    sent = []
    out = invoke_on(lambda: 1 / 0, "meser", sent.append, reraise=False)
    assert out is None and len(sent) == 1
    assert "ZeroDivisionError" in sent[0]["body"]


def test_base_exception_also_notifies():
    sent = []

    def interrupted():
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        invoke_on(interrupted, "backup", sent.append)
    assert sent[0]["operation"] == "backup"


def test_reraise_false_cannot_swallow_interrupts():
    # Only plain Exceptions are suppressible: an opted-out caller must not
    # keep the job alive through KeyboardInterrupt / SystemExit.
    for exc_type in (KeyboardInterrupt, SystemExit):
        sent = []

        def boom(e=exc_type):
            raise e

        with pytest.raises(exc_type):
            invoke_on(boom, "backup", sent.append, reraise=False)
        assert len(sent) == 1  # still notified first


def test_message_format_pinned():
    m = build_failure_message("derive", "TB", env_name="production")
    assert m == {
        "operation": "derive",
        "subject": "ETL Task - production : derive Failed",
        "body": "Operation `derive` encountered an error:\n\nError Log:\nTB",
    }
