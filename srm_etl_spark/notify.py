"""Failure-notification wrapper for pipeline entry points.

Reference ``srm_tools/error_notifier.py:9-63``: every operator's ``run`` is
wrapped in ``invoke_on(func, name)`` — on any exception it formats the
traceback into a subject/body pair and emails it, then re-raises. Here the
semantics are kept and the SMTP leg is the injected transport (the same
seam every sink uses): ``notify(payload)`` receives
``{"subject", "body", "operation"}`` — a deployment binds smtplib or a
webhook; tests bind a recorder. ``build_failure_message`` reproduces the
reference's subject/body format exactly so a drop-in SMTP transport sends
the same mail.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable


def build_failure_message(operation_name: str, error: str, env_name: str = "production") -> dict:
    """The reference's subject/body format (error_notifier.py:23-24)."""
    return {
        "operation": operation_name,
        "subject": f"ETL Task - {env_name} : {operation_name} Failed",
        "body": (
            f"Operation `{operation_name}` encountered an error:\n\n"
            f"Error Log:\n{error}"
        ),
    }


def invoke_on(
    func: Callable[[], object],
    name: str,
    notify: Callable[[dict], None],
    *,
    env_name: str = "production",
    on_success: Callable[[], None] | None = None,
    on_failure: Callable[[], None] | None = None,
    reraise: bool = True,
):
    """Run ``func``; on success call ``on_success``; on ANY exception
    (BaseException included — the reference catches both arms) call
    ``on_failure``, send the formatted failure message through ``notify``,
    and re-raise (the reference's ``reraise`` default — a failed operator
    must still fail the job after notifying).

    Returns ``func()``'s result on success."""
    try:
        result = func()
    except BaseException as exc:
        if on_failure is not None:
            on_failure()
        notify(build_failure_message(name, traceback.format_exc(), env_name))
        # Only plain Exceptions are suppressible: KeyboardInterrupt /
        # SystemExit / GeneratorExit must propagate even with reraise=False,
        # or an opted-out caller keeps the job alive through an interrupt.
        if reraise or not isinstance(exc, Exception):
            raise
        return None
    if on_success is not None:
        on_success()
    return result
