"""Production HTTP transports for the engine's injected seams.

Every connector and sink in this engine takes its transport as a callable —
``fetch_page(skip, limit)`` / ``fetch_url(url)`` on the ingest side
(``sources/connectors.py``), ``send(payload)`` / ``ship(partition)`` /
``sweep(index, body)`` / ``(fetch, put)`` on the publish side
(``sinks/rest.py``, ``sinks/es.py``). Tests inject recorders; a deployment
injects the factories below, built on ``requests`` with the reference's
retry posture (``operators/derive/es_utils.py:13-18``: bounded retries on
502/503/504, per-request timeout).

Design constraints honored here:

- **Executor-safe**: the ES bulk ship runs inside ``foreachPartition`` on
  executors, so factories capture plain config and build their HTTP session
  lazily per call — nothing unpicklable crosses the task boundary.
- **Testable without a network**: every factory accepts ``session`` (any
  object with ``request(method, url, **kw)`` returning a response with
  ``status_code`` / ``json()`` / ``text`` / ``raise_for_status()``), so the
  protocol around the wire is unit-tested with fakes
  (tests/test_connectors_sinks.py::TestTransports).
- ``requests`` itself is optional: importing this module without it only
  fails when a factory is actually used with the default session.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable

try:  # pragma: no cover - exercised implicitly by default-session paths
    import requests as _requests
except ImportError:  # pragma: no cover
    _requests = None

RETRY_STATUSES = (502, 503, 504)


def _new_session():
    if _requests is None:
        raise ImportError("transports need the 'requests' package (or an injected session)")
    return _requests.Session()


def request_json(
    url: str,
    *,
    method: str = "GET",
    session=None,
    retries: int = 3,
    retry_statuses: tuple[int, ...] = RETRY_STATUSES,
    timeout: float = 60.0,
    backoff: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
    **kw,
):
    """One JSON request with the reference's retry posture: bounded retries
    on the listed statuses (exponential backoff), raise on other errors."""
    session = session or _new_session()
    for attempt in range(retries + 1):
        resp = session.request(method, url, timeout=timeout, **kw)
        if resp.status_code in retry_statuses and attempt < retries:
            sleep(backoff * (2**attempt))
            continue
        resp.raise_for_status()
        return resp.json()
    raise RuntimeError("unreachable")  # pragma: no cover


def make_json_fetch(headers: dict | None = None, session=None, **rkw) -> Callable[..., dict]:
    """``fetch_url(url, params=None) -> dict`` for the linked/datagovil
    pagers (S5/S12) and any enveloped JSON source (S3/S10)."""

    def fetch(url: str, params: dict | None = None) -> dict:
        return request_json(url, session=session, headers=headers, params=params, **rkw)

    return fetch


def make_skip_limit_fetch_page(
    url: str,
    *,
    records_key: str = "records",
    skip_param: str = "skip",
    limit_param: str = "limit",
    params: dict | None = None,
    headers: dict | None = None,
    session=None,
    **rkw,
) -> Callable[[int, int], list]:
    """``fetch_page(skip, limit) -> list`` for the gov.il-style pager (S6,
    reference srm_tools/gov.py:13-55)."""

    def fetch_page(skip: int, limit: int) -> list:
        q = dict(params or {})
        q[skip_param] = skip
        q[limit_param] = limit
        body = request_json(url, session=session, headers=headers, params=q, **rkw)
        return body.get(records_key, []) if isinstance(body, dict) else body

    return fetch_page


def make_airtable_send(
    api_key: str, base: str, table: str, *, session=None, **rkw
) -> Callable[[dict], None]:
    """``send(payload)`` for K4/K6 batches (sinks/rest.py:upsert_payloads):
    the payload's ``method`` (PATCH=update / POST=create) maps straight onto
    the Airtable records endpoint; auth is the bearer header
    (reference load/airtable.py:104-214)."""
    url = f"https://api.airtable.com/v0/{base}/{table}"
    headers = {"Authorization": f"Bearer {api_key}"}

    def send(payload: dict) -> None:
        body = {k: v for k, v in payload.items() if k != "method"}
        request_json(
            url, method=payload.get("method", "POST"), session=session,
            headers=headers, json=body, **rkw,
        )

    return send


def make_ckan_send(
    host: str, api_key: str, owner_org: str, *, session=None, **rkw
) -> Callable[[dict], dict]:
    """``send(package_payload)`` for K5 (reference dump_to_ckan usage,
    operators/backup/__init__.py:38-43): package_create, falling back to
    package_patch when the name already exists (CKAN returns 409)."""
    headers = {"Authorization": api_key}

    def send(payload: dict) -> dict:
        payload = {**payload, "owner_org": owner_org}
        create = f"{host}/api/3/action/package_create"
        session_ = session or _new_session()
        resp = session_.request("POST", create, json=payload, headers=headers, timeout=60)
        if resp.status_code == 409:
            return request_json(
                f"{host}/api/3/action/package_patch", method="POST", session=session_,
                headers=headers, json={**payload, "id": payload["name"]}, **rkw,
            )
        resp.raise_for_status()
        return resp.json()

    return send


def make_es_ship(
    hosts: str, *, auth: tuple[str, str] | None = None, session=None, **rkw
) -> Callable[[Iterable], None]:
    """``ship(partition_iter)`` for ``sinks/es.py:publish``: each partition's
    (action_json, doc_json) pairs post as ONE ``_bulk`` NDJSON body. Runs on
    executors — the session is created inside the call (nothing unpicklable
    is captured); pass ``session`` only in tests."""

    def ship(rows: Iterable) -> None:
        lines: list[str] = []
        for r in rows:
            lines.append(r.action_json)
            lines.append(r.doc_json)
        if not lines:
            return
        s = session or _new_session()
        request_json(
            f"{hosts.rstrip('/')}/_bulk", method="POST", session=s,
            headers={"Content-Type": "application/x-ndjson"},
            data="\n".join(lines) + "\n", auth=auth, **rkw,
        )

    return ship


def make_es_sweep(
    hosts: str, *, auth: tuple[str, str] | None = None, session=None, **rkw
) -> Callable[[str, dict], dict]:
    """``sweep(index, body)`` for the revision delete-by-query (reference
    es_utils.py:59-63, ``conflicts=proceed``)."""

    def sweep(index: str, body: dict) -> dict:
        return request_json(
            f"{hosts.rstrip('/')}/{index}/_delete_by_query", method="POST",
            session=session, params={"conflicts": "proceed"},
            headers={"Content-Type": "application/json"}, data=json.dumps(body),
            auth=auth, **rkw,
        )

    return sweep


def make_github_transports(
    token: str, *, session=None, **rkw
) -> tuple[Callable[[str], tuple[int, dict]], Callable[[str, dict], int]]:
    """``(fetch, put)`` for ``sinks/rest.py:github_backup_push`` (reference
    operators/github_backup/__init__.py:17-23 headers)."""
    headers = {"Authorization": f"token {token}", "Accept": "application/vnd.github+json"}

    def fetch(url: str) -> tuple[int, dict]:
        s = session or _new_session()
        resp = s.request("GET", url, headers=headers, timeout=30)
        try:
            body = resp.json()
        except ValueError:
            body = {}
        return resp.status_code, body if isinstance(body, dict) else {}

    def put(url: str, payload: dict) -> int:
        s = session or _new_session()
        return s.request("PUT", url, headers=headers, json=payload, timeout=30).status_code

    return fetch, put
