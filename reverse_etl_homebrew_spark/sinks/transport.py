"""External-API transport layer (SURVEY.md §2.9).

The reference talks to HubSpot over REST with a shared requests
session, exponential backoff on {429,500,502,503,504}, MAX_RETRIES=5,
and a synthetic 599 status on exhaustion (main.py:426-528, 434-457).
The engine isolates that behavior behind a ``Transport`` protocol so:

- production injects an HTTP transport (same retry contract);
- tests inject ``FakeHubSpot`` — an in-memory keyed store that records
  every request to a spool file per partition, letting assertions see
  exactly what a real API would have received.

``compute_backoff`` is the pure retry-delay function, unit-testable
without I/O.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from typing import Dict, List, Optional, Protocol, Tuple

#: Operational constants, reference main.py:49-53.
BATCH_SIZE = 50
MAX_RETRIES = 5
INITIAL_BACKOFF = 0.5
BACKOFF_CAP = 30.0
RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})
EXHAUSTED_STATUS = 599  # synthetic sentinel, main.py:457


def compute_backoff(attempt: int) -> float:
    """Delay before retry ``attempt`` (1-based):
    min(cap, initial * 2^(attempt-1)) — jitterless exponential,
    main.py:441."""
    return min(BACKOFF_CAP, INITIAL_BACKOFF * (2 ** (attempt - 1)))


class Transport(Protocol):
    """Minimal remote-store contract the writer needs."""

    def create(self, object_type: str, properties: Dict[str, str]) -> Tuple[int, Optional[str]]:
        """→ (status, new_object_id)"""
        ...

    def update(self, object_type: str, object_id: str, properties: Dict[str, str]) -> int:
        """→ status"""
        ...


class FakeHubSpot:
    """In-memory keyed property-bag store with request spooling and
    optional scripted failures.

    ``fail_statuses`` maps natural_key → list of statuses to return
    before succeeding (exercises the retry/backoff path without
    sleeping — the writer receives ``sleeper`` for that).
    """

    def __init__(self, spool_dir: Optional[str] = None, fail_statuses: Optional[dict] = None):
        self.store: Dict[Tuple[str, str], Dict[str, str]] = {}
        self.requests: List[dict] = []
        self.spool_dir = spool_dir
        self.fail_statuses = dict(fail_statuses or {})
        self._lock = threading.Lock()
        if spool_dir:
            os.makedirs(spool_dir, exist_ok=True)

    def _spool(self, record: dict) -> None:
        with self._lock:
            self.requests.append(record)
        if self.spool_dir:
            path = os.path.join(
                self.spool_dir, f"part-{os.getpid()}-{threading.get_ident()}.jsonl"
            )
            with open(path, "a") as f:
                f.write(json.dumps(record, default=str) + "\n")

    def _maybe_fail(self, key: str) -> Optional[int]:
        with self._lock:
            pending = self.fail_statuses.get(key)
            if pending:
                return pending.pop(0)
        return None

    def create(self, object_type, properties):
        key = properties.get("natural_key", str(uuid.uuid4()))
        status = self._maybe_fail(key)
        if status is not None:
            self._spool({"op": "create", "object_type": object_type, "key": key, "status": status})
            return status, None
        new_id = f"{object_type}-{key}"
        with self._lock:
            self.store[(object_type, new_id)] = dict(properties)
        self._spool({"op": "create", "object_type": object_type, "key": key, "status": 201, "id": new_id})
        return 201, new_id

    def update(self, object_type, object_id, properties):
        status = self._maybe_fail(properties.get("natural_key", object_id))
        if status is not None:
            self._spool({"op": "update", "object_type": object_type, "id": object_id, "status": status})
            return status
        with self._lock:
            self.store.setdefault((object_type, object_id), {}).update(properties)
        self._spool({"op": "update", "object_type": object_type, "id": object_id, "status": 200})
        return 200
