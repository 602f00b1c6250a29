"""OAuth token lifecycle — the reference's session manager, testable.

`get_session` (`/root/reference/code/imagery_store.py:149-163`): every
HTTP call fetches a cached bearer token, refreshing when it is ≥600 s old
(the CDSE 10-minute token quota, README.md:67); the initial sentinel
start time (year 2000, imagery_store.py:35) forces the first refresh.

Spark deployment shape (SURVEY.md §3.3): the manager lives on the
driver; executors receive the token via a broadcast variable and call
``on_unauthorized`` to force-refresh on a 401 inside download tasks.
Clock and fetcher are injected so the lifecycle is testable without
network or sleeping.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

#: Refresh threshold — matches imagery_store.py:152.
TOKEN_MAX_AGE_S = 600.0

#: Initial sentinel epoch (year 2000) forcing the first refresh,
#: mirroring imagery_store.py:35.
_SENTINEL_START = 946684800.0


@dataclass
class TokenManager:
    fetch_token: Callable[[], str]
    clock: Callable[[], float] = time.time
    max_age_s: float = TOKEN_MAX_AGE_S
    _token: str | None = field(default=None, init=False)
    _started_at: float = field(default=_SENTINEL_START, init=False)
    refresh_count: int = field(default=0, init=False)

    def token(self) -> str:
        """Current bearer token, refreshed when older than max_age_s."""
        if self._token is None or (self.clock() - self._started_at) >= self.max_age_s:
            self._refresh()
        return self._token  # type: ignore[return-value]

    def on_unauthorized(self) -> str:
        """Force-refresh after a 401 (executor-side retry hook)."""
        self._refresh()
        return self._token  # type: ignore[return-value]

    def auth_header(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.token()}"}

    def _refresh(self) -> None:
        self._token = self.fetch_token()
        self._started_at = self.clock()
        self.refresh_count += 1
