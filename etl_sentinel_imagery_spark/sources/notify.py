"""Linux inotify directory watching — the file-notification lever for
streaming ingest (Auto Loader's ``cloudFiles.useNotifications`` shape,
re-expressed without any third-party dependency via ctypes).

Design stance (round-12, carried ROADMAP item): notifications are a
LATENCY AND IDLE-COST lever only — they decide WHEN to look, never
WHAT to load. Every wake-up still runs the ordinary
:func:`~etl_sentinel_imagery_spark.operators.txlog.copy_into` pass,
whose ledger (committed atomically with the rows) is the exactly-once
truth. Consequences, all deliberate:

- a LOST or coalesced event costs latency (the next fallback poll
  reconciles), never a lost file;
- a DUPLICATE event costs one no-op directory list, never a duplicate
  row;
- queue OVERFLOW (IN_Q_OVERFLOW) degrades to polling for that window
  — the watcher reports it and the caller's pass reconciles;
- an unsupported platform (non-Linux, FUSE mounts without inotify,
  object stores) degrades to pure polling: :meth:`DirWatcher.supported`
  is the gate and the ingest loop works identically without it.

This mirrors how cloud notification ingestion has to work anyway:
S3/GCS event delivery is at-least-once and unordered, so a correct
loader treats events as hints over a listable source of truth.

The watcher is NON-recursive (one directory fd, one watch): the
notify ingest mode accepts direct-dir sources only — a wildcarded
directory pattern would need a dynamic watch tree whose races
(dir created between list and add_watch) buy nothing over the
fallback poll that already covers every gap.
"""

from __future__ import annotations

import ctypes
import errno
import os
import select
import struct
import sys

__all__ = ["DirWatcher"]

# <sys/inotify.h> event masks
IN_CREATE = 0x00000100
IN_MOVED_TO = 0x00000080
IN_CLOSE_WRITE = 0x00000008
IN_DELETE = 0x00000200
IN_Q_OVERFLOW = 0x00004000

#: what a landing dir cares about: a file finished writing, appeared
#: by rename (the atomic-upload idiom), or was created (covered by
#: CLOSE_WRITE too, but cheap to include for copy-then-close writers)
_LANDING_MASK = IN_CREATE | IN_MOVED_TO | IN_CLOSE_WRITE

_EVENT_HEADER = struct.Struct("iIII")  # wd, mask, cookie, len


class DirWatcher:
    """One-directory inotify watcher with a poll(2)-based ``wait``.

    >>> w = DirWatcher("/data/landing")
    >>> w.wait(30.0)   # True the instant a file lands, False on timeout
    >>> w.close()

    ``wait`` DRAINS the event buffer (many events → one True), so the
    caller's follow-up scan naturally batches a burst of drops into
    one ingest commit. ``overflowed`` latches True if the kernel queue
    ever overflowed — informational; the caller's ledger-checked scan
    reconciles regardless."""

    def __init__(self, path: str, mask: int = _LANDING_MASK):
        if not self.supported():
            raise OSError("inotify is not available on this platform")
        self._libc = ctypes.CDLL(None, use_errno=True)
        self.path = os.path.abspath(path)
        self.overflowed = False
        self._fd = self._libc.inotify_init1(os.O_NONBLOCK)
        if self._fd < 0:
            raise OSError(ctypes.get_errno(), "inotify_init1 failed")
        wd = self._libc.inotify_add_watch(
            self._fd, os.fsencode(self.path), mask
        )
        if wd < 0:
            e = ctypes.get_errno()
            os.close(self._fd)
            raise OSError(e, f"inotify_add_watch({self.path}) failed")
        self._wd = wd

    @staticmethod
    def supported() -> bool:
        """Linux with the inotify syscalls reachable through libc."""
        if not sys.platform.startswith("linux"):
            return False
        try:
            libc = ctypes.CDLL(None, use_errno=True)
            return hasattr(libc, "inotify_init1") and hasattr(
                libc, "inotify_add_watch"
            )
        except OSError:
            return False

    def wait(self, timeout_s: float) -> bool:
        """Block up to ``timeout_s`` for at least one event; drain the
        buffer; return whether anything arrived. A False return is the
        fallback-poll signal — the caller scans anyway on its own
        cadence."""
        try:
            r, _, _ = select.select([self._fd], [], [], timeout_s)
        except OSError:
            return False
        if not r:
            return False
        return self._drain()

    def _drain(self) -> bool:
        got = False
        while True:
            try:
                buf = os.read(self._fd, 65536)
            except OSError as e:
                if e.errno in (errno.EAGAIN, errno.EWOULDBLOCK):
                    break
                raise
            if not buf:
                break
            off = 0
            while off + _EVENT_HEADER.size <= len(buf):
                _wd, mask, _cookie, nlen = _EVENT_HEADER.unpack_from(
                    buf, off
                )
                off += _EVENT_HEADER.size + nlen
                if mask & IN_Q_OVERFLOW:
                    self.overflowed = True
                got = True
            if len(buf) < 65536:
                # the kernel returns whole events; a short read means
                # the queue is (momentarily) empty — but loop once more
                # via the EAGAIN exit to be sure
                continue
        return got

    def close(self) -> None:
        if getattr(self, "_fd", -1) >= 0:
            try:
                os.close(self._fd)
            except OSError:
                pass
            self._fd = -1

    def __enter__(self) -> "DirWatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # best-effort fd hygiene
        self.close()
