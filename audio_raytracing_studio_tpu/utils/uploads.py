"""Shared upload store for the HTTP servers (studio + render service).

SECURITY-CRITICAL single definition: filename sanitization, the atomic
O_CREAT|O_EXCL name claim (concurrent same-named uploads must not
collide), and the realpath allowlist that both servers' file-serving
gates trust.  A hardening fix here reaches every server; duplicating
this logic per server is how the round-2 'list-smuggled file read'
class of bug happens twice.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import threading
from collections import OrderedDict
from typing import Optional


class UploadStore:
    """Temp-dir upload store with an LRU-ordered realpath allowlist.

    ``max_files`` bounds the store: the least-recently-USED uploads are
    unlinked and dropped from the allowlist once the cap is exceeded (a
    long-running service stays disk-bounded; pass None for the studio's
    keep-everything behavior — its sessions are interactive and short).
    Each successful ``allowed()`` check refreshes the file's age: a
    shared upload that jobs keep referencing (the upload-one-IR,
    submit-many-jobs client pattern) is never evicted by a stream of
    newer one-shot uploads — insertion-age eviction 403'd every
    external-IR job after 64 clip uploads in the round-5 HTTP soak.
    """

    def __init__(self, prefix: str, max_files: Optional[int] = None):
        if max_files is not None and max_files < 1:
            raise ValueError(f"max_files must be >= 1 (got {max_files})")
        self.dir = tempfile.mkdtemp(prefix=prefix)
        self.max_files = max_files
        self._lock = threading.Lock()
        self._paths: "OrderedDict[str, None]" = OrderedDict()

    def save(self, filename: str, body: bytes) -> str:
        """Sanitize ``filename``, claim a unique name atomically, write the
        body, and add the file to the allowlist.  Returns the path."""
        base = os.path.basename(filename) or "upload.bin"
        base = re.sub(r"[^A-Za-z0-9._\-]", "_", base)
        path = os.path.join(self.dir, base)
        stem, ext = os.path.splitext(path)
        n = 1
        # O_CREAT|O_EXCL makes the name claim atomic: uploads run without
        # any event lock (ThreadingHTTPServer), so an exists()-then-open
        # sequence would let two same-named concurrent uploads collide
        while True:
            try:
                fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
                break
            except FileExistsError:
                path = f"{stem}_{n}{ext}"
                n += 1
        with os.fdopen(fd, "wb") as fh:
            fh.write(body)
        evicted = []
        with self._lock:
            self._paths[os.path.realpath(path)] = None
            if self.max_files is not None:
                while len(self._paths) > self.max_files:
                    old, _ = self._paths.popitem(last=False)
                    evicted.append(old)
        for old in evicted:
            try:
                os.unlink(old)
            except OSError:
                pass
        return path

    def allowed(self, realpath: str) -> bool:
        """Membership test against the allowlist (caller passes a
        realpath).  A hit marks the file most-recently-used."""
        with self._lock:
            if realpath in self._paths:
                self._paths.move_to_end(realpath)
                return True
            return False

    def cleanup(self):
        """Remove the upload directory and clear the allowlist."""
        shutil.rmtree(self.dir, ignore_errors=True)
        with self._lock:
            self._paths.clear()
