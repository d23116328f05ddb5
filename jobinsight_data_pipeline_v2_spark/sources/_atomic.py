"""The rule-17 atomic single-file commit, shared by every
archive-style sink (WARC / ZIP-TAR / Avro / MBOX — and any future
one: new writers MUST go through ``commit_file`` so they inherit the
torn-file-free contract instead of re-implementing it).

Contract (kill-at-any-step safe, property-tested in
tests/test_crash_recovery.py):

- the final name appears only via ``os.rename`` of a fully-written
  tmp file → readers can NEVER observe a torn final file;
- the tmp name starts with a dot, which Spark/Hadoop file listings
  hide → crash residue is invisible to every reader in this package;
- tmp names are uuid-unique → a retried/speculative task never
  collides with a dead attempt's residue (rule 17);
- ``makedirs(exist_ok=True)`` → tasks may race to be first on a
  fresh out_dir.

Deployment constraint inherited by all callers: atomicity is plain
``os.rename``, so out_dir must be a filesystem shared by driver and
executors (local/NFS — the write_warc_archive note)."""

from __future__ import annotations

import os
import uuid

# indirection points so the crash-recovery property test can inject
# faults at each step without patching the global os module
_MAKEDIRS = os.makedirs
_RENAME = os.rename
_OPEN = open


def commit_file(out_dir: str, name: str, payload: bytes) -> None:
    """Atomically materialize ``out_dir/name`` with ``payload``."""
    _MAKEDIRS(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    with _OPEN(tmp, "wb") as f:
        f.write(payload)
    _RENAME(tmp, os.path.join(out_dir, name))
