"""LogStore: the transaction log's storage primitive, injectable.

Delta Lake's LogStore abstraction, restated: VersionedTable's ONE
correctness-critical storage assumption is that publishing a manifest
under its version name is atomic and exclusive — ``put_if_absent``
either makes the complete manifest visible or reports that the version
was already claimed, never a torn or duplicated commit. POSIX
filesystems give this via ``os.link`` (hard-link creation is atomic and
fails with EEXIST); S3-class object stores give it via conditional put
(``If-None-Match: *``) but have NO atomic rename — so the primitive,
not the filesystem idiom, is the boundary.

Everything else the log needs is weaker: ``put`` (checkpoints are
derived data, last-writer-wins is safe), ``read_bytes``/``exists``/
``list_names``/``delete``/``mtime`` (plain reads and maintenance).
Data files are NOT in scope — Spark executors write them directly and
a commit only makes them visible by reference, exactly Delta's split.

``PosixLogStore`` is the default (and what every test exercises, since
injection defaults to it); tests also run the suite-critical paths
through a conditional-put mock with no rename at all, proving the OCC
loop needs only this interface (see tests/test_versioned.py).

Reference scope parity: the reference engine's writers assume a
transactional target (database/writer.go); this layer is the
object-store-ready restatement for the versioned-table extension.
"""

from __future__ import annotations

import os
import uuid


class LogStore:
    """Abstract base. Paths are absolute strings; directories may not
    exist yet (``list_names`` of a missing directory is ``[]``)."""

    def list_names(self, directory: str) -> list[str]:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Atomically publish ``data`` at ``path``; False when ``path``
        already exists (the optimistic-concurrency loss signal). The
        write must be all-or-nothing: a reader must never observe a
        partial ``data``. THE commit primitive."""
        raise NotImplementedError

    def put(self, path: str, data: bytes) -> None:
        """Publish ``data`` at ``path``, overwriting. Used only for
        derived artifacts (checkpoints) where concurrent writers
        produce identical content — last-writer-wins is safe. The same
        all-or-nothing visibility rule applies."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Remove ``path``; missing is not an error (vacuum races)."""
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        """Last-modified epoch seconds (vacuum grace windows and the
        pre-``ts`` manifest fallback)."""
        raise NotImplementedError

    def open_arrow(self, path: str):
        """Something ``pyarrow.parquet`` accepts as a source. The
        default reads the whole object into a buffer; stores with
        random access (POSIX) return the path so pyarrow reads the
        footer alone — the property the parquet checkpoint format is
        built on."""
        import pyarrow as pa

        return pa.BufferReader(self.read_bytes(path))

    def sweep_temps(self, directory: str, old_enough) -> None:
        """Remove crash-orphaned temporaries under ``directory`` older
        than the grace predicate. No-op for stores that publish without
        temporaries."""


class PosixLogStore(LogStore):
    """Default store: POSIX filesystem semantics. ``put_if_absent``
    writes the full bytes to a temp name (fsync'd) and exposes them
    with ``os.link`` — link creation is atomic and fails like O_EXCL
    when the target exists, so a torn or duplicate manifest is
    impossible; ``put`` uses ``os.replace`` (atomic overwrite)."""

    def list_names(self, directory: str) -> list[str]:
        if not os.path.isdir(directory):
            return []
        return os.listdir(directory)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def _write_temp(self, path: str, data: bytes) -> str:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        return tmp

    def put_if_absent(self, path: str, data: bytes) -> bool:
        tmp = self._write_temp(path, data)
        try:
            os.link(tmp, path)
        except FileExistsError:
            os.unlink(tmp)
            return False
        os.unlink(tmp)
        return True

    def put(self, path: str, data: bytes) -> None:
        os.replace(self._write_temp(path, data), path)

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def open_arrow(self, path: str):
        return path  # pyarrow reads the footer only

    def sweep_temps(self, directory: str, old_enough) -> None:
        for f in self.list_names(directory):
            if f.startswith(".tmp-"):
                full = os.path.join(directory, f)
                try:
                    if old_enough(full):
                        os.remove(full)
                except OSError:
                    pass  # concurrent vacuum won the race
