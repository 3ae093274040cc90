"""Transport layer: stage remote bytes to local paths, keep the plan pure.

Reference semantics:
  * HTTP GET with ``^https?://`` detection — `src/Service/Transport/HttpTransport.php:18-49`.
  * SFTP file-selection protocol — `src/Service/Transport/SftpTransport.php:52-207`:
    treat ``source`` as ``dir/prefix.ext``; list the dir; keep regular files
    whose basename starts with the prefix; sort by mtime; download the
    NEWEST only; move all older matches to ``history/`` (archive + delete →
    at-most-once consumption).

The selection/archive protocol is implemented against a tiny filesystem
interface so it runs identically over paramiko SFTP (production, gated on
the lib) and a local directory (tests). Structured Streaming's
``cleanSource=archive`` option mirrors the history-move for stream ingest.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
import urllib.request
from dataclasses import dataclass
from typing import Protocol

_URL_RE = re.compile(r"^https?://", re.IGNORECASE)


def is_url(source: str) -> bool:
    return bool(_URL_RE.match(source))


def http_fetch(url: str, staging_dir: str | None = None) -> str:
    """Download to a staging file; returns the local path."""
    staging_dir = staging_dir or tempfile.mkdtemp(prefix="etl_http_")
    os.makedirs(staging_dir, exist_ok=True)
    name = os.path.basename(url.split("?")[0]) or "download"
    dest = os.path.join(staging_dir, name)
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as f:
        shutil.copyfileobj(resp, f)
    return dest


@dataclass
class RemoteFile:
    path: str
    mtime: float
    is_regular: bool


class RemoteFs(Protocol):
    """Minimal filesystem the SFTP protocol needs (paramiko SFTPClient and
    LocalFs both satisfy it)."""

    def listdir(self, path: str) -> list[RemoteFile]: ...
    def download(self, remote_path: str, local_path: str) -> None: ...
    def rename(self, src: str, dst: str) -> None: ...
    def makedirs(self, path: str) -> None: ...


class LocalFs:
    """Local-directory implementation (tests, mounted shares)."""

    def listdir(self, path: str) -> list[RemoteFile]:
        out = []
        for name in os.listdir(path):
            p = os.path.join(path, name)
            st = os.stat(p)
            out.append(RemoteFile(p, st.st_mtime, os.path.isfile(p)))
        return out

    def download(self, remote_path: str, local_path: str) -> None:
        shutil.copyfile(remote_path, local_path)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class ParamikoFs:
    """paramiko-backed RemoteFs (gated: paramiko is not in this container)."""

    def __init__(self, host: str, username: str, password: str | None = None,
                 port: int = 22, **connect_kwargs):
        try:
            import paramiko
        except ImportError as e:
            raise NotImplementedError(
                "SFTP transport needs paramiko (not available in this environment)"
            ) from e
        transport = paramiko.Transport((host, port))
        transport.connect(username=username, password=password, **connect_kwargs)
        self._sftp = paramiko.SFTPClient.from_transport(transport)

    def listdir(self, path: str) -> list[RemoteFile]:
        import stat as statmod

        out = []
        for attr in self._sftp.listdir_attr(path):
            out.append(
                RemoteFile(
                    f"{path.rstrip('/')}/{attr.filename}",
                    attr.st_mtime or 0,
                    statmod.S_ISREG(attr.st_mode or 0),
                )
            )
        return out

    def download(self, remote_path: str, local_path: str) -> None:
        self._sftp.get(remote_path, local_path)

    def rename(self, src: str, dst: str) -> None:
        self._sftp.posix_rename(src, dst)

    def makedirs(self, path: str) -> None:
        try:
            self._sftp.mkdir(path)
        except OSError:
            pass  # exists


def sftp_select_and_stage(
    fs: RemoteFs,
    source: str,
    staging_dir: str | None = None,
    archive: bool = True,
) -> list[str]:
    """The reference's at-most-once file pickup (`SftpTransport.php:139-207`).

    ``source`` = ``dir/prefix.ext``: match regular files in ``dir`` whose
    name starts with ``prefix``; newest by mtime is downloaded; older
    matches are moved to ``dir/history/`` (consumed exactly once even if the
    job re-runs before the supplier uploads a new file).

    Returns the list of staged local paths (newest only — one element — by
    protocol; kept a list because Excel/Morris readers union multiple files
    when a caller disables archiving).
    """
    directory, fname = os.path.split(source)
    prefix = os.path.splitext(fname)[0]
    matches = [
        f
        for f in fs.listdir(directory or ".")
        if f.is_regular and os.path.basename(f.path).startswith(prefix)
    ]
    if not matches:
        raise FileNotFoundError(f"no files matching {prefix!r} in {directory!r}")
    matches.sort(key=lambda f: f.mtime, reverse=True)
    newest, older = matches[0], matches[1:]

    staging_dir = staging_dir or tempfile.mkdtemp(prefix="etl_sftp_")
    os.makedirs(staging_dir, exist_ok=True)
    local = os.path.join(staging_dir, os.path.basename(newest.path))
    fs.download(newest.path, local)

    if archive and older:
        hist = os.path.join(directory or ".", "history")
        fs.makedirs(hist)
        for f in older:
            fs.rename(f.path, os.path.join(hist, os.path.basename(f.path)))
    return [local]


def sftp_fetch_latest(source: str, fs: RemoteFs | None = None) -> list[str]:
    """Default SFTP fetch used by the production registry. Without an
    explicit fs a paramiko connection would be required — configuration
    comes from the caller, so this raises with guidance when unwired."""
    if fs is None:
        raise NotImplementedError(
            "pass a RemoteFs (ParamikoFs(host,...) or LocalFs()) — no ambient "
            "SFTP credentials are assumed"
        )
    return sftp_select_and_stage(fs, source)
