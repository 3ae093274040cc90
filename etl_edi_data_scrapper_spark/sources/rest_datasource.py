"""Distributed REST scan as a native Python DataSource (Spark 4).

The driver-side paginator in ``rest.py`` is correct at reference scale but
serializes every page fetch through one process. This is the 100 TB path:
``spark.read.format("edi_rest")`` — the driver probes ONE page for
``meta.last_page``, then page ranges become input partitions and executors
fetch their pages concurrently. Page protocol is the reference's
(`RestApiInputHandler.php:24-119`): ``?page=N&per_page=M``, rows under
``data``, non-dict rows skipped, 404 → empty page.

Rows are emitted as raw JSON strings (column ``value``) — parsing stays in
the engine (``from_json`` with an explicit schema, or schema inference over
a sample), keeping this reader schema-free and the parse distributed.

Fixture mode: a ``file://`` base URL addresses pages as
``<dir>/page_<N>.json`` — same protocol shape, no network, used by tests
and offline replays.

Register per session: ``spark.dataSource.register(RestDataSource)``.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _page_url(base: str, page: int, page_size: int, page_param: str, size_param: str) -> str:
    if base.startswith("file://"):
        return f"{base.rstrip('/')}/page_{page}.json"
    sep = "&" if "?" in base else "?"
    return f"{base}{sep}{page_param}={page}&{size_param}={page_size}"


def _fetch_page(url: str, token: str | None) -> dict:
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req) as resp:
            body = resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:  # 404 → empty page (reference :72-76)
        if e.code == 404:
            return {}
        raise
    except OSError:  # missing fixture file == past-the-end page
        return {}
    try:
        parsed = json.loads(body)
    except json.JSONDecodeError:
        return {}
    return parsed if isinstance(parsed, dict) else {}


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start  # inclusive
        self.end = end      # inclusive


class RestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url = options["url"]
        self.page_param = options.get("page_param", "page")
        self.size_param = options.get("size_param", "per_page")
        self.page_size = int(options.get("page_size", 100))
        self.pages_per_task = int(options.get("pages_per_task", 8))
        self.token = options.get("token")
        self.n_pages = int(options["n_pages"]) if "n_pages" in options else None

    def _probe_last_page(self) -> int:
        first = _fetch_page(
            _page_url(self.url, 1, self.page_size, self.page_param, self.size_param),
            self.token,
        )
        meta = first.get("meta") or {}
        last = meta.get("last_page")
        if last is not None:
            return max(1, int(last))
        # unknown extent: single sequential partition walks links.next
        return 0

    def partitions(self) -> list[InputPartition]:
        n = self.n_pages if self.n_pages is not None else self._probe_last_page()
        if n <= 0:
            return [_PageRange(1, -1)]  # sentinel: sequential walk
        step = max(1, self.pages_per_task)
        return [_PageRange(s, min(s + step - 1, n)) for s in range(1, n + 1, step)]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        if partition.end == -1:  # extent unknown: follow links.next from start
            page = partition.start
            while True:
                doc = _fetch_page(
                    _page_url(self.url, page, self.page_size, self.page_param, self.size_param),
                    self.token,
                )
                yield from self._rows(doc)
                links = doc.get("links") or {}
                if not doc or not links.get("next"):
                    return
                page += 1
        else:
            for page in range(partition.start, partition.end + 1):
                doc = _fetch_page(
                    _page_url(self.url, page, self.page_size, self.page_param, self.size_param),
                    self.token,
                )
                yield from self._rows(doc)

    @staticmethod
    def _rows(doc: dict) -> Iterator[tuple]:
        for row in doc.get("data") or []:
            if isinstance(row, dict):  # non-dict rows skipped (reference :37-39)
                yield (json.dumps(row, sort_keys=True),)


class RestDataSource(DataSource):
    """``spark.read.format("edi_rest").option("url", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "edi_rest"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> RestReader:
        return RestReader(self.options)
