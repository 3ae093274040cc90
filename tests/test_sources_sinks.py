"""Sources (CSV/XML/REST/SFTP protocol/Excel range), sinks, and the
streaming job consumer — driven end-to-end on local fixtures."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark import sinks
from etl_edi_data_scrapper_spark.sources import files as fmod
from etl_edi_data_scrapper_spark.sources import transports as tmod
from etl_edi_data_scrapper_spark.sources.registry import local_registry, read_local
from etl_edi_data_scrapper_spark.sources.rest import JwtManager, paginate, read_rest_api


# --- CSV ---------------------------------------------------------------------


def test_csv_drops_malformed_rows(spark, tmp_path):
    # reference: skip rows whose column count != header (CsvInputHandler.php:80-83)
    p = tmp_path / "feed.csv"
    p.write_text("upc,qty,price\n1,2,3\nbadrow,5\n4,5,6\n\n7,8,9,10\n")
    df = fmod.read_csv(spark, str(p))
    rows = df.collect()
    assert [tuple(r) for r in rows] == [("1", "2", "3"), ("4", "5", "6")]
    assert df.columns == ["upc", "qty", "price"]


# --- Morris XML ---------------------------------------------------------------


MORRIS_XML = """<root>
  <available>
    <gtin>0042323456789</gtin><qty>15</qty>
    <detail><price>12.50</price></detail>
  </available>
  <available>
    <gtin>0099999999999</gtin><qty>3</qty>
    <detail><price>7.25</price></detail>
  </available>
</root>"""


def test_morris_xml_typed_parse(spark, tmp_path):
    p = tmp_path / "morris.xml"
    p.write_text(MORRIS_XML)
    df = fmod.read_morris_xml(spark, str(p))
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "bigint", "double",
    ]
    rows = {r.gtin: r for r in df.collect()}
    assert rows["0042323456789"].qty == 15 and rows["0042323456789"].price == 12.5


def test_morris_xml_multi_file_union(spark, tmp_path):
    (tmp_path / "a.xml").write_text(MORRIS_XML)
    (tmp_path / "b.xml").write_text(MORRIS_XML.replace("15", "99"))
    df = fmod.read_morris_xml(spark, str(tmp_path / "*.xml"))
    assert df.count() == 4


# --- Excel range dialect -------------------------------------------------------


@pytest.mark.parametrize(
    "rng,max_row,expect",
    [
        ("Sheet1!A1:D", 50, ("Sheet1", "A1:D50")),
        ("A:I", 10, (None, "A1:I10")),
        ("A1:I", 10, (None, "A1:I10")),
        ("B2:C9", 99, (None, "B2:C9")),
        ("Data!A:B", 7, ("Data", "A1:B7")),
    ],
)
def test_excel_range_normalization(rng, max_row, expect):
    # reference: ExcelInputHandler.php:126-139, :203-240
    assert fmod.normalize_excel_range(rng, max_row) == expect


def test_excel_reader_missing_file_raises(spark):
    with pytest.raises(OSError):
        fmod.read_excel(spark, "/nonexistent.xlsx")


# --- SFTP selection protocol ---------------------------------------------------


def test_sftp_newest_only_and_history_archive(tmp_path):
    remote = tmp_path / "remote"
    remote.mkdir()
    for i, name in enumerate(["feed_old.csv", "feed_mid.csv", "feed_new.csv"]):
        f = remote / name
        f.write_text(f"upc\n{i}\n")
        os.utime(f, (time.time() - 100 + i * 10, time.time() - 100 + i * 10))
    (remote / "unrelated.csv").write_text("upc\nx\n")

    staged = tmod.sftp_select_and_stage(
        tmod.LocalFs(), str(remote / "feed.csv"), staging_dir=str(tmp_path / "stage")
    )
    assert len(staged) == 1
    assert os.path.basename(staged[0]) == "feed_new.csv"
    # older matches moved to history/, newest + unrelated remain
    assert sorted(os.listdir(remote)) == ["feed_new.csv", "history", "unrelated.csv"]
    assert sorted(os.listdir(remote / "history")) == ["feed_mid.csv", "feed_old.csv"]


def test_sftp_no_match_raises(tmp_path):
    (tmp_path / "other.csv").write_text("x\n")
    with pytest.raises(FileNotFoundError):
        tmod.sftp_select_and_stage(tmod.LocalFs(), str(tmp_path / "feed.csv"))


# --- SOCKS5 proxy handshake (SftpTransport.php:60-128 parity) ------------------


class ScriptedSocket:
    """Socket fake: replays scripted recv() payloads, records sent bytes."""

    def __init__(self, replies):
        self.replies = [bytes(r) for r in replies]
        self.sent = b""

    def sendall(self, data):
        self.sent += bytes(data)

    def recv(self, n):
        if not self.replies:
            return b""
        cur = self.replies[0]
        chunk, rest = cur[:n], cur[n:]
        if rest:
            self.replies[0] = rest
        else:
            self.replies.pop(0)
        return chunk


def test_socks5_auth_handshake_byte_framing():
    sock = ScriptedSocket([
        b"\x05\x02",                       # greeting: user/pass accepted
        b"\x01\x00",                       # auth ok
        b"\x05\x00\x00\x01" + bytes(6),    # CONNECT granted
    ])
    out = tmod.socks5_connect(
        sock, "sftp.example.com", 2222, username="u", password="pw",
        resolve=lambda h: "10.1.2.3",
    )
    assert out is sock
    assert sock.sent == (
        b"\x05\x01\x02"                          # VER NMETHODS USERPASS
        + b"\x01\x01u\x02pw"                     # RFC1929: VER ULEN U PLEN P
        + b"\x05\x01\x00\x01"                    # VER CMD RSV ATYP=IPv4
        + bytes([10, 1, 2, 3])                   # resolved address
        + bytes([2222 >> 8, 2222 & 0xFF])        # port, network order
    )


def test_socks5_rejections_raise():
    # greeting refused
    with pytest.raises(tmod.Socks5Error, match="auth"):
        tmod.socks5_connect(
            ScriptedSocket([b"\x05\xff"]), "h", 22, username="u", password="p",
            resolve=lambda h: "1.2.3.4",
        )
    # bad credentials
    with pytest.raises(tmod.Socks5Error, match="credentials"):
        tmod.socks5_connect(
            ScriptedSocket([b"\x05\x02", b"\x01\x01"]), "h", 22,
            username="u", password="p", resolve=lambda h: "1.2.3.4",
        )
    # CONNECT refused (REP=0x05 connection refused)
    with pytest.raises(tmod.Socks5Error, match="CONNECT"):
        tmod.socks5_connect(
            ScriptedSocket([
                b"\x05\x02", b"\x01\x00",
                b"\x05\x05\x00\x01" + bytes(6),
            ]),
            "h", 22, username="u", password="p", resolve=lambda h: "1.2.3.4",
        )
    # proxy hangs up mid-handshake
    with pytest.raises(tmod.Socks5Error, match="closed"):
        tmod.socks5_connect(
            ScriptedSocket([b"\x05"]), "h", 22, username="u", password="p",
            resolve=lambda h: "1.2.3.4",
        )


def test_socks5_noauth_path():
    sock = ScriptedSocket([b"\x05\x00", b"\x05\x00\x00\x01" + bytes(6)])
    tmod.socks5_connect(sock, "h", 22, resolve=lambda h: "1.2.3.4")
    assert sock.sent.startswith(b"\x05\x01\x00")  # offers NO-AUTH only


# --- REST paginator + JWT -------------------------------------------------------


def fake_api(n_pages=3, per_page=2):
    def fetch(url: str) -> str:
        page = int(url.split("page=")[1].split("&")[0])
        if page > n_pages:
            return json.dumps({"data": []})
        rows = [
            {"barcode": f"b{page}-{i}", "stock_quantity": page * 10 + i}
            for i in range(per_page)
        ]
        return json.dumps(
            {"data": rows, "meta": {"last_page": n_pages},
             "links": {"next": f"x?page={page+1}" if page < n_pages else None}}
        )

    return fetch


def test_paginate_stops_at_last_page():
    pages = paginate("https://api.example.com/v1/products", fake_api(3, 2))
    assert len(pages) == 3 and sum(len(p) for p in pages) == 6


def test_paginate_skips_non_dict_rows():
    def fetch(url):
        return json.dumps({"data": [{"a": 1}, "junk", 42], "meta": {"last_page": 1}})

    pages = paginate("u", fetch)
    assert pages == [[{"a": 1}]]


def test_read_rest_api_dataframe(spark, tmp_path):
    df = read_rest_api(
        spark, "https://api.example.com/v1/products", fetch=fake_api(2, 3),
        staging_dir=str(tmp_path),
    )
    assert df.count() == 6
    assert set(df.columns) == {"barcode", "stock_quantity"}


def test_jwt_cache_roundtrip(tmp_path):
    calls = []

    def fake_post(url, creds):
        calls.append(url)
        return json.dumps({"token": "tok123", "expires_in": 3600})

    mgr = JwtManager(
        "https://auth.example.com/token", {"user": "u"},
        cache_dir=str(tmp_path), supplier_id=7, fetch_post=fake_post,
    )
    assert mgr.token() == "tok123"
    assert mgr.token() == "tok123"   # cached
    assert len(calls) == 1


def test_jwt_raw_string_token_gets_synthetic_expiry(tmp_path):
    mgr = JwtManager(
        "u", {}, cache_dir=str(tmp_path), supplier_id=8,
        fetch_post=lambda u, c: "raw-token-string",
    )
    assert mgr.token() == "raw-token-string"
    with open(mgr._cache_path()) as f:
        cached = json.load(f)
    assert cached["expires_at"] > time.time() + 23 * 3600


# --- sinks ----------------------------------------------------------------------


def test_rows_as_json_shape(spark):
    df = spark.createDataFrame([("42", 3, 1.5)], "upc string, qty long, price double")
    out = sinks.rows_as_json(df, key_col="upc").collect()
    assert out[0].key == "42"
    assert json.loads(out[0].value) == {"upc": "42", "qty": 3, "price": 1.5}


def test_kafka_error_classifier_missing_jar_only():
    # missing-package signatures → NotImplementedError path
    assert sinks._is_missing_kafka_jar(Exception("Failed to find data source: kafka."))
    assert sinks._is_missing_kafka_jar(Exception("[DATA_SOURCE_NOT_FOUND] kafka"))
    assert sinks._is_missing_kafka_jar(
        Exception("java.lang.ClassNotFoundException: kafka.DefaultSource")
    )
    # real delivery failures mention 'kafka' too — must NOT be misclassified
    assert not sinks._is_missing_kafka_jar(
        Exception("org.apache.kafka.common.errors.TimeoutException: Topic edi_output "
                  "not present in metadata after 60000 ms.")
    )
    assert not sinks._is_missing_kafka_jar(
        Exception("Connection to node -1 (localhost/127.0.0.1:9092) could not be "
                  "established. Broker may not be available. (kafka client)")
    )
    assert not sinks._is_missing_kafka_jar(
        Exception("SaslAuthenticationException: Authentication failed for kafka user")
    )


def test_write_jsonl_and_parquet(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    sinks.write_jsonl(df, str(tmp_path / "j"))
    sinks.write_parquet(df, str(tmp_path / "p"))
    assert spark.read.json(str(tmp_path / "j")).count() == 1
    assert spark.read.parquet(str(tmp_path / "p")).count() == 1
    assert sinks.collect_rows(df) == [{"k": "a", "v": 1}]


# --- streaming job consumer -------------------------------------------------------


def test_job_stream_end_to_end(spark, tmp_path, sf_dir):
    from etl_edi_data_scrapper_spark.streaming.consumer import run_job_stream

    msg_dir = tmp_path / "messages"
    msg_dir.mkdir()
    out_dir = tmp_path / "out"
    job = {
        "supplier_id": 55,
        "type_id": 3,
        "source": f"{sf_dir}/lineitem.parquet",
        "column_map_rules": {
            "upc": "l_partkey",
            "qty": ["l_quantity", "min"],
            "price": ["l_extendedprice", "max"],
        },
        "version": 2,
    }
    (msg_dir / "job1.jsonl").write_text(json.dumps(job) + "\n")

    results = {}

    def sink(df, cfg):
        sinks.write_parquet(df, str(out_dir / f"supplier_{cfg.supplier_id}"))
        results[cfg.supplier_id] = df.count()

    metrics = []
    q = run_job_stream(
        spark, {3: read_local}, sink,
        source_path=str(msg_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_metrics=metrics.append,
    )
    q.processAllAvailable()
    q.stop()

    assert results == {55: 200}  # 200 distinct partkeys at sf0.001
    out = spark.read.parquet(str(out_dir / "supplier_55"))
    assert set(out.columns) == {"upc", "qty", "price", "supplier_id", "version"}
    assert out.filter(F.col("supplier_id") != 55).count() == 0
    assert metrics and metrics[0]["supplier_id"] == 55
    assert metrics[0]["rows_out"] == 200  # observe() rode the sink action


def test_job_stream_bad_message_reported_not_fatal(spark, tmp_path, sf_dir):
    from etl_edi_data_scrapper_spark.streaming.consumer import process_messages

    good = {
        "supplier_id": 1, "type_id": 3,
        "source": f"{sf_dir}/region.parquet",
        "column_map_rules": {"name": "r_name", "upc": "r_regionkey"},
        "version": 1,
    }
    errors = []
    done = []
    n = process_messages(
        spark,
        [json.dumps(good), "{not json", json.dumps({"supplier_id": 2})],
        {3: read_local},
        sink=lambda df, cfg: done.append(df.count()),
        on_error=lambda m, e: errors.append(type(e).__name__),
    )
    assert n == 1 and done == [5]
    assert errors == ["InvalidConfigError", "InvalidConfigError"]


def test_idempotent_batch_writer_replay_safe(spark, tmp_path):
    """Replaying a batch (same batch_id) must overwrite, not duplicate;
    other batches' output must survive."""
    from etl_edi_data_scrapper_spark import sinks

    out = str(tmp_path / "out")
    writer = sinks.idempotent_batch_writer(out)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    writer(b0, 0)
    writer(b1, 1)
    # crash-replay of batch 0 with different (corrected) content
    writer(spark.createDataFrame([(1, "a2"), (2, "b2")], "id long, v string"), 0)
    got = {(r.id, r.v, r.batch_id) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a2", 0), (2, "b2", 0), (3, "c", 1)}


def test_job_stream_message_flood_trips_guard(spark, tmp_path, monkeypatch):
    # a subscription misrouted to a data topic must fail fast, not collect
    # an unbounded batch onto the driver
    from etl_edi_data_scrapper_spark.streaming import consumer

    monkeypatch.setattr(consumer, "MAX_MESSAGES_PER_BATCH", 5)
    msg_dir = tmp_path / "flood"
    msg_dir.mkdir()
    (msg_dir / "flood.jsonl").write_text(
        "\n".join('{"bogus": %d}' % i for i in range(50)) + "\n"
    )
    q = consumer.run_job_stream(
        spark, {}, lambda df, cfg: None,
        source_path=str(msg_dir),
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_error=lambda m, e: None,
    )
    import pytest as _pytest
    from pyspark.errors import StreamingQueryException

    with _pytest.raises(StreamingQueryException, match="data topic"):
        q.processAllAvailable()
        q.awaitTermination(10)
    q.stop()


def test_write_range_clustered_files_own_disjoint_key_ranges(spark, tmp_path):
    """The layout contract itself, asserted from the parquet footers: each
    output file's [min, max] interval of the cluster key must not overlap
    any other file's — that disjointness is exactly what lets a selective
    scan skip whole files via stats pushdown at 100 TB."""
    import glob

    import pyarrow.parquet as pq

    from etl_edi_data_scrapper_spark.sinks import write_range_clustered

    df = spark.range(0, 10_000).selectExpr(
        "CAST(pmod(id * 2654435761, 10000) AS LONG) AS k",  # scrambled order
        "id AS payload",
    )
    out = str(tmp_path / "clustered")
    write_range_clustered(df, out, cluster_by=["k"], n_files=8)

    intervals = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k" and col.statistics is not None
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        intervals.append((min(mins), max(maxs)))
    assert len(intervals) >= 4  # range partitioner actually spread the data
    intervals.sort()
    for (lo1, hi1), (lo2, hi2) in zip(intervals, intervals[1:]):
        assert hi1 <= lo2, f"files overlap: [{lo1},{hi1}] vs [{lo2},{hi2}]"

    # rows survive the relayout and a selective filter stays correct
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.filter("k < 100").count() == df.filter("k < 100").count()

    # partition_by path: stats must stay tight WITHIN each directory too
    out2 = str(tmp_path / "clustered_part")
    df2 = df.selectExpr("*", "CAST(pmod(payload, 2) AS INT) AS tenant")
    write_range_clustered(df2, out2, cluster_by=["k"], n_files=4, partition_by=["tenant"])
    for tenant_dir in glob.glob(out2 + "/tenant=*"):
        ivs = []
        for f in glob.glob(tenant_dir + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            stats = [md.row_group(rg).column(0).statistics for rg in range(md.num_row_groups)]
            ivs.append((min(s.min for s in stats), max(s.max for s in stats)))
        assert len(ivs) >= 2
        ivs.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ivs, ivs[1:]):
            assert hi1 <= lo2, f"{tenant_dir}: [{lo1},{hi1}] overlaps [{lo2},{hi2}]"
    assert spark.read.parquet(out2).count() == 10_000

    import pytest

    with pytest.raises(ValueError, match="cluster_by"):
        write_range_clustered(df, out, cluster_by=[])


def test_write_zorder_clustered_bounds_both_dimensions(spark, tmp_path):
    """Z-order layout: with a 100x100 grid written into 16 files, every
    file's min/max span on BOTH columns must be a fraction of the full
    domain (single-key clustering would leave the other column's span at
    ~full domain in every file) — that two-dimensional stats tightness is
    what makes predicates on either column skip files."""
    import glob

    import pyarrow.parquet as pq

    from etl_edi_data_scrapper_spark.sinks import write_zorder_clustered

    df = spark.range(0, 10_000).selectExpr(
        "CAST(pmod(id * 2654435761, 10000) AS LONG) AS cell"
    ).selectExpr("cell % 100 AS x", "CAST(cell / 100 AS LONG) AS y", "cell AS payload")
    out = str(tmp_path / "zorder")
    write_zorder_clustered(df, out, cols=("x", "y"), n_files=16, bits=8)

    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 8
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        d = {}
        for name in ("x", "y"):
            idx = schema_names.index(name)
            stats = [md.row_group(rg).column(idx).statistics for rg in range(md.num_row_groups)]
            d[name] = max(s.max for s in stats) - min(s.min for s in stats)
        spans.append(d)
    # full domain span is 99 per dimension. Clustering on x alone leaves
    # EVERY file's y span at ~99; the z-curve keeps the MEAN span of both
    # dimensions well under the domain (a few files straddle a major
    # curve boundary and wrap the minor dimension — inherent to any
    # linearized space-filling curve, so assert the mean, not the max)
    mean_x = sum(d["x"] for d in spans) / len(spans)
    mean_y = sum(d["y"] for d in spans) / len(spans)
    assert mean_x <= 60, (mean_x, spans)
    assert mean_y <= 60, (mean_y, spans)

    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert "__z" not in back.columns  # layout key is not part of the data
    assert back.filter("x = 7 AND y = 3").count() == df.filter("x = 7 AND y = 3").count()

    # the point of the layout: a selective predicate on EITHER key alone
    # touches a strict subset of the files (single-key clustering would
    # concentrate only its own key; the z-curve concentrates both)
    total_files = len(files)
    for pred in ("x = 7", "y = 3"):
        touched = (
            back.filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert 0 < touched < total_files, (pred, touched, total_files)
