"""Sheets/Drive handlers driven with fake API clients (the protocol the
real google-api adapters satisfy)."""

import pytest

from etl_edi_data_scrapper_spark.sources import google as g


class FakeSheets:
    def __init__(self, values, fail_times=0, status=429):
        self.values = values
        self.fail_times = fail_times
        self.status = status
        self.calls = 0

    def get_values(self, spreadsheet_id, range_):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise g.TransientApiError(self.status)
        return self.values


SHEET = [
    [" UPC ", "Quantity", "Wholesale"],
    ["0042", " 15 ", "12,99"],
    ["", "", ""],                      # fully empty → dropped
    ["0043", "7"],                     # short → padded with null
    ["0044", "1", "2.50", "EXTRA"],    # over-long → skipped
    ["0045", "3", "9.99"],
]


def test_sheets_header_pad_trim_skip(spark):
    df = g.read_google_sheets(spark, "sheet1", "A1:C", FakeSheets(SHEET), sleep=lambda s: None)
    assert df.columns == ["UPC", "Quantity", "Wholesale"]
    rows = {r.UPC: r for r in df.collect()}
    assert set(rows) == {"0042", "0043", "0045"}   # empty + overlong gone
    assert rows["0042"].Quantity == "15"           # cells trimmed
    assert rows["0043"].Wholesale is None          # short row padded


def test_sheets_retries_transient_then_succeeds(spark):
    naps = []
    client = FakeSheets(SHEET, fail_times=3)
    df = g.read_google_sheets(spark, "s", None, client, sleep=naps.append)
    assert df.count() == 3
    assert client.calls == 4 and naps == [5.0] * 3  # linear 5s backoff


def test_sheets_gives_up_after_budget(spark):
    client = FakeSheets(SHEET, fail_times=99)
    with pytest.raises(g.TransientApiError):
        g.read_google_sheets(spark, "s", None, client, sleep=lambda s: None)
    assert client.calls == 10  # reference budget


def test_sheets_non_retryable_fails_fast(spark):
    client = FakeSheets(SHEET, fail_times=1, status=403)
    with pytest.raises(g.TransientApiError):
        g.read_google_sheets(spark, "s", None, client, sleep=lambda s: None)
    assert client.calls == 1


class FakeDrive:
    def __init__(self, files, contents):
        self.files = files
        self.contents = contents

    def list_files(self, folder_id):
        return self.files

    def download(self, file_id, dest):
        with open(dest, "w") as f:
            f.write(self.contents[file_id])


def test_drive_takes_first_non_trashed_and_dispatches_csv(spark, tmp_path):
    drive = FakeDrive(
        [
            {"id": "t", "name": "old.csv", "mimeType": "text/csv", "trashed": True},
            {"id": "a", "name": "feed.csv", "mimeType": "text/csv", "trashed": False},
            {"id": "b", "name": "other.csv", "mimeType": "text/csv", "trashed": False},
        ],
        {"a": "upc,qty\n1,2\n3,4\n"},
    )
    df = g.read_google_drive_folder(spark, "folder1", None, drive, staging_dir=str(tmp_path))
    assert df.columns == ["upc", "qty"]
    assert df.count() == 2  # only the FIRST non-trashed file


def test_drive_empty_folder_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        g.read_google_drive_folder(spark, "f", None, FakeDrive([], {}), staging_dir=str(tmp_path))


def test_drive_mime_sniff_extensionless_csv(spark, tmp_path):
    # extensionless Drive export: extension dispatch finds nothing, the
    # listing's mimeType routes it to the CSV reader (reference parity,
    # GoogleDriveFolderHandler.php:81-98)
    drive = FakeDrive(
        [{"id": "a", "name": "export_no_ext", "mimeType": "text/csv", "trashed": False}],
        {"a": "upc,qty\n1,2\n"},
    )
    df = g.read_google_drive_folder(spark, "f", None, drive, staging_dir=str(tmp_path))
    assert df.columns == ["upc", "qty"]
    assert df.count() == 1


def test_drive_unsupported_type_raises(spark, tmp_path):
    drive = FakeDrive(
        [{"id": "a", "name": "notes.txt", "mimeType": "text/plain", "trashed": False}],
        {"a": "hello"},
    )
    with pytest.raises(ValueError, match="[Uu]nsupported"):
        g.read_google_drive_folder(spark, "f", None, drive, staging_dir=str(tmp_path))


def test_drive_file_type_table():
    cases = [
        ("feed.csv", "application/octet-stream", "csv"),
        ("export", "text/csv", "csv"),
        ("export", "text/csv; charset=utf-8", "csv"),
        ("feed.xlsx", "", "excel"),
        ("feed.XLS", "", "excel"),
        ("export", "application/vnd.ms-excel", "excel"),
        ("export",
         "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
         "excel"),
        ("notes.txt", "text/plain", "unsupported"),
        ("doc", "application/vnd.google-apps.document", "unsupported"),
    ]
    for name, mime, want in cases:
        assert g.drive_file_type(name, mime) == want, (name, mime)


# --- OAuth token refresh-persist (GoogleApiInputHandler.php:35-65 parity) ----


def _write_token(path, **kw):
    import json

    with open(path, "w") as f:
        json.dump(kw, f)


def test_oauth_fresh_token_no_refresh(tmp_path):
    p = str(tmp_path / "token.json")
    _write_token(p, access_token="live", refresh_token="r", expires_in=3600, created=1000)
    calls = []
    mgr = g.OAuthTokenManager(p, "cid", "sec", fetch_post=lambda u, d: calls.append(d) or {},
                              now=lambda: 1000 + 60)
    assert mgr.access_token() == "live"
    assert calls == []  # not expired → no network


def test_oauth_expired_refreshes_and_persists(tmp_path):
    import json

    p = str(tmp_path / "token.json")
    _write_token(p, access_token="stale", refresh_token="r1", expires_in=3600, created=1000)

    def fake_post(url, form):
        assert url == g.OAuthTokenManager.TOKEN_URL
        assert form["grant_type"] == "refresh_token" and form["refresh_token"] == "r1"
        return {"access_token": "fresh", "expires_in": 3599}  # Google omits refresh_token

    mgr = g.OAuthTokenManager(p, "cid", "sec", fetch_post=fake_post, now=lambda: 1000 + 3600)
    assert mgr.access_token() == "fresh"
    saved = json.load(open(p))
    assert saved["access_token"] == "fresh"
    assert saved["refresh_token"] == "r1"   # preserved (reference drops it)
    assert saved["created"] == 1000 + 3600
    # second call: now fresh, no further refresh
    mgr2 = g.OAuthTokenManager(p, "cid", "sec",
                               fetch_post=lambda u, d: (_ for _ in ()).throw(AssertionError),
                               now=lambda: 1000 + 3600 + 60)
    assert mgr2.access_token() == "fresh"


def test_oauth_expiry_skew_boundary(tmp_path):
    p = str(tmp_path / "token.json")
    _write_token(p, access_token="t", refresh_token="r", expires_in=100, created=0)
    mgr = g.OAuthTokenManager(p, "c", "s", fetch_post=lambda u, d: {}, now=lambda: 69)
    assert not mgr.is_expired(mgr._load())     # 69 < 100 - 30
    mgr.now = lambda: 70
    assert mgr.is_expired(mgr._load())          # 70 >= 100 - 30


def test_oauth_missing_refresh_token_raises(tmp_path):
    p = str(tmp_path / "token.json")
    _write_token(p, access_token="t", expires_in=0, created=0)
    mgr = g.OAuthTokenManager(p, "c", "s", fetch_post=lambda u, d: {}, now=lambda: 100)
    with pytest.raises(ValueError, match="refresh token"):
        mgr.access_token()


def test_oauth_missing_file_raises(tmp_path):
    mgr = g.OAuthTokenManager(str(tmp_path / "nope.json"), "c", "s",
                              fetch_post=lambda u, d: {})
    with pytest.raises(FileNotFoundError):
        mgr.access_token()
