"""InputConfig/SubSource validation — mirrors the reference's
`tests/Unit/Service/Config/InputConfigTest.php` cases + SubSource rules."""

import pytest

from etl_edi_data_scrapper_spark.plans.config import (
    InputConfig,
    InvalidConfigError,
    SubSource,
)

VALID = {
    "supplier_id": 102,
    "name": "Example CSV HTTP Supplier",
    "type_id": 2,
    "source": "https://example.com/feeds/inventory.csv",
    "range": None,
    "column_map_rules": {
        "qty": ["Quantity", "min"],
        "upc": "UPC",
        "price": ["Wholesale", "max"],
        "status": ["Sublocation", "addArray"],
    },
    "version": 1,
}


def test_happy_path():
    cfg = InputConfig.from_message(VALID)
    assert cfg.supplier_id == 102
    assert cfg.type_id == 2
    assert not cfg.is_multi_source
    assert cfg.unique_index == "upc"


@pytest.mark.parametrize("missing", ["supplier_id", "source", "column_map_rules", "version"])
def test_required_fields(missing):
    msg = {k: v for k, v in VALID.items() if k != missing}
    with pytest.raises(InvalidConfigError):
        InputConfig.from_message(msg)


def test_type_id_null_means_multi_source():
    msg = dict(VALID)
    msg["type_id"] = None
    msg["source"] = [
        {"type_id": 2, "filename": "a.csv", "key": "upc", "fields": ["qty"]},
        {"type_id": 7, "filename": "b.csv", "key": "sku", "fields": ["price"]},
    ]
    cfg = InputConfig.from_message(msg)
    assert cfg.is_multi_source
    assert isinstance(cfg.source[0], SubSource)
    assert cfg.source[1].key == "sku"


def test_multi_source_accepts_json_string():
    msg = dict(VALID)
    msg["type_id"] = None
    msg["source"] = (
        '[{"type_id": 2, "filename": "a.csv", "key": "upc", "fields": ["qty"]}]'
    )
    cfg = InputConfig.from_message(msg)
    assert cfg.is_multi_source and len(cfg.source) == 1


def test_json_string_source_with_type_id_stays_single():
    # divergence from reference bug §2.8.4: a JSON-ish string source with a
    # concrete type_id is NOT multi-source
    msg = dict(VALID)
    msg["source"] = '["not", "multi"]'
    cfg = InputConfig.from_message(msg)
    assert not cfg.is_multi_source


def test_invalid_type_id():
    msg = dict(VALID)
    msg["type_id"] = 9
    with pytest.raises(InvalidConfigError):
        InputConfig.from_message(msg)


def test_subsource_requires_fields():
    with pytest.raises(InvalidConfigError):
        SubSource.from_dict({"type_id": 2, "filename": "a.csv", "key": "upc", "fields": []})


def test_range_null_allowed():
    cfg = InputConfig.from_message(dict(VALID))
    assert cfg.range is None


def test_message_as_json_string():
    import json

    cfg = InputConfig.from_message(json.dumps(VALID))
    assert cfg.supplier_id == 102
