"""Path grammar, index diff and ordering (S4/S5/O1/O3 parity)."""

from __future__ import annotations

from tidb2dw_spark.sources.changelog import (
    DmlPathKey,
    diff_dml_maps,
    generate_dml_file_path,
    parse_dml_file_path,
    parse_schema_file_path,
    sorted_pending_keys,
)


def test_parse_non_partitioned():
    f = parse_dml_file_path("tpch/orders/1/2024-01-02/CDC000042.csv")
    assert f.key == DmlPathKey("tpch", "orders", 1, 0, "2024-01-02")
    assert f.index == 42


def test_parse_partitioned():
    f = parse_dml_file_path("tpch/orders/3/17/2024-01-02/CDC000007.csv")
    assert f.key.partition_num == 17
    assert f.key.version == 3


def test_parse_schema_file():
    key, ver, crc = parse_schema_file_path("tpch/orders/2/meta/schema_2_12345.json")
    assert key == DmlPathKey("tpch", "orders", 2, -1, "")
    assert (ver, crc) == (2, 12345)
    assert key.is_ddl_barrier


def test_generate_roundtrip():
    key = DmlPathKey("tpch", "orders", 5, 0, "2024-03-01")
    path = generate_dml_file_path(key, 9)
    assert path == "tpch/orders/5/2024-03-01/CDC000009.csv"
    assert parse_dml_file_path(path).key == key


def test_ddl_barrier_sorts_first():
    dml_v1 = DmlPathKey("a", "t", 1, 0, "2024-01-01")
    dml_v2 = DmlPathKey("a", "t", 2, 0, "2024-01-01")
    ddl_v2 = DmlPathKey("a", "t", 2, -1, "")
    assert sorted_pending_keys([dml_v2, dml_v1, ddl_v2]) == [dml_v1, ddl_v2, dml_v2]


def test_diff_dml_maps_emits_only_new_ranges():
    key = DmlPathKey("a", "t", 1, 0, "2024-01-01")
    current = {key: (1, 5)}
    assert diff_dml_maps(current, {}) == {key: (1, 5)}
    assert diff_dml_maps(current, {key: 3}) == {key: (4, 5)}
    assert diff_dml_maps(current, {key: 5}) == {}
