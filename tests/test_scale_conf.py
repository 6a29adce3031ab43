"""scale_conf.recommend: sizing arithmetic sanity at three scales."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.scale_conf import GB, MB, TB, parse_size, recommend


def test_100tb_1000_executors():
    conf = recommend(100 * TB, 1000, 16, 64)
    parts = int(conf["spark.sql.shuffle.partitions"])
    # 100 TB / 128 MB = 819200 raw → capped at 131072 (scheduler bound);
    # the cap wins over full-wave rounding (AQE coalesce evens the tail)
    assert parts == 131_072
    bc = int(conf["spark.sql.autoBroadcastJoinThreshold"])
    assert 10 * MB <= bc <= 512 * MB
    # 2% of 64 GiB ≈ 1.28 GiB → clamped to 512 MB
    assert bc == 512 * MB


def test_1tb_fits_full_waves():
    conf = recommend(1 * TB, 50, 8, 32)
    parts = int(conf["spark.sql.shuffle.partitions"])
    raw = (1 * TB) // (128 * MB)  # 8192
    assert parts >= raw
    assert parts % (50 * 8) == 0
    # within one extra wave of the raw requirement
    assert parts - raw < 50 * 8


def test_small_scale_floors():
    conf = recommend(10 * GB, 1, 32, 128)
    parts = int(conf["spark.sql.shuffle.partitions"])
    assert parts % 32 == 0 and parts <= 128
    assert conf["spark.sql.adaptive.enabled"] == "true"


def test_wide_rows_halve_scan_split():
    assert (
        int(recommend(1 * TB, 10, 8, 32, wide_rows=True)[
            "spark.sql.files.maxPartitionBytes"
        ])
        == 64 * MB
    )


def test_parse_size():
    assert parse_size("100TB") == 100 * TB
    assert parse_size("1.5GB") == int(1.5 * GB)
    assert parse_size("4096") == 4096
