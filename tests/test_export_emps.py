"""EMPS export golden-file test (S10, timeseries_tools.py:407-454)."""

from __future__ import annotations

from datetime import datetime

from tsengine import export_emps


def test_emps_golden(spark, tmp_path):
    rows = []
    # two days for conv A: a normal day with 3 hours, plus Feb-29 (dropped)
    for h, v in [(0, 1.0), (5, 2.5), (23, 1234.5678)]:
        rows.append(("A", datetime(2023, 3, 1, h), v))
    rows.append(("A", datetime(2024, 2, 29, 10), 99.0))   # leap day -> dropped
    rows.append(("A", datetime(2023, 12, 31, 2), 77.0))   # Dec 31 -> dropped
    rows.append(("A", datetime(2023, 3, 2, 1), -0.25))
    # conv B: single day
    rows.append(("B", datetime(2022, 7, 4, 12), 3.0))
    df = spark.createDataFrame(rows, "conv_id string, bucket_ts timestamp, value double")

    paths = export_emps.write_emps(df, str(tmp_path / "emps"))
    assert [p.split("/")[-1] for p in paths] == ["A.csv", "B.csv"]

    a = open(paths[0]).read().splitlines()
    # 3 header lines + 2 data days (leap/dec31 days dropped entirely)
    assert len(a) == 5
    assert a[0].startswith("Antall aar;Startaar;")
    assert a[1] == "1; 2023; 52; 1; 52; 0; 1; 3; VIND"
    assert a[2] == "Vindserier på timenivå;"
    day1 = a[3].split(";")
    assert len(day1) == 24
    assert day1[0] == "    1.000"
    assert day1[5] == "    2.500"
    assert day1[23] == " 1234.568"   # %9.3f rounds
    assert day1[1] == ""             # missing hour -> empty field
    day2 = a[4].split(";")
    assert day2[1] == "   -0.250"

    b = open(paths[1]).read().splitlines()
    assert b[1] == "1; 2022; 52; 1; 52; 0; 1; 3; VIND"
    assert b[3].split(";")[12] == "    3.000"
