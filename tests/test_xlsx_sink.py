"""S8 Excel sink: the written package must be a conforming minimal xlsx.
No openpyxl in this container, so verification unzips the package and
XML-parses the SpreadsheetML parts directly — which is also the stronger
check (it validates the bytes, not a library's tolerance)."""

from __future__ import annotations

import csv
import xml.etree.ElementTree as ET
import zipfile

import pytest

from gov_procurement_spider_spark.operators.xlsx_sink import (
    XLSX_MAX_ROWS,
    _col_letter,
    convert_csv_dir,
    write_df_xlsx,
    write_xlsx,
)

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _read_back(path):
    """xlsx → list of rows; each row is a list of (ref, type, text)."""
    with zipfile.ZipFile(path) as z:
        assert set(z.namelist()) == {
            "[Content_Types].xml",
            "_rels/.rels",
            "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/worksheets/sheet1.xml",
        }
        for part in z.namelist():  # every part must be well-formed XML
            ET.fromstring(z.read(part))
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in sheet.findall(".//m:row", _NS):
        cells = []
        for c in row.findall("m:c", _NS):
            t = c.get("t", "n")
            if t == "inlineStr":
                text = c.find("m:is/m:t", _NS).text or ""
            else:
                text = c.find("m:v", _NS).text
            cells.append((c.get("r"), t, text))
        rows.append(cells)
    return rows


def test_roundtrip_types_and_escaping(tmp_path):
    out = str(tmp_path / "r.xlsx")
    n = write_xlsx(
        out,
        ["名称", "n", "x", "flag", "note"],
        [
            ("采购<A>&\"B\"", 42, 3.25, True, None),
            ("plain", -1, float("nan"), False, "  spaced  "),
        ],
    )
    assert n == 2
    rows = _read_back(out)
    assert [c[2] for c in rows[0]] == ["名称", "n", "x", "flag", "note"]
    r1 = {c[0]: (c[1], c[2]) for c in rows[1]}
    assert r1["A2"] == ("inlineStr", '采购<A>&"B"')
    assert r1["B2"] == ("n", "42")
    assert r1["C2"] == ("n", "3.25")
    assert r1["D2"] == ("b", "1")
    assert "E2" not in r1  # None → no cell
    r2 = {c[0]: (c[1], c[2]) for c in rows[2]}
    assert "C3" not in r2  # NaN → no cell
    assert r2["E3"] == ("inlineStr", "  spaced  ")  # xml:space preserved


def test_column_letters_past_z(tmp_path):
    assert _col_letter(0) == "A" and _col_letter(25) == "Z"
    assert _col_letter(26) == "AA" and _col_letter(27) == "AB"
    assert _col_letter(26 * 27) == "AAA"
    cols = [f"c{i}" for i in range(30)]
    out = str(tmp_path / "wide.xlsx")
    write_xlsx(out, cols, [tuple(range(30))])
    rows = _read_back(out)
    assert rows[1][-1][0] == "AD2"  # 30th column


def test_row_cap_enforced_not_truncated(tmp_path):
    out = str(tmp_path / "cap.xlsx")

    def gen():
        i = 0
        while True:
            i += 1
            yield (i,)

    import gov_procurement_spider_spark.operators.xlsx_sink as xs

    orig = xs.XLSX_MAX_ROWS
    xs.XLSX_MAX_ROWS = 10  # shrink the format cap for the test
    try:
        with pytest.raises(ValueError, match="cap"):
            write_xlsx(out, ["i"], gen())
    finally:
        xs.XLSX_MAX_ROWS = orig
    assert XLSX_MAX_ROWS == 1_048_576
    import os

    assert not os.path.exists(out)  # failed write leaves no artifact


def test_convert_csv_dir_matches_reference_semantics(tmp_path):
    """converter.py:31-47 parity: each CSV (utf-8-sig) → sibling .xlsx,
    source removed on success; empty files are left alone."""
    for name, rows in {
        "a": [["col1", "列2"], ["x", "1"], ["y,z", "2"]],
        "b": [["only_header"]],
    }.items():
        with open(tmp_path / f"{name}.csv", "w", newline="", encoding="utf-8-sig") as f:
            csv.writer(f).writerows(rows)
    (tmp_path / "empty.csv").write_text("")

    assert convert_csv_dir(str(tmp_path)) == 2
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["a.xlsx", "b.xlsx", "empty.csv"]
    rows = _read_back(str(tmp_path / "a.xlsx"))
    assert [c[2] for c in rows[0]] == ["col1", "列2"]
    assert [c[2] for c in rows[1]] == ["x", "1"]
    assert [c[2] for c in rows[2]] == ["y,z", "2"]


def test_s7_csv_sink_chains_into_s8(spark, tmp_path):
    """The reference's actual pipeline: its own CSV output is what the
    converter consumes (converter.py:35 reads the crawler's utf-8-sig
    files). Our S7 sink's part file must convert cleanly — BOM stripped by
    the utf-8-sig read, 'N/A' fills intact, one xlsx per part."""
    from gov_procurement_spider_spark.plans.records_pipeline import csv_compat_sink

    df = spark.createDataFrame(
        [("项目A", "1200.50"), ("项目B", None)], ["名称", "单价"]
    )
    out = str(tmp_path / "report")
    csv_compat_sink(df, out)
    assert convert_csv_dir(out) == 1
    import glob as _glob

    assert not _glob.glob(out + "/*.csv")
    xlsx = _glob.glob(out + "/*.xlsx")
    assert len(xlsx) == 1
    rows = _read_back(xlsx[0])
    assert [c[2] for c in rows[0]] == ["名称", "单价"]  # header BOM-free
    body = {(r[0][2], r[1][2]) for r in rows[1:]}
    # '1200.50' becomes a NUMBER cell (1200.5) — the reference converter's
    # pandas read_csv→to_excel does the same dtype inference (round-4 ADVICE);
    # 'N/A' fills stay textual
    assert body == {("项目A", "1200.5"), ("项目B", "N/A")}


def test_write_df_xlsx_streams_spark_frame(spark, tmp_path):
    df = spark.range(200).selectExpr("id", "concat('u', id) AS name")
    out = str(tmp_path / "df.xlsx")
    assert write_df_xlsx(df, out) == 200
    rows = _read_back(out)
    assert len(rows) == 201
    assert [c[2] for c in rows[0]] == ["id", "name"]
    got = {(r[0][2], r[1][2]) for r in rows[1:]}
    assert got == {(str(i), f"u{i}") for i in range(200)}


def test_control_chars_and_infinities_never_corrupt_the_sheet(tmp_path):
    """Round-4 review findings: scraped text with XML-illegal control chars
    must not produce an unreadable workbook (convert_csv_dir deletes the
    source!), and non-finite floats have no xsd:double spelling — both are
    sanitized, and the result still parses."""
    out = str(tmp_path / "hostile.xlsx")
    write_xlsx(
        out,
        ["txt", "x"],
        [("page\x0cbreak\x00null", float("inf")), ("ok\tkeep\nlines", float("-inf"))],
    )
    rows = _read_back(out)  # _read_back ET-parses every part — the real gate
    r1 = {c[0]: c[2] for c in rows[1]}
    assert r1["A2"] == "page�break�null"
    assert "B2" not in r1  # inf → blank cell, like NaN
    r2 = {c[0]: c[2] for c in rows[2]}
    assert r2["A3"] == "ok\tkeep\nlines"  # XML-legal whitespace preserved


def test_convert_csv_dir_numeric_cells_and_per_file_isolation(tmp_path):
    """Round-4 ADVICE: (a) numeric-looking CSV values become NUMBER cells
    (no t= attribute), matching the reference's pandas dtype inference;
    (b) one failing file is skipped with its source kept while the rest
    convert."""
    import warnings
    import xml.etree.ElementTree as ET
    import zipfile

    (tmp_path / "good.csv").write_text(
        "name,qty,price,note\nwidget,3,19.99,N/A\n", encoding="utf-8-sig"
    )
    # invalid utf-8 makes the csv read raise mid-directory
    (tmp_path / "bad.csv").write_bytes(b"\xff\xfe\x00broken")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert convert_csv_dir(str(tmp_path)) == 1
    assert any("bad.csv" in str(x.message) for x in rec)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["bad.csv", "good.xlsx"]  # failed source kept

    with zipfile.ZipFile(tmp_path / "good.xlsx") as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    data_cells = root.findall(f"{ns}sheetData/{ns}row")[1].findall(f"{ns}c")
    kinds = [c.get("t") for c in data_cells]
    # str, int, float, str — ints/floats are typed NUMBER cells (t=None)
    assert kinds == ["inlineStr", None, None, "inlineStr"]
    assert data_cells[1].find(f"{ns}v").text == "3"
    assert data_cells[2].find(f"{ns}v").text == "19.99"
