"""Excel (.xlsx) ingestion without an Excel engine dependency.

Spark twin of the reference's ``_profile_excel``
(``profiling.py:300-318``: ``pd.ExcelFile`` → first sheet → header row
+ full frame) and the xlsx branch of its archive profiling
(``profiling.py:384``). The container has no openpyxl/xlrd, and none is
needed: an .xlsx IS a zip of XML, so the member parse is stdlib
``zipfile`` + ``xml.etree`` — workbook.xml for first-sheet order,
workbook.xml.rels for the sheet target, sharedStrings.xml for the
string pool, then one pass over the sheet's ``<row>``/``<c>`` elements.

Scale shape mirrors ``archives.py``: a workbook is not splittable, so
the parallel unit is the FILE — ``binaryFile`` yields one task per
workbook and ``mapInPandas`` parses inside it, streaming Arrow batches
out. No driver-side loop, no shuffle. Output columns are string-typed;
the caller casts after load, like the reference's ``dtype="string"``
delimited reads.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

if TYPE_CHECKING:
    import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'B7' -> 1 (zero-based column index from the A1-style reference)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _first_sheet_path(zf) -> str:
    """Resolve the workbook's FIRST sheet (pd.ExcelFile.sheet_names[0])
    via workbook.xml order + the rels map — not filename order, which
    lies when sheets were reordered."""
    import xml.etree.ElementTree as ET

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    first = wb.find(f"{_NS}sheets/{_NS}sheet")
    if first is None:
        raise ValueError("workbook has no sheets")
    rid = first.get(f"{_RNS}id")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    for rel in rels.findall(f"{rns}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target").lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"workbook relationship {rid} not found")


def _shared_strings(zf) -> list[str]:
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    # Each <si> may be a plain <t> or rich-text runs — concat all <t>.
    return [
        "".join(t.text or "" for t in si.iter(f"{_NS}t"))
        for si in root.findall(f"{_NS}si")
    ]


def _cell_value(cell, strings: list[str]) -> str | None:
    import xml.etree.ElementTree as ET  # noqa: F401  (namespace consistency)

    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return strings[int(v.text)]
    if ctype == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    # 'n' (number), 'str' (formula cached string), 'e' (error): raw text.
    return v.text


def parse_xlsx(content: bytes) -> tuple[list[str], list[list[str | None]]]:
    """First sheet of one workbook -> (header, data rows).

    Row 1 is the header (pd.read_excel's default), remaining rows are
    data; values are the raw stored strings (shared/inline strings
    resolved, booleans as TRUE/FALSE, numbers as stored). Rows are
    padded/truncated to the header width — same cross-row behavior the
    delimited readers give heterogenous files.
    """
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
        strings = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_path(zf)))
        rows: list[list[str | None]] = []
        for row_el in sheet.iter(f"{_NS}row"):
            cells: dict[int, str | None] = {}
            seq = 0
            for cell in row_el.findall(f"{_NS}c"):
                ref = cell.get("r")
                col = _col_index(ref) if ref else seq
                seq = col + 1
                cells[col] = _cell_value(cell, strings)
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])
    if not rows:
        return [], []
    header = [h if h is not None else f"col_{i}" for i, h in enumerate(rows[0])]
    width = len(header)
    data = [(r + [None] * width)[:width] for r in rows[1:]]
    return header, data


def read_excel(
    spark: SparkSession, path_glob: str, columns: list[str]
) -> DataFrame:
    """Read .xlsx workbooks (first sheet each) into one string-typed
    DataFrame.

    ``columns`` is the output contract, exactly as in
    ``archives.read_zipped_csv``: header names are matched by value,
    missing columns yield nulls, extras are dropped.
    """
    schema = StructType(
        [StructField("_workbook", StringType(), False)]
        + [StructField(c, StringType(), True) for c in columns]
    )

    def _read(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                header, data = parse_xlsx(content)
                frame = pd.DataFrame(data, columns=header, dtype="string")
                yield pd.DataFrame(
                    {
                        "_workbook": str(path).rsplit("/", 1)[-1],
                        **{
                            c: frame[c].astype("string")
                            if c in frame.columns
                            else pd.Series(
                                pd.NA, index=frame.index, dtype="string"
                            )
                            for c in columns
                        },
                    }
                )

    bf = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return bf.mapInPandas(_read, schema)


EXCEL_PROFILE_SCHEMA = StructType(
    [
        StructField("workbook", StringType(), False),
        StructField("row_count", LongType(), False),
        StructField("column_count", LongType(), False),
        StructField("columns", StringType(), False),
    ]
)


def profile_excel(spark: SparkSession, path_glob: str) -> DataFrame:
    """Per-workbook profile row — row_count / column_count / columns of
    the first sheet, the exact fields ``_profile_excel``
    (profiling.py:313-318) reports, computed one task per file."""

    def _profile(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                header, data = parse_xlsx(content)
                rows.append(
                    {
                        "workbook": str(path).rsplit("/", 1)[-1],
                        "row_count": len(data),
                        "column_count": len(header),
                        "columns": ",".join(header),
                    }
                )
            yield pd.DataFrame(rows)

    bf = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return bf.mapInPandas(_profile, EXCEL_PROFILE_SCHEMA).orderBy("workbook")
