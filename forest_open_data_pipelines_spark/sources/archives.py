"""Zipped-CSV ingestion: member pick, delimiter sniff, encoding fallback.

Spark twin of the reference's archive handling
(``audits/utils.py:24-77`` — ``pick_archive_member`` takes the first
sorted .csv/.txt member, ``detect_delimiter`` sniffs 8 KiB with
csv.Sniffer over ``;,|\\t`` + the semicolon/comma fallback,
``read_member_csv`` tries utf-8 → latin-1 → cp1252 with bad lines
skipped). Every real reference dataset arrives zipped
(``reports/builders/bdqueimadas_incremental.py:651-789`` downloads and
unpacks month archives), so this is the front door, not a nicety.

Scale shape: a zip is not splittable, so the parallel unit is the
ARCHIVE — ``binaryFile`` gives one task per zip and ``mapInPandas``
unpacks/parses inside that task, streaming Arrow batches out. 100 TB of
monthly archives = thousands of zips = thousands of independent tasks;
no driver-side loop, no shuffle (the parse is scan-stage). Output
columns are typed string — the caller casts after load, exactly like
the reference's ``dtype="string"`` reads.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from forest_open_data_pipelines_spark.sources.formats import detect_delimiter

if TYPE_CHECKING:
    import pandas as pd

ENCODING_FALLBACK = ("utf-8", "latin-1", "cp1252")
MEMBER_SUFFIXES = (".csv", ".txt")
SNIFF_BYTES = 8192


def pick_archive_member(names: list[str]) -> str:
    """First sorted non-directory member with a readable suffix
    (audits/utils.py:24-33)."""
    members = sorted(
        n
        for n in names
        if not n.endswith("/")
        and "." in n.rsplit("/", 1)[-1]
        and "." + n.rsplit(".", 1)[-1].lower() in MEMBER_SUFFIXES
    )
    if not members:
        raise FileNotFoundError("zip has no readable CSV/TXT member")
    return members[0]


def _parse_member(content: bytes) -> tuple["pd.DataFrame", str, str, str]:
    """Unpack one archive: (frame, member, delimiter, encoding)."""
    import io
    import zipfile

    import pandas as pd

    with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
        member = pick_archive_member(zf.namelist())
        with zf.open(member) as f:
            sample = f.read(SNIFF_BYTES).decode("utf-8", errors="ignore")
        delimiter = detect_delimiter(sample, member.rsplit(".", 1)[-1])
        raw = zf.read(member)

    last_error: Exception | None = None
    for encoding in ENCODING_FALLBACK:
        try:
            frame = pd.read_csv(
                io.BytesIO(raw),
                sep=delimiter,
                encoding=encoding,
                dtype="string",
                on_bad_lines="skip",
            )
            return frame, member, delimiter, encoding
        except Exception as e:  # UnicodeDecodeError or parser errors
            last_error = e
    raise RuntimeError("no supported encoding could read the member") from last_error


def read_zipped_csv(
    spark: SparkSession, path_glob: str, columns: list[str]
) -> DataFrame:
    """Read zipped CSV archives into one DataFrame of string columns.

    ``columns`` is the output contract (explicit, like passing a schema
    to ``read_delimited``): members missing a column yield nulls, extra
    member columns are dropped — the cross-file behavior the schema
    audit expects from heterogenous archives.
    """
    schema = StructType(
        [StructField("_archive", StringType(), False)]
        + [StructField(c, StringType(), True) for c in columns]
    )

    def _read(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                frame, _, _, _ = _parse_member(content)
                out = pd.DataFrame(
                    {
                        "_archive": str(path).rsplit("/", 1)[-1],
                        **{
                            c: frame[c].astype("string")
                            if c in frame.columns
                            else pd.Series(pd.NA, index=frame.index, dtype="string")
                            for c in columns
                        },
                    }
                )
                yield out

    bf = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return bf.mapInPandas(_read, schema)


ARCHIVE_PROFILE_SCHEMA = StructType(
    [
        StructField("archive", StringType(), False),
        StructField("member", StringType(), False),
        StructField("delimiter", StringType(), False),
        StructField("encoding", StringType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_columns", LongType(), False),
        StructField("columns", StringType(), False),
    ]
)


def profile_archives(spark: SparkSession, path_glob: str) -> DataFrame:
    """Per-archive audit row: picked member, sniffed delimiter, winning
    encoding, shape, header signature (audits/utils.py read_header_columns
    + read_sample rolled into one distributed pass)."""

    def _profile(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                frame, member, delimiter, encoding = _parse_member(content)
                rows.append(
                    {
                        "archive": str(path).rsplit("/", 1)[-1],
                        "member": member,
                        "delimiter": delimiter,
                        "encoding": encoding,
                        "n_rows": len(frame),
                        "n_columns": len(frame.columns),
                        "columns": ",".join(frame.columns),
                    }
                )
            yield pd.DataFrame(rows)

    bf = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return bf.mapInPandas(_profile, ARCHIVE_PROFILE_SCHEMA).orderBy("archive")
