"""WARC (Web ARChive, ISO 28500) source — the crawl world's standard
archive format (Common Crawl, Heritrix, wget --warc): read WARC files as
binary blobs and explode them into per-record rows, Spark-side.

Format essentials handled here (WARC/1.0 and 1.1):
  * a record = version line + CRLF header lines until a blank line +
    exactly Content-Length payload bytes + CRLF CRLF separator;
  * header names are case-insensitive; WARC-Type selects record kind
    (warcinfo / request / response / metadata ...);
  * records concatenate back-to-back in one file (commonly .warc.gz with
    one gzip member per record — member-gzip is transparent to Python's
    gzip/zlib, and the plumbing here takes the DEcompressed stream; the
    per-member split at 100 TB happens in the input format layer).

The parser is deliberately tolerant: a malformed or truncated trailing
record stops the scan of THAT file without failing the task (poison-guard
policy, same as the media kernels). No external warc library involved —
the format is simple enough to parse exactly, and the container has none.

Scale shape: one WARC file = one blob row = one mapInPandas unit; files
are independent, so a 100 TB archive parallelizes by file with zero
shuffles until the first downstream aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"


def encode_warc(records) -> bytes:
    """Serialize (warc_type, target_uri, date, payload: bytes) tuples into
    one standards-shaped WARC byte stream (used by tests/fixtures; a real
    deployment reads archives produced by crawlers)."""
    out = bytearray()
    for warc_type, uri, date, payload in records:
        out += b"WARC/1.0" + _CRLF
        out += f"WARC-Type: {warc_type}".encode() + _CRLF
        if uri is not None:
            out += f"WARC-Target-URI: {uri}".encode() + _CRLF
        out += f"WARC-Date: {date}".encode() + _CRLF
        out += f"Content-Length: {len(payload)}".encode() + _CRLF
        out += _CRLF
        out += payload
        out += _CRLF + _CRLF
    return bytes(out)


def parse_warc(blob: bytes):
    """Yield (warc_type, target_uri, date, payload: bytes) per record;
    stops (without raising) at the first malformed/truncated record."""
    b = bytes(blob)
    pos = 0
    n = len(b)
    while pos < n:
        # skip inter-record padding
        while b.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        end_hdr = b.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            return
        header = b[pos:end_hdr]
        lines = header.split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            return
        fields = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get(b"content-length", b""))
        except ValueError:
            return
        # a negative length would move pos BACKWARD and loop forever on
        # the same record — reject it like any other malformed framing
        if length < 0:
            return
        start = end_hdr + 4
        if start + length > n:
            return
        payload = b[start:start + length]
        yield (fields.get(b"warc-type", b"").decode("ascii", "replace"),
               (fields.get(b"warc-target-uri") or b"").decode("utf-8",
                                                              "replace")
               or None,
               fields.get(b"warc-date", b"").decode("ascii", "replace"),
               payload)
        pos = start + length


def read_warc(df: DataFrame, blob_col: str = "warc_blob",
              file_col: str = "file_id") -> DataFrame:
    """Explode WARC file blobs into per-record rows
    (file_id, rec_no, warc_type, target_uri, payload_len, payload_text).
    Payload text is UTF-8 decoded with replacement (binary payloads
    downstream should re-read the archive with a binary-preserving
    variant). Pure mapInPandas over the blobs — zero shuffles."""
    import pandas as pd

    out_schema = T.StructType([
        df.schema[file_col],
        T.StructField("rec_no", T.IntegerType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("payload_len", T.IntegerType(), False),
        T.StructField("payload_text", T.StringType(), True),
    ])

    def run(batches):
        for pdf in batches:
            fids, recs, types, uris, lens, texts = [], [], [], [], [], []
            for fid, blob in zip(pdf[file_col], pdf[blob_col]):
                if blob is None:
                    continue
                for i, (wt, uri, _date, payload) in enumerate(
                        parse_warc(blob)):
                    fids.append(fid)
                    recs.append(i)
                    types.append(wt)
                    uris.append(uri)
                    lens.append(len(payload))
                    texts.append(payload.decode("utf-8", "replace"))
            yield pd.DataFrame({
                file_col: fids,
                "rec_no": pd.Series(recs, dtype="int32"),
                "warc_type": types,
                "target_uri": uris,
                "payload_len": pd.Series(lens, dtype="int32"),
                "payload_text": texts})

    return df.mapInPandas(run, out_schema)
