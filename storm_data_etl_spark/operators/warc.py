"""WARC-style crawl-record containers: JVM-side record builder + an
independent byte-level record parser.

Crawl ingestion is the front door of a pretraining pipeline: multi-record
container files (WARC/1.1) arrive as opaque blobs and must be split into
records by header parsing + Content-Length framing — never by scanning the
payload, which may itself contain header-like bytes. The builder here is a
pure Catalyst string expression (codegen'd, no Python); the parser is an
Arrow-batched byte scanner with NO shared code with the builder, so a
parity check between the two exercises the real framing logic (mirrors the
discipline of operators/multimodal.py synth_* vs decode_*).

Reference parity: the reference ingests single-record Kafka payloads
(internal/adapter/kafka/reader.go:37-72); this operator family is the
batch-file analogue a 100 TB crawl corpus needs.

Record wire format (CRLF line endings, Content-Length framing):

    WARC/1.1\r\n
    WARC-Record-ID: <urn:doc:{doc_id}>\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: https://{source}.example.com/doc/{doc_id}\r\n
    Content-Length: {octet_length(payload)}\r\n
    \r\n
    {payload}\r\n\r\n
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Parser output schema (Spark DDL and the exactly-matching Arrow schema —
#: from_pydict inference would widen bool/int32 and break the JVM accessor).
PARSED_DDL = (
    "file_id long, doc_id long, host string, payload_bytes long, "
    "payload_md5 string, parse_ok boolean"
)
_ARROW_SCHEMA = pa.schema(
    [
        ("file_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("host", pa.string()),
        ("payload_bytes", pa.int64()),
        ("payload_md5", pa.string()),
        ("parse_ok", pa.bool_()),
    ]
)


def record_expr(doc_id: Column, source: Column, text: Column) -> Column:
    """One WARC/1.1-style record as a single JVM string expression
    (whole-stage codegen; no Python in the build path). NULL payloads are
    written as empty (Content-Length: 0)."""
    body = F.coalesce(text, F.lit(""))
    did = doc_id.cast("string")
    return F.concat(
        F.lit("WARC/1.1\r\nWARC-Record-ID: <urn:doc:"),
        did,
        F.lit(">\r\nWARC-Type: response\r\nWARC-Target-URI: https://"),
        source,
        F.lit(".example.com/doc/"),
        did,
        F.lit("\r\nContent-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n\r\n"),
    )


def _scan(blob: bytes):
    """Yield (doc_id, host, payload_bytes, payload_md5, ok) per record.

    Framing: headers end at the first CRLFCRLF from the record start; the
    payload is then taken by Content-Length (NEVER by delimiter search —
    payloads may contain CRLFCRLF) and must be followed by the CRLFCRLF
    record terminator. Any violation emits one not-ok row and abandons the
    rest of the blob (framing is lost once a length is wrong)."""
    pos, n = 0, len(blob)
    while pos < n:
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield (-1, "", 0, "", False)
            return
        lines = blob[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not lines or lines[0] != "WARC/1.1":
            yield (-1, "", 0, "", False)
            return
        fields: dict[str, str] = {}
        for line in lines[1:]:
            key, sep, val = line.partition(": ")
            if sep:
                fields[key] = val
        try:
            clen = int(fields["Content-Length"])
            rid = fields["WARC-Record-ID"]
            uri = fields["WARC-Target-URI"]
            if not (rid.startswith("<urn:doc:") and rid.endswith(">")):
                raise ValueError(rid)
            doc_id = int(rid[len("<urn:doc:") : -1])
            host = uri.removeprefix("https://").split("/", 1)[0]
            host = host.removesuffix(".example.com")
        except (KeyError, ValueError):
            yield (-1, "", 0, "", False)
            return
        body_start = hdr_end + 4
        payload = blob[body_start : body_start + clen]
        if (
            len(payload) != clen
            or blob[body_start + clen : body_start + clen + 4] != b"\r\n\r\n"
        ):
            yield (doc_id, host, 0, "", False)
            return
        yield (doc_id, host, clen, hashlib.md5(payload).hexdigest(), True)
        pos = body_start + clen + 4


def parse_records(files: DataFrame) -> DataFrame:
    """Split (file_id, blob) container blobs into per-record rows.

    Arrow-batched mapInArrow — one Python roundtrip per batch of files, the
    scanner itself is pure bytes work. Per-file output is independent, so
    the operator parallelizes by input partitioning alone (no shuffle)."""

    def kernel(batches):  # noqa: ANN001
        for batch in batches:
            fids = batch.column("file_id").to_pylist()
            blobs = batch.column("blob").to_pylist()
            rows: dict[str, list] = {name: [] for name in _ARROW_SCHEMA.names}
            for fid, blob in zip(fids, blobs):
                for doc_id, host, nbytes, pmd5, ok in _scan(blob or b""):
                    rows["file_id"].append(fid)
                    rows["doc_id"].append(doc_id)
                    rows["host"].append(host)
                    rows["payload_bytes"].append(nbytes)
                    rows["payload_md5"].append(pmd5)
                    rows["parse_ok"].append(ok)
            yield pa.RecordBatch.from_pydict(rows, schema=_ARROW_SCHEMA)

    return files.mapInArrow(kernel, PARSED_DDL)
