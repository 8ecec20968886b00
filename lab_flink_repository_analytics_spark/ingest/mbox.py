"""Mbox ingester: mailing-list archives → Email rows → Parquet.

Replicates ApacheMboxSource's parsing semantics (ref ApacheMboxSource.java)
with the Python stdlib (``mailbox`` + ``email``):

* month-named archive files ``{list}-{yyyy-mm}.mbox`` downloaded from
  lists.apache.org (:118-122) — here the caller supplies the local path /
  URL fetch is a separate concern
* multipart bodies: recurse into parts, append text/plain parts to
  textBody and text/html to htmlBody, skip non-inline attachments
  (:263-293); empty body → NULL (:255-260)
* author: FROM field, falling back to SENDER, else "unknown" (:302-319)
* charset tolerance: the reference tries 6 charsets in order (:73-80);
  the stdlib parser decodes per-part with errors="replace" fallback
* date filter ``date > lastDate`` for incremental resume (:157, ≙
  ListState checkpoint :341-358); ms truncation (TIMESTAMP(3))
"""

from __future__ import annotations

import mailbox
from datetime import datetime, timezone
from email.header import decode_header, make_header
from email.message import Message
from email.utils import parseaddr, parsedate_to_datetime

from pyspark.sql import DataFrame, SparkSession

from lab_flink_repository_analytics_spark import schemas

_CHARSETS = ["utf-8", "iso-8859-1", "windows-1252", "iso-8859-15", "us-ascii", "utf-16"]


def _decode_payload(part: Message) -> str:
    payload = part.get_payload(decode=True)
    if payload is None:
        return ""
    charsets = [part.get_content_charset()] if part.get_content_charset() else []
    for cs in charsets + _CHARSETS:
        try:
            return payload.decode(cs)
        except (UnicodeDecodeError, LookupError):
            continue
    return payload.decode("utf-8", errors="replace")


def _walk_bodies(msg: Message) -> tuple[str | None, str | None]:
    text_parts: list[str] = []
    html_parts: list[str] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        disp = part.get_content_disposition()
        if disp is not None and disp != "inline":
            continue  # attachment
        ctype = part.get_content_type()
        if ctype == "text/plain":
            text_parts.append(_decode_payload(part))
        elif ctype == "text/html":
            html_parts.append(_decode_payload(part))
    text = "".join(text_parts)
    html = "".join(html_parts)
    return (text or None), (html or None)


def _header_str(msg: Message, name: str) -> str | None:
    raw = msg.get(name)
    if raw is None:
        return None
    try:
        return str(make_header(decode_header(raw)))
    except Exception:
        return raw


def _author(msg: Message) -> tuple[str, str | None]:
    """(fromRaw, fromEmail) with FROM → SENDER → 'unknown' fallback."""
    for field in ("From", "Sender"):
        raw = _header_str(msg, field)
        if raw:
            _, addr = parseaddr(raw)
            return raw, (addr or None)
    return "unknown", None


def _parse_date(msg: Message) -> datetime | None:
    raw = msg.get("Date")
    if not raw:
        return None
    try:
        dt = parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)


def read_emails(mbox_path: str, after: datetime | None = None) -> list[dict]:
    """Parse an mbox file into Email dicts (schemas.EMAIL shape)."""
    out = []
    for msg in mailbox.mbox(mbox_path):
        date = _parse_date(msg)
        if date is None or (after is not None and date <= after):
            continue
        from_raw, from_email = _author(msg)
        text_body, html_body = _walk_bodies(msg)
        out.append(
            {
                "date": date,
                "fromEmail": from_email,
                "fromRaw": from_raw,
                "htmlBody": html_body,
                "subject": _header_str(msg, "Subject"),
                "textBody": text_body,
            }
        )
    return out


def emails_df(
    spark: SparkSession,
    mbox_path: str,
    after: datetime | None = None,
    rows: list[dict] | None = None,
) -> DataFrame:
    """Pass ``rows`` to reuse a :func:`read_emails` result (no re-parse)."""
    if rows is None:
        rows = read_emails(mbox_path, after)
    tuples = [tuple(r[f.name] for f in schemas.EMAIL.fields) for r in rows]
    return spark.createDataFrame(tuples, schemas.EMAIL)


def ingest_to_parquet(
    spark: SparkSession,
    mbox_path: str,
    output_path: str,
    after: datetime | None = None,
) -> datetime | None:
    """Append new emails to parquet (partitioned by month for window
    pruning); returns the new high-water-mark date."""
    from pyspark.sql import functions as F

    rows = read_emails(mbox_path, after)
    if not rows:
        return after
    df = emails_df(spark, mbox_path, after, rows=rows)
    (
        df.withColumn("month", F.date_format("date", "yyyy-MM"))
        .repartition("month")
        .write.mode("append")
        .partitionBy("month")
        .parquet(output_path)
    )
    return max(r["date"] for r in rows)
