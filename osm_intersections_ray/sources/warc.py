"""WARC.gz source — the container format Common-Crawl actually ships.

A WARC file is a sequence of records, each individually gzip-compressed and
concatenated (the per-member layout is what makes CC files splittable at
record boundaries); a record is CRLF headers + a Content-Length-delimited
payload + a blank-record separator.  Everything here is stdlib (gzip/zlib)
+ pyarrow — no external wheels.

Scale shape: the writer emits MANY .warc.gz files (one per shard), and the
reader is ``read_binary_files`` (one file per task) + a stateless
``map_batches`` parse — so ingest parallelism is file-count-wide and each
task holds one file's bytes, never the corpus.  The parse is
Content-Length-driven (no splitting on payload bytes), exactly like a real
WARC reader.

The fixture writer derives the .warc.gz files FROM the pages fixture table,
so the whole path (encode -> gzip members -> parse -> rows) is verified
hash-exact against a plain SQL projection of pages.parquet.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

N_WARC_FILES = 8


def _iso8601_us(ts_us: int) -> str:
    """Microsecond ISO-8601 Zulu timestamp from epoch-us (no tz machinery:
    WARC-Date must round-trip bit-exactly through the parser below)."""
    import datetime as dt

    t = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=int(ts_us))
    return t.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


_EPOCH_ORD = 719_163  # datetime.date(1970, 1, 1).toordinal()


def _parse_iso8601_us(s: str) -> int:
    """Fixed-width parse of the exact format `_iso8601_us` emits
    (YYYY-MM-DDTHH:MM:SS.ffffffZ) — runs once per WARC record on the ingest
    hot path, so no strptime (which re-compiles its format string and builds
    datetime objects per call; ~10x slower)."""
    import datetime as dt

    days = dt.date(int(s[0:4]), int(s[5:7]), int(s[8:10])).toordinal() - _EPOCH_ORD
    return (days * 86_400_000_000
            + int(s[11:13]) * 3_600_000_000
            + int(s[14:16]) * 60_000_000
            + int(s[17:19]) * 1_000_000
            + int(s[20:26]))


def encode_warc_record(url: str, ts_us: int, payload: bytes,
                       digest: str | None = None) -> bytes:
    """One WARC/1.0 response record, individually gzipped (CC member
    layout).  ``digest`` (md5 hex of the INTENDED payload) adds the
    WARC-Payload-Digest header real crawls carry — the quarantine reader
    verifies against it."""
    dig = (b"WARC-Payload-Digest: md5:" + digest.encode("ascii") + b"\r\n"
           if digest is not None else b"")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
        b"WARC-Date: " + _iso8601_us(ts_us).encode("ascii") + b"\r\n"
        + dig +
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(payload)).encode("ascii") + b"\r\n"
        b"\r\n"
    )
    return gzip.compress(head + payload + b"\r\n\r\n", 6)


def parse_warc_members(blob: bytes, resync: bool = False):
    """Yield (url, ts_us, payload, headers) from a multi-member .warc.gz
    blob (or an already-inflated WARC stream — Ray's binary reader
    auto-decompresses ``.gz`` paths).  Content-Length-driven — payload
    bytes are never scanned for separators.

    ``resync=False`` (default, the strict contract the round-trip tests
    pin): any structural damage raises.  ``resync=True`` (the quarantine
    reader's mode): on a bad record boundary, an unparseable header block
    or missing mandatory headers, scan forward to the next
    ``WARC/1.0\\r\\n`` magic and continue — one mangled record costs
    itself, not the rest of the shard."""
    raw = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
    i, n = 0, len(raw)

    def _next_magic(pos: int) -> int:
        return raw.find(b"WARC/1.0\r\n", pos + 1)

    while i < n:
        if raw[i:i + 9] != b"WARC/1.0\r":
            if not resync:
                raise ValueError(f"bad WARC record start at {i}")
            i = _next_magic(i)
            if i < 0:
                return
            continue
        try:
            hdr_end = raw.index(b"\r\n\r\n", i)
            headers = {}
            for line in raw[i:hdr_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b": ")
                headers[k.decode("ascii").lower()] = v.decode("utf-8")
            clen = int(headers["content-length"])
            body_start = hdr_end + 4
            payload = raw[body_start:body_start + clen]
            rec = (headers["warc-target-uri"],
                   _parse_iso8601_us(headers["warc-date"]),
                   payload,
                   headers)
        except (KeyError, ValueError, UnicodeDecodeError):
            if not resync:
                raise
            i = _next_magic(i)
            if i < 0:
                return
            continue
        yield rec
        i = body_start + clen + 4  # trailing \r\n\r\n


def write_warc_gz(pages_tbl: pa.Table, out_dir: str,
                  n_files: int = N_WARC_FILES) -> None:
    """Shard the pages table into ``n_files`` .warc.gz files (row order
    preserved within a shard; shard = row_index % n_files)."""
    urls = pages_tbl["url"].to_pylist()
    ts = pages_tbl["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = pages_tbl["html"].to_pylist()
    for s in range(n_files):
        with open(os.path.join(out_dir, f"{s:04d}.warc.gz"), "wb") as f:
            for k in range(s, len(urls), n_files):
                f.write(encode_warc_record(urls[k], ts[k], htmls[k]))


def ensure_warc(sf_dir: str) -> str:
    """Generate (once, cached, atomic) the .warc.gz fixture shards derived
    from the pages fixture for this scale factor."""
    import pyarrow.parquet as pq

    from .synthetic import FIXTURE_ROOT, ensure_fixtures, scale_from_sf_dir

    fx = ensure_fixtures(sf_dir)
    label, _, _ = scale_from_sf_dir(sf_dir)
    out_dir = os.path.join(FIXTURE_ROOT, f"{label}_warc")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp = tempfile.mkdtemp(dir=FIXTURE_ROOT, prefix=f".{label}_warc.")
    try:
        write_warc_gz(pq.read_table(os.path.join(fx, "pages.parquet"),
                                    columns=["url", "warc_ts", "html"]), tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        if not os.path.exists(out_dir):
            os.replace(tmp, out_dir)
        else:
            shutil.rmtree(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def read_warc_pages(warc_dir: str):
    """Ray Dataset over .warc.gz shards: (url, warc_ts_us, n_bytes,
    html_md5) per record.  One file per read task; the parse emits only
    metadata + digest, so payload bytes never leave the ingest stage."""
    import ray.data as rd

    ds = rd.read_binary_files(warc_dir, file_extensions=["gz"])

    def parse(b: pa.Table) -> pa.Table:
        urls, tss, lens, digs = [], [], [], []
        for blob in b["bytes"].to_pylist():
            for url, ts_us, payload, _hdr in parse_warc_members(blob):
                urls.append(url)
                tss.append(ts_us)
                lens.append(len(payload))
                digs.append(hashlib.md5(payload).hexdigest())
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts_us": pa.array(np.asarray(tss, np.int64)),
            "n_bytes": pa.array(np.asarray(lens, np.int64)),
            "html_md5": pa.array(digs, pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def warc_pages_sql(pages_tbl_expr: str) -> str:
    """Oracle: the same rows straight off pages.parquet.  ``md5(decode(
    html))`` hashes the raw payload bytes because the fixture htmls are
    valid UTF-8 (a pinned fixture invariant; CAST would hex-escape
    non-ASCII bytes); the engine side hashes the bytes directly and is
    encoding-agnostic."""
    return f"""
SELECT url, epoch_us(warc_ts) AS warc_ts_us,
       octet_length(html)::BIGINT AS n_bytes,
       md5(decode(html)) AS html_md5
FROM {pages_tbl_expr}
"""


# --- corrupt-record quarantine (ingest fault tolerance) -----------------------
CORRUPT_HEX = "012"  # md5('corrupt|'+url) first hex in this set -> corrupted


def write_warc_corrupt_gz(pages_tbl: pa.Table, out_dir: str,
                          n_files: int = N_WARC_FILES) -> None:
    """The quarantine fixture: every record carries its intended payload
    digest, and a deterministic ~3/16 of NON-EMPTY payloads are then
    corrupted in flight (first byte replaced with '#') — the digest no
    longer matches what arrives, exactly the bit-rot / truncated-transfer
    shape a crawl ingest must survive."""
    urls = pages_tbl["url"].to_pylist()
    ts = pages_tbl["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = pages_tbl["html"].to_pylist()
    for s in range(n_files):
        with open(os.path.join(out_dir, f"{s:04d}.warc.gz"), "wb") as f:
            for k in range(s, len(urls), n_files):
                payload = htmls[k]
                dig = hashlib.md5(payload).hexdigest()
                if (payload and hashlib.md5(
                        ("corrupt|" + urls[k]).encode("utf-8"))
                        .hexdigest()[0] in CORRUPT_HEX):
                    payload = b"#" + payload[1:]
                f.write(encode_warc_record(urls[k], ts[k], payload,
                                           digest=dig))


def ensure_warc_corrupt(sf_dir: str) -> str:
    """Generate (once, cached, atomic) the corrupted .warc.gz shards."""
    import pyarrow.parquet as pq

    from .synthetic import FIXTURE_ROOT, ensure_fixtures, scale_from_sf_dir

    fx = ensure_fixtures(sf_dir)
    label, _, _ = scale_from_sf_dir(sf_dir)
    out_dir = os.path.join(FIXTURE_ROOT, f"{label}_warcq")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp = tempfile.mkdtemp(dir=FIXTURE_ROOT, prefix=f".{label}_warcq.")
    try:
        write_warc_corrupt_gz(pq.read_table(os.path.join(fx, "pages.parquet"),
                                            columns=["url", "warc_ts", "html"]),
                              tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok\n")
        if not os.path.exists(out_dir):
            os.replace(tmp, out_dir)
        else:
            shutil.rmtree(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return out_dir


def read_warc_quarantine(warc_dir: str):
    """Fault-tolerant ingest: verify every record's arrived payload against
    its WARC-Payload-Digest header and ROUTE instead of raise — ok=1 rows
    are the clean corpus, ok=0 rows are the quarantine manifest (url + the
    digest of what actually arrived, for re-fetch triage).  A record with
    no digest header is trusted (ok=1).

    Scale shape: identical to read_warc_pages (one file per read task,
    payload bytes never leave the ingest stage); at 100 TB the quarantine
    branch is what keeps one flipped bit from killing a whole ingest job."""
    import ray.data as rd

    ds = rd.read_binary_files(warc_dir, file_extensions=["gz"])

    def parse(b: pa.Table) -> pa.Table:
        urls, oks, digs = [], [], []
        for blob in b["bytes"].to_pylist():
            # strict first (zero-cost on clean shards); STRUCTURAL damage
            # re-parses with resync so one mangled record costs itself,
            # plus one quarantine row flagging the shard for re-fetch
            try:
                members = list(parse_warc_members(blob))
                structural = False
            except (KeyError, ValueError, UnicodeDecodeError, EOFError,
                    gzip.BadGzipFile):
                structural = True
                try:
                    members = list(parse_warc_members(blob, resync=True))
                except (EOFError, gzip.BadGzipFile, ValueError):
                    members = []  # shard unreadable end to end
            if structural:
                urls.append("<structural-corruption>")
                oks.append(0)
                digs.append(hashlib.md5(blob).hexdigest())
            for url, _ts, payload, hdr in members:
                want = hdr.get("warc-payload-digest", "")
                got = hashlib.md5(payload).hexdigest()
                ok = (not want) or want == "md5:" + got
                urls.append(url)
                oks.append(1 if ok else 0)
                digs.append(got)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "ok": pa.array(np.asarray(oks, np.int64)),
            "arrived_md5": pa.array(digs, pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def warc_quarantine_sql(pages_tbl_expr: str) -> str:
    """Oracle: predict the deterministic corruption straight off
    pages.parquet — corrupted records arrive with '#' in place of the
    first byte (fixture htmls are ASCII-leading, so byte == char 1)."""
    is_bad = (f"octet_length(html) >= 1 AND substr(md5('corrupt' || chr(124)"
              f" || url), 1, 1) IN ({', '.join(repr(c) for c in CORRUPT_HEX)})")
    return f"""
SELECT url,
       CASE WHEN {is_bad} THEN 0 ELSE 1 END::BIGINT AS ok,
       CASE WHEN {is_bad} THEN md5('#' || substr(decode(html), 2))
            ELSE md5(decode(html)) END AS arrived_md5
FROM {pages_tbl_expr}
"""
