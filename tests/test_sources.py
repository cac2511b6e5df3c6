"""Unit tests for the sources package: REST connector internals that the
oracle-parity harness can't see (signing, pushdown plumbing, atomicity)."""

from __future__ import annotations

import hashlib
import hmac
import json
import os

from pyspark.sql import functions as F

from seamless_sharepoint_etl_spark.sources import rest

SF = "/root/testdata/sf0.001"


def test_hmac_signature_reference_layout():
    # StringToSign = VERB+path-sans-/api+ts (reference :33-39); verify
    # against an independently computed digest.
    sig = rest.seamless_api_signature("/api/form/F1/pipeline", "get", "1700000000", "s3cr3t")
    expected = hmac.new(
        b"s3cr3t", b"GET+/form/F1/pipeline+1700000000", hashlib.sha256
    ).hexdigest()
    assert sig == expected
    # non-/api paths pass through unstripped
    assert rest.seamless_api_signature("/x", "POST", "1", "k") == hmac.new(
        b"k", b"POST+/x+1", hashlib.sha256
    ).hexdigest()


def test_oauth_token_deterministic():
    t1 = rest.oauth2_client_credentials_token("a", "b", "t")
    t2 = rest.oauth2_client_credentials_token("a", "b", "t")
    assert t1 == t2 and len(t1) == 64
    assert t1 != rest.oauth2_client_credentials_token("a", "b2", "t")


def test_filter_pushdown_absorbed_into_source(spark):
    """The po_number frontier filter must reach the source: the physical
    plan shows it as a pushed filter, not a Spark-side Filter node."""
    df = rest.rest_paged_scan(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the `>` comparison is absorbed by pushFilters; only the residual
    # isnotnull guard may remain as a Spark-side Filter
    assert " > " not in plan, plan
    assert "BatchScan seamless_rest" in plan
    # and the scan's row count equals the frontier tail
    items = rest.io.seamless_items(spark, SF)
    wm_row = rest.io.load_table(spark, SF, "orders").agg(
        F.format_string(
            rest.io.PO_FORMAT, F.floor(F.max("o_orderkey") * F.lit(0.6)).cast("long")
        ).alias("wm")
    ).collect()[0]
    expected = items.filter(F.col("po_number") > F.lit(wm_row["wm"])).count()
    assert df.count() == expected > 0


def test_catalog_projection_order(spark):
    """`columns` option controls both membership and order (A6/A7)."""
    rest.register(spark)
    endpoint = rest.materialize_pages(spark, SF, rest._endpoint_for(SF))
    df = (
        spark.read.format("seamless_rest")
        .option("endpoint", endpoint)
        .option("columns", "amount,po_number")
        .load()
    )
    assert df.columns == ["amount", "po_number"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["double", "string"]


def test_sink_commit_is_atomic(spark, tmp_path):
    """All batches land via manifest; staging dir left empty on success."""
    rest.register(spark)
    sink = str(tmp_path / "sink")
    src = rest.io.seamless_items(spark, SF).limit(50)
    (
        src.repartition(3)
        .write.format("seamless_rest")
        .option("sink_dir", sink)
        .mode("append")
        .save()
    )
    with open(os.path.join(sink, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert sum(b["rows"] for b in manifest["batches"]) == 50
    assert manifest["columns"] == src.columns
    assert os.listdir(os.path.join(sink, "_staging")) == []
    # POST bodies are positional arrays (reference :118-121)
    body = json.load(open(os.path.join(sink, manifest["batches"][0]["file"])))
    assert body["index"] is None
    assert all(len(v) == len(src.columns) for v in body["values"])


def test_signature_verified_by_transport(spark, tmp_path):
    """A page that demands signing rejects a reader with the wrong key."""
    rest.register(spark)
    endpoint = str(tmp_path / "ep")
    os.makedirs(endpoint)
    sig = rest.seamless_api_signature(
        "/api/form/F9/pipeline/page-00000.json", "GET", "42", "rightkey"
    )
    with open(os.path.join(endpoint, "page-00000.json"), "w") as fh:
        json.dump(
            {
                "signature_required": True,
                "signature": sig,
                "items": [{"application_data": {"fld_k7q2": "U00000001D"}}],
            },
            fh,
        )
    with open(os.path.join(endpoint, "catalog.json"), "w") as fh:
        json.dump({"columns": [rest.ITEMS_CATALOG[0]]}, fh)

    ok = (
        spark.read.format("seamless_rest")
        .option("endpoint", endpoint)
        .option("secret_key", "rightkey")
        .option("request_ts", "42")
        .option("form_id", "F9")
        .load()
    )
    assert ok.count() == 1

    bad = (
        spark.read.format("seamless_rest")
        .option("endpoint", endpoint)
        .option("secret_key", "wrongkey")
        .option("request_ts", "42")
        .option("form_id", "F9")
        .load()
    )
    try:
        bad.count()
        raised = False
    except Exception as e:  # noqa: BLE001 — Py4J wraps the ValueError
        raised = "signature rejected" in str(e)
    assert raised


def test_materialize_pages_cleans_stale_pages(spark, tmp_path):
    """Re-materializing after a page-size change must not leave stale
    pages behind (they would be double-read by the scan)."""
    import json as _json

    ep = str(tmp_path / "ep")
    rest.materialize_pages(spark, SF, ep, page_size=100)
    n_small = len([p for p in os.listdir(ep) if p.startswith("page-")])
    rest.materialize_pages(spark, SF, ep, page_size=1000)
    n_big = len([p for p in os.listdir(ep) if p.startswith("page-")])
    assert n_big < n_small
    # row count through the reader equals the source exactly
    rest.register(spark)
    df = (
        spark.read.format("seamless_rest")
        .option("endpoint", ep)
        .load()
    )
    assert df.count() == rest.io.seamless_items(spark, SF).count()


def test_rest_topn_matches_spark_side_sort(spark):
    """Pushed TopN returns exactly the rows a Spark-side orderBy+limit
    over the full source would, and reads only the page prefix."""
    rest.register(spark)
    endpoint = rest.materialize_pages(spark, SF, rest._endpoint_for(SF))
    base = (
        spark.read.format("seamless_rest")
        .option("endpoint", endpoint)
        .option("request_ts", "1700000000")
        .load()
    )
    n_rows = base.count()
    truth = base.orderBy("po_number").limit(rest.TOPN_LIMIT).collect()
    got = rest.rest_topn_scan(spark, SF).collect()
    assert len(got) == min(rest.TOPN_LIMIT, n_rows)
    assert {r["po_number"] for r in got} == {r["po_number"] for r in truth}
    # page-prefix read: partitions cover ceil(limit/page_size) pages max
    reader = rest.SeamlessRestReader(
        {"endpoint": endpoint, "order_by": "po_number", "limit": str(rest.TOPN_LIMIT)},
        base.schema,
        rest.SeamlessRestDataSource({"endpoint": endpoint})._catalog(),
    )
    parts = reader.partitions()
    assert len(parts) <= (rest.TOPN_LIMIT + 1999) // 2000
    # TopN groups hold exactly one page each so `take` stays per-page
    assert all(len(g.pages) == 1 for g in parts)
    assert sum(g.pages[0].take for g in parts) == min(rest.TOPN_LIMIT, n_rows)


def test_rest_topn_rejects_unservable_order(spark):
    """A sort the server can't provide must raise, not silently return
    the wrong order."""
    import pytest

    from pyspark.sql.types import StructType

    rest.register(spark)
    endpoint = rest.materialize_pages(spark, SF, rest._endpoint_for(SF))
    cat = rest.SeamlessRestDataSource({"endpoint": endpoint})._catalog()
    reader = rest.SeamlessRestReader(
        {"endpoint": endpoint, "order_by": "amount", "limit": "10"},
        StructType([]),
        cat,
    )
    with pytest.raises(ValueError, match="sorted Spark-side"):
        reader.partitions()


def _mini_endpoint(tmp_path, n_pages=2, rows_per_page=3):
    """Hand-built paged endpoint (catalog + page files) small enough to
    reason about exactly."""
    d = str(tmp_path / "endpoint")
    os.makedirs(d)
    with open(os.path.join(d, "catalog.json"), "w") as fh:
        json.dump({"columns": rest.ITEMS_CATALOG}, fh)
    counter = 0
    for page in range(n_pages):
        items = []
        for _ in range(rows_per_page):
            items.append(
                {
                    "application_data": {
                        "fld_k7q2": f"U{counter:08d}D",
                        "fld_x91a": f"vendor{counter % 3}",
                        "fld_m3om": f"desc {counter}",
                        "fld_erk0": f"picker{counter % 2}",
                        "fld_qfp5": f"cc{counter % 4}",
                        "fld_amt9": float(counter) * 10.0,
                    }
                }
            )
            counter += 1
        with open(os.path.join(d, f"page-{page:05d}.json"), "w") as fh:
            json.dump({"items": items}, fh)
    return d, counter


def _run_stream(spark, endpoint, out, ckpt):
    rest.register(spark)
    stream = (
        spark.readStream.format("seamless_rest")
        .option("endpoint", endpoint)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_stream_reader_incremental_offsets(spark, tmp_path):
    """The streaming REST source must (1) land exactly the batch-scan
    relation, and (2) on resume consume ONLY pages that appeared after
    the checkpointed offset — the reference's incremental cron copy
    with real offset bookkeeping."""
    endpoint, n_rows = _mini_endpoint(tmp_path, n_pages=2, rows_per_page=3)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    landed = _run_stream(spark, endpoint, out, ckpt)
    batch = spark.read.format("seamless_rest").option("endpoint", endpoint).load()
    assert sorted(map(tuple, landed.collect())) == sorted(map(tuple, batch.collect()))
    assert landed.count() == n_rows

    # a new page arrives; the resumed stream must append just its rows
    with open(os.path.join(endpoint, "page-00002.json"), "w") as fh:
        json.dump(
            {
                "items": [
                    {
                        "application_data": {
                            "fld_k7q2": "U99999999D",
                            "fld_x91a": "vendorX",
                            "fld_m3om": "late page",
                            "fld_erk0": "pickerX",
                            "fld_qfp5": "ccX",
                            "fld_amt9": 777.0,
                        }
                    }
                ]
            },
            fh,
        )
    landed2 = _run_stream(spark, endpoint, out, ckpt)
    assert landed2.count() == n_rows + 1
    assert (
        landed2.filter(F.col("po_number") == "U99999999D").count() == 1
    )  # exactly once, not re-read


def test_avro_ocf_roundtrip_and_integrity(tmp_path):
    """The pure-Python Avro OCF codec: (a) write->read is the identity
    on adversarial values (negative cents, zigzag edge magnitudes,
    unicode and empty strings, multi-block files); (b) a tampered block
    sync marker is rejected (the split-reader resync check); (c) the
    spec's negative-map-count header branch decodes; (d) blocks really
    are raw-deflate (independent zlib inflate of the first block)."""
    import os
    import zlib

    import pytest

    from seamless_sharepoint_etl_spark.sources import avro_ocf as ao

    rows = [
        (0, "", 0, 0),
        (1, "Ünïcode — supplier #1", 24, -999_999),
        (2, "x" * 500, 7, (1 << 62) - 1),
        (3, "plain", 3, -(1 << 62)),
    ] + [(10 + i, f"s{i}", i % 25, i * 101 - 5000) for i in range(500)]
    path = os.path.join(str(tmp_path), "t.avro")
    sync = ao._sync_for("t.avro")
    ao.write_ocf(path, rows, sync)
    blob = open(path, "rb").read()
    assert ao.read_ocf(blob) == rows  # multi-block: 504 rows > _BLOCK_RECORDS

    # (b) flip a byte inside the FIRST sync marker after the header
    hdr_end = blob.index(sync) + 16
    first_block_sync = blob.index(sync, hdr_end)
    bad = bytearray(blob)
    bad[first_block_sync + 3] ^= 0xFF
    with pytest.raises(AssertionError, match="sync"):
        ao.read_ocf(bytes(bad))

    # (c) negative map count prefixes a byte size (Avro spec form)
    out = bytearray(ao.MAGIC)
    ao._wlong(out, -2)  # negative count
    inner = bytearray()
    ao._wstr(inner, "avro.schema")
    ao._wstr(inner, ao.SCHEMA_JSON)
    ao._wstr(inner, "avro.codec")
    ao._wstr(inner, "null")
    ao._wlong(out, len(inner))  # byte size
    out.extend(inner)
    ao._wlong(out, 0)
    out.extend(sync)
    body = bytearray()
    ao._wlong(body, 42)
    ao._wstr(body, "n")
    ao._wlong(body, 1)
    ao._wlong(body, -250)
    ao._wlong(out, 1)
    ao._wlong(out, len(body))
    out.extend(body)
    out.extend(sync)
    assert ao.read_ocf(bytes(out)) == [(42, "n", 1, -250)]

    # (d) the first deflate block inflates with raw zlib
    pos = hdr_end
    count, pos = ao._rlong(blob, pos)
    size, pos = ao._rlong(blob, pos)
    assert count == ao._BLOCK_RECORDS and size < count * 20  # compressed
    zlib.decompress(blob[pos : pos + size], -15)  # raises if not raw deflate


def test_avro_scan_matches_supplier_oracle(spark):
    """src_avro_roundtrip_scan: staged OCF files decode back to exactly
    the supplier rows (the sf0.001 in-process oracle check; driver_sim
    covers sf0.01/0.1)."""
    import duckdb

    from seamless_sharepoint_etl_spark.sources import avro_ocf as ao

    got = sorted(
        tuple(r)
        for r in ao.avro_roundtrip_scan(spark, "/root/testdata/sf0.001").collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW supplier AS SELECT * FROM "
        "'/root/testdata/sf0.001/supplier.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(ao.AVRO_SCAN_SQL).fetchall())
    con.close()
    assert got == want and len(got) > 0


def test_staging_invalidated_when_fixture_regenerates(spark, tmp_path):
    """The driver has regenerated fixtures mid-round before (NOTES
    trap 2). Staged /tmp artifacts embed io.fixture_token in their
    path, so a changed source parquet must yield FRESH staged files —
    serving rows from the old fixture against an oracle reading the
    new one would be a silent whole-family wrong answer."""
    import os
    import time

    import pandas as pd

    from seamless_sharepoint_etl_spark.sources import avro_ocf as ao

    d = str(tmp_path)

    def write_supplier(rows):
        pd.DataFrame(
            {
                "s_suppkey": [r[0] for r in rows],
                "s_name": [r[1] for r in rows],
                "s_address": ["x"] * len(rows),
                "s_nationkey": [r[2] for r in rows],
                "s_phone": ["p"] * len(rows),
                "s_acctbal": [r[3] for r in rows],
                "s_comment": ["c"] * len(rows),
            }
        ).to_parquet(os.path.join(d, "supplier.parquet"))

    write_supplier([(1, "alpha", 3, 10.0), (2, "beta", 5, 20.0)])
    first = sorted(
        tuple(r) for r in ao.avro_roundtrip_scan(spark, d).collect()
    )
    assert [r[0] for r in first] == [1, 2]

    time.sleep(0.02)  # ensure a distinct mtime_ns
    write_supplier([(7, "gamma", 9, 30.0)])
    second = sorted(
        tuple(r) for r in ao.avro_roundtrip_scan(spark, d).collect()
    )
    assert second == [(7, "gamma", 9, 3000)], (
        "staged Avro files were not invalidated by the fixture change"
    )


def test_sqlite_partitioned_scan_pushdown_and_bounds(spark):
    """The SQLite federated scan must be a REAL partitioned, pushed
    read: (a) the staged database's range query executes as an index
    SEARCH on the INTEGER PRIMARY KEY (EXPLAIN QUERY PLAN — the
    pushdown proof; a SCAN here means the key predicate is not
    reaching the source), (b) the computed partition bounds tile the
    key space with no overlap and no gap, and (c) the staged artifact
    is keyed by the fixture token, so a regenerated fixture can never
    pair stale SQLite rows with a fresh oracle."""
    import sqlite3

    from seamless_sharepoint_etl_spark.sources import formats as fmt

    sf = "/root/testdata/sf0.001"
    path = fmt._stage_sqlite_orders(sf)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    plan = con.execute(
        "EXPLAIN QUERY PLAN SELECT o_custkey FROM orders"
        " WHERE o_orderkey >= 10 AND o_orderkey < 500"
    ).fetchall()
    detail = " ".join(str(r) for r in plan)
    assert "SEARCH" in detail and "PRIMARY KEY" in detail, detail
    lo, hi = con.execute(
        "SELECT min(o_orderkey), max(o_orderkey) FROM orders"
    ).fetchone()
    n_rows = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    con.close()
    assert n_rows > 0

    step = max(1, (hi - lo + 1) // fmt.SQLITE_N_PARTS)
    bounds = [
        (
            lo + i * step,
            (lo + (i + 1) * step) if i < fmt.SQLITE_N_PARTS - 1 else hi + 1,
        )
        for i in range(fmt.SQLITE_N_PARTS)
    ]
    assert bounds[0][0] == lo and bounds[-1][1] == hi + 1
    for (a_lo, a_hi), (b_lo, b_hi) in zip(bounds, bounds[1:]):
        assert a_hi == b_lo, "partition ranges must tile without gap/overlap"

    assert fmt._sqlite_db_path(sf) != fmt._sqlite_db_path(
        "/root/testdata/sf0.01"
    ), "db path must be fixture-keyed"

    rows = fmt.sqlite_partitioned_scan(spark, sf).collect()
    assert rows and sum(r["n_orders"] for r in rows) > 0


def test_sqlite_scan_streams_batches_and_guards_empty(spark, monkeypatch, tmp_path):
    """(a) The per-task range read streams fetchmany batches (the JDBC
    fetchsize analog — VERDICT r7 #5): with a 7-row batch size the
    result is identical to the default, proving correctness does not
    depend on whole-range materialization. (b) An empty source table
    raises a descriptive ValueError instead of an opaque TypeError on
    None bounds (ADVICE r7)."""
    import sqlite3

    import pytest

    from seamless_sharepoint_etl_spark.sources import formats as fmt

    sf = "/root/testdata/sf0.001"
    baseline = sorted(
        tuple(r) for r in fmt.sqlite_partitioned_scan(spark, sf).collect()
    )
    monkeypatch.setattr(fmt, "SQLITE_FETCH_BATCH", 7)
    tiny = sorted(
        tuple(r) for r in fmt.sqlite_partitioned_scan(spark, sf).collect()
    )
    assert tiny == baseline

    empty = tmp_path / "empty.db"
    con = sqlite3.connect(str(empty))
    con.execute(
        "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY,"
        " o_custkey INTEGER, o_orderstatus TEXT, o_totalprice REAL,"
        " o_orderdate TEXT)"
    )
    con.commit()
    con.close()
    monkeypatch.setattr(fmt, "_stage_sqlite_orders", lambda _sf: str(empty))
    with pytest.raises(ValueError, match="empty"):
        fmt.sqlite_partitioned_scan(spark, sf)


def test_protobuf_wire_codec_roundtrip_and_skipping(spark):
    """The protobuf path is the REAL wire format, proven without the
    protobuf library: (a) encode/decode round-trips values spanning
    every varint length (1..10 bytes) and ZigZag sign handling,
    including int64 extremes; (b) a reader without our schema skips
    unknown fields of every skippable wire type (the decoder's own
    messages carry fixed32/len-delimited/fixed64 unknowns); (c) hand-
    packed spec vectors pin the bit layout (varint 300 = AC 02, ZigZag
    -1 = 1, -2 = 3 — the published examples); (d) every truncation of
    a framed stream raises the labeled ProtoWireError; (e) staged
    files tile the orders table with no loss (row-count identity)."""
    import pytest

    from seamless_sharepoint_etl_spark.sources import formats as fmt

    # (c) published spec vectors
    assert fmt._pb_varint(300) == b"\xac\x02"
    assert fmt._pb_varint(1) == b"\x01"
    assert fmt._pb_zigzag(0) == 0
    assert fmt._pb_zigzag(-1) == 1
    assert fmt._pb_zigzag(1) == 2
    assert fmt._pb_zigzag(-2) == 3
    assert fmt._pb_unzigzag(4294967294) == 2147483647
    assert fmt._pb_unzigzag(4294967295) == -2147483648

    # (a) round-trip across varint widths and signs
    probes = [0, 1, 127, 128, 300, 2**21 - 1, 2**35, 2**63 - 1]
    for v in probes:
        got, end = fmt._pb_read_varint(fmt._pb_varint(v), 0)
        assert got == v and end == len(fmt._pb_varint(v))
    for s in [0, -1, 1, -123456789, 2**62, -(2**62), 2**63 - 1, -(2**63)]:
        assert fmt._pb_unzigzag(fmt._pb_zigzag(s)) == s
    # negative int64 as plain varint: ten bytes on the wire
    assert len(fmt._pb_varint(-1)) == 10
    got, _ = fmt._pb_read_varint(fmt._pb_varint(-1), 0)
    assert got == 2**64 - 1  # two's complement widened, per spec

    # (a)+(b) full message round trip (messages embed unknown fields)
    msg = fmt._pb_encode_order(42, 7, "F", 123456, "1995-03-15")
    o = fmt._pb_decode_order(msg)
    assert o == {
        "o_orderkey": 42,
        "o_custkey": 7,
        "o_orderstatus": "F",
        "cents": 123456,
        "cents_off": 123456 - fmt.PB_PRICE_OFFSET_CENTS,
        "o_orderdate": "1995-03-15",
    }
    assert o["cents_off"] < 0, "ZigZag negative path not exercised"

    # (d) truncation sweep over a two-message framed stream
    stream = (
        fmt._pb_varint(len(msg)) + msg + fmt._pb_varint(len(msg)) + msg
    )
    full = [m for m in fmt._pb_iter_messages(stream)]
    assert len(full) == 2 and all(fmt._pb_decode_order(m) == o for m in full)
    frame_len = len(fmt._pb_varint(len(msg))) + len(msg)
    for cut in range(1, len(stream)):
        if cut == frame_len:
            # a cut exactly at a frame boundary IS a valid (shorter)
            # stream — the framing cannot and should not reject it
            assert len(list(fmt._pb_iter_messages(stream[:cut]))) == 1
            continue
        truncated = stream[:cut]
        with pytest.raises(fmt.ProtoWireError):
            for m in fmt._pb_iter_messages(truncated):
                fmt._pb_decode_order(m)

    # (e) staged stream carries every orders row
    sf = "/root/testdata/sf0.001"
    rows = fmt.protobuf_wire_scan(spark, sf).collect()
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == n


def test_warc_scan_is_a_real_common_crawl_reader(spark):
    """The WARC path must be the real Common Crawl layout, proven
    structurally: (a) each staged archive is a MULTI-MEMBER gzip
    stream (one member per record — CC's random-access property; a
    whole-file gzip.decompress would conflate them, so count members
    with a raw zlib walk); (b) the leading warcinfo record is
    skipped by type, not by position; (c) framing is Content-Length
    driven — a body containing the WARC magic and bare CRLFCRLF must
    parse (delimiter-scanning readers break here); (d) malformed
    archives (bad version line, truncated body, corrupt member) raise,
    never mis-parse; (e) the distributed scan equals a sequential
    re-parse of every archive."""
    import gzip
    import os
    import zlib

    import pytest

    from seamless_sharepoint_etl_spark.sources import formats as fmt

    sf = "/root/testdata/sf0.001"
    path = fmt._stage_warc_docs(sf)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".warc.gz")
    )
    assert len(files) == fmt.WARC_N_FILES

    raw = open(files[0], "rb").read()
    members = 0
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        d.decompress(raw[pos:])
        pos = len(raw) - len(d.unused_data)
        members += 1
    parsed = list(fmt._parse_warc_gz(raw))
    assert members == len(parsed) + 1, (
        "each record must be its own gzip member (+1 warcinfo)"
    )
    assert all(s == 200 for _, s, _ in parsed)

    # (c) adversarial body: WARC magic + CRLFCRLF inside the payload
    body = b"WARC/1.0\r\n\r\nfake record\r\n\r\nmore"
    http = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://corpus.example/doc/7\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    got = list(fmt._parse_warc_gz(gzip.compress(rec)))
    assert got == [("http://corpus.example/doc/7", 200, len(body))]

    # (d) malformed archives raise
    with pytest.raises(ValueError):
        list(fmt._parse_warc_gz(gzip.compress(rec.replace(b"WARC/1.0", b"WARC/9.9", 1))))
    with pytest.raises(ValueError):
        list(fmt._parse_warc_gz(gzip.compress(rec[:-6])))  # framing cut
    with pytest.raises(ValueError):
        list(fmt._parse_warc_gz(raw[:-1]))  # cut inside the gzip trailer
    flipped = bytearray(raw)
    flipped[20] ^= 0xFF  # deflate data of the first member
    with pytest.raises(Exception):
        list(fmt._parse_warc_gz(bytes(flipped)))

    # (e) distributed scan == sequential re-parse
    seq = sorted(
        (int(u.rsplit("/", 1)[1]), s, n)
        for f in files
        for u, s, n in fmt._parse_warc_gz(open(f, "rb").read())
    )
    dist = sorted(
        (r["doc_id"], r["http_status"], r["content_octets"])
        for r in fmt.warc_scan(spark, sf).collect()
    )
    assert seq == dist and len(dist) > 0


def test_rest_partitions_bin_pack_pages_by_bytes(spark):
    """The batch reader's partitions are byte-bin-packed page GROUPS
    (the Python-DataSource analog of maxPartitionBytes): every page
    appears exactly once, groups preserve sorted page order, no group
    except a single-oversized-page one exceeds the byte cap, and the
    grouped scan returns the same rows as the per-page layout would."""
    import os

    rest.register(spark)
    endpoint = rest.materialize_pages(spark, SF, rest._endpoint_for(SF))
    cat = rest.SeamlessRestDataSource({"endpoint": endpoint})._catalog()
    reader = rest.SeamlessRestReader({"endpoint": endpoint}, _rest_schema(), cat)
    groups = reader.partitions()
    pages = [p.path for g in groups for p in g.pages]
    expected = sorted(
        os.path.join(endpoint, f)
        for f in os.listdir(endpoint)
        if f.startswith("page-") and f.endswith(".json")
    )
    assert pages == expected, "grouping must preserve sorted page order"
    for g in groups:
        size = sum(os.path.getsize(p.path) for p in g.pages)
        assert len(g.pages) == 1 or size <= rest.REST_MAX_PARTITION_BYTES
    if len(expected) > 1:
        assert len(groups) < len(expected), (
            "small pages should pack into fewer tasks"
        )


def _rest_schema():
    from pyspark.sql.types import StructType

    import __spark_entry__  # noqa: F401  (ensures registry import side effects)
    from seamless_sharepoint_etl_spark.sources import rest as r

    cat = r.ITEMS_CATALOG
    from pyspark.sql.types import DoubleType, StringType, StructField

    return StructType(
        [
            StructField(
                c["printable_name"],
                DoubleType() if c["type"] == "double" else StringType(),
            )
            for c in cat
        ]
    )
