"""ZIP shard pack/walk tests (operators/archives.py, r9): spec-level
structural checks (EOCD backward scan through a comment, central-
directory authority, both compression methods), loud integrity
rejection, and the distributed two-stage round trip."""

from __future__ import annotations

import struct
import zlib

import pytest

from python_multiproc_bigdata_spark.operators.archives import (
    gzip_unwrap,
    gzip_wrap,
    pack_tar,
    pack_tar_shards,
    pack_targz_shards,
    pack_zip,
    pack_zip_shards,
    tar_members,
    walk_tar_shards,
    walk_targz_shards,
    walk_zip_shards,
    zip_members,
)

MEMBERS = [
    ("doc_00000001.txt", b"hello world", 8),
    ("doc_00000002.txt", b"", 0),  # empty STORE member
    ("a/b/deep.txt", bytes(range(256)) * 40, 8),  # incompressible-ish
]


def test_roundtrip_both_methods_and_comment():
    blob = pack_zip(MEMBERS, comment=b"shard 7 test")
    out = zip_members(blob)
    assert [(n, m, d) for n, m, d in out] == [(n, m, d) for n, d, m in MEMBERS]
    # the comment really displaces EOCD from the fixed -22 position
    assert blob[-12:] == b"shard 7 test"
    assert blob.rfind(b"PK\x05\x06") != len(blob) - 22


def test_central_directory_is_authoritative():
    """A walker must reach member data through each central entry's
    local-header offset. Prepend junk bytes BEFORE the first local
    record and fix up all offsets — a reader assuming records start at
    byte 0 (or are contiguous after a guessed origin) fails; the
    spec-following walk still recovers everything."""
    blob = pack_zip(MEMBERS)
    pad = b"JUNKJUNK"  # self-extractor stub stand-in (spec-legal)
    shifted = bytearray(pad + blob)
    eocd = shifted.rfind(b"PK\x05\x06")
    cd_size, cd_off = struct.unpack("<II", shifted[eocd + 12 : eocd + 20])
    struct.pack_into("<I", shifted, eocd + 16, cd_off + len(pad))
    pos = cd_off + len(pad)
    for _ in range(len(MEMBERS)):
        (loc,) = struct.unpack("<I", shifted[pos + 42 : pos + 46])
        struct.pack_into("<I", shifted, pos + 42, loc + len(pad))
        nlen, elen, cmlen = struct.unpack("<HHH", shifted[pos + 28 : pos + 34])
        pos += 46 + nlen + elen + cmlen
    out = zip_members(bytes(shifted))
    assert [n for n, _, _ in out] == [n for n, _, _ in MEMBERS]


def test_integrity_violations_rejected():
    blob = pack_zip(MEMBERS, comment=b"c")
    # flip one DEFLATE byte of member 1 (payload starts after the
    # 30-byte local header + 16-byte name)
    bad = bytearray(blob)
    bad[30 + 16 + 2] ^= 0xFF
    with pytest.raises(Exception):  # zlib.error or ValueError(CRC)
        zip_members(bytes(bad))
    # a truncated comment means no candidate satisfies the backward
    # scan's "comment reaches payload end" test → no EOCD found
    with pytest.raises(ValueError, match="no end-of-central-directory"):
        zip_members(blob[:-1])
    with pytest.raises(ValueError, match="no end-of-central-directory"):
        zip_members(b"PK\x03\x04" + bytes(40))
    # corrupt a STORED member's CRC field in the central directory
    bad = bytearray(blob)
    eocd = bad.rfind(b"PK\x05\x06")
    (cd_off,) = struct.unpack("<I", bad[eocd + 16 : eocd + 20])
    pos = cd_off + 46 + len(MEMBERS[0][0])  # second entry (STORE)
    struct.pack_into("<I", bad, pos + 16, 0xDEADBEEF)
    with pytest.raises(ValueError, match="CRC-32 mismatch"):
        zip_members(bytes(bad))


def test_eocd_signature_inside_comment():
    """APPNOTE's backward scan: a comment containing the literal EOCD
    signature bytes must not derail the walk — the scan continues past
    the false hit until a candidate's comment length reaches payload
    end."""
    blob = pack_zip(MEMBERS, comment=b"decoy PK\x05\x06 inside comment")
    out = zip_members(blob)
    assert [n for n, _, _ in out] == [n for n, _, _ in MEMBERS]


def test_tar_typeflags_and_prefix():
    """Archives the repo did NOT create: directory ('5') and symlink
    ('2') entries are skipped, PAX 'x' metadata blocks are skipped
    (their data advances the cursor), unknown typeflags raise, and the
    ustar prefix field rejoins long paths."""
    import io
    import tarfile

    buf = io.BytesIO()
    deep = "p/" * 60 + "leaf.txt"  # >100 chars → stdlib uses prefix field
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("adir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        s = tarfile.TarInfo("alink")
        s.type = tarfile.SYMTYPE
        s.linkname = "target"
        tf.addfile(s)
        f = tarfile.TarInfo(deep)
        f.size = 4
        tf.addfile(f, io.BytesIO(b"data"))
    got = tar_members(buf.getvalue())
    assert got == [(deep, b"data")]
    # PAX extended headers: stdlib PAX_FORMAT emits 'x' blocks before
    # each member — the walker must skip them and return just the file
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT) as tf:
        f = tarfile.TarInfo("doc.txt")
        f.size = 3
        f.pax_headers = {"comment": "meta"}
        tf.addfile(f, io.BytesIO(b"abc"))
    assert tar_members(buf.getvalue()) == [("doc.txt", b"abc")]
    # unknown typeflag is loud
    blob = bytearray(pack_tar([("f.txt", b"z")]))
    blob[156] = ord("Z")
    chk = sum(blob[:148]) + 8 * ord(" ") + sum(blob[156:512])
    blob[148:156] = f"{chk:06o}\x00 ".encode()
    with pytest.raises(ValueError, match="typeflag"):
        tar_members(bytes(blob))


def test_tar_roundtrip_against_stdlib_and_integrity():
    """The ustar pack must be readable by the INDEPENDENT stdlib
    tarfile reader (cross-implementation proof), and the walker must
    verify header checksums, sizes, and the terminator pair."""
    import io
    import tarfile

    members = [("doc_00000003.txt", b"abc" * 700), ("x/y.bin", bytes(513))]
    blob = pack_tar(members)
    assert len(blob) % 512 == 0
    # stdlib reads what we wrote
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    # our walker reads what stdlib writes (reverse direction)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    assert tar_members(buf.getvalue()) == members
    # checksum violation is loud
    bad = bytearray(blob)
    bad[0] ^= 0x01  # flip a name byte -> checksum mismatch
    with pytest.raises(ValueError, match="checksum"):
        tar_members(bytes(bad))
    # truncated content is loud
    with pytest.raises(ValueError, match="truncated|terminator"):
        tar_members(blob[: 512 + 100])
    # missing terminator pair is loud
    with pytest.raises(ValueError, match="terminator"):
        tar_members(blob[:-1024])


def test_tar_distributed_roundtrip(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"tar body {i} " * (1 + i % 2)) for i in range(20)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in walk_tar_shards(pack_tar_shards(docs)).collect()}
    assert len(out) == 20
    for i in range(20):
        body = f"tar body {i} " * (1 + i % 2)
        assert out[i].method == -1 and out[i].crc_ok
        assert out[i].content_md5 == hashlib.md5(body.encode()).hexdigest()


def test_gzip_cross_implementation_and_integrity():
    """RFC 1952 framing must interoperate with the INDEPENDENT stdlib
    gzip implementation both directions, skip every optional header
    field, and verify the CRC/ISIZE trailer loudly."""
    import gzip as gz
    import struct as st

    data = b"corpus shard content " * 300
    blob = gzip_wrap(data, fname=b"shard.tar", fcomment=b"note")
    # stdlib reads ours
    assert gz.decompress(blob) == data
    out, fname = gzip_unwrap(blob)
    assert out == data and fname == b"shard.tar"
    # ours reads stdlib's (mtime pinned for determinism; no FNAME)
    assert gzip_unwrap(gz.compress(data, mtime=0))[0] == data
    # FEXTRA skipping: inject an extra field and fix FLG
    extra = bytearray(gzip_wrap(data))
    extra[3] |= 0x04
    payload = bytes(extra[:10]) + st.pack("<H", 4) + b"XTRA" + bytes(extra[10:])
    assert gzip_unwrap(payload)[0] == data
    # trailer violations are loud
    bad = bytearray(blob)
    bad[-4] ^= 0xFF  # ISIZE
    with pytest.raises(ValueError, match="ISIZE"):
        gzip_unwrap(bytes(bad))
    bad = bytearray(blob)
    bad[-8] ^= 0xFF  # CRC
    with pytest.raises(ValueError, match="CRC"):
        gzip_unwrap(bytes(bad))
    with pytest.raises(ValueError, match="not gzip"):
        gzip_unwrap(b"PK\x03\x04")


def test_targz_distributed_roundtrip(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"tgz body {i} " * (1 + i % 3)) for i in range(20)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in walk_targz_shards(pack_targz_shards(docs)).collect()}
    assert len(out) == 20
    for i in range(20):
        body = f"tgz body {i} " * (1 + i % 3)
        assert out[i].method == 8 and out[i].crc_ok
        assert out[i].content_md5 == hashlib.md5(body.encode()).hexdigest()


def test_zip_members_reads_stdlib_archives_fuzz():
    """Cross-implementation fuzz: archives written by the INDEPENDENT
    stdlib zipfile (random member names/sizes/methods, with and without
    an archive comment containing the EOCD signature bytes) must walk
    back byte-identical through zip_members."""
    import io
    import zipfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    name_st = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-./", min_size=1, max_size=40
    ).filter(lambda s: not s.startswith("/") and ".." not in s)
    member_st = st.tuples(name_st, st.binary(max_size=2000), st.sampled_from([0, 8]))

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(member_st, min_size=1, max_size=8, unique_by=lambda m: m[0]),
        st.sampled_from([b"", b"plain comment", b"decoy PK\x05\x06 comment"]),
    )
    def run(members, comment):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for name, data, method in members:
                zf.writestr(
                    name,
                    data,
                    compress_type=(
                        zipfile.ZIP_DEFLATED if method == 8 else zipfile.ZIP_STORED
                    ),
                )
            zf.comment = comment
        got = zip_members(buf.getvalue())
        assert [(n, d) for n, _, d in got] == [(n, d) for n, d, _ in members]

    run()


def test_tar_members_reads_stdlib_archives_fuzz():
    """Same fuzz for the ustar walker: random stdlib-written archives in
    USTAR and PAX formats (long prefix paths, interleaved directories)
    must yield exactly the regular-file members."""
    import io
    import tarfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=12)
    name_st = st.lists(seg, min_size=1, max_size=12).map("/".join).filter(
        lambda s: len(s) <= 140
    )
    member_st = st.tuples(name_st, st.binary(max_size=3000), st.booleans())

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(member_st, min_size=1, max_size=6, unique_by=lambda m: m[0]),
        st.sampled_from([tarfile.USTAR_FORMAT, tarfile.PAX_FORMAT]),
    )
    def run(members, fmt):
        usable = [
            (n, d) for n, d, _ in members
            if fmt == tarfile.PAX_FORMAT or len(n) <= 100 or ("/" in n)
        ]
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            for (n, d), (_, _, add_dir) in zip(usable, members):
                if add_dir:
                    dinfo = tarfile.TarInfo(n + ".d")
                    dinfo.type = tarfile.DIRTYPE
                    tf.addfile(dinfo)
                info = tarfile.TarInfo(n)
                info.size = len(d)
                tf.addfile(info, io.BytesIO(d))
        got = tar_members(buf.getvalue())
        assert got == usable

    run()


def test_streaming_zip_ingest_matches_batch(spark):
    """The streaming twin must equal the batch walk value-for-value:
    micro-batch epochs are written idempotently and the union of
    per-epoch member rows is micro-batch-invariant. Re-running the
    query (fixture_root self-cleans) must give the identical result —
    the at-least-once retry guarantee in miniature."""
    from python_multiproc_bigdata_spark.registry.advanced import source_zip_shards
    from python_multiproc_bigdata_spark.registry.streaming import (
        streaming_zip_ingest,
    )

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in source_zip_shards(spark, sf).collect()}
    stream1 = {tuple(r) for r in streaming_zip_ingest(spark, sf).collect()}
    assert stream1 == batch and len(stream1) == 500
    stream2 = {tuple(r) for r in streaming_zip_ingest(spark, sf).collect()}
    assert stream2 == stream1


def test_streaming_targz_ingest_matches_batch(spark):
    """tar.gz streaming twin (r10): same epoch-idempotent foreachBatch
    walk as the ZIP twin — the streamed union must equal the batch walk
    value-for-value, and a re-run (fixture_root self-cleans, fresh
    checkpoint) must reproduce it exactly (at-least-once recovery in
    miniature)."""
    from python_multiproc_bigdata_spark.registry.advanced import source_targz_shards
    from python_multiproc_bigdata_spark.registry.streaming import (
        streaming_targz_ingest,
    )

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in source_targz_shards(spark, sf).collect()}
    stream1 = {tuple(r) for r in streaming_targz_ingest(spark, sf).collect()}
    assert stream1 == batch and len(stream1) == 500
    stream2 = {tuple(r) for r in streaming_targz_ingest(spark, sf).collect()}
    assert stream2 == stream1


def test_distributed_two_stage_roundtrip(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i, f"document body {i} " * (1 + i % 3)) for i in range(40)],
        ["doc_id", "text"],
    )
    out = walk_zip_shards(pack_zip_shards(docs)).collect()
    assert len(out) == 40
    by_id = {r.doc_id: r for r in out}
    for i in range(40):
        r = by_id[i]
        body = f"document body {i} " * (1 + i % 3)
        assert r.shard_id == i // 16
        assert r.method == (8 if i % 2 == 0 else 0)
        assert r.n_bytes == len(body.encode())
        assert r.crc_ok
        assert r.content_md5 == hashlib.md5(body.encode()).hexdigest()
