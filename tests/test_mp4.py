"""ISO-BMFF metadata parser (operators/mp4.py): skeleton round-trips,
version-1 / 64-bit box forms, malformed-input errors, and the Spark
per-track fan-out operator."""

from __future__ import annotations

import struct

import pytest

from timeseries_data_provider_spark.operators import mp4


def test_skeleton_roundtrip_closed_form():
    p = mp4.build_skeleton(4321, 320, 240)
    m = mp4.decode_video_meta(p)
    assert m["format"] == "mp4"
    assert m["major_brand"] == "isom"
    assert m["duration_ms"] == 4321 and m["timescale"] == 1000
    assert m["n_tracks"] == 2 and not m["fragmented"]
    v, a = m["tracks"]
    assert v == {
        "track_id": 1, "kind": "video", "codec": "mp4v",
        "width": 320, "height": 240, "duration_ms": 4321,
        "moov_samples": None,
        "n_samples": None, "n_chunks": None, "sample_bytes": None,
        "first_sample_off": None, "last_sample_off": None,
    }
    assert a["kind"] == "audio" and a["codec"] == "mp4a"
    assert a["width"] is None and a["height"] is None


def test_non_milli_timescale_converts():
    p = mp4.build_skeleton(2500, 64, 48, timescale=90_000)
    m = mp4.decode_video_meta(p)
    assert m["duration_ms"] == 2500
    assert m["timescale"] == 90_000
    assert m["tracks"][0]["duration_ms"] == 2500


def test_version1_and_64bit_boxes():
    # hand-built: 64-bit-size moov holding a version-1 mvhd
    mvhd_body = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)  # creation/modification (64-bit)
        + struct.pack(">IQ", 1000, 7500)  # timescale, duration
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 1)
    )
    mvhd = mp4._box(b"mvhd", mvhd_body)
    moov64 = (
        struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", 16 + len(mvhd))
        + mvhd
    )
    ftyp = mp4._box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
    m = mp4.decode_video_meta(ftyp + moov64)
    assert m["duration_ms"] == 7500 and m["major_brand"] == "mp42"
    assert m["n_tracks"] == 0


def test_fragmented_flag():
    p = mp4.build_skeleton(1000, 32, 32) + mp4._box(b"moof", b"")
    assert mp4.decode_video_meta(p)["fragmented"] is True


def test_malformed_inputs_raise_named_errors():
    with pytest.raises(ValueError, match="ftyp"):
        mp4.decode_video_meta(b"\x00" * 32)
    ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    with pytest.raises(ValueError, match="moov"):
        mp4.decode_video_meta(ftyp)
    # box claiming to extend past its container
    bomb = ftyp + struct.pack(">I", 1 << 30) + b"moov"
    with pytest.raises(ValueError, match="beyond its container"):
        mp4.decode_video_meta(bomb)
    # truncated header
    with pytest.raises(ValueError, match="truncated"):
        mp4.decode_video_meta(ftyp + b"\x00\x00\x00")
    # mvhd timescale 0
    mvhd = mp4._box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 0, 5)
        + b"\x00" * 80,
    )
    with pytest.raises(ValueError, match="timescale"):
        mp4.decode_video_meta(ftyp + mp4._box(b"moov", mvhd))


def test_truncated_box_bodies_raise_valueerror_not_struct_error():
    # ADVICE r6: truncated mvhd/tkhd/mdhd/stsd bodies used to escape
    # as raw struct.error/IndexError; the triage contract (same as
    # decode_baseline_jpeg) classifies on ValueError.
    ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    # mvhd with a 4-byte body: used to slice into neighbor bytes or
    # escape as struct.error
    short_mvhd = mp4._box(b"mvhd", b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        mp4.decode_video_meta(ftyp + mp4._box(b"moov", short_mvhd))
    # trak with a truncated tkhd body — mid-payload, so without the
    # explicit body-length check the parser would SILENTLY read the
    # following mdia box's bytes as track fields
    good = mp4.build_skeleton(1000, 32, 32)
    mvhd_ok = mp4._box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 1000, 5)
        + b"\x00" * 80,
    )
    short_tkhd = mp4._box(b"trak", mp4._box(b"tkhd", b"\x00" * 6)
                          + mp4._box(b"mdia", b""))
    with pytest.raises(ValueError, match="truncated"):
        mp4.decode_video_meta(
            ftyp + mp4._box(b"moov", mvhd_ok + short_tkhd)
        )
    # the well-formed skeleton still decodes after the wrap
    assert mp4.decode_video_meta(good)["n_tracks"] == 2


def test_video_sample_ranges_spark_fanout(spark):
    from timeseries_data_provider_spark.operators import multimodal as mm

    ids = spark.range(20_000, 20_006).withColumnRenamed("id", "doc_id")
    rows = (
        mm.video_sample_ranges(mm.synth_mp4_media(ids))
        .orderBy("doc_id", "track_id", "sample_idx")
        .collect()
    )
    for r in rows:
        i, j = r["doc_id"], r["sample_idx"]
        if r["track_id"] == 1:
            n = 5 + i % 7
            dur = 1000 + 100 * (i % 10)
            assert j < n
            assert r["sample_size"] == 100 + j
            assert r["sample_off"] == 10000 + 100 * j + j * (j - 1) // 2
            assert r["chunk"] == j // 4 + 1
            assert r["dts"] == j * (dur // n)
        else:
            m = 16 + i % 9
            assert j < m
            assert r["sample_size"] == 128
            assert r["sample_off"] == 50000 + 1024 * (j // 8) + 128 * (j % 8)
            assert r["dts"] == 50 * j
    # row count: sum of both tracks' sample counts
    want = sum((5 + i % 7) + (16 + i % 9) for i in range(20_000, 20_006))
    assert len(rows) == want


def test_video_meta_features_spark_fanout(spark):
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import multimodal as mm

    ids = spark.range(20_000, 20_010).withColumnRenamed("id", "doc_id")
    rows = (
        mm.video_meta_features(mm.synth_mp4_media(ids))
        .orderBy("doc_id", "track_id")
        .collect()
    )
    assert len(rows) == 20  # one video + one audio row per doc
    for r in rows:
        i = r["doc_id"]
        assert r["n_tracks"] == 2 and r["major_brand"] == "isom"
        assert r["track_ms"] == 1000 + 100 * (i % 10)
        if r["track_id"] == 1:
            assert r["track_kind"] == "video" and r["codec"] == "mp4v"
            assert r["width"] == 320 + 16 * (i % 5)
            assert r["height"] == 240 + 16 * (i % 3)
        else:
            assert r["track_kind"] == "audio" and r["codec"] == "mp4a"
            assert r["width"] is None and r["height"] is None


# --- sample tables (VERDICT r6 item 2) ------------------------------------


def _stbl_payload(tables: bytes) -> bytes:
    """Wrap raw sample-table boxes in a one-video-track container."""
    stbl = mp4._box(b"stbl", mp4._stsd(b"mp4v") + tables)
    minf = mp4._box(b"minf", stbl)
    mdia = mp4._box(
        b"mdia",
        mp4._mdhd(1000, 1000) + mp4._hdlr(b"vide", b"t") + minf,
    )
    trak = mp4._box(b"trak", mp4._tkhd(1, 1000, 32, 32) + mdia)
    ftyp = mp4._box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    return ftyp + mp4._box(
        b"moov", mp4._mvhd(1000, 1000, 2) + trak
    )


def test_sample_tables_summary_closed_form():
    # video: 11 samples of 100+j bytes, 4/chunk => 3 chunks (4,4,3)
    p = mp4.build_skeleton(2000, 64, 48, video_samples=11,
                           audio_samples=17)
    v, a = mp4.decode_video_meta(p)["tracks"]
    assert v["n_samples"] == 11 and v["n_chunks"] == 3
    assert v["sample_bytes"] == sum(100 + j for j in range(11))
    assert v["first_sample_off"] == 10000
    assert v["last_sample_off"] == 10000 + sum(
        100 + j for j in range(10)
    )
    # audio: const 128-byte samples, 8/chunk (partial last implied)
    assert a["n_samples"] == 17 and a["n_chunks"] == 3
    assert a["sample_bytes"] == 128 * 17
    assert a["first_sample_off"] == 50000
    assert a["last_sample_off"] == 50000 + 128 * 16


def test_iter_samples_walks_chunks_sizes_and_dts():
    p = mp4.build_skeleton(2000, 64, 48, video_samples=6,
                           audio_samples=9)
    vs = list(mp4.iter_samples(p, 1))
    assert [s["index"] for s in vs] == list(range(6))
    assert [s["size"] for s in vs] == [100 + j for j in range(6)]
    assert [s["chunk"] for s in vs] == [1, 1, 1, 1, 2, 2]
    # within-chunk offsets accumulate sizes; chunk 2 restarts at stco
    assert vs[0]["offset"] == 10000
    assert vs[1]["offset"] == 10100
    assert vs[4]["offset"] == 10000 + sum(100 + j for j in range(4))
    # dts: stts [(5, 333), (1, 2000 - 5*333)]
    assert [s["dts"] for s in vs] == [0, 333, 666, 999, 1332, 1665]
    au = list(mp4.iter_samples(p, 2))
    assert len(au) == 9
    assert [s["offset"] for s in au[:3]] == [50000, 50128, 50256]
    assert au[8]["chunk"] == 2 and au[8]["offset"] == 50000 + 1024
    assert [s["dts"] for s in au] == [50 * j for j in range(9)]
    # stss (r9 late): video marks every 4th sample sync (1-based
    # 1, 5, ...); audio has NO stss -> all sync (the spec default)
    assert [s["sync"] for s in vs] == [True, False, False, False,
                                       True, False]
    assert all(s["sync"] for s in au)


def test_stss_empty_means_no_keyframes():
    # a PRESENT-but-empty stss is "no sync samples", distinct from
    # the absent-box all-sync default
    import struct

    tables = mp4.skeleton_video_tables(2000, 4)
    # rebuild with an empty stss: strip the generated one, append ours
    stripped = tables[: tables.rfind(b"stss") - 4]
    empty = struct.pack(">I", 12) + b"stss" + b"\x00" * 4 + struct.pack(">I", 0)
    p = mp4.build_skeleton(
        2000, 64, 48, video_samples=4, audio_samples=0,
        video_tables=stripped + empty,
    ) if "video_tables" in mp4.build_skeleton.__code__.co_varnames else None
    if p is None:
        # builder has no override hook: exercise the parser directly
        blob = stripped + empty
        sync = mp4._parse_stss(
            blob, blob.rfind(b"stss") + 4, len(blob)
        )
        assert sync == set()


def test_iter_samples_errors():
    p = mp4.build_skeleton(1000, 32, 32, video_samples=4)
    with pytest.raises(ValueError, match="no track with id"):
        list(mp4.iter_samples(p, 9))
    with pytest.raises(ValueError, match="no sample tables"):
        list(mp4.iter_samples(p, 2))  # audio track has none here


def test_stz2_field_sizes():
    for field, sizes in ((16, [300, 5, 12]), (8, [9, 0, 255]),
                         (4, [1, 15, 7])):
        if field == 16:
            packed = b"".join(struct.pack(">H", s) for s in sizes)
        elif field == 8:
            packed = bytes(sizes)
        else:
            packed = bytes([(sizes[0] << 4) | sizes[1],
                            sizes[2] << 4])
        stz2 = mp4._full(
            b"stz2",
            b"\x00\x00\x00" + bytes([field])
            + struct.pack(">I", len(sizes)) + packed,
        )
        tables = (
            mp4._stts_box([(3, 10)])
            + mp4._stsc_box([(1, 3)])
            + stz2
            + mp4._stco_box([777], wide=False)
        )
        t = mp4.decode_video_meta(_stbl_payload(tables))["tracks"][0]
        assert t["n_samples"] == 3
        assert t["sample_bytes"] == sum(sizes), field
        assert t["last_sample_off"] == 777 + sizes[0] + sizes[1]


def test_hostile_sample_tables_raise_valueerror():
    def build(tables):
        return _stbl_payload(tables)

    stts = mp4._stts_box([(4, 10)])
    stsc = mp4._stsc_box([(1, 4)])
    stsz = mp4._stsz_box(0, 4, [10, 20, 30, 40])
    stco = mp4._stco_box([100], wide=False)
    # incomplete: any subset missing a family is malformed
    with pytest.raises(ValueError, match="incomplete sample tables"):
        mp4.decode_video_meta(build(stts + stsc + stsz))
    # stts/stsz disagreement
    with pytest.raises(ValueError, match="stsz claims"):
        mp4.decode_video_meta(
            build(mp4._stts_box([(3, 10)]) + stsc + stsz + stco)
        )
    # stsc regressing first_chunk
    with pytest.raises(ValueError, match="not increasing"):
        mp4.decode_video_meta(
            build(stts + mp4._stsc_box([(2, 1), (1, 3)]) + stsz + stco)
        )
    # stsc not starting at chunk 1
    with pytest.raises(ValueError, match="start at chunk 1"):
        mp4.decode_video_meta(
            build(stts + mp4._stsc_box([(2, 4)]) + stsz + stco)
        )
    # more samples than the chunks can place
    with pytest.raises(ValueError, match="place only"):
        mp4.decode_video_meta(
            build(stts + mp4._stsc_box([(1, 2)]) + stsz + stco)
        )
    # stsz sizes body shorter than the claimed count
    short = mp4._full(
        b"stsz", struct.pack(">II", 0, 9) + struct.pack(">I", 10)
    )
    with pytest.raises(ValueError, match="stsz sizes"):
        mp4.decode_video_meta(build(stts + stsc + short + stco))
    # stz2 with an illegal field width
    bad2 = mp4._full(
        b"stz2",
        b"\x00\x00\x00\x05" + struct.pack(">I", 1) + b"\x00",
    )
    with pytest.raises(ValueError, match="field size"):
        mp4.decode_video_meta(build(stts + stsc + bad2 + stco))
    # hostile const-size stsz claiming 2^31 samples: summary must stay
    # O(chunks) arithmetic — and then fail placement, not allocate
    huge = mp4._stsz_box(1000, 1 << 31, None)
    with pytest.raises(ValueError, match="place only"):
        mp4.decode_video_meta(
            build(mp4._stts_box([(1 << 31, 1)]) + stsc + huge + stco)
        )
    # samples claimed but ZERO chunks (review finding: the summary
    # used to accept this quietly while iter_samples rejected it —
    # the routing and ingestion tiers must agree)
    empty_stco = mp4._stco_box([], wide=False)
    with pytest.raises(ValueError, match="place only 0 of 4"):
        mp4.decode_video_meta(build(stts + stsc + stsz + empty_stco))


def test_every_truncation_point_keeps_mp4_error_contract():
    enc = mp4.build_skeleton(1500, 48, 32, video_samples=7,
                             audio_samples=12)
    for cut in range(0, len(enc), 3):
        try:
            mp4.decode_video_meta(enc[:cut])
        except ValueError as e:
            assert str(e).startswith("mp4:"), (cut, e)


# --- fragmented (moof/traf/trun) tier (r8) --------------------------------


def test_fragmented_skeleton_summary_and_walk():
    p = mp4.build_fragmented_skeleton(320, 240, n_fragments=3,
                                      samples_per_fragment=5)
    m = mp4.decode_video_meta(p)
    assert m["fragmented"] is True and m["n_tracks"] == 1
    t = m["tracks"][0]
    # summary comes from the fragment walk (moov has no tables and a
    # zero duration by design)
    assert t["n_samples"] == 15 and t["n_chunks"] == 3
    assert t["first_sample_off"] == 100_064
    # even fragments: per-sample sizes 200+j; odd: tfhd default 150+f
    want_bytes = (
        2 * sum(200 + j for j in range(5)) + 5 * 151
    )
    assert t["sample_bytes"] == want_bytes
    # duration from tfdt base of the last fragment + 5 * 25 ticks
    assert t["duration_ms"] == 500 * 2 + 25 * 5
    walk = list(mp4.iter_fragment_samples(p, 1))
    assert [s["index"] for s in walk] == list(range(15))
    for s in walk:
        f, j = s["fragment"] - 1, s["index"] % 5
        base = 100_064 + 10_000 * f
        if f % 2 == 0:
            assert s["size"] == 200 + j
            assert s["offset"] == base + 200 * j + j * (j - 1) // 2
        else:
            assert s["size"] == 150 + f
            assert s["offset"] == base + (150 + f) * j
        assert s["dts"] == 500 * f + 25 * j
        assert s["duration"] == 25  # trex default
        assert s["chunk"] == f + 1


def test_fragmented_base_is_moof_and_trex_size_defaults():
    # hand-build one moof using default-base-is-moof and NO size
    # anywhere except trex: offsets anchor at the moof header start
    ftyp = mp4._box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5")
    moov = mp4._box(
        b"moov",
        mp4._mvhd(1000, 0, 2)
        + mp4._trak(1, 0, b"vide", b"mp4v", 16, 16, 1000)
        + mp4._box(b"mvex", mp4._trex_box(1, 10, 77)),
    )
    traf = mp4._box(
        b"traf",
        mp4._tfhd_box(1, base_is_moof=True)
        + mp4._trun_box([(None, None)] * 3, data_offset=32),
    )
    moof = mp4._box(
        b"moof", mp4._full(b"mfhd", struct.pack(">I", 1)) + traf
    )
    p = ftyp + moov + moof
    moof_start = len(ftyp) + len(moov)
    walk = list(mp4.iter_fragment_samples(p, 1))
    assert [s["offset"] for s in walk] == [
        moof_start + 32 + 77 * j for j in range(3)
    ]
    assert [s["size"] for s in walk] == [77] * 3
    # no tfdt: dts accumulates from 0 with the trex default duration
    assert [s["dts"] for s in walk] == [0, 10, 20]


def test_fragmented_hostile_errors():
    p = mp4.build_fragmented_skeleton(16, 16, 2, 3)
    # traf without tfhd ("moof" in p is the box TAG, 4 bytes into the
    # header — the container prefix ends 4 bytes earlier)
    ftyp_moov = p[: p.index(b"moof") - 4]
    bad_traf = mp4._box(b"traf", mp4._tfdt_box(0))
    bad = ftyp_moov + mp4._box(
        b"moof", mp4._full(b"mfhd", struct.pack(">I", 1)) + bad_traf
    )
    with pytest.raises(ValueError, match="traf without tfhd"):
        list(mp4.iter_fragment_samples(bad, 1))
    # second traf for the same track with NEITHER base flag CHAINS
    # off the first traf's data end (r9): 1000 + 0 + 5 = 1005
    traf_ok = mp4._box(
        b"traf",
        mp4._tfhd_box(1, base_offset=1000)
        + mp4._trun_box([(None, 5)], data_offset=0, per_size=True),
    )
    traf_chain = mp4._box(
        b"traf",
        mp4._tfhd_box(1)
        + mp4._trun_box([(None, 5)], data_offset=0, per_size=True),
    )
    chain = ftyp_moov + mp4._box(
        b"moof",
        mp4._full(b"mfhd", struct.pack(">I", 1)) + traf_ok + traf_chain,
    )
    offs = [s["offset"] for s in mp4.iter_fragment_samples(chain, 1)]
    assert offs == [1000, 1005]
    # a chain through a preceding traf whose geometry is undecodable
    # (other track, sample with no size anywhere) is a named error —
    # the same OTHER-track traf is silently ignored when nothing
    # chains past it (pre-r9 leniency preserved: walk track 2 works)
    traf_bad_other = mp4._box(
        b"traf",
        mp4._tfhd_box(9, base_offset=500)
        + mp4._trun_box([(None, None)], data_offset=0),
    )
    traf_target = mp4._box(
        b"traf",
        mp4._tfhd_box(1)
        + mp4._trun_box([(None, 5)], data_offset=0, per_size=True),
    )
    traf_abs = mp4._box(
        b"traf",
        mp4._tfhd_box(2, base_offset=2000)
        + mp4._trun_box(
            [(17, 7)], data_offset=0, per_size=True, per_duration=True
        ),
    )
    blocked = ftyp_moov + mp4._box(
        b"moof",
        mp4._full(b"mfhd", struct.pack(">I", 1))
        + traf_bad_other
        + traf_target
        + traf_abs,
    )
    with pytest.raises(ValueError, match="chained traf base-offset"):
        list(mp4.iter_fragment_samples(blocked, 1))
    assert [s["offset"] for s in mp4.iter_fragment_samples(blocked, 2)] == [2000]
    # sample with no size from trun, tfhd, or trex
    no_size = ftyp_moov.replace(
        mp4._trex_box(1, 25, 0), mp4._trex_box(1, 25, 0)
    )  # trex default size is 0 -> still a value; craft without trex
    ftyp = mp4._box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5")
    moov_plain = mp4._box(
        b"moov",
        mp4._mvhd(1000, 0, 2)
        + mp4._trak(1, 0, b"vide", b"mp4v", 16, 16, 1000),
    )
    traf_nosize = mp4._box(
        b"traf",
        mp4._tfhd_box(1, base_offset=500)
        + mp4._trun_box([(None, None)], data_offset=0),
    )
    nosize = ftyp + moov_plain + mp4._box(
        b"moof", mp4._full(b"mfhd", struct.pack(">I", 1)) + traf_nosize
    )
    with pytest.raises(ValueError, match="no tfhd/trex default"):
        list(mp4.iter_fragment_samples(nosize, 1))
    assert no_size  # silence lint on the helper var


def test_trun_hostile_count_does_not_allocate():
    # all-default trun (no per-sample bytes) claiming 2^32-1 samples:
    # parse must stay O(1) memory (review finding) — summary/walk loop
    # lazily and here fail on the missing size default
    ftyp = mp4._box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5")
    moov = mp4._box(
        b"moov",
        mp4._mvhd(1000, 0, 2)
        + mp4._trak(1, 0, b"vide", b"mp4v", 16, 16, 1000),
    )
    body = struct.pack(">I", mp4._TRUN_DATA_OFFSET) + struct.pack(
        ">I", 0xFFFFFFFF
    ) + struct.pack(">i", 0)
    traf = mp4._box(
        b"traf", mp4._tfhd_box(1, base_offset=500) + mp4._box(b"trun", body)
    )
    p = ftyp + moov + mp4._box(
        b"moof", mp4._full(b"mfhd", struct.pack(">I", 1)) + traf
    )
    # the parse itself is O(1): samples stays None with just the count
    tb = p.index(b"trun") - 4
    parsed = mp4._parse_trun(p, tb + 8, len(p))
    assert parsed["samples"] is None and parsed["count"] == 0xFFFFFFFF
    with pytest.raises(ValueError, match="no tfhd/trex default"):
        next(iter(mp4.iter_fragment_samples(p, 1)))


def test_zero_entry_stbl_tables_fall_back_to_fragments():
    # real CMAF muxers emit zero-ENTRY stts/stsc/stsz/stco in the
    # moov: the summary must come from the fragment walk, not report
    # n_samples=0 (review finding)
    empty_tables = (
        mp4._stts_box([])
        + mp4._stsc_box([])
        + mp4._stsz_box(0, 0, [])
        + mp4._stco_box([], wide=False)
    )
    frag = mp4.build_fragmented_skeleton(16, 16, 2, 3)
    # splice the empty tables into the moov's stbl by rebuilding
    ftyp = mp4._box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5")
    moov = mp4._box(
        b"moov",
        mp4._mvhd(1000, 0, 2)
        + mp4._trak(
            1, 0, b"vide", b"mp4v", 16, 16, 1000,
            sample_tables=empty_tables,
        )
        + mp4._box(b"mvex", mp4._trex_box(1, 25, 0)),
    )
    moof_part = frag[frag.index(b"moof") - 4 :]
    p = ftyp + moov + moof_part
    t = mp4.decode_video_meta(p)["tracks"][0]
    assert t["moov_samples"] == 0
    assert t["n_samples"] == 6 and t["n_chunks"] == 2
    fragmented, listing = mp4.track_listing(p)
    assert fragmented and listing == [(1, 0)]


def test_hybrid_file_walks_both_tiers(spark):
    # moov tables AND moofs: the fetch list covers both (review
    # finding — the fragment flag used to shadow the moov samples)
    from timeseries_data_provider_spark.operators import multimodal as mm

    prog = mp4.build_skeleton(1000, 16, 16, video_samples=4)
    # self-contained moof (per-sample sizes AND durations — the
    # progressive moov carries no mvex/trex defaults)
    traf = mp4._box(
        b"traf",
        mp4._tfhd_box(1, base_offset=100_064)
        + mp4._trun_box(
            [(25, 300 + j) for j in range(3)],
            data_offset=0,
            per_size=True,
            per_duration=True,
        ),
    )
    hybrid = prog + mp4._box(
        b"moof", mp4._full(b"mfhd", struct.pack(">I", 1)) + traf
    )
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [hybrid]})
    )
    rows = mm.video_sample_ranges(df).collect()
    offs = sorted(r["sample_off"] for r in rows if r["track_id"] == 1)
    # 4 moov-tier samples from 10000 + 3 fragment-tier from 100064
    assert len([o for o in offs if o < 100_000]) == 4
    assert len([o for o in offs if o >= 100_000]) == 3


def test_fragmented_every_truncation_point():
    enc = mp4.build_fragmented_skeleton(32, 32, 2, 4)
    for cut in range(0, len(enc), 3):
        try:
            mp4.decode_video_meta(enc[:cut])
            list(mp4.iter_fragment_samples(enc[:cut], 1))
        except ValueError as e:
            assert str(e).startswith("mp4:"), (cut, e)


def test_chained_every_truncation_point():
    enc = mp4.build_chained_fragmented_skeleton(32, 32, 2, 3)
    for cut in range(0, len(enc), 3):
        for tid in (1, 2):
            try:
                list(mp4.iter_fragment_samples(enc[:cut], tid))
            except ValueError as e:
                assert str(e).startswith("mp4:"), (cut, tid, e)


def test_chained_fragmented_skeleton_walks_both_tracks():
    """The §8.8.7 chained default end-to-end: track 1 anchors each
    moof at its own start (flags 0, first traf); track 2's traf has
    flags 0 AND no trun data_offset, so its base is the END of track
    1's data — moof start + 64 + Σ(100+i). Expected offsets are
    recovered from the actual moof positions (box sizes aren't doc-id
    arithmetic), durations from trex defaults."""
    spf = 3
    nf = 2
    enc = mp4.build_chained_fragmented_skeleton(24, 16, nf, spf)
    # moof start positions: the tag sits 4 bytes into the box header
    moof_starts = []
    p = 0
    while True:
        p = enc.find(b"moof", p)
        if p < 0:
            break
        moof_starts.append(p - 4)
        p += 4
    assert len(moof_starts) == nf
    v = list(mp4.iter_fragment_samples(enc, 1))
    a = list(mp4.iter_fragment_samples(enc, 2))
    assert len(v) == len(a) == nf * spf
    t1_bytes = sum(100 + i for i in range(spf))
    for f, m in enumerate(moof_starts):
        for j in range(spf):
            s = v[f * spf + j]
            assert s["offset"] == m + 64 + 100 * j + j * (j - 1) // 2
            assert s["size"] == 100 + j
            assert s["dts"] == 500 * f + 25 * j
            assert s["fragment"] == f + 1
            t = a[f * spf + j]
            assert t["offset"] == (
                m + 64 + t1_bytes + 40 * j + j * (j - 1) // 2
            )
            assert t["size"] == 40 + j
            assert t["dts"] == 300 * f + 10 * j
    # the metadata tier sees both tracks' fragment summaries
    meta = mp4.decode_video_meta(enc)
    byid = {t["track_id"]: t for t in meta["tracks"]}
    assert byid[1]["n_samples"] == nf * spf
    assert byid[2]["n_samples"] == nf * spf
    assert byid[2]["sample_bytes"] == nf * sum(40 + i for i in range(spf))


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(nv=st.integers(1, 64), na=st.integers(1, 64))
def test_property_sample_walk_is_consistent(nv, na):
    p = mp4.build_skeleton(3000, 32, 32, video_samples=nv,
                           audio_samples=na)
    v, a = mp4.decode_video_meta(p)["tracks"]
    vs = list(mp4.iter_samples(p, 1))
    au = list(mp4.iter_samples(p, 2))
    # the lazy walk and the O(chunks) summary must agree exactly
    assert len(vs) == v["n_samples"] == nv
    assert len(au) == a["n_samples"] == na
    assert sum(s["size"] for s in vs) == v["sample_bytes"]
    assert vs[0]["offset"] == v["first_sample_off"]
    assert vs[-1]["offset"] == v["last_sample_off"]
    assert au[-1]["offset"] == a["last_sample_off"]
    assert vs[-1]["chunk"] == v["n_chunks"]
    # offsets strictly increase within the planted layouts
    offs = [s["offset"] for s in vs]
    assert offs == sorted(offs) and len(set(offs)) == nv


@settings(max_examples=50, deadline=None)
@given(
    ms=st.integers(0, 10**7),
    w=st.integers(1, 8192),
    h=st.integers(1, 8192),
    ts=st.sampled_from([1000, 90_000, 44_100, 600]),
)
def test_property_skeleton_roundtrip(ms, w, h, ts):
    m = mp4.decode_video_meta(
        mp4.build_skeleton(ms, w, h, timescale=ts)
    )
    # duration survives the timescale round trip to within 1 ms of the
    # builder's own integer quantization
    dur = (ms * ts) // 1000
    assert m["duration_ms"] == (dur * 1000) // ts
    v = m["tracks"][0]
    assert (v["width"], v["height"]) == (w, h)
    assert m["n_tracks"] == 2 and m["timescale"] == ts


def test_fragment_keyframes_all_resolution_tiers():
    # review finding (r10): trun sample-flags were a named gap — the
    # fragmented tier reported keyframe NULL, so a thumbnail tier
    # over CMAF couldn't filter to sync samples. The skeleton plants
    # keyframe iff j == 0 through per-sample flags (even fragments)
    # and tfhd-default + first-sample-flags (odd fragments).
    p = mp4.build_fragmented_skeleton(320, 240, n_fragments=4,
                                      samples_per_fragment=3)
    for s in mp4.iter_fragment_samples(p, 1):
        j = s["index"] % 3
        assert s["sync"] is (j == 0)

    # trex-default tier: no flags in tfhd/trun at all — the mvex
    # default (non-sync) applies to every sample
    ftyp = mp4._box(b"ftyp", b"iso5" + b"\x00\x00\x02\x00" + b"iso5")
    mvex = mp4._box(
        b"mvex", mp4._trex_box(1, 25, 100, default_flags=0x01010000)
    )
    moov = mp4._box(
        b"moov",
        mp4._mvhd(1000, 0, 2)
        + mp4._trak(1, 0, b"vide", b"mp4v", 16, 16, 1000)
        + mvex,
    )
    traf = mp4._box(
        b"traf",
        mp4._tfhd_box(1, base_offset=5000)
        + mp4._trun_box([(None, None)] * 2, data_offset=8),
    )
    moof = mp4._box(
        b"moof", mp4._full(b"mfhd", b"\x00\x00\x00\x01") + traf
    )
    walk = list(mp4.iter_fragment_samples(ftyp + moov + moof, 1))
    assert len(walk) == 2
    assert all(s["sync"] is False for s in walk)

    # trex present with flags 0: the field is mandatory in the box,
    # so this IS a declaration — sample_is_non_sync_sample = 0 reads
    # as sync per the spec (documented caveat: a careless muxer's
    # all-zero trex makes every sample "declared sync")
    mvex0 = mp4._box(b"mvex", mp4._trex_box(1, 25, 100))
    moov0 = mp4._box(
        b"moov",
        mp4._mvhd(1000, 0, 2)
        + mp4._trak(1, 0, b"vide", b"mp4v", 16, 16, 1000)
        + mvex0,
    )
    walk0 = list(mp4.iter_fragment_samples(ftyp + moov0 + moof, 1))
    assert all(s["sync"] is True for s in walk0)

    # sync is None (unknown) ONLY when no tier exists at all: a track
    # with no trex (no mvex) and no tfhd/trun flags — per-sample
    # durations and a tfhd size default stand in for the missing trex
    traf_sz = mp4._box(
        b"traf",
        mp4._tfhd_box(1, base_offset=5000, def_size=100)
        + mp4._trun_box(
            [(25, None), (25, None)], data_offset=8, per_duration=True
        ),
    )
    moof_sz = mp4._box(
        b"moof", mp4._full(b"mfhd", b"\x00\x00\x00\x01") + traf_sz
    )
    moov_plain = mp4._box(
        b"moov",
        mp4._mvhd(1000, 0, 2)
        + mp4._trak(1, 0, b"vide", b"mp4v", 16, 16, 1000),
    )
    walk_n = list(
        mp4.iter_fragment_samples(ftyp + moov_plain + moof_sz, 1)
    )
    assert len(walk_n) == 2
    assert all(s["sync"] is None for s in walk_n)
