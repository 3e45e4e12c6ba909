"""CCITT T.4/T.6 fax codes (operators/ccitt) + the TIFF compression
2/3/4 wiring (operators/tiff).

The Huffman tables are transcribed from ITU-T T.4 Tables 2/3/4; a
shared-table round-trip cannot catch transcription errors, so the
load-bearing tests here are GOLDEN FIXTURES produced by an
independent implementation — the JDK's javax.imageio TIFF plugin
(CCITT RLE / T.4 / T.6 writers) — pinned as base64 and decoded
pixel-exact. The reverse direction (the JDK decoding THIS encoder's
output, 36/36 digests equal) was verified at build time; these
fixtures keep the forward direction pinned without a Java test
dependency.
"""

import base64

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseries_data_provider_spark.operators import ccitt, tiff

# -- golden fixtures: JDK-encoded CCITT TIFFs -------------------------
# pattern: black(x, y, seed) = ((x*x + 3*y*x + y + seed*1009) % 97) < 40
_JDK = {
    "jdk_rle_64x48_0": (
        "TU0AKgAAAAgACwEAAAMAAAABAEAAAAEBAAMAAAABADAAAAEDAAMAAAABAAIAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABADAAAAEXAAQAAAABAAADFwEa"
        "AAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAA"
        "AAE1HG+6HXodOn4j0bg1O906dDodDodOnUdiXwnANXahOh06HTodOn4yON04NXChOh0Oh0Oh"
        "06H37C3vjpw1oUIfHQ6HQ6HTp97SfdOhwDWfdD46HQ6HTofdRIoT46dDgDXhOnQ6HQ6HTp0/"
        "Zud7p06HQ4A13Tp0Oh0Oh06dR2JfCdOh0OhwNd06HQ6HQ6HTp1Hz7hOnQ6HQ6HA1x8dWnQ6d"
        "Oo9eE6dDp1Y1Tp0Oh0OnQ+6j04T46dDodDpwNU6HQ6HQ6HTp94OfdOh0Oh0Oh041TodDodOh"
        "91Hpwnx06HQ6HTpwNVadDp06j14Tp0OnVofHQDVDodDodOnUfPuE6dDodDodDp06NUOh0OnT"
        "qOxL4Tp0Oh0Oh06dOjVDodOnT9m53unTodDodDp06hA1Q6dD7qJFCfHTodDodD46ffA1Q6dP"
        "vaT7p0Oh0Oh0PjqFGDVOh9+wt746dDodDodDp1CiNU6fjI43TodOh06HTqFcNU6jsS+E6dDo"
        "dDodOnT9sDVPxHo3Todeh0+/BDVR2JfCdOh0Oh0OnTp+DgA13iJ906dDodOh06fh8DXgEjfd"
        "DodYh06fioA18LOE6dDodDodDp0/GQA1w+N06HQ6HQ6HTp1HzwA1p1p8fHQ6HQ6HTp0/YWA1"
        "C3vj46HUIdDp0/Dm3DUS990OnQ6tOnUeu4A1LN90PjodDodOnT9h7xw1ecJ06HQ6HQ6HTp+M"
        "PjHANft90OnQ6HTodOo4DxwhwDVZwnTodYh06feDn3Q4NVfCdOh0Oh0OnTp+Ds43Toc1VqE6"
        "dDodDp0On38Hm+6HQ4A1Ubp0OnQ6HTp06iIoTp06NU+6dWh06HTp+H7jdOh06DVPj46dDodO"
        "h0+/YS990OnQ6ITp0Oh0OnQ6ffweb7odOh0OgHx8dDodDodOn3tJ906HQ6HQ6HTodYh06feD"
        "n3TodYh0dOh0Oh06H3UenCfHTodDodOgdDqEOh06feDn3TodDqEOnQB0Oh0OnQ6fj043Q6dD"
        "odDp0Ph0Oh06H3UfXcJ8dOh0OnQ6fMQ6H3T+C5unx0OsQ6dOhw=="
    ),
    "jdk_t4_64x48_0": (
        "TU0AKgAAAAgADAEAAAMAAAABAEAAAAEBAAMAAAABADAAAAEDAAMAAAABAAMAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEWAAMAAAABADAAAAEXAAQAAAABAAADGwEa"
        "AAUAAAABAAAAoAEbAAUAAAABAAAAqAEkAAQAAAABAAAAAQEoAAMAAAABAAEAAAAAAAAAAAAA"
        "AAEAAAABAAAAAQAAAAEAGajjfdDr0OnT8R6NwAUJJBBBNEdEdAgSXthkS28AGau1CdDp0OnQ"
        "6dPxkcbpwAWkkkkEF6WuyFsE3wAZrQoQ+Oh0Oh0OnT72k+6dDgAtUkkkkktawQIIE38AGa8J"
        "06HQ6HQ6dOn7NzvdOnQ6HABaSSSSSSSSXEECBBhMJhfABmu6dDodDodDp06j59wnTodDodDg"
        "AtUh2kkkkhCCCCYTC2hgAzVOnQ6HQ6dD7qPThPjp0Oh0OnABekkkkEEwgkEgkEkEkEF/wAZq"
        "nQ6HQ6dD7qPThPjp0Oh0OnTgAsdoIJhBBCEEkkgkggmh1UAGaodDodDp06j59wnTodDodDod"
        "OnQAL/YTCEII2Ikkkkkkkl+ADNUOh06dP2bne6dOh0Oh0OnTqEAC9hWwQZkOlSSSSSVJVABm"
        "qHTp97SfdOh0Oh0Oh8dQowAWwrbBkLfSSSSSSQSSSgAzVOn4yON06HTodOh06hXAAvbDIlt/"
        "0kggmkgkoAM1T8R6N06HXodPvwQALbDIlt/yOiOggmkEEEECgAzXeIn3Tp0Oh06HTp+HwALZ"
        "BIbbC0hYWwmEECgAzXws4Tp0Oh0Oh0OnT8ZAALEECDCYTC/9hMEGCEw4AM1p1p8fHQ6HQ6HT"
        "p0/YWAAUhbCYQTC4/9hlzcAGaiXvuh06HVp06j13ABQQQQQQQVhBeCBfYZD24AM1ecJ06HQ6"
        "HQ6HTp+MPjHABQkgkkEE0kl+2yHhvABmqzhOnQ6xDp0+8HPuhwAWkkkkkR0CBJfsGbMNvwAZ"
        "qrUJ06HQ6HTodPv4PN90OhwAWqSQQTSSSXViR4ME+4AM1T7p1aHTodOn4fuN06HToAF6pAgS"
        "SSSS7ISwTbC2FgA4Tp0Oh0OnQ6ffweb7odOh0OgASqkkkkEE0koggggggmggvwAbp0OsQ6dP"
        "vBz7p0OsQ6ABfkdBBNBJBIJBIIJBBNEdAgSWADdDqEOh06feDn3TodDqEOnQALwgtoIJhIJB"
        "JJBBNJAgSWoAN0Oh06H3UfXcJ8dOh0OnQ6fABC0EFYQTBCXF0kkgghHS6gAwAYAMAGADABg="
    ),
    "jdk_t6_64x48_0": (
        "TU0AKgAAAAgACwEAAAMAAAABAEAAAAEBAAMAAAABADAAAAEDAAMAAAABAAQAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABADAAAAEXAAQAAAABAAAChwEa"
        "AAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAA"
        "AAEmozGXy6I6Pojoui+YieMeEkgggmiOiOgQJL2wyJbfSCSSCCaS/tskbf0kkkggvS12Qtgm"
        "/SSQSSSSSSS7Ok27XVJJJJJLWsECCBN/qkqSSSSSpWDLmDCYJ2F9JJJJJJJJLiCBAgwmEwv/"
        "pJJJJJJJMvgggmEwv+qQ7SSSSQhBBBMJhbQ6rBAkggmgkkkEEEE0EE0EFggvpJJJBBMIJBIJ"
        "BJBJBBf//2gkgkEgkEEggmkkkvjtBBMIIIQgkkkEkEE0Oq4IEkEFsJhCEEeaSSSSQQWCBJV/"
        "7CYQhBGxEkkkkkkkv/2EwmCEETfpJJJJJJJJfsK2CDMh0qSSSSSpKv7bBa1pJJJJJV7CtsGQ"
        "t9JJJJJJBJJL7YZyH1pe0kkl+2GRLb/pJBBNJBJe2GTzfpCLQQTSQXbDIlt/yOiOggmkEEEE"
        "C3ZIm//aCCYTCCBdkEhtsLSFhbCYQQLhksBBgn/I6CC2EwggXEECDCYTC/9hMEGCEw9mcIQJ"
        "u//YTCYISOFyFsJhBMLj/2GXN4QQQQSCCtAgQ7CYIM+vBBBBBBBWEF4IF9hkPbwggkEEEwgv"
        "/2GcN+EkEkggmkkv22Q8N9BBIIIJoIIR0u7Ic39JJJJIjoECS/YM2Ybf9JJJJJJaS4ZHgJth"
        "fVJIIJpJJLqxI8GCffSSSFJLSSWz7BBMJhf6pAgSSSSS7ISwTbC2FjVaSSSSSSUEEEEEEFsL"
        "1VJJJIIJpJRBBBBBBNBBf1SQtJJJJBBBBBBMLEf/I6CCaCSCQSCQQSCCaI6BAkvSaSCCYQSC"
        "QSCSCSCCx/8ILaCCYSCQSSQQTSQIElr+wrQQQR6SQQSSSSS0sWggrCCYIS4ukkkEEI6XUAEA"
        "EA=="
    ),
    "jdk_t6_101x37_1": (
        "TU0AKgAAAAgACwEAAAMAAAABAGUAAAEBAAMAAAABACUAAAEDAAMAAAABAAQAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABACUAAAEXAAQAAAABAAAC8wEa"
        "AAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAA"
        "AAEmqP5hF8jouiOiOi6I6L5fNhDeXy6I6LojojouiPl0Yz6ikEkEkEF+l7DKJt/SSSCCYQSC"
        "CCVJJIIJpJL9tkPDfS/aCCYQQQLSSCSQjpfnXDBfiLCsIIIIFpJIJIjojoECSSS4ZmwwTCYX"
        "kdEdBBMIJhBAtJJUkkkkvVkLYTBf/3YQQIvq9Ukkkkkklhl8CDCYTC/92wzI9JJJJJJJJLiC"
        "BBhMJhf+wmCDPhLOukItJJJKCCCCCCYWIj9sEGHrSWR0R00kkoIIIIIJhCyhyhwWwTsMkT19"
        "JJIjpJJJQQQQQQTCZQ4X/s9kS/9LFoIJhCgkggkEkkEELX9sMnm/+kR0EE0kEggkgkEEwmiO"
        "ggtL2wyJbf/4sJhMIIFSSSTSSX9kiDBfxFlDhMJhBAqSSSI6EdJbZBIdsLGR0R0EFsJhBAqS"
        "SSSI6I6BAkusMlgIME/ggl/YTBBghMPpJJJJJJJJbEjwYTCYX/7CYTBCRwukkkkkkkq9nmCB"
        "N3//7BBlzdekkkklSSUQQQQQQV//2EwTPr0kkhFoJJJQQQQQQTCCER9+wQZDx9LI6I6SQSSU"
        "EEEEEggrKHKHBf7YZRN/pJJBBNJJQQQQQQQTQQX6XtsMhLfpftBJBJIIIJBBIIJpJL77ZD23"
        "9JJIIJhBBCEECpJIJIIL9L+yHsE//tBBNBBAqQSSCCaSSS/tnXe/9hbCCCBUkkkkkktduyeD"
        "CYJ8RYWwgggRIekkkkI6VLyCQCbvwgtgmwzH9JJAgSSr7IthBAnfEILYTBBgukkkkkqpXEIE"
        "EEwmELKvds9kJdVSEjppJKmCCCCaCCZQ4WCBbthl++qwQJIjpIJJLCCCCYQTCC/+2GIb/SSS"
        "SCSSSUIIJIJBBREftsMnBOPpCLSCQQSSpIIJBBNEdEdAgS+2J/bdcjojoIJoJIIIKEEEkEkE"
        "E0l1uwZxhlR69oIJhBJJaSSSSCC9L7Bgz2wX6SQQWwmEEC1SSSSSSS17EvBgr//YTCBBKACA"
        "CA=="
    ),
    "jdk_rle_stripes": (
        "TU0AKgAAAAgACwEAAAMAAAABAFAAAAEBAAMAAAABAAoAAAEDAAMAAAABAAIAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABAAoAAAEXAAQAAAABAAABwgEa"
        "AAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAA"
        "AAEdDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDodDo"
        "dDodDodDodDodDodDodDodDodDo="
    ),
    "jdk_t4_stripes": (
        "TU0AKgAAAAgADAEAAAMAAAABAFAAAAEBAAMAAAABAAoAAAEDAAMAAAABAAMAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEWAAMAAAABAAoAAAEXAAQAAAABAAABLQEa"
        "AAUAAAABAAAAoAEbAAUAAAABAAAAqAEkAAQAAAABAAAAAQEoAAMAAAABAAEAAAAAAAAAAAAA"
        "AAEAAAABAAAAAQAAAAEAGOh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0"
        "Oh0Oh0Oh0AC/////////////wAY6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ"
        "6HQ6HQ6HQ6HQ6HQAL/////////////ABjodDodDodDodDodDodDodDodDodDodDodDodDodD"
        "odDodDodDodDodDodDodAAv////////////8AGOh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0O"
        "h0Oh0Oh0Oh0Oh0Oh0Oh0Oh0Oh0AC/////////////wAY6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6"
        "HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQ6HQAL/////////////ABgAwAYAMAGAD"
    ),
    "jdk_t6_stripes": (
        "TU0AKgAAAAgACwEAAAMAAAABAFAAAAEBAAMAAAABAAoAAAEDAAMAAAABAAQAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABAAoAAAEXAAQAAAABAAAAmQEa"
        "AAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAA"
        "AAEjojojojojojojojojojojojojojojojojojojojojojojojojojojojojojojojojojoj"
        "ojojojoEEv//////////////////////////////////////////////////////////////"
        "/////////////////////////////////////////////////////////4AIAIA="
    ),
    "jdk_t6_white": (
        "TU0AKgAAAAgACwEAAAMAAAABAFAAAAEBAAMAAAABAAoAAAEDAAMAAAABAAQAAAEGAAMAAAAB"
        "AAAAAAERAAQAAAABAAAApAEVAAMAAAABAAEAAAEWAAMAAAABAAoAAAEXAAQAAAABAAAABQEa"
        "AAUAAAABAAAAlAEbAAUAAAABAAAAnAEoAAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAA"
        "AAH/wAQAQA=="
    ),
}


def _jdk_blob(name: str) -> bytes:
    return base64.b64decode("".join(_JDK[name]))


def _pattern(w: int, h: int, seed: int) -> np.ndarray:
    ys, xs = np.mgrid[0:h, 0:w]
    return np.where(
        (xs * xs + 3 * ys * xs + ys + seed * 1009) % 97 < 40, 0, 255
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "name,w,h,seed",
    [
        ("jdk_rle_64x48_0", 64, 48, 0),
        ("jdk_t4_64x48_0", 64, 48, 0),
        ("jdk_t6_64x48_0", 64, 48, 0),
        ("jdk_t6_101x37_1", 101, 37, 1),
    ],
)
def test_jdk_golden_pattern_fixtures(name, w, h, seed):
    d = tiff.decode_tiff(_jdk_blob(name))
    assert (d["width"], d["height"]) == (w, h)
    assert (d["pixels"] == _pattern(w, h, seed)).all()


@pytest.mark.parametrize(
    "name", ["jdk_rle_stripes", "jdk_t4_stripes", "jdk_t6_stripes"]
)
def test_jdk_golden_stripes(name):
    # odd columns black: the worst case for run coding (all runs
    # length 1 — exercises the shortest codes of both colour tables)
    exp = np.tile(
        np.where(np.arange(80) % 2 == 1, 0, 255).astype(np.uint8),
        (10, 1),
    )
    assert (tiff.decode_tiff(_jdk_blob(name))["pixels"] == exp).all()


def test_jdk_golden_all_white():
    d = tiff.decode_tiff(_jdk_blob("jdk_t6_white"))
    assert (d["pixels"] == 255).all() and d["pixels"].shape == (10, 80)


# -- table structure ----------------------------------------------------


def test_code_tables_shape():
    # T.4 Tables 2/3: 64 terminating + 27 make-up codes per colour;
    # Table 4: 13 shared extended make-ups. Prefix-freeness is
    # asserted at import by _build_tree.
    assert len(ccitt.WHITE) == 91 and len(ccitt.BLACK) == 91
    assert sorted(ccitt.EXT) == list(range(1792, 2561, 64))
    assert set(ccitt.WHITE) == set(ccitt.BLACK)
    assert sorted(ccitt.WHITE)[:65] == list(range(65))


# -- round-trips through the TIFF container -----------------------------


@pytest.mark.parametrize("form", ["mh", "g3", "g4"])
@pytest.mark.parametrize("rps", [None, 3])
@pytest.mark.parametrize("be", [False, True])
def test_tiff_ccitt_roundtrip_matrix(form, rps, be):
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 64), (17, 131)]:
        img = np.where(rng.random((h, w)) < 0.4, 0, 255).astype(
            np.uint8
        )
        blob = tiff.encode_tiff(
            w, h, img, big_endian=be, ccitt=form, rows_per_strip=rps
        )
        d = tiff.decode_tiff(blob)
        assert (d["pixels"] == img).all()


def test_extended_makeup_runs():
    # runs above 1791 need Table 4; above 2623 chain 2560-codes
    img = np.zeros((3, 3000), np.uint8)
    img[1, 2900:] = 255
    img[2, :] = 255
    for form in ("mh", "g3", "g4"):
        blob = tiff.encode_tiff(3000, 3, img, ccitt=form)
        assert (tiff.decode_tiff(blob)["pixels"] == img).all()


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    form=st.sampled_from(["mh", "g3", "g4"]),
    h=st.integers(1, 12),
    w=st.integers(1, 80),
)
def test_property_roundtrip(seed, form, h, w):
    rng = np.random.default_rng(seed)
    img = np.where(rng.random((h, w)) < 0.5, 0, 255).astype(np.uint8)
    blob = tiff.encode_tiff(w, h, img, ccitt=form)
    assert (tiff.decode_tiff(blob)["pixels"] == img).all()


# -- hostile inputs ------------------------------------------------------


def test_truncation_is_loud():
    img = _pattern(64, 16, 3)
    for form in ("mh", "g3", "g4"):
        blob = tiff.encode_tiff(64, 16, img, ccitt=form)
        for cut in range(len(blob) - 1, len(blob) - 40, -3):
            try:
                d = tiff.decode_tiff(blob[:cut])
            except (ValueError, NotImplementedError):
                continue
            raise AssertionError(f"{form} cut={cut} decoded silently")


def test_corrupt_stream_is_loud():
    # flipping bits inside the coded strip must raise, never return
    # wrong pixels silently... unless the flip lands in padding; we
    # assert only that no exception OTHER than ValueError escapes
    img = _pattern(64, 16, 4)
    blob = bytearray(tiff.encode_tiff(64, 16, img, ccitt="g4"))
    hits = 0
    for at in range(len(blob) - 40, len(blob), 2):
        mutated = bytearray(blob)
        mutated[at] ^= 0xFF
        try:
            tiff.decode_tiff(bytes(mutated))
        except (ValueError, NotImplementedError):
            hits += 1
    assert hits > 0  # at least some corruption is detected


def test_uncompressed_mode_option_named():
    blob = bytearray(tiff.encode_tiff(8, 2, np.zeros((2, 8), np.uint8), ccitt="g4"))
    # T6Options was written as LONG [0]; set bit 1 (uncompressed)
    at = bytes(blob).find((293).to_bytes(2, "little"))
    assert at > 0
    blob[at + 8] = 2  # little-endian value field
    with pytest.raises(NotImplementedError, match="uncompressed"):
        tiff.decode_tiff(bytes(blob))


def test_ccitt_guards():
    img = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="exclusive"):
        tiff.encode_tiff(4, 4, img, ccitt="g4", lzw=True)
    with pytest.raises(ValueError, match="ccitt"):
        tiff.encode_tiff(4, 4, img, ccitt="g5")
    with pytest.raises(ValueError, match="predictor"):
        tiff.encode_tiff(4, 4, img, ccitt="g4", predictor=2)
    rgb = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="gray"):
        tiff.encode_tiff(4, 4, rgb, ccitt="mh")


def test_photometric_1_bilevel():
    # photometric only changes how SAMPLES are stored; fax bits are
    # white/black either way and the decoder emits the same display
    # gray. Flip the photometric tag 0 -> 1 and expect identical
    # output.
    img = _pattern(40, 8, 5)
    blob = bytearray(tiff.encode_tiff(40, 8, img, ccitt="g4"))
    at = bytes(blob).find((262).to_bytes(2, "little"))
    assert at > 0 and blob[at + 8] == 0
    blob[at + 8] = 1
    assert (tiff.decode_tiff(bytes(blob))["pixels"] == img).all()


def test_registry_dispatch():
    # CCITT TIFFs ride the shared image-codec registry like every
    # other TIFF flavour
    from timeseries_data_provider_spark.operators import multimodal

    tiff.register()
    img = _pattern(32, 8, 6)
    blob = tiff.encode_tiff(32, 8, img, ccitt="g4")
    d = multimodal.decode_image(blob)
    assert d["format"] == "tiff" and (d["pixels"] == img).all()
