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
    # r12 ADVICE correction: under TIFF 6.0 the decompressed fax
    # bits ARE the samples (white pel -> 0), so photometric 1
    # (BlackIsZero) marks a REVERSED image — flipping the tag 0 -> 1
    # must INVERT the decoded raster (libtiff semantics; the r11
    # claim that photometric was display-neutral for CCITT was
    # wrong).
    img = _pattern(40, 8, 5)
    blob = bytearray(tiff.encode_tiff(40, 8, img, ccitt="g4"))
    at = bytes(blob).find((262).to_bytes(2, "little"))
    assert at > 0 and blob[at + 8] == 0
    blob[at + 8] = 1
    assert (
        tiff.decode_tiff(bytes(blob))["pixels"] == 255 - img
    ).all()


def test_registry_dispatch():
    # CCITT TIFFs ride the shared image-codec registry like every
    # other TIFF flavour
    from timeseries_data_provider_spark.operators import multimodal

    tiff.register()
    img = _pattern(32, 8, 6)
    blob = tiff.encode_tiff(32, 8, img, ccitt="g4")
    d = multimodal.decode_image(blob)
    assert d["format"] == "tiff" and (d["pixels"] == img).all()


# -- 16-bit samples (r11 late, same cross-validation posture) -----------
# JDK-ImageIO-encoded 16-bit gray Deflate TIFF of the pattern
# v(x, y) = (x*733 + y*12007) % 65536; the decoder downconverts to
# the package-wide 8-bit contract via >>8 (the exact inverse of the
# v*257 upscale convention). Reverse direction (JDK digest-equal on
# this encoder's none/Deflate/big-endian files) verified at build
# time; the JDK itself cannot read 16-bit Predictor-2 files (a JDK
# limitation, not a spec one), so that combination rides the
# round-trip matrix below instead.
_JDK16_DEFLATE = (
    "TU0AKgAAAAgADQEAAAMAAAABAFoAAAEBAAMAAAABACgAAAECAAMAAAABABAAAAEDAAMAAAAB"
    "gLIAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAvAEVAAMAAAABAAEAAAEWAAMAAAABACgAAAEX"
    "AAQAAAABAAAcKwEaAAUAAAABAAAArAEbAAUAAAABAAAAtAEoAAMAAAABAAEAAAFTAAMAAAAB"
    "AAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAF42gEgHN/jAAAC3QW6CJcLdA5RES4UCxboGcUc"
    "oh9/IlwlOSgWKvMt0DCtM4o2ZzlEPCE+/kHbRLhHlUpyTU9QLFMJVeZYw1ugXn1hWmQ3ZxRp"
    "8WzOb6tyiHVleEJ7H338gNmDtoaTiXCMTY8qkgeU5JfBmp6de6BYozWmEqjvq8yuqbGGtGO3"
    "QLodvPq/18K0xZHIbstLzijRBdPi1r/ZnNx531biM+UQ5+3qyu2n8ITzYfY++Rv7+P7VLucx"
    "xDShN346Wz04QBVC8kXPSKxLiU5mUUNUIFb9Wdpct1+UYnFlTmgrawht5XDCc592fHlZfDZ/"
    "E4HwhM2HqoqHjWSQQZMelfuY2Ju1npKhb6RMpymqBqzjr8CynbV6uFe7NL4RwO7Dy8aoyYXM"
    "Ys8/0hzU+dfW2rPdkOBt40rmJ+kE6+HuvvGb9Hj3Vfoy/Q//7ALJBaYIgwtgDj0RGhP3FtQZ"
    "sRyOH2siSCUlKAIq3y28Xc5gq2OIZmVpQmwfbvxx2XS2d5N6cH1NgCqDB4XkiMGLno57kViU"
    "NZcSme+czJ+pooalY6hAqx2t+rDXs7S2kbluvEu/KMIFxOLHv8qczXnQVtMz1hDY7dvK3qfh"
    "hORh5z7qG+z479XysvWP+Gz7Sf4mAQMD4Aa9CZoMdw9UEjEVDhfrGsgdpSCCI18mPCkZK/Yu"
    "0zGwNI03ajpHPSRAAULeRbtImEt1TlJRL1QMVulZxlyjjLWPkpJvlUyYKZsGneOgwKOdpnqp"
    "V6w0rxGx7rTLt6i6hb1iwD/DHMX5yNbLs86Q0W3UStcn2gTc4d++4pvleOhV6zLuD/Ds88n2"
    "pvmD/GD/PQIaBPcH1AqxDY4QaxNIFiUZAhvfHrwhmSR2J1MqMC0NL+oyxzWkOIE7Xj47QRhD"
    "9UbSSa9MjE9pUkZVI1gAWt1dumCXY3RmUWkubAtu6HHFdKJ3f3pcfTmAFoLzhdCIrYuKu5y+"
    "ecFWxDPHEMntzMrPp9KE1WHYPtsb3fjg1eOy5o/pbOxJ7ybyA/Tg9736mv13AFQDMQYOCOsL"
    "yA6lEYIUXxc8Ghkc9h/TIrAljShqK0cuJDEBM942uzmYPHU/UkIvRQxH6UrGTaNQgFNdVjpZ"
    "F1v0XtFhrmSLZ2hqRW0ib/9y3HW5eJZ7c35QgS2ECobnicSMoY9+kluVOJgVmvKdz6Cso4mm"
    "ZqlDrCCu/bHatLe3lLpx6oPtYPA98xr19/jU+7H+jgFrBEgHJQoCDN8PvBKZFXYYUxswHg0g"
    "6iPHJqQpgSxeLzsyGDT1N9I6rz2MQGlDRkYjSQBL3U66UZdUdFdRWi5dC1/oYsVlomh/a1xu"
    "OXEWc/N20HmtfIp/Z4JEhSGH/orbjbiQlZNylk+ZLJwJnuahw6Sgp32qWq03sBSy8bXOuKu7"
    "iL5lwULEH8b8ydnMts+T0nDVTdgq2wfd5ODB457me+lYGWocRx8kIgEk3ie7KpgtdTBSMy82"
    "DDjpO8Y+o0GARF1HOkoXTPRP0VKuVYtYaFtFXiJg/2PcZrlplmxzb1ByLXUKd+d6xH2hgH6D"
    "W4Y4iRWL8o7PkayUiZdmmkOdIJ/9otqlt6iUq3GuTrErtAi25bnCvJ+/fMJZxTbIE8rwzc3Q"
    "qtOH1mTZQdwe3vvh2OS155Lqb+1M8CnzBvXj+MD7nf56AVcENAcRCe4Myw+oEoUVYhg/SFFL"
    "Lk4LUOhTxVaiWX9cXF85YhZk82fQaq1tinBnc0R2IXj+e9t+uIGVhHKHT4osjQmP5pLDlaCY"
    "fZtanjehFKPxps6pq6yIr2WyQrUft/y62b22wJPDcMZNySrMB87k0cHUntd72ljdNeAS4u/l"
    "zOip64buY/FA9B32+vnX/LT/kQJuBUsIKAsFDeIQvxOcFnkZVhwzHxAh7STKJ6cqhC1hMD4z"
    "GzX4ONU7sj6PQWxESUcmdzh6FXzyf8+CrIWJiGaLQ44gkP2T2pa3mZSccZ9OoiulCKflqsKt"
    "n7B8s1m2NrkTu/C+zcGqxIfHZMpBzR7P+9LY1bXYkttv3kzhKeQG5uPpwOyd73ryV/U0+BH6"
    "7v3LAKgDhQZiCT8MHA75EdYUsxeQGm0dSiAnIwQl4Si+K5sueDFVNDI3DznsPMk/pkKDRWBI"
    "PUsaTfdQ1FOxVo5Za1xIXyViAmTfZ7xqmW12cFNzMHYNph+o/KvZrraxk7Rwt026Kr0Hv+TC"
    "wcWeyHvLWM410RLT79bM2ancht9j4kDlHef66tfttPCR8272S/ko/AX+4gG/BJwHeQpWDTMQ"
    "EBLtFcoYpxuEHmEhPiQbJvgp1SyyL48ybDVJOCY7Az3gQL1DmkZ3SVRMMU8OUetUyFelWoJd"
    "X2A8Yxll9mjTa7BujXFqdEd3JHoBfN5/u4KYhXWIUosvjgyQ6ZPGlqOZgJxdnzqiF6T01QbX"
    "49rA3Z3geuNX5jTpEevu7svxqPSF92L6P/0c//kC1gWzCJALbQ5KEScUBBbhGb4cmx94IlUl"
    "MigPKuwtyTCmM4M2YDk9PBo+90HURLFHjkprTUhQJVMCVd9YvFuZXnZhU2QwZw1p6mzHb6Ry"
    "gXVeeDt7GH31gNKDr4aMiWmMRo8jkgCU3Ze6mpeddKBRoy6mC6joq8WuorF/tFy3OboWvPO/"
    "0MKtxYrIZ8tEziHQ/tPbA+0GygmnDIQPYRI+FRsX+BrVHbIgjyNsJkkpJiwDLuAxvTSaN3c6"
    "VD0xQA5C60XISKVLgk5fUTxUGVb2WdNcsF+NYmplR2gkawFt3nC7c5h2dXlSfC9/DIHphMaH"
    "o4qAjV2QOpMXlfSY0ZuunouhaKRFpyKp/6zcr7mylrVzuFC7Lb4KwOfDxMahyX7MW8840hXU"
    "8tfP2qzdieBm40PmIOj969rut/GU9HH3Tvor/Qj/5QLCMtQ1sTiOO2s+SEElRAJG30m8TJlP"
    "dlJTVTBYDVrqXcdgpGOBZl5pO2wYbvVx0nSvd4x6aX1GgCODAIXdiLqLl450kVGULpcLmeic"
    "xZ+ion+lXKg5qxat87DQs622irlnvES/IcH+xNvHuMqVzXLQT9Ms1gnY5tvD3qDhfeRa5zfq"
    "FOzx787yq/WI+GX7Qv4fAPwD2Qa2CZMMcA9NEioVBxfkGsEdniB7I1gmNSkSK+8uzDGpYbtk"
    "mGd1alJtL3AMcul1xnije4B+XYE6hBeG9InRjK6Pi5JolUWYIpr/ndyguaOWpnOpUKwtrwqx"
    "57TEt6G6fr1bwDjDFcXyyM/LrM6J0WbUQ9cg2f3c2t+34pTlcehO6yvuCPDl88L2n/l8/Fn/"
    "NgITBPAHzQqqDYcQZBNBFh4Y+xvYHrUhkiRvJ0wqKS0GL+MywDWdOHo7Vz40QRFD7kbLSahM"
    "hU9iUj9VHFf5WtZds2CQkKKTf5ZcmTmcFp7zodCkraeKqmetRLAhsv6127i4u5W+csFPxCzH"
    "CcnmzMPPoNJ91VrYN9sU3fHgzuOr5ojpZexC7x/x/PTZ97b6k/1wAE0DKgYHCOQLwQ6eEXsU"
    "WBc1GhIc7x/MIqklhihjK0AuHTD6M9c2tDmRPG4/S0IoRQVH4kq/TZxQeVNWVjNZEFvtXsph"
    "p2SEZ2FqPm0bb/hy1XWyeI97bH5JgSaEA4bgib2Mmo93v4nCZsVDyCDK/c3a0LfTlNZx2U7c"
    "K98I4eXkwuef6nztWfA28xP18PjN+6r+hwFkBEEHHgn7DNgPtRKSFW8YTBspHgYg4yPAJp0p"
    "eixXLzQyETTuN8s6qD2FQGJDP0YcSPlL1k6zUZBUbVdKWiddBF/hYr5lm2h4a1VuMnEPc+x2"
    "yXmmfIN/YII9hRqH94rUjbGQjpNrlkiZJZwCnt+hvKSZp3aqU60wsA2y6rXHuKS7gb5e7nDx"
    "TfQq9wf55PzB/54CewVYCDULEg3vEMwTqRaGGWMcQB8dIfok1ye0KpEtbjBLMyg2BTjiO78+"
    "nEF5RFZHM0oQTO1PylKnVYRYYVs+Xhtg+GPVZrJpj2xsb0lyJnUDd+B6vX2agHeDVIYxiQ6L"
    "647IkaWUgpdfmjydGZ/2otOlsKiNq2quR7EktAG23rm7vJi/dcJSxS/IDMrpzcbQo9OA1l3Z"
    "OtwX3vTh0eSu54vqaO1FHVcgNCMRJe4oyyuoLoUxYjQ/Nxw5+TzWP7NCkEVtSEpLJ04EUOFT"
    "vlabWXhcVV8yYg9k7GfJaqZtg3Bgcz12Gnj3e9R+sYGOhGuHSIoljQKP35K8lZmYdptTnjCh"
    "DaPqpseppKyBr16yO7UYt/W60r2vwIzDacZGySPMAM7d0brUl9d02lHdLuAL4ujlxeii63/u"
    "XPE59Bb28/nQ/K3/igJnBUQIIQr+DdsQuBOVFnIZTxwsTD5PG1H4VNVXslqPXWxgSWMmZgNo"
    "4Gu9bppxd3RUdzF6Dnzrf8iCpYWCiF+LPI4ZkPaT05awmY2cap9HoiSlAafeqrutmLB1s1K2"
    "L7kMu+m+xsGjxIDHXco6zRfP9NLR1a7Yi9to3kXhIuP/5tzpueyW73PyUPUt+Ar65/3EAKED"
    "fgZbCTgMFQ7yEc8UrBeJGmYdQyAgIv0l2ii3K5QucTFONCs3CDnlPMI/n0J8RVlINksTeyV+"
    "AoDfg7yGmYl2jFOPMJINlOqXx5qknYGgXqM7phio9avSrq+xjLRpt0a6I70Av93CusWXyHTL"
    "Uc4u0QvT6NbF2aLcf99c4jnlFufz6tDtrfCK82f2RPkh+/7+2wG4BJUHcgpPDSwQCRLmFcMY"
    "oBt9HlohNyQUJvEpziyrL4gyZTVCOB86/D3ZQLZDk0ZwSU1MKk8HUeRUwVeeWntdWGA1YxJl"
    "72jMa6luhnFjdEB3HXn6qgys6a/GsqO1gLhduzq+F8D0w9HGrsmLzGjPRdIi1P/X3Nq53Zbg"
    "c+NQ5i3pCuvn7sTxofR+91v6OP0V//ICzwWsCIkLZg5DESAT/RbaGbcclB9xIk4lKygIKuUt"
    "wjCfM3w2WTk2PBM+8EHNRKpHh0pkTUFQHlL7VdhYtVuSXm9hTGQpZwZp42zAb51yenVXeDR7"
    "EX3ugMuDqIaFiWKMP48ckfmU1pezmpCdbaBKoyemBKjh2PPb0N6t4YrkZ+dE6iHs/u/b8rj1"
    "lfhy+0/+LAEJA+YGwwmgDH0PWhI3FRQX8RrOHasgiCNlJkIpHyv8LtkxtjSTN3A6TT0qQAdC"
    "5EXBSJ5Le05YUTVUElbvWcxcqV+GYmNlQGgdavpt13C0c5F2bnlLfCh/BYHihL+HnIp5jVaQ"
    "M5MQle2YypunnoShYaQ+pxup+KzVr7Kyj7VsuEm7Jr4DwODDvcaayXfMVM8x0g7U69fIB9oK"
    "tw2UEHETThYrGQgb5R7CIZ8kfCdZKjYtEy/wMs01qjiHO2Q+QUEeQ/tG2Em1TJJPb1JMVSlY"
    "BlrjXcBgnWN6ZldpNGwRbu5xy3Sod4V6Yn0/gByC+YXWiLOLkI5tkUqUJ5cEmeGcvp+bonil"
    "Vagyqw+t7LDJs6a2g7lgvD2/GsH3xNTHscqOzWvQSNMl1gLY39u83pnhduRT5zDqDezq78fy"
    "pPWB+F77O/4YAPUD0gavNsE5njx7P1hCNUUSR+9KzE2pUIZTY1ZAWR1b+l7XYbRkkWduaktt"
    "KHAFcuJ1v3ice3l+VoEzhBCG7YnKjKePhJJhlT6YG5r4ndWgsqOPpmypSawmrwOx4LS9t5q6"
    "d71UwDHDDsXryMjLpc6C0V/UPNcZ2fbc09+w4o3lauhH6yTuAfDe87v2mPl1/FL/LwIMBOkH"
    "xgqjDYAQXRM6FhcY9BvRHq4hiyRoJ0UqIiz/L9wyuTWWZahohWtibj9xHHP5dtZ5s3yQf22C"
    "SoUniASK4Y2+kJuTeJZVmTKcD57socmkpqeDqmCtPbAasve11Lixu46+a8FIxCXHAsnfzLzP"
    "mdJ21VPYMNsN3ergx+Ok5oHpXuw77xjx9fTS96/6jP1pAEYDIwYACN0Lug6XEXQUURcuGgsc"
    "6B/FIqIlfyhcKzkuFjDzM9A2rTmKPGc/REIhRP5H20q4TZVQclNPVixZCVvmXsNhoGR9lI+X"
    "bJpJnSagA6Lgpb2omqt3rlSxMbQOtuu5yLylv4LCX8U8yBnK9s3T0LDTjdZq2UfcJN8B4d7k"
    "u+eY6nXtUvAv8wz16fjG+6P+gAFdBDoHFwn0DNEPrhKLFWgYRRsiHf8g3CO5JpYpcyxQLy0y"
    "CjTnN8Q6oT1+QFtDOEYVSPJLz06sUYlUZldDWiBc/V/aYrdllGhxa05uK3EIc+V2wnmffHx/"
    "WYI2hROH8IrNjaqQh5Nkw3bGU8kwzA3O6tHH1KTXgdpe3TvgGOL15dLor+uM7mnxRvQj9wD5"
    "3fy6/5cCdAVRCC4LCw3oEMUTohZ/GVwcOR8WIfMk0CetKootZzBEMyE1/jjbO7g+lUFyRE9H"
    "LEoJTOZPw1KgVX1YWls3XhRg8WPOZqtpiGxlb0JyH3T8d9l6tn2TgHCDTYYqiQeL5I7BkZ6U"
    "e5dYmjWdEp/vosylqaiGq2OuQLEds/q217m0vJG/bsJL8l31OvgX+vT90QCuA4sGaAlFDCIO"
    "/xHcFLkXlhpzHVAgLSMKJecoxCuhLn4xWzQ4NxU58jzPP6xCiUVmSENLIE39UNpTt1aUWXFc"
    "Tl8rYghk5WfCap9tfHBZczZ2E3jwe81+qoGHhGSHQYoejPuP2JK1lZKYb5tMnimhBqPjpsCp"
    "nax6r1eyNLURt+66y72owIXDYsY/yRzL+c7W0bPUkNdt2krdJ+AE4uHlvuib63juVfEyIUQk"
    "ISb+KdssuC+VMnI1TzgsOwk95kDDQ6BGfUlaTDdPFFHxVM5Xq1qIXWVgQmMfZfxo2Wu2bpNx"
    "cHRNdyp6B3zkf8GCnoV7iFiLNY4SkO+TzJapmYacY59Aoh2k+qfXqrStkbBus0u2KLkFu+K+"
    "v8GcxHnHVsozzRDP7dLK1afYhNth3j7hG+P45tXpsuyP72zySfUm+AP64P29AJoDdwZUCTEM"
    "Dg7rEcgUpReCGl8dPCAZUCtTCFXlWMJbn158YVlkNmcTafBszW+qcod1ZHhBex59+4DYg7WG"
    "kolvjEyPKZIGlOOXwJqdnXqgV6M0phGo7qvLrqixhbRitz+6HLz5v9bCs8WQyG3LSs4n0QTT"
    "4da+2ZvceN9V4jLlD+fs6sntpvCD82D2Pfka+/f+1AGxBI4HawpIDSUQAhLfFbwYmRt2HlMh"
    "MCQNJuopxyykL4EyXjU7OBg69T3SQK9DjEZpSUZMI08AfxKB74TMh6mKho1jkECTHZX6mNeb"
    "tJ6RoW6kS6coqgWs4q+/spy1ebhWuzO+EMDtw8rGp8mEzGHPPtIb1PjX1dqy3Y/gbONJ5ibp"
    "A+vg7r3xmvR391T6Mf0O/+sCyAWlCIILXw48ERkT9hbTGbAcjR9qIkclJCgBKt4tuzCYM3U2"
    "UjkvPAw+6UHGRKNHgEpdTTpQF1L0VdFYrluLXmhhRWQiZv9p3Gy5b5Zyc3VQeC17Cn3nrfmw"
    "1rOztpC5bbxKvyfCBMThx77Km8140FXTMtYP2Ozbyd6m4YPkYOc96hrs9+/U8rH1jvhr+0j+"
    "JQECA98GvAmZDHYPUxIwFQ0X6hrHHaQggSNeJjspGCv1LtIxrzSMN2k6Rj0jQABC3UW6SJdL"
    "dE5RUS5UC1boWcVcol9/YlxlOWgWavNt0HCtc4p2Z3lEfCF+/oHbhLiHlYpyjU+QLJMJleaY"
    "w5ugnn2hWqQ3pxSp8azO3ODfveKa5XfoVOsx7g7w6/PI9qX5gvxf/zwCGQT2B9MKsA2NEGoT"
    "RxYkGQEb3h67IZgkdSdSKi8tDC/pMsY1oziAO10+OkEXQ/RG0UmuTItPaFJFVSJX/1rcXblg"
    "lmNzZlBpLWwKbudxxHShd356W304gBWC8oXPiKyLiY5mkUOUIJb9mdqct5+UonGlTqgrqwit"
    "5bDCs5+2fLlZvDa/E8HwxM3HqsqHzWTQQdMe1fvY2Nu1C8cOpBGBFF4XOxoYHPUf0iKvJYwo"
    "aStGLiMxADPdNro5lzx0P1FCLkULR+hKxU2iUH9TXFY5WRZb817QYa1kimdnakRtIW/+ctt1"
    "uHiVe3J+T4EshAmG5onDjKCPfZJalTeYFJrxnc6gq6OIpmWpQqwfrvyx2bS2t5O6cL1NwCrD"
    "B8XkyMHLns570VjUNdcS2e/czN+p4oblY+hA6x3t+vDX87T2kflu/Ev/KAIFBOIHvwqcOq49"
    "i0BoQ0VGIkj/S9xOuVGWVHNXUFotXQpf52LEZaFofmtbbjhxFXPyds95rHyJf2aCQ4Ugh/2K"
    "2o23kJSTcZZOmSucCJ7locKkn6d8qlmtNrATsvC1zbiqu4e+ZMFBxB7G+8nYzLXPktJv1UzY"
    "KdsG3ePgwOOd5nrpV+w07xHx7vTL96j6hf1iAD8DHAX5CNYLsw6QEW0UShcnGgQc4R++Ipsl"
    "eChVKzIuDzDsM8k2pjmDaZVscm9Pcix1CXfmesN9oIB9g1qGN4kUi/GOzpGrlIiXZZpCnR+f"
    "/KLZpbaok6twrk2xKrQHtuS5wbyev3vCWMU1yBLK783M0KnThtZj2UDcHd764dfktOeR6m7t"
    "S/Ao8wX14vi/+5z+eQFWBDMHEAntDMoPpxKEFWEYPhsbHfgg1SOyJo8pbCxJLyYyAzTgN706"
    "mj13QFRDMUYOSOtLyE6lUYJUX1c8Whlc9l/TYrBljWhqmHybWZ42oROj8KbNqaqsh69kskG1"
    "Hrf7uti9tcCSw2/GTMkpzAbO49HA1J3XetpX3TTgEeLu5cvoqOuF7mLxP/Qc9vn51vyz/5AC"
    "bQVKCCcLBA3hEL4TmxZ4GVUcMh8PIewkySemKoMtYDA9Mxo19zjUO7E+jkFrREhHJUoCTN9P"
    "vFKZVXZYU1swXg1g6mPHZqRpgWxebztyGHT1d9J6r32MgGmDRoYjiQCL3Y66kZeUdJdRx2PK"
    "QM0dz/rS19W02JHbbt5L4SjkBebi6b/snO958lb1M/gQ+u39ygCnA4QGYQk+DBsO+BHVFLIX"
    "jxpsHUkgJiMDJeAovSuaLncxVDQxNw456zzIP6VCgkVfSDxLGU32UNNTsFaNWWpcR18kYgFk"
    "3me7aphtdXBScy92DHjpe8Z+o4GAhF2HOooXjPSP0ZKulYuYaJtFniKg/6Pcprmplqxzr1Cy"
    "LbUKt+e6xL2hwH7DW8Y49kr5J/wE/uEBvgSbB3gKVQ0yEA8S7BXJGKYbgx5gIT0kGib3KdQs"
    "sS+OMms1SDglOwI930C8Q5lGdklTTDBPDVHqVMdXpFqBXV5gO2MYZfVo0muvboxxaXRGdyN6"
    "AHzdf7qCl4V0iFGLLo4LkOiTxZaimX+cXJ85ohak86fQqq2tirBns0S2Ibj+u9u+uMGVxHLH"
    "T8oszQnP5tLD1aDYfdta3jfhFOPx5s7pq+yI72XyQvUfJTEoDirrLcgwpTOCNl85PDwZPvZB"
    "00SwR41Kak1HUCRTAVXeWLtbmF51YVJkL2cMaelsxm+jcoB1XXg6exd99IDRg66Gi4lojEWP"
    "IpH/lNyXuZqWnXOgUKMtpgqo56vErqGxfrRbtzi6Fbzyv8/CrMWJyGbLQ84g0P3T2ta32ZTc"
    "cd9O4ivlCOfl6sLtn/B881n2NvkT+/D+zQGqBIcHZApBDR4P+xLYFbUYkhtvHkwhKSQGrnIE"
    "TA=="
)


def _pattern16() -> np.ndarray:
    ys, xs = np.mgrid[0:40, 0:90]
    return ((xs * 733 + ys * 12007) % 65536).astype(np.uint16)


def test_jdk_golden_16bit_gray():
    blob = base64.b64decode("".join(_JDK16_DEFLATE))
    d = tiff.decode_tiff(blob)
    assert (d["width"], d["height"]) == (90, 40)
    assert (d["pixels"] == (_pattern16() >> 8).astype(np.uint8)).all()


@pytest.mark.parametrize("spp", [1, 3])
@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"lzw": True},
        {"lzw": True, "predictor": 2},
        {"deflate": True, "big_endian": True},
        {"packbits": True, "rows_per_strip": 3},
    ],
)
def test_16bit_roundtrip_matrix(spp, kw):
    rng = np.random.default_rng(21)
    shape = (13, 57) if spp == 1 else (13, 57, 3)
    img = rng.integers(0, 65536, size=shape).astype(np.uint16)
    blob = tiff.encode_tiff(57, 13, img, bits=16, **kw)
    d = tiff.decode_tiff(blob)
    assert (d["pixels"] == (img >> 8).astype(np.uint8)).all()


def test_16bit_planar2_and_upscale_exactness():
    rng = np.random.default_rng(22)
    img8 = rng.integers(0, 256, size=(9, 31, 3)).astype(np.uint16)
    # v*257 upscale then >>8 downconvert must be the identity
    blob = tiff.encode_tiff(
        31, 9, img8 * 257, bits=16, planar2=True, rows_per_strip=4
    )
    assert (
        tiff.decode_tiff(blob)["pixels"] == img8.astype(np.uint8)
    ).all()


def test_16bit_minis_white_and_guards():
    img = _pattern16()
    blob = bytearray(tiff.encode_tiff(90, 40, img, bits=16))
    at = bytes(blob).find((262).to_bytes(2, "little"))
    blob[at + 8] = 0  # photometric MinIsWhite
    assert (
        tiff.decode_tiff(bytes(blob))["pixels"]
        == 255 - (img >> 8).astype(np.uint8)
    ).all()
    with pytest.raises(ValueError, match="bits"):
        tiff.encode_tiff(4, 4, np.zeros((4, 4), np.uint16), bits=12)
    with pytest.raises(ValueError, match="16-bit"):
        tiff.encode_tiff(
            4, 4, np.zeros((4, 4), np.uint16), bits=16, ccitt="g4"
        )


def test_mixed_bits_per_sample_loud():
    # hand-corrupt BitsPerSample to [8, 16, 8]: must raise, not
    # misassemble strips
    rng = np.random.default_rng(23)
    img = rng.integers(0, 65536, size=(4, 6, 3)).astype(np.uint16)
    blob = bytearray(tiff.encode_tiff(6, 4, img, bits=16))
    at = bytes(blob).find((258).to_bytes(2, "little"))
    assert at > 0
    # BITS count=3 -> value is an offset to [16,16,16]; patch one
    (off,) = __import__("struct").unpack_from("<I", bytes(blob), at + 8)
    blob[off] = 8
    blob[off + 1] = 0
    with pytest.raises(NotImplementedError, match="bits per sample"):
        tiff.decode_tiff(bytes(blob))
