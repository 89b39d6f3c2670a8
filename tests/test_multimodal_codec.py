"""Real media codec tests: PNG pixel decode (zlib inflate + all 5 row
filters) and WAV PCM decode, stdlib-only.  These pin the byte-exact
contract behind multimodal_decode_stats — the query's DuckDB oracle is
the third independent route to the same numbers.

No Spark needed for the codec laws; one Spark case covers the
mapInPandas stats kernel.
"""

import hashlib
import struct

import pytest

from hotdog_spark.operators.multimodal import (
    _PNG_CHANNELS,
    decode_image,
    decode_png,
    decode_wav,
    parse_png_header,
    parse_wav_header,
    synth_png,
    synth_wav,
)


def _pseudo_pixels(seed: str, n: int) -> bytes:
    out = hashlib.sha256(seed.encode()).digest()
    while len(out) < n:
        out += hashlib.sha256(out).digest()
    return out[:n]


@pytest.mark.parametrize("color_type", [0, 2, 4, 6])
@pytest.mark.parametrize("size", [(1, 1), (3, 2), (7, 11), (64, 48)])
def test_png_round_trip(color_type, size):
    """Encode (filter cycle 0-4 + deflate) → decode (inflate + unfilter)
    must reproduce the pixels bit-exactly for every supported color type;
    ≥5-row images exercise all five filter types."""
    w, h = size
    ch = _PNG_CHANNELS[color_type]
    px = _pseudo_pixels(f"{color_type}/{w}x{h}", w * h * ch)
    out = decode_png(synth_png(w, h, 8, color_type, pixels=px))
    assert out is not None
    assert (out["width"], out["height"], out["channels"]) == (w, h, ch)
    assert out["pixels"] == px


def test_png_golden_bytes():
    """Pinned bytes of a 2x2 RGBA PNG: layout must never drift (the
    oracle arithmetic depends on it)."""
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120, 130, 140, 150, 160])
    blob = synth_png(2, 2, 8, 6, pixels=px)
    assert blob.hex() == (
        "89504e470d0a1a0a0000000d4948445200000002000000020806000000"
        "72b60d240000001849444154789c63e01291d330b2710b608c4ac9abd0"
        "0002001d7b03ae1d7a1d630000000049454e44ae426082"
    )
    assert decode_png(blob)["pixels"] == px


def test_png_rejects_malformed():
    px = bytes(64)
    good = synth_png(4, 4, 8, 6, pixels=px)
    assert decode_png(b"") is None
    assert decode_png(b"not a png at all") is None
    assert decode_png(good[:20]) is None          # truncated mid-IHDR
    corrupted = bytearray(good)
    corrupted[-20] ^= 0xFF                         # damage IDAT payload
    assert decode_png(bytes(corrupted)) is None    # inflate/shape check
    assert decode_png(synth_png(10, 20)) is None   # header-only: no IDAT
    assert parse_png_header(synth_png(10, 20))["width"] == 10


def test_decode_image_dispatches_jpeg_and_rejects_junk():
    """decode_image now dispatches JPEG magic to the real baseline
    decoder (operators/jpeg.py); malformed JPEG still fails loudly, and
    a valid one returns pixels through the same dict contract as PNG."""
    from hotdog_spark.operators import jpeg as J

    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0JFIF")  # truncated: no DQT/SOF/SOS
    with pytest.raises(ValueError):
        decode_image(b"RIFFnope")              # neither PNG nor JPEG
    out = decode_image(J.synth_jpeg_gray(8, 8, [{(0, 0): 80}]))
    assert (out["width"], out["height"], out["channels"]) == (8, 8, 1)
    assert out["pixels"] == bytes([138]) * 64  # 128 + 80/8, flat block


def test_wav_round_trip_signed_and_stereo():
    samples = [0, 1, -1, 32767, -32768, 1234, -4321, 100]
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    out = decode_wav(synth_wav(pcm, 22050, channels=2, bits=16))
    assert out == {
        "sample_rate": 22050,
        "channels": 2,
        "bits_per_sample": 16,
        "samples": samples,
    }


def test_wav_golden_matches_stdlib_wave(tmp_path):
    """Cross-check against Python's independent `wave` reader: same
    channel count, rate, width and frame bytes."""
    import wave

    samples = [0, -1, 32767, -32768]
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    blob = synth_wav(pcm, 8000, 1, 16)
    p = tmp_path / "g.wav"
    p.write_bytes(blob)
    with wave.open(str(p)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (1, 8000, 2)
        assert w.readframes(4) == pcm
    assert decode_wav(blob)["samples"] == samples


def test_wav_8bit_and_rejects():
    out = decode_wav(synth_wav(bytes([0, 128, 255]), 8000, 1, bits=8))
    assert out["samples"] == [0, 128, 255]  # 8-bit WAV is unsigned
    assert decode_wav(b"RIFFxxxx") is None
    assert decode_wav(b"") is None
    assert parse_wav_header(synth_wav(b"\0\0", 44100, 1, 16))["sample_rate"] == 44100


def test_decode_stats_kernel(spark):
    """The Spark-side per-channel stats over real decoded media: a 2-row
    frame (one WAV, one PNG) through the mapInPandas kernel."""
    from hotdog_spark.operators.multimodal import decode_stats, synth_decodable_media

    df = spark.createDataFrame([(2, 30), (3, 10)], "doc_id long, n_chars long")
    media = synth_decodable_media(df, "doc_id", "n_chars")
    rows = {(r.media_id, r.channel): r for r in decode_stats(media).collect()}
    # even id 2 → WAV: n = 30 % 512 + 16 = 46 samples, s_i = ((26+7i)%4096)-2048
    wav = rows[(2, 0)]
    expected = [((2 * 13 + 7 * i) % 4096) - 2048 for i in range(46)]
    assert wav.kind == "wav"
    assert wav.n_values == 46
    assert wav.sum_val == sum(expected)
    assert wav.min_val == min(expected) and wav.max_val == max(expected)
    # odd id 3 → PNG 11x11 RGBA, pixel(x,y,c) = (93 + 7c + x) % 256
    for c in range(4):
        png = rows[(3, c)]
        vals = [(3 * 31 + 7 * c + x) % 256 for x in range(11)] * 11
        assert png.kind == "png"
        assert png.n_values == 121
        assert png.sum_val == sum(vals)
        assert png.min_val == min(vals) and png.max_val == max(vals)


def test_extract_features_real_decode(spark):
    """extract_features must now emit DECODED per-channel means for real
    media (not byte stats): a constant-valued PNG's features are exactly
    value/255 in every slot."""
    from hotdog_spark.operators.multimodal import extract_features

    blob = synth_png(4, 3, 8, 6, pixels=bytes([100]) * 48)
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, content binary")
    feats = extract_features(df, dim=8).collect()[0]
    assert feats.feat_dim == 8
    assert all(abs(f - 100.0 / 255.0) < 1e-6 for f in feats.features)


def test_audio_chunks_pcm_sample_aligned(spark):
    """Sample-aligned PCM chunking: a stereo 16-bit WAV with 7 frames and
    chunk_frames=3 must split 3+3+1 ON FRAME BOUNDARIES (never mid-frame,
    never splitting a 16-bit sample), with exact integer stats per chunk;
    an undecodable payload yields no rows (divert, not fatal)."""
    import struct

    from hotdog_spark.operators.multimodal import audio_chunks_pcm, synth_wav

    # stereo frames: frame i = (L=10i, R=-10i)  → 14 interleaved samples
    samples = []
    for i in range(7):
        samples += [10 * i, -10 * i]
    pcm = b"".join(struct.pack("<h", v) for v in samples)
    wav = synth_wav(pcm, sample_rate=8000, channels=2, bits=16)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not a wav at all"))],
        "media_id long, content binary",
    )
    rows = {r.chunk_idx: r for r in audio_chunks_pcm(df, chunk_frames=3).collect()}
    assert set(rows) == {0, 1, 2}  # id 2 diverted: no rows
    assert [rows[i].n_frames for i in range(3)] == [3, 3, 1]
    # chunk 0: frames 0-2 → samples [0,0,10,-10,20,-20]
    assert rows[0].sum_val == 0
    assert rows[0].min_val == -20 and rows[0].max_val == 20
    assert rows[0].peak_abs == 20
    assert rows[0].sum_sq == 2 * (0 + 100 + 400)
    # chunk 2: frame 6 only → [60,-60]
    assert rows[2].sum_val == 0 and rows[2].peak_abs == 60
    assert rows[2].sum_sq == 2 * 3600
    assert all(r.media_id == 1 for r in rows.values())


def _reference_ahash(pixels: bytes, w: int, h: int, ch: int, grid: int = 8):
    """Independent pure-Python aHash: nested loops, no numpy — pins the
    vectorized kernel's binning and bit packing."""
    cell_sum = [[0] * grid for _ in range(grid)]
    cell_n = [[0] * grid for _ in range(grid)]
    total = 0
    for y in range(h):
        for x in range(w):
            base = (y * w + x) * ch
            if ch >= 3:
                g = pixels[base] + pixels[base + 1] + pixels[base + 2]
            else:
                g = pixels[base] * 3
            i, j = (grid * y) // h, (grid * x) // w
            cell_sum[i][j] += g
            cell_n[i][j] += 1
            total += g
    lo = hi = 0
    for i in range(grid):
        for j in range(grid):
            if cell_sum[i][j] * (w * h) > total * cell_n[i][j]:
                k = i * grid + j
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
    return hi, lo


def test_image_ahash_matches_reference(spark):
    """The Spark aHash kernel (decode → numpy binning → bit pack) must
    equal the loop-reference hash on images that exercise uneven grid
    cells (w, h not multiples of 8) and sub-grid sizes (w < 8)."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import image_ahash

    cases = [(13, 9, "a"), (64, 48, "b"), (5, 3, "c"), (8, 8, "d"), (1, 1, "e")]
    rows = []
    expected = {}
    for n, (w, h, seed) in enumerate(cases):
        pix = _pseudo_pixels(seed, w * h * 4)
        rows.append((n, synth_png(w, h, 8, 6, pixels=pix)))
        expected[n] = _reference_ahash(pix, w, h, 4)
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "content"])
    )
    got = {
        r["media_id"]: (r["ahash_hi"], r["ahash_lo"])
        for r in image_ahash(df).collect()
    }
    assert got == expected


def test_image_ahash_dedup_groups(spark):
    """Identical pixel content under different encodings (filter cycles
    differ with height) must collide; the canonical is the min id and
    every other member is flagged."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import image_ahash_dedup

    pix = _pseudo_pixels("dup", 16 * 8 * 4)
    # Same image twice (ids 7, 3) + one distinct image (id 5).
    rows = [
        (7, synth_png(16, 8, 8, 6, pixels=pix)),
        (3, synth_png(16, 8, 8, 6, pixels=pix)),
        (5, synth_png(16, 8, 8, 6, pixels=_pseudo_pixels("other", 16 * 8 * 4))),
        (9, b"not a png"),  # diverted, no row
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "content"])
    )
    out = {r["media_id"]: r.asDict() for r in image_ahash_dedup(df).collect()}
    assert set(out) == {3, 5, 7}
    assert out[3]["group_n"] == 2 and out[7]["group_n"] == 2
    assert out[3]["canonical_id"] == 3 and out[7]["canonical_id"] == 3
    assert out[3]["is_dup"] == 0 and out[7]["is_dup"] == 1
    assert out[5]["group_n"] == 1 and out[5]["is_dup"] == 0


def test_group_dedup_skew_safe_identical_and_windowless(spark):
    """The skew_safe group attach (r11 VERDICT item 5) must produce
    bit-identical rows to the windowed default on a degenerate corpus
    (one collision key shared by 30% of rows) AND keep the degenerate
    group out of any single-task window: its executed plan has no
    Window node — group stats come from a partially-aggregated keyed
    aggregate and attach via a join."""
    from hotdog_spark.operators import release_tracked_persists
    from hotdog_spark.operators.multimodal import _group_dedup

    n = 1000
    # ids 0..299 share hash (1, 2); the rest are unique
    rows = [
        (i, 1, 2) if i < 300 else (i, 100 + i, 200 + i) for i in range(n)
    ]
    hashes = spark.createDataFrame(
        rows, "media_id long, ahash_hi long, ahash_lo long"
    )
    keys = ["ahash_hi", "ahash_lo"]
    base = sorted(map(tuple, _group_dedup(hashes, keys).collect()))
    safe_df = _group_dedup(hashes, keys, skew_safe=True)
    safe = sorted(map(tuple, safe_df.collect()))
    plan = safe_df._jdf.queryExecution().executedPlan().toString()
    release_tracked_persists()
    assert safe == base
    assert len(base) == n
    assert "Window" not in plan
    assert "HashAggregate" in plan


# ---- baseline JPEG (operators/jpeg.py) ----


def test_jpeg_roundtrip_exact_subspace_golden():
    """Encode one block with known {F00,F40,F04,F44} and check every
    decoded pixel against the closed form 128 + (F00 ± F40 ± F04 ±
    F44)/8 with the u=4 sign pattern [+,-,-,+,+,-,-,+] along rows for
    F40 and columns for F04 — one wrong Huffman bit, zigzag slot or
    IDCT scale breaks this."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J

    coefs = {(0, 0): 80, (4, 0): 16, (0, 4): -24, (4, 4): 8}
    img = J.decode_jpeg_gray(J.synth_jpeg_gray(8, 8, [coefs]))
    sx = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    want = 128 + (80 + 16 * sx[:, None] - 24 * sx[None, :]
                  + 8 * sx[:, None] * sx[None, :]) / 8
    assert np.array_equal(img, want.astype(np.uint8))


def test_jpeg_dc_prediction_across_blocks():
    """DC coefficients are coded as differences from the previous
    block (T.81 F.1.1.5.1): three blocks with DCs 80, -96, 0 decode to
    flat values 138, 116, 128 — wrong prediction shifts blocks 2+."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J

    blocks = [{(0, 0): 80}, {(0, 0): -96}, {(0, 0): 0}]
    img = J.decode_jpeg_gray(J.synth_jpeg_gray(24, 8, blocks))
    assert img.shape == (8, 24)
    assert np.all(img[:, :8] == 138)
    assert np.all(img[:, 8:16] == 116)
    assert np.all(img[:, 16:] == 128)


def test_jpeg_rejects_unsupported_and_non_jpeg():
    """Non-JPEG bytes → None (divert path); unsupported frame types
    (lossless SOF3, arithmetic-coded SOF10) raise loudly; and the
    baseline/progressive DISPATCH is pinned — a stream whose marker
    says SOF2 but whose single scan is baseline-shaped (Ss=0, Se=63)
    is an invalid progressive stream, not silently decoded as
    sequential."""
    import pytest

    from hotdog_spark.operators import jpeg as J

    assert J.decode_jpeg_gray(b"not a jpeg") is None
    data = J.synth_jpeg_gray(8, 8, [{(0, 0): 8}])
    for bad_sof in (b"\xff\xc3", b"\xff\xca"):
        with pytest.raises(ValueError, match="SOF0.*SOF2|SOF2"):
            J.decode_jpeg_gray(data.replace(b"\xff\xc0", bad_sof, 1))
    with pytest.raises(ValueError, match="progressive"):
        J.decode_jpeg_gray(data.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # and the reverse flip: progressive scans under an SOF0 marker are
    # rejected (a DC-only band is not a legal baseline scan)
    prog = J.synth_jpeg_gray_progressive(8, 8, [{(0, 0): 8}])
    with pytest.raises(ValueError):
        J.decode_jpeg_gray(prog.replace(b"\xff\xc2", b"\xff\xc0", 1))


def test_jpeg_byte_stuffing_roundtrip():
    """Entropy bytes equal to 0xFF must be stuffed (FF 00) by the
    writer and unstuffed by the reader.  Coefficients 8184 put ten
    consecutive 1-bits (magnitude of code 1023) in the stream twice,
    which is enough to land an aligned 0xFF — verified present — and
    the decode must still match the closed form (clamped here: 128 ±
    1023 saturates both ends)."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J

    fmap = {(4, 0): 8184, (4, 4): 8184}
    data = J.synth_jpeg_gray(8, 8, [fmap])
    entropy = data[data.find(b"\xff\xda") + 2 : -2]
    assert b"\xff\x00" in entropy, "fixture no longer exercises stuffing"
    img = J.decode_jpeg_gray(data)
    sx = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    want = np.clip(
        128 + (8184 * sx[:, None] + 8184 * sx[:, None] * sx[None, :]) / 8,
        0, 255,
    )
    assert np.array_equal(img, want.astype(np.uint8))


def test_jpeg_exact_subspace_stats_sweep():
    """Many ids through the full synth→decode path: per-image integer
    stats must equal the closed form the DuckDB oracle computes."""
    from hotdog_spark.operators import jpeg as J

    for did in range(1, 60):
        w, h, data = J.synth_exact_jpeg(did)
        img = J.decode_jpeg_gray(data)
        tot, mn, mx = 0, 10 ** 9, -1
        for b in range((w // 8) * (h // 8)):
            c = J.exact_block_coefs(did, b)
            vals = [
                128 + (c[(0, 0)] + ex * c[(4, 0)] + ey * c[(0, 4)]
                       + ex * ey * c[(4, 4)]) // 8
                for ex in (1, -1) for ey in (1, -1)
            ]
            tot += 16 * sum(vals)
            mn, mx = min(mn, min(vals)), max(mx, max(vals))
        assert (int(img.sum()), int(img.min()), int(img.max())) == (tot, mn, mx)


def test_jpeg_property_random_exact_subspace_roundtrips():
    """Hypothesis: ANY multi-block image whose per-block coefficients
    live in the exact-IDCT subspace (all multiples of 8, bounded so no
    pixel clamps) decodes to exactly the closed-form pixels — the
    entropy coder, DC predictor, zigzag and IDCT have no value-dependent
    blind spots."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hotdog_spark.operators import jpeg as J

    coef = st.integers(min_value=-12, max_value=12).map(lambda v: v * 8)
    block = st.fixed_dictionaries(
        {(0, 0): st.integers(-31, 31).map(lambda v: v * 8),
         (4, 0): coef, (0, 4): coef, (4, 4): coef}
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 4), st.integers(1, 3),
        st.lists(block, min_size=12, max_size=12),
    )
    def check(bw, bh, blocks):
        blocks = blocks[: bw * bh]
        img = J.decode_jpeg_gray(J.synth_jpeg_gray(bw * 8, bh * 8, blocks))
        sx = np.array([1, -1, -1, 1, 1, -1, -1, 1])
        for b, c in enumerate(blocks):
            want = 128 + (c[(0, 0)] + c[(4, 0)] * sx[:, None]
                          + c[(0, 4)] * sx[None, :]
                          + c[(4, 4)] * sx[:, None] * sx[None, :]) / 8
            by, bx = divmod(b, bw)
            got = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert np.array_equal(got, want.astype(np.uint8)), (bw, bh, b, c)

    check()


def test_jpeg_corruption_fuzz_never_silently_wrong():
    """Deterministic corruption sweep: truncations and single-byte flips
    of a valid JPEG must either decode to the SAME pixels (flip landed
    in a don't-care byte), raise ValueError/return None, or at worst
    produce a differently-valued image — never crash with a non-Error
    exception and never hang.  Guards the segment walker and bit reader
    against malformed 100 TB-scale inputs (corrupt blobs are a
    certainty, and the divert path depends on loud failure)."""
    from hotdog_spark.operators import jpeg as J

    _, _, data = J.synth_exact_jpeg(17)
    baseline = J.decode_jpeg_gray(data)

    outcomes = {"ok_same": 0, "rejected": 0, "decoded_diff": 0}

    def probe(blob):
        try:
            out = J.decode_jpeg_gray(blob)
        except ValueError:
            outcomes["rejected"] += 1
            return
        if out is None:
            outcomes["rejected"] += 1
        elif out.shape == baseline.shape and (out == baseline).all():
            outcomes["ok_same"] += 1
        else:
            outcomes["decoded_diff"] += 1

    for cut in range(2, len(data), 7):          # truncations
        probe(data[:cut])
    for pos in range(0, len(data), 5):          # single-byte flips
        mutated = bytearray(data)
        mutated[pos] ^= 0x5A
        probe(bytes(mutated))
    # the sweep must exercise the loud-rejection path; ValueError is the
    # ONLY exception type allowed out (any other type fails the test)
    assert outcomes["rejected"] > 0
    assert sum(outcomes.values()) > 50


# ---- progressive (SOF2) JPEG (VERDICT r8 item 4) ----


def test_jpeg_duplicate_scan_component_rejected_both_modes():
    """A scan header listing the same component id twice would collapse
    the per-component LUT dict and decode with a wrong MCU block order;
    the uniqueness guard must fire for BASELINE and for PROGRESSIVE DC
    scans alike (r10 ADVICE: it was baseline-only)."""
    import pytest

    from hotdog_spark.operators import jpeg as J

    def coefs(_comp, _b):
        return {(0, 0): 8}

    for synth in (J.synth_jpeg_color, J.synth_jpeg_color_progressive):
        data = synth(16, 16, coefs)
        i = data.find(b"\xff\xda")
        assert i > 0 and data[i + 4] == 3, "fixture: 3-component scan"
        # body[1]=cid1, body[3]=cid2 → raw offsets i+5 / i+7: dup cid1
        assert data[i + 7] == 2
        bad = data[: i + 7] + b"\x01" + data[i + 8 :]
        with pytest.raises(ValueError, match="duplicate component id"):
            J.decode_jpeg(bad)


def test_jpeg_progressive_gray_equals_baseline():
    """The six-scan progressive encoding (DC first Al=1, AC bands 1-5 /
    6-63 Al=1, then DC + AC successive-approximation refinement) must
    reconstruct the EXACT coefficients and therefore decode to the same
    pixels as the baseline encoding of the same blocks — spectral
    selection, EOB runs, point transforms and refinement all included."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J

    blocks = [
        {(0, 0): 80, (4, 0): 16, (0, 4): -24, (4, 4): 8},
        {(0, 0): -96, (1, 0): 40, (7, 7): -16},      # odd DC: refine bit set
        {(0, 0): 0},                                 # all-EOB band: EOBRUN
        {(2, 3): 8, (5, 6): -8},                     # AC-only, sparse
        {(0, 0): 8, (0, 1): 24, (1, 1): -40},
        {(0, 0): -8},
    ]
    base = J.decode_jpeg_gray(J.synth_jpeg_gray(24, 16, blocks))
    prog = J.decode_jpeg_gray(J.synth_jpeg_gray_progressive(24, 16, blocks))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_random_equals_baseline():
    """Pseudorandom coefficient fuzz over the full progressive machinery
    (grayscale + 4:2:0 colour): every stream must decode bit-identically
    to the baseline encoding of the same coefficients.  Random runs of
    zeros exercise ZRL-in-refinement, EOB-run batching across blocks,
    and buffered correction bits."""
    import random

    import numpy as np

    from hotdog_spark.operators import jpeg as J

    rng = random.Random(2024)
    for _ in range(30):
        bw, bh = rng.randint(1, 4), rng.randint(1, 3)
        blocks = []
        for _ in range(bw * bh):
            fmap = {}
            for _ in range(rng.randint(0, 12)):
                rc = (rng.randint(0, 7), rng.randint(0, 7))
                fmap[rc] = rng.randint(-60, 60) * 8
            blocks.append(fmap)
        base = J.decode_jpeg_gray(J.synth_jpeg_gray(bw * 8, bh * 8, blocks))
        prog = J.decode_jpeg_gray(
            J.synth_jpeg_gray_progressive(bw * 8, bh * 8, blocks)
        )
        assert np.array_equal(base, prog)

    for _ in range(10):
        mx, my = rng.randint(1, 3), rng.randint(1, 2)
        cache = {}

        def coefs(comp, b):
            if (comp, b) not in cache:
                fmap = {}
                for _ in range(rng.randint(0, 10)):
                    rc = (rng.randint(0, 7), rng.randint(0, 7))
                    fmap[rc] = rng.randint(-50, 50) * 8
                cache[(comp, b)] = fmap
            return cache[(comp, b)]

        base = J.decode_jpeg(J.synth_jpeg_color(mx * 16, my * 16, coefs))
        prog = J.decode_jpeg(
            J.synth_jpeg_color_progressive(mx * 16, my * 16, coefs)
        )
        assert all(np.array_equal(a, b) for a, b in zip(base, prog))


def test_jpeg_progressive_exact_subspace_stats_sweep():
    """The progressive colour fixture family decodes to the closed form
    the DuckDB oracle computes — per (doc, component, block), pixels are
    128 + (F00 ± F40 ± F04 ± F44)/8 with g = doc*11 + b*17 + comp*23."""
    from hotdog_spark.operators import jpeg as J

    for did in range(1, 40):
        w, h, data = J.synth_exact_prog_jpeg(did)
        planes = J.decode_jpeg(data)
        for comp, plane in enumerate(planes):
            bw = plane.shape[1] // 8
            bh = plane.shape[0] // 8
            tot, mn, mx = 0, 10 ** 9, -1
            for b in range(bw * bh):
                c = J.exact_prog_block_coefs(did, comp, b)
                vals = [
                    128 + (c[(0, 0)] + ex * c[(4, 0)] + ey * c[(0, 4)]
                           + ex * ey * c[(4, 4)]) // 8
                    for ex in (1, -1) for ey in (1, -1)
                ]
                tot += 16 * sum(vals)
                mn, mx = min(mn, min(vals)), max(mx, max(vals))
            got = (int(plane.sum()), int(plane.min()), int(plane.max()))
            assert got == (tot, mn, mx), (did, comp)


def test_jpeg_progressive_corruption_fuzz():
    """The corruption sweep extended to the multi-scan SOF2 path:
    truncations and byte flips of a progressive stream must reject with
    ValueError, decode identically, or decode different values — never
    escape with another exception type (the divert contract)."""
    from hotdog_spark.operators import jpeg as J

    _, _, data = J.synth_exact_prog_jpeg(23)
    baseline = J.decode_jpeg(data)

    outcomes = {"ok_same": 0, "rejected": 0, "decoded_diff": 0}

    def probe(blob):
        try:
            out = J.decode_jpeg(blob)
        except ValueError:
            outcomes["rejected"] += 1
            return
        if out is None:
            outcomes["rejected"] += 1
        elif all(
            a.shape == b.shape and (a == b).all()
            for a, b in zip(baseline, out)
        ) and len(out) == len(baseline):
            outcomes["ok_same"] += 1
        else:
            outcomes["decoded_diff"] += 1

    for cut in range(2, len(data), 11):
        probe(data[:cut])
    for pos in range(0, len(data), 7):
        mutated = bytearray(data)
        mutated[pos] ^= 0x5A
        probe(bytes(mutated))
    assert outcomes["rejected"] > 0
    assert sum(outcomes.values()) > 50


# ---- 3-component 4:2:0 colour JPEG (VERDICT r7 item 4) ----


def test_jpeg_color_roundtrip_exact_subspace():
    """Every plane of the 4:2:0 colour fixture must decode to the
    closed-form pixels: Y at full resolution, Cb/Cr at half, each block
    carrying its own component-keyed coefficients through the MCU
    interleave and per-component DC predictors."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J

    for did in (0, 1, 2, 3, 5, 11, 17):
        w, h, data = J.synth_exact_color_jpeg(did)
        planes = J.decode_jpeg(data)
        assert len(planes) == 3
        assert planes[0].shape == (h, w)
        assert planes[1].shape == planes[2].shape == (h // 2, w // 2)
        for comp, plane in enumerate(planes):
            bw = plane.shape[1] // 8
            for b in range(bw * (plane.shape[0] // 8)):
                coefs = J.exact_color_block_coefs(did, comp, b)
                f00, f40 = coefs[(0, 0)], coefs[(4, 0)]
                f04, f44 = coefs[(0, 4)], coefs[(4, 4)]
                sgn = np.array([1, -1, -1, 1, 1, -1, -1, 1])
                # pixel(y,x) = 128 + (f00 + s(y)f40 + s(x)f04 + s(y)s(x)f44)/8
                # — F(4,0) is the VERTICAL u=4 basis (varies along y),
                # F(0,4) the horizontal one.
                want = (
                    128
                    + (
                        f00
                        + sgn[:, None] * f40
                        + sgn[None, :] * f04
                        + (sgn[:, None] * sgn[None, :]) * f44
                    )
                    // 8
                ).astype(np.uint8)
                by, bx = divmod(b, bw)
                got = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert np.array_equal(got, want), (did, comp, b)


def test_jpeg_color_per_component_dc_predictors_are_independent():
    """T.81 F.1.1.5.1: each scan component carries its OWN DC predictor.
    A frame whose Y DC ramps while chroma stays constant decodes wrongly
    if the predictors are shared (the chroma would inherit Y's last DC)."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J

    def coefs(comp, b):
        if comp == 0:
            return {(0, 0): 8 * 8 * (b + 1)}  # ramping luma DC
        return {(0, 0): -64 if comp == 1 else 64}  # flat chroma

    data = J.synth_jpeg_color(32, 16, coefs)
    y, cb, cr = J.decode_jpeg(data)
    # Y blocks: value 128 + 8(b+1)
    for b in range(8):
        by, bx = divmod(b, 4)
        assert (y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                == 128 + 8 * (b + 1)).all()
    assert (cb == 128 - 8).all()
    assert (cr == 128 + 8).all()


def test_jpeg_gray_api_rejects_color_and_color_api_decodes_gray():
    from hotdog_spark.operators import jpeg as J

    import pytest

    _, _, color = J.synth_exact_color_jpeg(3)
    with pytest.raises(ValueError, match="single-component"):
        J.decode_jpeg_gray(color)
    # the general API handles grayscale as a 1-plane frame
    _, _, gray = J.synth_exact_jpeg(4)
    planes = J.decode_jpeg(gray)
    assert len(planes) == 1
    import numpy as np

    assert np.array_equal(planes[0], J.decode_jpeg_gray(gray))


def test_jpeg_color_corruption_fuzz_never_silently_wrong():
    """Same single-exception contract as grayscale, over the colour
    stream: truncations and byte flips → same pixels, ValueError/None,
    or differently-valued planes — never a stray exception type."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J

    _, _, data = J.synth_exact_color_jpeg(17)
    baseline = J.decode_jpeg(data)

    def probe(blob):
        try:
            out = J.decode_jpeg(blob)
        except ValueError:
            return
        if out is None or len(out) != 3:
            return
        for a, b in zip(out, baseline):
            if a.shape != b.shape or not (a == b).all():
                return

    for cut in range(2, len(data), 7):
        probe(data[:cut])
    for i in range(0, len(data), 3):
        for flip in (0x01, 0x80, 0xFF):
            blob = bytearray(data)
            blob[i] ^= flip
            probe(bytes(blob))


def test_jpeg_color_missing_eoi_rejected():
    """ADVICE r7: a stream truncated exactly at the EOI marker must be
    rejected, not decoded from a silently-shortened entropy slice."""
    import pytest

    from hotdog_spark.operators import jpeg as J

    _, _, data = J.synth_exact_color_jpeg(5)
    assert data.endswith(b"\xff\xd9")
    with pytest.raises(ValueError, match="EOI"):
        J.decode_jpeg(data[:-2])
    _, _, gray = J.synth_exact_jpeg(5)
    with pytest.raises(ValueError, match="EOI"):
        J.decode_jpeg_gray(gray[:-2])


def test_jpeg_color_duplicate_scan_component_ids_rejected():
    """ADVICE r9: a malformed SOS listing the same component id three
    times (e.g. [1,1,1] for a 3-component frame) passes a count-only
    check, collapses the per-component LUT dict, and would decode with
    a wrong MCU block order — it must fail loudly instead."""
    import pytest

    from hotdog_spark.operators import jpeg as J

    _, _, data = J.synth_exact_color_jpeg(7)
    sos = data.find(b"\xff\xda")
    assert sos >= 0
    ns = data[sos + 4]
    assert ns == 3
    patched = bytearray(data)
    cid0 = data[sos + 5]
    # rewrite all three scan component ids to the first one; keep each
    # entry's huffman-table selector byte untouched
    for i in range(ns):
        patched[sos + 5 + 2 * i] = cid0
    with pytest.raises(ValueError, match="duplicate component id"):
        J.decode_jpeg(bytes(patched))
    # the pristine stream still decodes
    assert J.decode_jpeg(data) is not None


def test_decode_image_color_jpeg_interleaved_ycbcr():
    """decode_image dispatches colour JPEG: chroma upsampled by exact
    replication, interleaved YCbCr, channels=3 — and grayscale JPEG
    stays channels=1."""
    import numpy as np

    from hotdog_spark.operators import jpeg as J
    from hotdog_spark.operators.multimodal import decode_image

    _, _, data = J.synth_exact_color_jpeg(7)
    out = decode_image(data)
    y, cb, cr = J.decode_jpeg(data)
    assert (out["width"], out["height"], out["channels"]) == (
        y.shape[1], y.shape[0], 3,
    )
    px = np.frombuffer(out["pixels"], dtype=np.uint8).reshape(
        out["height"], out["width"], 3
    )
    assert np.array_equal(px[:, :, 0], y)
    # replication: every full-res chroma sample equals its 2x2 source
    assert np.array_equal(px[::2, ::2, 1], cb)
    assert np.array_equal(px[1::2, 1::2, 1], cb)
    assert np.array_equal(px[::2, ::2, 2], cr)


def _reference_dhash(pixels: bytes, w: int, h: int, ch: int, grid: int = 8):
    """Independent pure-Python dHash: nested loops over a (grid+1)-column
    grid, cross-multiplied neighbor comparison — pins the vectorized
    kernel's binning, comparison rule and bit packing."""
    cols = grid + 1
    cell_sum = [[0] * cols for _ in range(grid)]
    cell_n = [[0] * cols for _ in range(grid)]
    for y in range(h):
        for x in range(w):
            base = (y * w + x) * ch
            if ch >= 3:
                g = pixels[base] + pixels[base + 1] + pixels[base + 2]
            else:
                g = pixels[base] * 3
            i, j = (grid * y) // h, (cols * x) // w
            cell_sum[i][j] += g
            cell_n[i][j] += 1
    lo = hi = 0
    for i in range(grid):
        for j in range(grid):
            if (cell_sum[i][j + 1] * cell_n[i][j]
                    > cell_sum[i][j] * cell_n[i][j + 1]):
                k = i * grid + j
                if k < 32:
                    lo |= 1 << k
                else:
                    hi |= 1 << (k - 32)
    return hi, lo


def test_image_dhash_matches_reference(spark):
    """The Spark dHash kernel must equal the loop-reference hash on
    uneven grids, sub-grid widths (w < 9 leaves empty columns -> bit 0)
    and the 1x1 degenerate."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import image_dhash

    cases = [(13, 9, "a"), (64, 48, "b"), (5, 3, "c"), (9, 8, "d"), (1, 1, "e")]
    rows = []
    expected = {}
    for n, (w, h, seed) in enumerate(cases):
        pix = _pseudo_pixels(seed, w * h * 4)
        rows.append((n, synth_png(w, h, 8, 6, pixels=pix)))
        expected[n] = _reference_dhash(pix, w, h, 4)
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "content"])
    )
    got = {
        r["media_id"]: (r["dhash_hi"], r["dhash_lo"])
        for r in image_dhash(df).collect()
    }
    assert got == expected


def test_image_dhash_locality_vs_ahash_global_mean(spark):
    """The motivating property, stated honestly: aHash bits are GLOBAL-
    mean-relative, so one bright localized patch (a watermark) moves the
    mean and flips cells FAR from the edit; dHash bits are local
    gradients, so only comparisons touching the patch move.  (A uniform
    brightness shift is a weaker claim — it leaves BOTH hashes unchanged
    because the mean shifts with every cell.)  Fixture: 100/104
    alternating column bands + one 255 patch in the top-left cell;
    measured flips: 34 aHash bits vs 2 dHash bits."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import image_ahash, image_dhash

    w, h = 32, 16
    base = bytearray()
    for y in range(h):
        for x in range(w):
            v = 100 + (4 if (x // 4) % 2 else 0)
            base += bytes((v, v, v, 255))
    edited = bytearray(base)
    for y in range(4):
        for x in range(4):
            p = (y * w + x) * 4
            edited[p:p + 3] = b"\xff\xff\xff"
    df = spark.createDataFrame(pd.DataFrame(
        [(0, synth_png(w, h, 8, 6, pixels=bytes(base))),
         (1, synth_png(w, h, 8, 6, pixels=bytes(edited)))],
        columns=["media_id", "content"],
    ))
    d = {r["media_id"]: (r["dhash_hi"] << 32) | r["dhash_lo"]
         for r in image_dhash(df).collect()}
    a = {r["media_id"]: (r["ahash_hi"] << 32) | r["ahash_lo"]
         for r in image_ahash(df).collect()}
    d_flips = bin(d[0] ^ d[1]).count("1")
    a_flips = bin(a[0] ^ a[1]).count("1")
    assert d_flips == 2 and a_flips == 34
    assert d_flips < a_flips


def test_image_dhash_dedup_groups(spark):
    """Identical content collides on dhash; canonical = min id; corrupt
    blobs diverted."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import image_dhash_dedup

    pix = _pseudo_pixels("dup", 16 * 8 * 4)
    rows = [
        (7, synth_png(16, 8, 8, 6, pixels=pix)),
        (3, synth_png(16, 8, 8, 6, pixels=pix)),
        (5, synth_png(16, 8, 8, 6, pixels=_pseudo_pixels("other", 16 * 8 * 4))),
        (9, b"not a png"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "content"])
    )
    out = {r["media_id"]: r.asDict() for r in image_dhash_dedup(df).collect()}
    assert set(out) == {3, 5, 7}
    assert out[3]["group_n"] == 2 and out[7]["is_dup"] == 1
    assert out[3]["canonical_id"] == 3 and out[3]["is_dup"] == 0


def _reference_audio_fp(samples, frame=16):
    """Independent pure-Python energy-contour fingerprint."""
    nf = len(samples) // frame
    e = [sum(s * s for s in samples[f * frame:(f + 1) * frame])
         for f in range(nf)]
    lo = hi = 0
    for f in range(min(64, nf - 1)):
        if e[f + 1] > e[f]:
            if f < 32:
                lo |= 1 << f
            else:
                hi |= 1 << (f - 32)
    return nf, hi, lo


def test_audio_energy_fingerprint_matches_reference(spark):
    """The Spark kernel must equal the loop reference on streams that
    exercise the frame remainder drop, the 64-bit cap boundary, and a
    sub-frame stream (diverted: no output row)."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import audio_energy_fingerprint

    cases = {
        1: [((i * 37) % 4096) - 2048 for i in range(100)],   # remainder 4
        2: [((i * 7) % 100) - 50 for i in range(16 * 70)],   # 69 bits > cap
        3: [5, -5, 7],                                        # < one frame
    }
    rows = []
    for mid, s in cases.items():
        pcm = b"".join(struct.pack("<h", v) for v in s)
        rows.append((mid, synth_wav(pcm, 16000, 1, 16)))
    rows.append((4, b"not audio"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "content"])
    )
    got = {
        r["media_id"]: (r["n_frames"], r["afp_hi"], r["afp_lo"])
        for r in audio_energy_fingerprint(df).collect()
    }
    assert set(got) == {1, 2}  # id 3 has zero full frames, id 4 diverts
    assert got[1] == _reference_audio_fp(cases[1])
    assert got[2] == _reference_audio_fp(cases[2])


def test_audio_fp_dedup_gain_invariant_contour(spark):
    """The motivating property: a uniformly SCALED copy (half gain)
    keeps every energy comparison's sign, so it lands in the same
    fingerprint group as the original; a stream with a different
    contour does not."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import audio_fp_dedup

    base = [((i * 53) % 3000) - 1500 for i in range(160)]
    half = [v // 2 for v in base]          # monotone scale: signs survive
    other = list(reversed(base))
    rows = []
    for mid, s in ((10, base), (11, half), (12, other)):
        pcm = b"".join(struct.pack("<h", v) for v in s)
        rows.append((mid, synth_wav(pcm, 16000, 1, 16)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "content"])
    )
    out = {r["media_id"]: r.asDict() for r in audio_fp_dedup(df).collect()}
    assert out[10]["group_n"] == 2 and out[11]["group_n"] == 2
    assert out[11]["canonical_id"] == 10 and out[11]["is_dup"] == 1
    assert out[12]["group_n"] == 1


def test_video_signature_dedup_groups_and_divert(spark):
    """Videos with identical frame sequences collide; different fill
    order does not; a truncated AVI diverts (no row)."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import (
        synth_avi,
        video_signature_dedup,
    )

    w, h = 4, 3
    f = lambda b: bytes([b]) * (w * h * 3)
    same = [f(10), f(20), f(30)]
    rows = [
        (7, synth_avi(same, w, h)),
        (3, synth_avi(same, w, h)),
        (5, synth_avi([f(30), f(20), f(10)], w, h)),  # same sums, diff order
        (9, synth_avi(same, w, h)[:40]),               # truncated: divert
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "content"])
    )
    out = {r["media_id"]: r.asDict() for r in video_signature_dedup(df).collect()}
    assert set(out) == {3, 5, 7}
    assert out[3]["group_n"] == 2 and out[7]["is_dup"] == 1
    assert out[3]["canonical_id"] == 3
    assert out[5]["group_n"] == 1  # ORDER matters in the signature


def test_video_frame_bytes_is_max_over_variable_size_stream(spark):
    """frame_bytes is the MAX payload size across the stream — pinned on
    a variable-frame-size AVI so the column is order-independent and
    well-defined beyond the constant-size synthetic fixtures (where max
    == the common size)."""
    import pandas as pd

    from hotdog_spark.operators.multimodal import (
        synth_avi,
        video_frame_signature,
    )

    frames = [b"\x01" * 10, b"\x02" * 50, b"\x03" * 30]
    df = spark.createDataFrame(
        pd.DataFrame([(1, synth_avi(frames, 4, 3))],
                     columns=["media_id", "content"])
    )
    [row] = video_frame_signature(df).collect()
    assert row.n_frames == 3
    assert row.frame_bytes == 50  # max, not last (30) nor first (10)
    assert row.frame_sums == [10, 100, 90]
