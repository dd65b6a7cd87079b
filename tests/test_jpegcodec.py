"""Baseline JPEG codec (T.81): decode correctness, encoder round-trips,
and the DCTDecode OCR path through real PDF structures."""

import numpy as np
import pytest

from pdf_ocr_engine_spark.core.jpegcodec import (
    JpegError,
    JpegUnsupported,
    decode_jpeg_gray,
    encode_jpeg_gray,
    encode_jpeg_rgb,
)


def _err(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


class TestGrayRoundTrip:
    def test_constant_block_exact(self):
        src = np.full((8, 8), 77, dtype=np.uint8)
        assert _err(decode_jpeg_gray(encode_jpeg_gray(src, 100)), src) == 0

    def test_q100_near_lossless(self):
        rng = np.random.default_rng(5)
        src = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(src, quality=100))
        assert out.shape == src.shape
        assert _err(out, src) <= 2  # FDCT/IDCT float rounding only

    def test_binary_page_stays_inside_ocr_margin(self):
        # the OCR tier thresholds at 128; a 0/255 page at q100 must keep
        # every pixel on its own side by a wide margin
        page = np.full((61, 83), 255, dtype=np.uint8)
        page[10:17, 10:15] = 0
        page[30:37, 20:50] = 0
        out = decode_jpeg_gray(encode_jpeg_gray(page, quality=100))
        assert _err(out, page) <= 2

    def test_odd_dimensions_crop(self):
        src = (np.arange(13 * 17, dtype=np.int64).reshape(13, 17)
               % 256).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(src, quality=100))
        assert out.shape == (13, 17)
        assert _err(out, src) <= 2

    def test_lower_quality_still_close_on_smooth_content(self):
        src = np.add.outer(np.arange(32) * 3,
                           np.arange(48)).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(src, quality=75))
        assert _err(out, src) <= 12

    def test_restart_interval_roundtrip(self):
        rng = np.random.default_rng(9)
        src = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
        out = decode_jpeg_gray(
            encode_jpeg_gray(src, quality=100, restart_interval=2))
        assert _err(out, src) <= 2

    def test_byte_stuffing_survives(self):
        # all-255 content maximizes 0xFF-heavy entropy bytes
        src = np.full((16, 16), 255, dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(src, quality=100))
        assert _err(out, src) <= 1


class TestColorScan:
    def _luma(self, rgb: np.ndarray) -> np.ndarray:
        r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
        return np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b),
                       0, 255)

    @pytest.mark.parametrize("subsample", [True, False])
    def test_rgb_interleaved_mcu_decode(self, subsample):
        rng = np.random.default_rng(13)
        # smooth-ish content so chroma loss does not touch luma checks
        base = np.add.outer(np.arange(24) * 5, np.arange(40) * 3) % 256
        rgb = np.stack([base, (base + 60) % 256, (base + 120) % 256],
                       axis=2).astype(np.uint8)
        out = decode_jpeg_gray(
            encode_jpeg_rgb(rgb, quality=97, subsample=subsample))
        assert out.shape == (24, 40)
        # the %256 wrap makes sawtooth edges; q97 ringing costs a few
        # levels there — bounded, not structural
        assert _err(out, self._luma(rgb).astype(np.uint8)) <= 6

    def test_420_odd_dims(self):
        rgb = np.full((11, 13, 3), 200, dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_rgb(rgb, quality=95))
        assert out.shape == (11, 13)
        assert _err(out, np.full((11, 13), 200, dtype=np.uint8)) <= 2


class TestRejections:
    def test_not_jpeg(self):
        with pytest.raises(JpegError):
            decode_jpeg_gray(b"\x89PNG\r\n\x1a\n")

    def test_lossless_unsupported(self):
        # SOF3 header: the unsupported-process signal PIL would take over
        # (SOF2 progressive decodes for real now)
        data = (b"\xFF\xD8\xFF\xC3\x00\x0B\x08\x00\x08\x00\x08\x01"
                b"\x01\x11\x00")
        with pytest.raises(JpegUnsupported):
            decode_jpeg_gray(data)

    def test_progressive_with_no_scan_is_error(self):
        data = (b"\xFF\xD8\xFF\xC2\x00\x0B\x08\x00\x08\x00\x08\x01"
                b"\x01\x11\x00\xFF\xD9")
        with pytest.raises(JpegError):
            decode_jpeg_gray(data)

    def test_truncated_entropy_data(self):
        src = np.arange(64, dtype=np.uint8).reshape(8, 8)
        full = encode_jpeg_gray(src, quality=100)
        with pytest.raises(JpegError):
            decode_jpeg_gray(full[:len(full) // 2])

    def test_eoi_mid_scan_is_error_not_zeros(self):
        src = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
        full = bytearray(encode_jpeg_gray(src, quality=100))
        # truncate entropy data but keep a valid EOI — must still raise
        cut = bytes(full[:len(full) - 20]) + b"\xFF\xD9"
        with pytest.raises(JpegError):
            decode_jpeg_gray(cut)

    def test_missing_huffman_table(self):
        src = np.zeros((8, 8), dtype=np.uint8)
        data = bytearray(encode_jpeg_gray(src, quality=100))
        # excise the DHT segments (marker 0xFFC4)
        out = bytearray()
        i = 0
        while i < len(data):
            if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0xC4:
                seg_len = int.from_bytes(data[i + 2:i + 4], "big")
                i += 2 + seg_len
                continue
            out.append(data[i])
            i += 1
        with pytest.raises(JpegError, match="Huffman"):
            decode_jpeg_gray(bytes(out))


class TestPdfDctPath:
    def test_dct_scanned_pdf_extracts_identical_text(self):
        from pdf_ocr_engine_spark.core.extract_doc import extract_document
        from pdf_ocr_engine_spark.core.pdfscan import build_pixel_scanned_pdf
        from pdf_ocr_engine_spark.operators.ocr import (
            deterministic_recognizer,
        )

        pages = [{"width": 300, "height": 120,
                  "words": [("scanned", 10, 10, 52, 18),
                            ("via", 60, 10, 78, 18),
                            ("jpeg", 10, 30, 34, 38)]}]
        rec = deterministic_recognizer()
        flate = extract_document(
            build_pixel_scanned_pdf(pages, codec="flate"), "eng",
            recognizer=rec)
        jpeg = extract_document(
            build_pixel_scanned_pdf(pages, codec="jpeg"), "eng",
            recognizer=rec)
        assert flate["status"] == jpeg["status"] == "ok"
        assert jpeg["text"] == flate["text"] == "scanned via\njpeg"

    def test_decoded_image_reports_dct_filter(self):
        from pdf_ocr_engine_spark.core.pdfreal import extract_page_images
        from pdf_ocr_engine_spark.core.pdfscan import build_pixel_scanned_pdf

        pages = [{"width": 100, "height": 40,
                  "words": [("x", 10, 10, 16, 18)]}]
        out = extract_page_images(build_pixel_scanned_pdf(pages,
                                                          codec="jpeg"))
        img = out[0]["images"][0]
        assert img["filter"] == "DCTDecode"
        assert img["data"][:2] == b"\xFF\xD8"
        # flate variant is fully decoded — no pending image filter
        out = extract_page_images(build_pixel_scanned_pdf(pages,
                                                          codec="flate"))
        assert out[0]["images"][0]["filter"] is None

    def test_corrupt_jpeg_raster_is_decode_error(self):
        from pdf_ocr_engine_spark.core.extract_doc import extract_document
        from pdf_ocr_engine_spark.core.pdfscan import build_pixel_scanned_pdf
        from pdf_ocr_engine_spark.operators.ocr import (
            deterministic_recognizer,
        )

        pdf = bytearray(build_pixel_scanned_pdf(
            [{"width": 100, "height": 40,
              "words": [("ok", 10, 10, 22, 18)]}], codec="jpeg"))
        # flip bytes inside the JPEG entropy data (after SOS)
        sos = bytes(pdf).find(b"\xFF\xDA")
        assert sos > 0
        pdf[sos + 20:sos + 24] = b"\x00\x00\x00\x00"
        r = extract_document(bytes(pdf), "eng",
                             recognizer=deterministic_recognizer())
        assert r["status"] == "decode_error"

    def test_multimodal_jpeg_tier(self):
        from pdf_ocr_engine_spark.operators.multimodal import (
            decode_image_pixels,
        )

        src = (np.add.outer(np.arange(16) * 7, np.arange(24) * 3)
               % 256).astype(np.uint8)
        out = decode_image_pixels(encode_jpeg_gray(src, quality=100))
        assert _err(out, src) <= 2
        with pytest.raises(ValueError):
            decode_image_pixels(b"\xFF\xD8\xFF\xE0 truncated junk")


class TestProgressive:
    """SOF2 / T.81 Annex G: the six-scan fixture script covers DC first
    with point transform, DC refinement, AC first per band with EOB runs,
    and AC refinement with correction bits."""

    def test_matches_baseline_decode_exactly(self):
        # same quantized coefficients in, so the decoded planes must be
        # IDENTICAL — any progressive path bug shows as a pixel diff
        from pdf_ocr_engine_spark.core.jpegcodec import (
            encode_jpeg_gray_progressive,
        )

        rng = np.random.default_rng(21)
        for q in (100, 90, 50):
            src = rng.integers(0, 256, size=(56, 41), dtype=np.uint8)
            base = decode_jpeg_gray(encode_jpeg_gray(src, quality=q))
            prog = decode_jpeg_gray(
                encode_jpeg_gray_progressive(src, quality=q))
            assert (prog == base).all(), q

    def test_mostly_white_page_exercises_eob_runs(self):
        from pdf_ocr_engine_spark.core.jpegcodec import (
            encode_jpeg_gray_progressive,
        )

        src = np.full((96, 120), 255, dtype=np.uint8)
        src[40:48, 56:80] = 0  # one dark patch among many empty blocks
        base = decode_jpeg_gray(encode_jpeg_gray(src, quality=100))
        prog = decode_jpeg_gray(
            encode_jpeg_gray_progressive(src, quality=100))
        assert (prog == base).all()

    def test_truncated_progressive_is_error(self):
        from pdf_ocr_engine_spark.core.jpegcodec import (
            encode_jpeg_gray_progressive,
        )

        full = encode_jpeg_gray_progressive(
            np.arange(64, dtype=np.uint8).reshape(8, 8))
        with pytest.raises(JpegError):
            decode_jpeg_gray(full[: len(full) // 3])

    def test_scanned_pdf_with_progressive_raster_ocrs(self):
        from pdf_ocr_engine_spark.core.extract_doc import extract_document
        from pdf_ocr_engine_spark.core.pdfscan import build_pixel_scanned_pdf
        from pdf_ocr_engine_spark.operators.ocr import (
            deterministic_recognizer,
        )

        pages = [{"width": 300, "height": 120,
                  "words": [("web", 10, 10, 28, 18),
                            ("jpeg", 36, 10, 60, 18)]}]
        rec = deterministic_recognizer()
        out = extract_document(
            build_pixel_scanned_pdf(pages, codec="jpegprog"), "eng",
            recognizer=rec)
        assert out["status"] == "ok"
        assert out["text"] == "web jpeg"

    def test_multimodal_tier_decodes_progressive(self):
        from pdf_ocr_engine_spark.core.jpegcodec import (
            encode_jpeg_gray_progressive,
        )
        from pdf_ocr_engine_spark.operators.multimodal import (
            decode_image_pixels,
        )

        src = (np.add.outer(np.arange(16) * 5, np.arange(24) * 11)
               % 256).astype(np.uint8)
        out = decode_image_pixels(
            encode_jpeg_gray_progressive(src, quality=100))
        assert _err(out, src) <= 2

    def test_pil_decodes_our_progressive(self):
        Image = pytest.importorskip("PIL.Image")
        import io

        from pdf_ocr_engine_spark.core.jpegcodec import (
            encode_jpeg_gray_progressive,
        )

        rng = np.random.default_rng(22)
        src = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
        img = Image.open(io.BytesIO(
            encode_jpeg_gray_progressive(src, quality=100)))
        got = np.asarray(img.convert("L"))
        assert _err(got, src) <= 2

    def test_we_decode_pil_progressive(self):
        Image = pytest.importorskip("PIL.Image")
        import io

        rng = np.random.default_rng(23)
        src = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(src, "L").save(buf, format="JPEG", quality=95,
                                       progressive=True)
        out = decode_jpeg_gray(buf.getvalue())
        pil_back = np.asarray(Image.open(io.BytesIO(buf.getvalue()))
                              .convert("L"))
        assert _err(out, pil_back) <= 1
