import numpy as np
import pytest

from assetdatavalidationtool_spark.codecs import (
    decode_image,
    decode_png,
    encode_image,
    encode_png,
    encode_stub_lossy,
    psnr,
)
from assetdatavalidationtool_spark.datagen import make_row, render_image, row_params


def test_png_roundtrip_exact():
    img = render_image("img_000000000003", 96, 64)
    assert (decode_png(encode_png(img)) == img).all()


def test_lossy_default_quality_above_gate():
    img = render_image("img_000000000011", 128, 128)
    for fmt in ("jpeg", "webp"):
        p = psnr(img, decode_image(encode_image(img, fmt), fmt))
        assert p >= 40.0, f"{fmt} default quality must clear the 40dB gate, got {p}"


def test_lossy_low_quality_below_gate():
    img = render_image("img_000000000011", 128, 128)
    p = psnr(img, decode_image(encode_stub_lossy(img, "jpeg", 32), "jpeg"))
    assert p < 40.0


def test_psnr_identical_is_inf_and_shape_mismatch_is_neg_inf():
    a = np.zeros((4, 4, 3), np.uint8)
    assert psnr(a, a) == float("inf")
    assert psnr(a, np.zeros((4, 5, 3), np.uint8)) == float("-inf")


def test_datagen_deterministic():
    r1, r2 = make_row(17), make_row(17)
    assert r1 == r2
    p = row_params(17)
    assert p["image_id"] == "img_000000000017"
    assert p["w"] in (64, 128, 256, 512) and p["fmt"] in ("png", "jpeg", "webp")


def test_render_deterministic_across_calls():
    a = render_image("img_000000000042", 64, 64)
    b = render_image("img_000000000042", 64, 64)
    assert (a == b).all()
