"""Property tests for the pure-stdlib PNG codec (no Spark session):
encode→read roundtrips pixels exactly for every supported color type."""

from hypothesis import given, settings
from hypothesis import strategies as st

from impresso_ta.operators.multimodal import (
    _PNG_CHANNELS,
    _png_image_decode,
    _png_read,
    png_encode,
)

dims = st.tuples(st.integers(1, 12), st.integers(1, 12))


@settings(max_examples=60, deadline=None)
@given(
    dims,
    st.sampled_from([0, 2, 4, 6]),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_all_color_types(wh, color_type, rnd):
    w, h = wh
    n = w * h * _PNG_CHANNELS[color_type]
    pixels = bytes(rnd.randrange(256) for _ in range(n))
    got = _png_read(png_encode(w, h, color_type, pixels))
    assert got[0] == w and got[1] == h
    assert got[2] == color_type
    assert got[4] == pixels


@settings(max_examples=30, deadline=None)
@given(dims, st.integers(0, 255))
def test_png_decode_constant_gray_luma(wh, v):
    w, h = wh
    meta = _png_image_decode(png_encode(w, h, 0, bytes([v]) * (w * h)))
    assert meta["width"] == w and meta["height"] == h
    assert meta["mode"] == "L"
    assert abs(meta["mean_luma"] - v / 255.0) < 1e-5


@settings(max_examples=40, deadline=None)
@given(dims, st.randoms(use_true_random=False))
def test_png_palette_roundtrip(wh, rnd):
    w, h = wh
    plte = bytes(rnd.randrange(256) for _ in range(3 * 4))  # 4 entries
    idx = bytes(rnd.randrange(4) for _ in range(w * h))
    got = _png_read(png_encode(w, h, 3, idx, plte))
    assert got[4] == idx and got[5] == plte
    meta = _png_image_decode(png_encode(w, h, 3, idx, plte))
    assert meta["mode"] == "P"
    # luma equals the palette-mapped ITU-R 601-2 mean
    expect = sum(
        plte[3 * i] * 0.299 + plte[3 * i + 1] * 0.587 + plte[3 * i + 2] * 0.114
        for i in idx
    ) / (w * h) / 255.0
    assert abs(meta["mean_luma"] - expect) < 1e-5


@settings(max_examples=60, deadline=None)
@given(
    st.tuples(st.integers(1, 40), st.integers(1, 40)),
    st.sampled_from([0, 2, 3, 4, 6]),
    st.randoms(use_true_random=False),
)
def test_numpy_luma_grid_bit_exact_vs_scalar(wh, color_type, rnd):
    """The vectorized luma grid must be BIT-identical to the retained
    scalar reference on every color type and dimension — same per-pixel
    three-term luma expression, cumsum = the scalar loop's sequential
    float adds — so dHash values cannot shift with the speedup."""
    from impresso_ta.operators.multimodal import (
        _png_luma_grid,
        _png_luma_grid_scalar,
    )

    w, h = wh
    if color_type == 3:
        plte = bytes(rnd.randrange(256) for _ in range(48))
        pixels = bytes(rnd.randrange(16) for _ in range(w * h))
        png = png_encode(w, h, 3, pixels, plte)
    else:
        n = w * h * _PNG_CHANNELS[color_type]
        pixels = bytes(rnd.randrange(256) for _ in range(n))
        png = png_encode(w, h, color_type, pixels)
    for gw, gh in ((9, 8), (3, 3), (1, 1)):
        assert _png_luma_grid(png, gw, gh) == _png_luma_grid_scalar(
            png, gw, gh
        )
