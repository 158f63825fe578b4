"""Image tier oracles (NPP / nvJPEG / nvTIFF class)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpumathlib.core import assert_allclose
from tpumathlib.image import (
    canny,
    dct8x8,
    distance_transform,
    find_contours,
    flood_fill,
    idct8x8,
    jpeg_decode,
    jpeg_encode,
    label_compress,
    label_markers,
    resize_bilinear,
    rgb_to_ycbcr,
    tiff_info,
    tiff_read,
    tiff_write,
    watermark,
    watershed,
    ycbcr_to_rgb,
)


def test_label_markers_and_compress():
    mask = np.zeros((12, 12), bool)
    mask[1:4, 1:4] = True        # component 1
    mask[6:9, 6:10] = True       # component 2
    mask[10, 0:3] = True         # component 3
    labels = np.asarray(label_markers(jnp.asarray(mask)))
    assert (labels > 0).sum() == mask.sum()
    vals = {labels[2, 2], labels[7, 7], labels[10, 1]}
    assert len(vals) == 3  # three distinct labels
    assert labels[0, 0] == 0
    comp, count = label_compress(jnp.asarray(labels))
    assert int(count) == 3
    assert set(np.unique(np.asarray(comp))) == {0, 1, 2, 3}


def test_label_markers_connectivity():
    # diagonal touch: connected in 8-conn, separate in 4-conn
    mask = np.zeros((4, 4), bool)
    mask[0, 0] = mask[1, 1] = True
    l8 = np.asarray(label_markers(jnp.asarray(mask), eight=True))
    l4 = np.asarray(label_markers(jnp.asarray(mask), eight=False))
    assert l8[0, 0] == l8[1, 1]
    assert l4[0, 0] != l4[1, 1]


def test_distance_transform():
    mask = np.ones((16, 16), bool)
    mask[0, 0] = False  # single background pixel
    d = np.asarray(distance_transform(jnp.asarray(mask)))
    yy, xx = np.mgrid[0:16, 0:16]
    want = np.sqrt(yy**2.0 + xx**2)
    want[0, 0] = 0
    assert_allclose(d, want, rtol=1e-5, msg="EDT")


def test_watershed():
    img = np.zeros((16, 16), np.float32)
    img[:, 8] = 10.0  # ridge splits the image
    markers = np.zeros((16, 16), np.int32)
    markers[8, 2] = 1
    markers[8, 13] = 2
    seg = np.asarray(watershed(jnp.asarray(img), jnp.asarray(markers)))
    assert (seg[:, :8] == 1).all()
    assert (seg[:, 9:] == 2).all()


def test_flood_fill():
    img = np.zeros((10, 10), np.float32)
    img[:5, :5] = 1.0
    out, mask = flood_fill(jnp.asarray(img), (2, 2), 7.0, tol=0.1)
    assert np.asarray(mask).sum() == 25
    assert np.asarray(out)[0, 0] == 7.0
    assert np.asarray(out)[9, 9] == 0.0


def test_find_contours():
    mask = np.zeros((8, 8), bool)
    mask[2:6, 2:6] = True
    c = np.asarray(find_contours(jnp.asarray(mask)))
    assert c[2, 2] and c[2, 5] and c[5, 5]
    assert not c[3, 3]  # interior
    assert c.sum() == 12  # 4x4 square boundary


def test_canny():
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 255.0  # vertical step edge
    edges = np.asarray(canny(jnp.asarray(img)))
    cols = np.nonzero(edges.any(axis=0))[0]
    assert len(cols) > 0 and np.all(np.abs(cols - 15.5) < 3)
    # no edges in flat regions
    assert not edges[:, :10].any() and not edges[:, 22:].any()


def test_resize_watermark(rng):
    img = rng.integers(0, 255, (16, 24), np.uint8)
    up = np.asarray(resize_bilinear(jnp.asarray(img), 32, 48))
    assert up.shape == (32, 48)
    # downscale back ≈ original (low-pass sanity)
    back = np.asarray(resize_bilinear(jnp.asarray(up), 16, 24))
    assert np.abs(back.astype(float) - img.astype(float)).mean() < 30
    mark = np.full((4, 4), 255, np.uint8)
    wm = np.asarray(watermark(jnp.asarray(img), jnp.asarray(mark), alpha=1.0))
    assert (wm[:4, :4] == 255).all()


def test_dct_roundtrip(rng):
    b = jnp.asarray(rng.normal(size=(5, 8, 8)), jnp.float32)
    assert_allclose(idct8x8(dct8x8(b)), np.asarray(b), rtol=1e-4, msg="DCT")
    # DCT of constant block concentrates in DC
    const = jnp.ones((1, 8, 8), jnp.float32) * 37.0
    co = np.asarray(dct8x8(const))
    assert abs(co[0, 0, 0] - 37.0 * 8) < 1e-3
    assert np.abs(co[0].ravel()[1:]).max() < 1e-3


def test_ycbcr_roundtrip(rng):
    rgb = jnp.asarray(rng.integers(0, 255, (8, 8, 3)), jnp.float32)
    back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    assert_allclose(back, np.asarray(rgb), rtol=1e-3, atol=0.1)


@pytest.mark.parametrize("chans", [1, 3])
def test_jpeg_roundtrip(rng, chans):
    shape = (32, 40) if chans == 1 else (32, 40, 3)
    # smooth image (JPEG is for natural images)
    base = np.cumsum(np.cumsum(rng.normal(size=(32, 40)), 0), 1)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    img = (np.stack([base] * chans, -1).reshape(shape)).astype(np.uint8)
    blob = jpeg_encode(img, quality=90)
    assert len(blob) < img.size  # compresses
    out = jpeg_decode(blob)
    assert out.shape == img.shape
    err = np.abs(out.astype(float) - img.astype(float)).mean()
    assert err < 6.0, err  # q90 near-lossless on smooth data


def test_tiff_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.tif")
    img = rng.integers(0, 255, (20, 30, 3), np.uint8)
    tiff_write(path, img)
    info = tiff_info(path)
    assert info["width"] == 30 and info["height"] == 20 and info["samples_per_pixel"] == 3
    back = tiff_read(path)
    np.testing.assert_array_equal(back, img)
    region = tiff_read(path, region=(5, 10, 8, 12))
    np.testing.assert_array_equal(region, img[5:13, 10:22])
    gray = rng.integers(0, 255, (10, 10), np.uint8)
    tiff_write(path, gray)
    np.testing.assert_array_equal(tiff_read(path), gray)


def test_tiff_lzw_decode(tmp_path, rng):
    """LZW TIFF decode (compression=5 + predictor) against
    libtiff-encoded streams via Pillow — bit-exact (≙ nvTIFF's LZW
    decode path)."""
    pytest.importorskip("PIL")
    from PIL import Image

    for mode, shape in (("L", (41, 57)), ("RGB", (33, 29, 3))):
        img = (rng.integers(0, 255, shape, dtype=np.uint8) // 4
               + 90).astype(np.uint8)
        p = str(tmp_path / f"lzw_{mode}.tif")
        Image.fromarray(img, mode).save(p, compression="tiff_lzw")
        np.testing.assert_array_equal(tiff_read(p), img)


def test_label_markers_batched():
    from tpumathlib.image import label_markers_batched

    masks = np.zeros((2, 8, 8), bool)
    masks[0, 1:3, 1:3] = True
    masks[1, 4:6, 4:6] = True
    masks[1, 0, 0] = True
    labels = np.asarray(label_markers_batched(jnp.asarray(masks)))
    assert (labels[0] > 0).sum() == 4
    assert len(set(labels[1][labels[1] > 0])) == 2


def test_jpeg_decode_batched(rng):
    from tpumathlib.image import jpeg_decode_batched, jpeg_encode

    imgs = [rng.integers(0, 255, (16, 16), np.uint8) for _ in range(3)]
    blobs = [jpeg_encode(i, quality=95) for i in imgs]
    outs = jpeg_decode_batched(blobs)
    for o, i in zip(outs, imgs):
        assert o.shape == i.shape


def test_inkernel_rng(rng):
    """cuRANDDx parity: RNG inside a Pallas kernel (interpret on CPU)."""
    from tpumathlib.dx.rng import dropout_matmul_kernel, random_uniform_kernel

    u = np.asarray(random_uniform_kernel(42, (64, 128)))
    assert 0.0 < u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.05
    # determinism by seed
    u2 = np.asarray(random_uniform_kernel(42, (64, 128)))
    np.testing.assert_array_equal(u, u2)
    a = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    d = np.asarray(dropout_matmul_kernel(a, b, 7, rate=0.5))
    full = np.asarray(a) @ np.asarray(b)
    zeros = (d == 0).mean()
    assert 0.3 < zeros < 0.7
    nz = d != 0
    assert np.allclose(d[nz], 2 * full[nz], rtol=1e-4)


def test_jfif_decode_real_jpeg(rng):
    """Decode REAL libjpeg-encoded .jpg streams through jpeg_decode
    (≙ nvJPEG-Decoder/nvjpegDecoder.cpp:46-88 decoding actual files) —
    PIL (libjpeg) is the encode+decode oracle."""
    import io

    from PIL import Image

    from tpumathlib.image.jpeg import jpeg_decode

    x = np.linspace(0, 4 * np.pi, 128)
    img = (127 + 60 * np.sin(x)[:, None] * np.cos(x)[None, :]
           + 40 * np.outer(np.cos(x / 3), np.ones(128)))
    img = img.clip(0, 255).astype(np.uint8)
    rgb = np.stack([img, np.roll(img, 7, 0), 255 - img], -1)

    # 4:4:4 color: near-exact vs libjpeg's own decode
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=90, subsampling=0)
    ours = jpeg_decode(buf.getvalue())
    ref = np.asarray(Image.open(buf).convert("RGB"))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 3

    # 4:2:0 at an odd size (chroma upsampling differs: nearest vs fancy)
    rgb2 = rgb[:100, :75]
    buf = io.BytesIO()
    Image.fromarray(rgb2).save(buf, "JPEG", quality=92, subsampling=2)
    ours = jpeg_decode(buf.getvalue())
    ref = np.asarray(Image.open(buf).convert("RGB"))
    assert ours.shape == ref.shape
    assert np.abs(ours.astype(int) - ref.astype(int)).mean() < 3.0

    # grayscale with restart markers
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=85,
                              restart_marker_blocks=4)
    ours = jpeg_decode(buf.getvalue())
    ref = np.asarray(Image.open(buf).convert("L"))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_jfif_encode_interop(rng):
    """JFIF-conformant encoder: the emitted stream opens in Pillow/libjpeg
    (≙ nvJPEG-Encoder-MultipleInstances) at 4:4:4, 4:2:0, gray, odd dims."""
    import io

    from PIL import Image

    from tpumathlib.image import jfif_decode, jfif_encode

    x, y = np.meshgrid(np.arange(64), np.arange(48))
    img = np.stack([(127 + 90 * np.sin(x / 9) * np.cos(y / 11)),
                    (127 + 80 * np.cos(x / 7)),
                    (127 + 70 * np.sin((x + y) / 13))],
                   axis=-1).clip(0, 255).astype(np.uint8)
    for sub, tol in (("444", 8), ("420", 14)):
        blob = jfif_encode(img, quality=92, subsampling=sub)
        pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
        assert np.abs(pil.astype(int) - img.astype(int)).max() <= tol
        ours = jfif_decode(blob)
        assert np.abs(ours.astype(int) - img.astype(int)).max() <= tol + 4
    gray = img[..., 0]
    blob = jfif_encode(gray, quality=92)
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("L"))
    assert np.abs(pil.astype(int) - gray.astype(int)).max() <= 4
    odd = img[:45, :53]
    blob = jfif_encode(odd, quality=92, subsampling="420")
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    assert pil.shape == odd.shape
    assert np.abs(pil.astype(int) - odd.astype(int)).max() <= 16


def test_jfif_roi_and_backend(rng):
    """ROI decode (≙ nvJPEG-Decoder-Backend-ROI) matches the full decode's
    crop exactly; host backend matches the hybrid one."""
    import io

    from PIL import Image

    from tpumathlib.image import jfif_decode

    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95,
                              subsampling=2)  # 4:2:0 stream
    blob = buf.getvalue()
    full = jfif_decode(blob)
    roi = jfif_decode(blob, roi=(13, 9, 31, 22))
    np.testing.assert_array_equal(roi, full[9:31, 13:44])
    host = jfif_decode(blob, roi=(13, 9, 31, 22), backend="host")
    assert np.abs(host.astype(int) - roi.astype(int)).max() <= 1


def test_geotiff_roundtrip(tmp_path, rng):
    """GeoTIFF tags round-trip through our writer/reader AND interop with
    Pillow (≙ nvTIFF-GeoTIFF-Decode-Encode)."""
    from PIL import Image
    from PIL.TiffTags import TAGS_V2  # noqa: F401

    from tpumathlib.image.tiff import geotiff_read, geotiff_write

    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    path = str(tmp_path / "geo.tif")
    keys = [(1024, 0, 1, 2),      # GTModelTypeGeoKey = geographic
            (2048, 0, 1, 4326)]   # GeodeticCRSGeoKey = WGS84
    geotiff_write(path, img, pixel_scale=(0.1, 0.1, 0.0),
                  tiepoint=(0, 0, 0, -122.45, 37.75, 0.0),
                  geo_keys=keys, ascii_params="WGS 84|")
    back, geo = geotiff_read(path)
    np.testing.assert_array_equal(back, img)
    assert geo["pixel_scale"] == (0.1, 0.1, 0.0)
    assert geo["tiepoints"][3] == -122.45
    assert geo["geo_keys"] == [tuple(k) for k in keys]
    assert geo["ascii_params"].startswith("WGS 84")
    # interop: Pillow reads the image and the geo tags
    pim = Image.open(path)
    np.testing.assert_array_equal(np.asarray(pim), img)
    assert 33550 in pim.tag_v2 and 34735 in pim.tag_v2
    assert tuple(pim.tag_v2[33550]) == (0.1, 0.1, 0.0)
    # and we can read a Pillow-written GeoTIFF-tagged file
    p2 = str(tmp_path / "pil.tif")
    pim.save(p2, tiffinfo=pim.tag_v2)
    back2, geo2 = geotiff_read(p2)
    np.testing.assert_array_equal(back2, img)
    assert geo2["pixel_scale"] == (0.1, 0.1, 0.0)


def test_tiff_multi_image(tmp_path, rng):
    """Multi-image TIFF (chained IFDs): info lists every image, read by
    index, read_all (≙ the nvTIFF multi-image info sample)."""
    from PIL import Image

    from tpumathlib.image.tiff import (tiff_info, tiff_read, tiff_read_all,
                                       tiff_write)

    imgs = [rng.integers(0, 255, (16, 20, 3), dtype=np.uint8),
            rng.integers(0, 255, (8, 12), dtype=np.uint8),
            rng.integers(0, 255, (10, 10, 3), dtype=np.uint8)]
    path = str(tmp_path / "multi.tif")
    tiff_write(path, imgs)
    info = tiff_info(path)
    assert info["num_images"] == 3
    assert [i["height"] for i in info["images"]] == [16, 8, 10]
    for k in range(3):
        np.testing.assert_array_equal(tiff_read(path, index=k), imgs[k])
    all_ = tiff_read_all(path)
    assert len(all_) == 3
    # Pillow sees all frames
    pim = Image.open(path)
    assert getattr(pim, "n_frames", 1) == 3
    pim.seek(1)
    np.testing.assert_array_equal(np.asarray(pim), imgs[1])


def test_jpeg_encode_subsampling_modes(rng):
    """Full nvJPEG CSS set on the encoder (NVJPEG_CSS_444/422/420/440/411):
    every mode emits a stream libjpeg decodes near the original, and our
    own decoder agrees with libjpeg on our streams."""
    import io

    from PIL import Image

    from tpumathlib.image.jpeg import jfif_decode, jfif_encode

    y, x = np.mgrid[0:41, 0:53]
    img = np.stack([(y * 3) % 256, (x * 3) % 256, (x + y) % 256],
                   -1).astype(np.uint8)
    for sub in ("444", "422", "420", "440", "411"):
        blob = jfif_encode(img, quality=95, subsampling=sub)
        pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
        assert np.mean(np.abs(pil.astype(int) - img.astype(int))) < 3.0, sub
        ours = jfif_decode(blob)
        assert np.mean(np.abs(ours.astype(int) - img.astype(int))) < 3.0, sub
    with pytest.raises(ValueError):
        jfif_encode(img, subsampling="410")


def test_jpeg_progressive_decode(rng):
    """Progressive (SOF2) decode — spectral selection + successive
    approximation + EOB runs (≙ nvJPEG's progressive support in the
    decoder samples). Grayscale is BIT-EXACT vs libjpeg (no color
    transform in the way); RGB within the color-rounding envelope of the
    baseline path; chroma-subsampled within the nearest-upsampling
    envelope."""
    import io

    from PIL import Image

    from tpumathlib.image.jpeg import jfif_decode

    y, x = np.mgrid[0:64, 0:80]
    smooth = np.stack([(y * 2) % 256, (x * 2) % 256, (x + y) % 256],
                      -1).astype(np.uint8)
    noisy = rng.integers(0, 255, (41, 53, 3), dtype=np.uint8)

    def enc(img, **kw):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", progressive=True, **kw)
        return buf.getvalue()

    def pil_dec(blob, mode):
        return np.asarray(Image.open(io.BytesIO(blob)).convert(mode))

    # gray: bit-exact against libjpeg on smooth data; ±1 IDCT rounding
    # envelope on noisy data (float IDCT vs libjpeg's integer islow)
    blob = enc(smooth[:, :, 0], quality=95)
    np.testing.assert_array_equal(jfif_decode(blob), pil_dec(blob, "L"))
    blob = enc(noisy[:, :, 0], quality=85)
    d = np.abs(jfif_decode(blob).astype(int)
               - pil_dec(blob, "L").astype(int))
    assert d.max() <= 1, d.max()
    # RGB 4:4:4: only YCbCr rounding differs (same envelope as baseline;
    # float vs libjpeg fixed-point conversion leaves rare ±3 pixels at
    # chroma-saturation corners)
    for img, q in ((smooth, 95), (noisy, 92)):
        blob = enc(img, quality=q, subsampling=0)
        d = np.abs(jfif_decode(blob).astype(int)
                   - pil_dec(blob, "RGB").astype(int))
        assert d.max() <= 3, d.max()
    # 4:2:0 smooth: nearest-vs-fancy chroma upsampling envelope
    blob = enc(smooth, quality=90, subsampling=2)
    d = np.abs(jfif_decode(blob).astype(int)
               - pil_dec(blob, "RGB").astype(int))
    assert np.mean(d) < 1.5, np.mean(d)


def test_jpeg_resize_watermark_pipeline(rng):
    """Decode → resize → watermark → encode pipeline (≙ nvJPEG
    Image-Resize-WaterMark decodeResizeEncodeOneImage): the output is a
    valid JPEG at the target size whose pixels match a NumPy reference
    of the same stages within JPEG loss."""
    import io

    from PIL import Image

    from tpumathlib.image import jpeg_resize_watermark
    from tpumathlib.image.jpeg import jfif_encode

    y, x = np.mgrid[0:64, 0:80]
    img = np.stack([(y * 3) % 256, (x * 3) % 256, (x + y) % 256],
                   axis=-1).astype(np.uint8)
    mark = np.full((16, 24, 3), 255, np.uint8)
    blob = jfif_encode(img, quality=95)
    out = jpeg_resize_watermark(blob, mark=mark, alpha=0.5, quality=95)
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == (32, 40, 3)          # sample's default: half size
    # reference: PIL bilinear resize + blend
    ref = np.asarray(Image.fromarray(img).resize((40, 32), Image.BILINEAR),
                     dtype=np.float32)
    ref[:16, :24] = 0.5 * ref[:16, :24] + 0.5 * 255.0
    err = np.mean(np.abs(dec.astype(np.float32) - ref))
    assert err < 8.0, err
    # explicit target size, no watermark
    out2 = jpeg_resize_watermark(blob, out_w=20, out_h=10)
    assert np.asarray(Image.open(io.BytesIO(out2))).shape == (10, 20, 3)


def test_tiff_encode_options(tmp_path, rng):
    """nvTIFF-Encode-Options variant matrix
    (/root/reference/nvTIFF/nvTIFF-Encode-Options/nvtiff_encode_options.cpp:139-209):
    lzw/deflate/packbits roundtrip bit-exact, with/without the horizontal
    predictor and striped geometry; Pillow (libtiff) decodes every stream
    we emit and we decode every stream it emits (cross-conformance)."""
    from PIL import Image

    rgb = rng.integers(0, 255, (33, 47, 3), dtype=np.uint8)
    gray = rng.integers(0, 255, (21, 30), dtype=np.uint8)
    # smooth data so the predictor actually matters
    smooth = (np.add.outer(np.arange(33), np.arange(47)) % 251
              ).astype(np.uint8)
    for comp in ("lzw", "deflate", "packbits"):
        for img in (rgb, gray, smooth):
            for pred in (False, True):
                p = str(tmp_path / f"{comp}_{pred}.tif")
                tiff_write(p, img, compression=comp, rows_per_strip=7,
                           predictor=pred)
                np.testing.assert_array_equal(tiff_read(p), img)
                np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
        assert tiff_info(str(tmp_path / f"{comp}_False.tif"))[
            "compression"] == {"lzw": 5, "deflate": 8, "packbits": 32773}[comp]
    # decode libtiff-emitted streams for the codecs new this round
    for pil_comp in ("packbits", "tiff_adobe_deflate"):
        p = str(tmp_path / f"pil_{pil_comp}.tif")
        Image.fromarray(rgb).save(p, compression=pil_comp)
        np.testing.assert_array_equal(tiff_read(p), rgb)


def test_tiff_tiled(tmp_path, rng):
    """Tiled TIFF geometry (TileWidth/TileLength/TileOffsets, dims
    multiples of 16 as nvTIFF requires): write/read roundtrip incl.
    edge-partial tiles, region decode, Pillow interop both directions."""
    from PIL import Image

    img = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
    p = str(tmp_path / "tiled.tif")
    tiff_write(p, img, tile=(32, 48), compression="lzw")
    info = tiff_info(p)
    assert info["tile"] == (32, 48)
    np.testing.assert_array_equal(tiff_read(p), img)
    np.testing.assert_array_equal(tiff_read(p, region=(20, 30, 40, 50)),
                                  img[20:60, 30:80])
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
    with pytest.raises(ValueError):
        tiff_write(p, img, tile=(20, 48))
    # libtiff-emitted tiled stream
    p2 = str(tmp_path / "pil_tiled.tif")
    Image.fromarray(img).save(p2, compression="tiff_lzw",
                              tiffinfo={322: 64, 323: 48})
    if tiff_info(p2).get("tile"):            # Pillow honored the request
        np.testing.assert_array_equal(tiff_read(p2), img)


def test_tiff_tiled_predictor_and_batched_regions(tmp_path, rng):
    """Predictor=2 restarts at each tile (TIFF 6.0 §14) — regression for
    the cross-tile cumsum bug — and batched region decode with segment
    pushdown (≙ nvTIFF-Batched-Region-Decode nvtiffDecodeRange): every
    region bit-exact vs the full-frame crop, single- and multi-threaded."""
    from PIL import Image

    from tpumathlib.image.tiff import tiff_read_regions

    img = rng.integers(0, 255, (40, 96, 3), dtype=np.uint8)
    p = str(tmp_path / "tp.tif")
    tiff_write(p, img, compression="lzw", tile=(16, 32), predictor=True)
    np.testing.assert_array_equal(tiff_read(p), img)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
    regs = [(0, 0, 40, 96), (5, 7, 20, 30), (17, 33, 16, 16),
            (39, 95, 1, 1)]
    for threads in (1, 3):
        outs = tiff_read_regions(p, regs, threads=threads)
        for (y, x, h, w), o in zip(regs, outs):
            np.testing.assert_array_equal(o, img[y:y + h, x:x + w])
    # striped pushdown too
    p2 = str(tmp_path / "sp.tif")
    tiff_write(p2, img, compression="deflate", rows_per_strip=7,
               predictor=True)
    for (y, x, h, w), o in zip(regs, tiff_read_regions(p2, regs)):
        np.testing.assert_array_equal(o, img[y:y + h, x:x + w])
    # non-intersecting region → empty crop, not an exception
    assert tiff_read(p2, region=(40, 0, 4, 4)).shape[0] == 0
    assert tiff_read(p, region=(0, 96, 4, 4)).shape[1] == 0


def test_tiff_16bit_and_bigendian(tmp_path, rng):
    """16-bit samples (roundtrip all host codecs + Pillow interop both
    directions) and big-endian (MM) container decode — both nvTIFF
    capabilities the 8-bit/LE-only reader lacked."""
    import struct

    from PIL import Image

    g16 = rng.integers(0, 65535, (25, 31), dtype=np.uint16)
    rgb16 = rng.integers(0, 65535, (12, 17, 3), dtype=np.uint16)
    for comp in ("none", "lzw", "deflate", "packbits"):
        p = str(tmp_path / f"d16_{comp}.tif")
        tiff_write(p, g16, compression=comp, rows_per_strip=6,
                   predictor=(comp in ("lzw", "deflate")))
        np.testing.assert_array_equal(tiff_read(p), g16)
        tiff_write(p, rgb16, compression=comp)
        np.testing.assert_array_equal(tiff_read(p), rgb16)
    # Pillow reads our 16-bit gray; we read Pillow's
    p = str(tmp_path / "g16.tif")
    tiff_write(p, g16, compression="deflate")
    np.testing.assert_array_equal(np.asarray(Image.open(p)), g16)
    p2 = str(tmp_path / "pil16.tif")
    Image.fromarray(g16).save(p2, compression="tiff_adobe_deflate")
    np.testing.assert_array_equal(tiff_read(p2), g16)
    with pytest.raises(ValueError):
        tiff_write(p, g16, compression="jpeg")
    # hand-built minimal big-endian (MM) uncompressed gray file
    img = rng.integers(0, 255, (5, 7), dtype=np.uint8)
    entries = [(256, 3, 1, 7), (257, 3, 1, 5), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),
               (277, 3, 1, 1), (278, 3, 1, 5), (279, 4, 1, 35)]
    ifd_off = 8
    data_off = ifd_off + 2 + len(entries) * 12 + 4
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off)
    buf += struct.pack(">H", len(entries))
    for tid, tt, cnt, val in entries:
        val = data_off if tid == 273 else val
        buf += struct.pack(">HHI", tid, tt, cnt)
        buf += struct.pack(">HH", val, 0) if tt == 3 \
            else struct.pack(">I", val)
    buf += struct.pack(">I", 0) + img.tobytes()
    p3 = str(tmp_path / "be.tif")
    with open(p3, "wb") as f:
        f.write(buf)
    np.testing.assert_array_equal(np.asarray(Image.open(p3)), img)  # sane
    np.testing.assert_array_equal(tiff_read(p3), img)
    # big-endian 16-bit: byte order of samples honored
    img16 = rng.integers(0, 65535, (5, 7), dtype=np.uint16)
    entries[2] = (258, 3, 1, 16)
    entries[8] = (279, 4, 1, 70)
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off)
    buf += struct.pack(">H", len(entries))
    for tid, tt, cnt, val in entries:
        val = data_off if tid == 273 else val
        buf += struct.pack(">HHI", tid, tt, cnt)
        buf += struct.pack(">HH", val, 0) if tt == 3 \
            else struct.pack(">I", val)
    buf += struct.pack(">I", 0) + img16.astype(">u2").tobytes()
    with open(p3, "wb") as f:
        f.write(buf)
    np.testing.assert_array_equal(tiff_read(p3), img16)


def test_tiff_bigtiff(tmp_path, rng):
    """BigTIFF container (version 43, 8-byte offsets ≙ NVTIFF_BIG_TIFF):
    roundtrip + multi-image + Pillow reads it."""
    from PIL import Image

    imgs = [rng.integers(0, 255, (24, 31, 3), dtype=np.uint8),
            rng.integers(0, 255, (17, 13), dtype=np.uint8)]
    p = str(tmp_path / "big.tif")
    tiff_write(p, imgs, bigtiff=True, compression="deflate")
    import struct

    with open(p, "rb") as f:
        assert struct.unpack("<2sH", f.read(4))[1] == 43
    assert tiff_info(p)["num_images"] == 2
    for k in range(2):
        np.testing.assert_array_equal(tiff_read(p, index=k), imgs[k])
    pim = Image.open(p)
    np.testing.assert_array_equal(np.asarray(pim), imgs[0])


def test_tiff_jpeg_compression(tmp_path, rng):
    """JPEG-in-TIFF (compression=7): our encoder writes full JFIF strips
    through the suite's jfif_encode; decode handles both full streams and
    JPEGTables-abbreviated strips (TIFF TechNote 2, as libtiff emits)."""
    from PIL import Image

    # smooth image so lossy JPEG stays close
    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([(y * 2) % 256, (x * 2) % 256, ((x + y)) % 256],
                   axis=-1).astype(np.uint8)
    p = str(tmp_path / "jpeg.tif")
    tiff_write(p, img, compression="jpeg", jpeg_quality=95,
               rows_per_strip=16)
    assert tiff_info(p)["compression"] == 7
    got = tiff_read(p)
    assert got.shape == img.shape
    assert np.mean(np.abs(got.astype(int) - img.astype(int))) < 4.0
    # Pillow/libjpeg decodes our strips
    pil = np.asarray(Image.open(p))
    assert np.mean(np.abs(pil.astype(int) - img.astype(int))) < 4.0
    # libtiff-emitted JPEGTables-abbreviated stream
    p2 = str(tmp_path / "pil_jpeg.tif")
    Image.fromarray(img).save(p2, compression="jpeg", quality=95)
    got2 = tiff_read(p2)
    assert np.mean(np.abs(got2.astype(int) - img.astype(int))) < 4.0


def test_j2k_real_codestream_decode(rng):
    """Conformant JPEG2000 decode of REAL openjpeg streams
    (≙ nvJPEG2000/nvJPEG2000-Decoder): MQ + EBCOT Tier-1/2 + reversible
    5/3 synthesis + RCT — BIT-EXACT lossless roundtrip."""
    import io

    from PIL import Image

    from tpumathlib.image.j2k import j2k_decode

    def enc(img, **kw):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG2000", irreversible=False, **kw)
        return buf.getvalue()

    for ref in (rng.integers(0, 255, (64, 64), dtype=np.uint8),
                rng.integers(0, 255, (37, 53), dtype=np.uint8),
                rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)):
        got = j2k_decode(enc(ref))
        np.testing.assert_array_equal(got, ref)
    # region decode on a real stream
    ref = rng.integers(0, 255, (64, 64), dtype=np.uint8)
    got = j2k_decode(enc(ref), region=(8, 4, 16, 24))
    np.testing.assert_array_equal(got, ref[8:24, 4:28])
    # precinct-partitioned streams (scod&1): per-precinct packets and
    # tag trees, effective code-block clamping — bit-exact lossless
    for psize in ((128, 128), (64, 64)):
        buf = io.BytesIO()
        Image.fromarray(ref).save(buf, "JPEG2000", irreversible=False,
                                  precinct_size=psize)
        np.testing.assert_array_equal(j2k_decode(buf.getvalue()), ref)
    # irreversible 9/7 path: scalar dequantization + float CDF 9/7
    # synthesis + ICT, within ±1 of openjpeg's own lossy reconstruction
    x = np.linspace(0, 4 * np.pi, 64)
    smooth = ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 100
              + 128).astype(np.uint8)
    for ref97 in (smooth, smooth[:37, :53],
                  np.stack([smooth, smooth.T, 255 - smooth], -1),
                  rng.integers(0, 255, (48, 40), dtype=np.uint8)):
        buf = io.BytesIO()
        Image.fromarray(ref97).save(buf, "JPEG2000", irreversible=True)
        blob = buf.getvalue()
        oj = np.asarray(Image.open(io.BytesIO(blob)))
        got = j2k_decode(blob)
        assert np.abs(got.astype(int) - oj.astype(int)).max() <= 1


def test_jfif_encode_batch_multi_instance(rng):
    """Multi-instance batch encoder (≙ nvJPEG-Encoder-MultipleInstances):
    thread-pooled encode states, auto thread search, byte-identical output
    to the single-instance path."""
    import io

    from PIL import Image

    from tpumathlib.image.jpeg import jfif_encode, jfif_encode_batch

    imgs = [rng.integers(0, 255, (24 + 8 * i, 32, 3), dtype=np.uint8)
            for i in range(5)]
    outs = jfif_encode_batch(imgs, quality=80, nthreads=2)
    assert len(outs) == 5
    for im, blob in zip(imgs, outs):
        assert blob == jfif_encode(im, quality=80)
        dec = np.asarray(Image.open(io.BytesIO(blob)))
        assert dec.shape == im.shape
    # automatic thread-count search path
    outs2 = jfif_encode_batch(imgs[:3], quality=80)
    assert outs2 == outs[:3]


def test_j2k_real_codestream_encode(rng):
    """Conformant JPEG2000 ENCODER (≙ nvJPEG2000-Encoder): MQ encoder +
    full Tier-1/2 + forward 5/3 + RCT; output decodes BIT-EXACTLY both in
    this suite's decoder and in openjpeg (Pillow)."""
    import io

    from PIL import Image

    from tpumathlib.image.j2k import j2k_decode, j2k_encode
    from tpumathlib.image.j2k_codestream import MQDecoder
    from tpumathlib.image.j2k_encoder import MQEncoder

    # MQ coder roundtrip over random contexts/decisions
    cxs = rng.integers(0, 19, 1500)
    bits = rng.integers(0, 2, 1500)
    enc = MQEncoder()
    for c, b in zip(cxs, bits):
        enc.encode(int(c), int(b))
    dec = MQDecoder(enc.flush())
    assert [dec.decode(int(c)) for c in cxs] == list(map(int, bits))

    x = np.linspace(0, 4 * np.pi, 64)
    smooth = ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 100
              + 128).astype(np.uint8)
    for img in (smooth, smooth[:37, :53],
                rng.integers(0, 256, (32, 32), dtype=np.uint8),
                np.stack([smooth, smooth.T, 255 - smooth], -1)):
        blob = j2k_encode(img)
        np.testing.assert_array_equal(j2k_decode(blob), img)
        np.testing.assert_array_equal(
            np.asarray(Image.open(io.BytesIO(blob))), img)
        if img is smooth:
            assert len(blob) < img.size  # really compresses


def test_j2k_multitile_partial_decode(rng):
    """Multi-tile codestreams + tile-partial region decode
    (≙ nvJPEG2000-Decoder-Tile-Partial) and the pipelined batch decoder
    (≙ nvJPEG2000-Decoder-Pipelined)."""
    import io

    from PIL import Image

    from tpumathlib.image.j2k import j2k_decode, j2k_decode_batched

    x = np.linspace(0, 4 * np.pi, 160)
    img = ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 100
           + 128).astype(np.uint8)
    rgb = np.stack([img, img.T, 255 - img], -1)
    blobs = []
    for arr in (img, rgb):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG2000", irreversible=False,
                                  tile_size=(64, 64))
        blobs.append(buf.getvalue())
        np.testing.assert_array_equal(j2k_decode(blobs[-1]), arr)
    # partial: only intersecting tiles are entropy-decoded
    np.testing.assert_array_equal(
        j2k_decode(blobs[0], region=(70, 100, 50, 40)),
        img[70:120, 100:140])
    # 9/7 multi-tile
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG2000", irreversible=True,
                              tile_size=(128, 128))
    oj = np.asarray(Image.open(io.BytesIO(buf.getvalue())))
    assert np.abs(j2k_decode(buf.getvalue()).astype(int)
                  - oj.astype(int)).max() <= 1
    # pipelined batch decode
    outs = j2k_decode_batched(blobs * 2)
    np.testing.assert_array_equal(outs[0], img)
    np.testing.assert_array_equal(outs[1], rgb)


def test_j2k_quality_layers(rng):
    """Quality layers + rate control (≙ nvjpeg2kEncodeParamsSpecifyQuality,
    nvjpeg2k_encode.cpp:830): multi-layer codestreams decode losslessly in
    BOTH openjpeg and this suite's decoder, PSNR increases monotonically
    as layers are added (progressive quality), and the rates= knob
    bounds the first layer's byte budget."""
    import io

    pytest.importorskip("PIL")
    from PIL import Image

    from tpumathlib.image.j2k_codestream import j2k_decode_codestream
    from tpumathlib.image.j2k_encoder import j2k_encode_codestream

    img = (rng.integers(0, 30, (96, 80), dtype=np.uint8)
           + np.linspace(0, 180, 80, dtype=np.uint8)[None, :]).astype(np.uint8)
    blob = j2k_encode_codestream(img, levels=3, layers=3, rates=[16, 4])
    # full stream: lossless in both decoders
    np.testing.assert_array_equal(j2k_decode_codestream(blob), img)
    np.testing.assert_array_equal(
        np.asarray(Image.open(io.BytesIO(blob))), img)

    def psnr(a):
        mse = np.mean((a.astype(float) - img.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)

    ps = [psnr(j2k_decode_codestream(blob, max_layers=lay))
          for lay in (1, 2, 3)]
    assert ps[0] < ps[1] < ps[2] and ps[2] == 99.0, ps
    assert ps[0] > 25.0, ps      # first layer is a usable approximation
    # 2-layer stream also opens in openjpeg
    b2 = j2k_encode_codestream(img, levels=3, layers=2)
    np.testing.assert_array_equal(
        np.asarray(Image.open(io.BytesIO(b2))), img)


def test_jpeg_native_entropy_exact(rng, monkeypatch):
    """The native C++ entropy engine (native/src/jpeg_entropy.cpp) is
    byte-exact against the pure-Python reference path on encode, and
    coefficient-exact on decode — including restart-marker streams
    (≙ nvJPEG's dedicated entropy engines vs its CPU backend)."""
    import io

    pytest.importorskip("PIL")
    from PIL import Image

    from tpumathlib import native
    from tpumathlib.image import jpeg

    try:
        native.lib()
    except Exception:
        pytest.skip("native runtime unavailable")

    img = rng.integers(0, 256, (80, 64, 3), dtype=np.uint8)
    img = (img.astype(np.float32) + np.roll(img, 1, 0)
           + np.roll(img, 1, 1)).astype(np.uint8)

    def python_only(fn, *a, **k):
        monkeypatch.setattr(jpeg, "_native_lib", lambda: None)
        try:
            return fn(*a, **k)
        finally:
            monkeypatch.undo()

    for sub in ("444", "420"):
        blob_n = jpeg.jfif_encode(img, quality=85, subsampling=sub)
        blob_p = python_only(jpeg.jfif_encode, img, quality=85,
                             subsampling=sub)
        assert blob_n == blob_p          # byte-exact entropy stream
        out_n = jpeg.jfif_decode(blob_n, backend="host")
        out_p = python_only(jpeg.jfif_decode, blob_n, backend="host")
        np.testing.assert_array_equal(out_n, out_p)

    # externally-encoded stream WITH restart markers: native RST handling
    buf = io.BytesIO()
    try:
        Image.fromarray(img).save(buf, "JPEG", quality=80, subsampling=2,
                                  restart_marker_blocks=4)
    except (TypeError, OSError):
        pytest.skip("Pillow without restart_marker_blocks")
    blob = buf.getvalue()
    assert b"\xff\xdd" in blob           # DRI present
    out_n = jpeg.jfif_decode(blob, backend="host")
    out_p = python_only(jpeg.jfif_decode, blob, backend="host")
    np.testing.assert_array_equal(out_n, out_p)


def test_j2k_native_ebcot_exact(rng):
    """The native C++ EBCOT Tier-1 engine (native/src/ebcot.cpp) is
    byte-exact against the pure-Python reference coder on encode (data,
    numbps, npasses AND per-pass truncation lengths — the quality-layer
    split points) and coefficient-exact on decode, across bands, odd
    shapes, sparse/zero blocks (≙ nvJPEG2000's entropy engines vs its
    CPU backend)."""
    import pytest as _pytest

    from tpumathlib import native
    from tpumathlib.image import j2k_codestream as jcs
    from tpumathlib.image import j2k_encoder as jce

    try:
        native.lib()
    except Exception:
        _pytest.skip("native runtime unavailable")

    cases = []
    for band in range(4):
        blk = (rng.standard_normal((33, 17)) * 60).astype(np.int32)
        cases.append((blk, band))
    sparse = (rng.standard_normal((64, 64)) * 400).astype(np.int32)
    sparse[rng.random((64, 64)) < 0.9] = 0
    cases += [(sparse, 3), (np.zeros((8, 8), np.int32), 0),
              (np.ones((1, 5), np.int32) * -7, 2),
              ((rng.standard_normal((5, 1)) * 9).astype(np.int32), 1)]
    for blk, band in cases:
        d_p, nb_p, np_p, pl_p = jce._encode_codeblock_py(blk, band)
        d_n, nb_n, np_n, pl_n = jce.encode_codeblock(blk, band)
        assert d_n == d_p and (nb_n, np_n, pl_n) == (nb_p, np_p, pl_p)
        if nb_p:
            h, w = blk.shape
            out_p = jcs._decode_codeblock_py(d_p, w, h, nb_p, np_p, band)
            out_n = jcs.decode_codeblock(d_p, w, h, nb_p, np_p, band)
            np.testing.assert_array_equal(out_n, out_p)
            np.testing.assert_array_equal(out_n, blk)
    # truncated decode (a quality-layer prefix) must also agree
    blk, band = cases[0]
    d_p, nb_p, np_p, pl_p = jce._encode_codeblock_py(blk, band)
    for cut in range(1, np_p, 2):
        pre = d_p[:pl_p[cut - 1]]
        out_p = jcs._decode_codeblock_py(pre, 17, 33, nb_p, cut, band)
        out_n = jcs.decode_codeblock(pre, 17, 33, nb_p, cut, band)
        np.testing.assert_array_equal(out_n, out_p)


def test_jpeg_restart_segment_decode(rng, monkeypatch):
    """Restart-marker streams decode via the native segment-parallel
    LUT path (native/src/jpeg_entropy.cpp: de-stuffed segments + 8-bit
    first-level Huffman LUT + std::thread pool, ≙ nvJPEG's parallel
    restart-segment decode, nvjpegDecoder.cpp:46-88), byte-agreeing with
    libjpeg serial decode; the forced-threaded path must match too."""
    pytest.importorskip("PIL")
    import io
    import os
    import subprocess
    import sys

    from PIL import Image

    from tpumathlib.image.jpeg import jfif_decode

    x = np.clip(np.cumsum(rng.integers(-4, 5, (120, 200, 3)), axis=1)
                + 128, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    try:
        Image.fromarray(x).save(buf, "JPEG", quality=92, subsampling=0,
                                restart_marker_blocks=3)
    except TypeError:
        pytest.skip("PIL without restart_marker_blocks")
    blob = buf.getvalue()
    assert b"\xff\xdd" in blob          # DRI present
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    ours = jfif_decode(blob)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 3
    # threaded segment decode (1-core hosts never take the pool branch
    # by default — force it) must produce identical pixels
    monkeypatch.setenv("TPUMATHLIB_JPEG_THREADS", "3")
    code = (
        "import jax, sys, numpy as np;"
        "jax.config.update('jax_platforms','cpu');"
        "from tpumathlib.image.jpeg import jfif_decode;"
        "blob=open(sys.argv[1],'rb').read();"
        "np.save(sys.argv[2], jfif_decode(blob))"
    )
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        bp = os.path.join(td, "x.jpg")
        op = os.path.join(td, "out.npy")
        open(bp, "wb").write(blob)
        subprocess.run([sys.executable, "-c", code, bp, op], check=True,
                       env={**os.environ,
                            "TPUMATHLIB_JPEG_THREADS": "3"})
        np.testing.assert_array_equal(np.load(op), ours)


def test_jpeg_native_pixel_backend(rng):
    """backend="native" (C++ pixel stage, native/src/jpeg_pixel.cpp —
    dequant/IDCT/upsample/color on decode, color/pool/FDCT/quant on
    encode; ≙ NVJPEG_BACKEND_CPU_ONLY) agrees with the jit pixel
    pipeline to ±2 LSB on decode across all CSS modes (float summation
    order can flip a round-half-even boundary in BOTH the per-plane and
    the color rounding), and its encoded
    streams are spec-conformant (Pillow opens them within the nearest-
    vs-fancy chroma-upsampling envelope)."""
    import io

    pytest.importorskip("PIL")
    from PIL import Image

    from tpumathlib import native
    from tpumathlib.image.jpeg import jfif_decode, jfif_encode

    try:
        native.lib()
    except Exception:
        pytest.skip("native runtime unavailable")

    for (h, w), sub in (((120, 130), "444"), ((128, 96), "420"),
                        ((97, 65), "422"), ((64, 48), "411"),
                        ((80, 56), "440")):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = (img.astype(np.float32) + np.roll(img, 1, 0)
               + np.roll(img, 1, 1)).astype(np.uint8)
        blob = jfif_encode(img, quality=85, subsampling=sub,
                           backend="cpu")
        d_jit = np.asarray(jfif_decode(blob, backend="cpu")).astype(int)
        d_nat = np.asarray(jfif_decode(blob, backend="native")).astype(int)
        assert np.abs(d_jit - d_nat).max() <= 2, sub
        # native-encoded stream: conformant + self-consistent decode
        b_nat = jfif_encode(img, quality=85, subsampling=sub,
                            backend="native")
        pil = np.asarray(Image.open(io.BytesIO(b_nat))).astype(int)
        ours = np.asarray(jfif_decode(b_nat, backend="native")).astype(int)
        # control: the jit-encoded stream shows the same pillow gap
        # (fancy-upsampling), so bound native by the control + slack
        ctrl = np.abs(np.asarray(Image.open(io.BytesIO(blob))).astype(int)
                      - d_jit).max()
        assert np.abs(pil - ours).max() <= max(ctrl + 4, 6), sub
        # jit decode of the native stream matches native decode to ±1
        d2 = np.asarray(jfif_decode(b_nat, backend="cpu")).astype(int)
        assert np.abs(d2 - ours).max() <= 2, sub

    gray = rng.integers(0, 256, (96, 88), dtype=np.uint8)
    b = jfif_encode(gray, quality=90, backend="native")
    d1 = np.asarray(jfif_decode(b, backend="cpu")).astype(int)
    d2 = np.asarray(jfif_decode(b, backend="native")).astype(int)
    assert np.abs(d1 - d2).max() <= 2
