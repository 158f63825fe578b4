"""NPP-class image operators as data-parallel jnp programs.

Queue/scanline algorithms (union-find CCL, priority-flood watershed, BFS
flood fill) are reformulated as fixed-point label-propagation loops — each
iteration is a vectorized 4/8-neighbor reduction on the VPU, iterated under
lax.while_loop until the labels stop changing. The distance transform uses
jump flooding (log-step gathers) — the same algorithmic family as NPP's
parallel banding algorithm (PBA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


def _neighbor_min(x, eight: bool = True, pad_val=jnp.inf):
    """Min over the 4- or 8-neighborhood (including self)."""
    p = jnp.pad(x, 1, constant_values=pad_val)
    views = [p[1:-1, 1:-1], p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:]]
    if eight:
        views += [p[:-2, :-2], p[:-2, 2:], p[2:, :-2], p[2:, 2:]]
    return functools.reduce(jnp.minimum, views)


@functools.partial(jax.jit, static_argnames=("eight",))
def label_markers(mask, eight: bool = True):
    """Connected-component labels of a boolean mask (≙ nppiLabelMarkersUF).

    Label values are the (flattened-index+1) minima of each component —
    exactly the union-find style "marker" labels the NPP sample produces
    before compression. 0 = background."""
    h, w = mask.shape
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w) + 1).astype(jnp.float32)
    labels = jnp.where(mask, idx, _INF)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        nm = _neighbor_min(labels, eight)
        new = jnp.where(mask, jnp.minimum(labels, nm), _INF)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return jnp.where(mask, labels, 0).astype(jnp.int32)


def label_markers_batched(masks, eight: bool = True):
    """Batched CCL (≙ nppiLabelMarkersUFBatch — the
    batchedLabelMarkersAndCompression sample): vmap over a stack of masks."""
    return jax.vmap(lambda m: label_markers(m, eight))(masks)


@jax.jit
def label_compress(labels):
    """Renumber labels to 1..N (≙ nppiCompressMarkerLabelsUF). Returns
    (compressed, count)."""
    flat = labels.ravel()
    # pad with int32-max so the padded tail stays sorted for searchsorted
    uniq = jnp.unique(flat, size=flat.shape[0], fill_value=jnp.int32(2**31 - 1))
    nz = uniq > 0
    # rank of each unique nonzero label
    order = jnp.cumsum(nz)  # 1-based ranks where nz
    comp = jnp.zeros(flat.shape[0] + 1, jnp.int32)

    def lookup(v):
        pos = jnp.searchsorted(uniq, v)
        return jnp.where(v > 0, order[pos], 0)

    out = jax.vmap(lookup)(flat).reshape(labels.shape).astype(jnp.int32)
    return out, jnp.max(out)


@functools.partial(jax.jit, static_argnames=())
def distance_transform(mask):
    """Euclidean distance transform by jump flooding (≙ NPP
    distanceTransform PBA): distance from each True pixel to the nearest
    False (background) pixel. O(log n) gather passes."""
    h, w = mask.shape
    yy = jnp.arange(h)[:, None] * jnp.ones((1, w), jnp.int32)
    xx = jnp.ones((h, 1), jnp.int32) * jnp.arange(w)[None, :]
    # seeds: background pixels know their own coords; others unknown
    big = jnp.int32(1 << 20)
    sy = jnp.where(~mask, yy, big)
    sx = jnp.where(~mask, xx, big)

    def dist2(ay, ax):
        return (ay - yy) ** 2 + (ax - xx) ** 2

    steps = []
    s = 1
    while s < max(h, w):
        s *= 2
    while s >= 1:
        steps.append(s)
        s //= 2

    def jump(carry, step):
        sy, sx = carry
        best = jnp.where(sy < big, dist2(sy, sx), jnp.int32(1 << 30))
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                cy = jnp.roll(sy, (dy, dx), axis=(0, 1))
                cx = jnp.roll(sx, (dy, dx), axis=(0, 1))
                # invalidate wrapped entries
                valid = jnp.ones_like(mask)
                if dy > 0:
                    valid = valid & (yy >= dy)
                elif dy < 0:
                    valid = valid & (yy < h + dy)
                if dx > 0:
                    valid = valid & (xx >= dx)
                elif dx < 0:
                    valid = valid & (xx < w + dx)
                cy = jnp.where(valid & (cy < big), cy, big)
                cx = jnp.where(valid & (cx < big), cx, big)
                d = jnp.where(cy < big, dist2(cy, cx), jnp.int32(1 << 30))
                better = d < best
                sy = jnp.where(better, cy, sy)
                sx = jnp.where(better, cx, sx)
                best = jnp.minimum(best, d)
        return (sy, sx), None

    for st in steps:  # static unroll of the log passes
        (sy, sx), _ = jump((sy, sx), st)
    d = jnp.sqrt(dist2(sy, sx).astype(jnp.float32))
    return jnp.where(mask, d, 0.0)


@functools.partial(jax.jit, static_argnames=("levels",))
def watershed(image, markers, levels: int = 64):
    """Watershed-by-flooding segmentation (≙ nppiSegmentWatershed): flood
    the intensity landscape level by level from the marker labels; at each
    level, unlabeled pixels at or below the waterline iteratively adopt the
    neighboring label (min-label tie-break)."""
    img = image.astype(jnp.float32)
    lo = jnp.min(img)
    hi = jnp.max(img)
    labels = markers.astype(jnp.int32)

    def flood_level(level, labels):
        thresh = lo + (hi - lo) * (level + 1) / levels
        active = img <= thresh

        def body(state):
            labels, _ = state
            lab_f = jnp.where(labels > 0, labels.astype(jnp.float32), _INF)
            nm = _neighbor_min(lab_f, eight=False)
            adopt = (labels == 0) & active & jnp.isfinite(nm)
            new = jnp.where(adopt, nm.astype(jnp.int32), labels)
            return new, jnp.any(new != labels)

        def cond(state):
            return state[1]

        labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
        return labels

    return jax.lax.fori_loop(0, levels, flood_level, labels)


@jax.jit
def flood_fill(image, seed_yx, new_value, tol: float = 0.0):
    """Flood fill from a seed (≙ NPP+ floodFill): the connected region with
    |value − value(seed)| ≤ tol becomes ``new_value``. Returns (image, mask)."""
    img = image.astype(jnp.float32)
    sv = img[seed_yx[0], seed_yx[1]]
    eligible = jnp.abs(img - sv) <= tol
    h, w = img.shape
    seed_mask = jnp.zeros((h, w), bool).at[seed_yx[0], seed_yx[1]].set(True)

    def body(state):
        m, _ = state
        grown = _neighbor_min(jnp.where(m, 0.0, 1.0), eight=False, pad_val=1.0) < 0.5
        new = (grown | m) & eligible
        return new, jnp.any(new != m)

    mask, _ = jax.lax.while_loop(lambda s: s[1], body, (seed_mask & eligible, jnp.bool_(True)))
    return jnp.where(mask, new_value, image), mask


def find_contours(mask):
    """Boundary pixels of each labeled/true region (≙ nppiFindContour's
    contour image): pixels in the mask with at least one 4-neighbor outside."""
    m = jnp.asarray(mask) > 0
    interior = _neighbor_min(jnp.where(m, 1.0, 0.0), eight=False, pad_val=0.0) > 0.5
    return m & ~interior


# ---------------- filtering / canny ----------------

def _conv2_same(img, kernel):
    # replicate-pad borders (≙ NPP's *Border replicate mode) — zero padding
    # would manufacture step edges at the image frame
    kh, kw = kernel.shape
    p = jnp.pad(img, ((kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    return jax.scipy.signal.convolve2d(p, kernel, mode="valid")


def _gauss_kernel(sigma: float, radius: int):
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x**2) / (2 * sigma**2))
    k = k / k.sum()
    return jnp.asarray(np.outer(k, k), jnp.float32)


@functools.partial(jax.jit, static_argnames=("low", "high"))
def canny(image, low: float = 0.1, high: float = 0.3):
    """Canny edge detector (≙ nppiFilterCannyBorder / NPP+ sample):
    Gaussian blur → Sobel gradients → non-max suppression → hysteresis by
    iterative strong-edge propagation. Thresholds are fractions of the max
    gradient magnitude. Returns a boolean edge map."""
    img = image.astype(jnp.float32)
    img = _conv2_same(img, _gauss_kernel(1.4, 2))
    sx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    gx = _conv2_same(img, sx)
    gy = _conv2_same(img, sx.T)
    mag = jnp.hypot(gx, gy)
    ang = jnp.arctan2(gy, gx)
    # quantize direction to 0/45/90/135
    d = jnp.round(ang / (jnp.pi / 4)).astype(jnp.int32) % 4

    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), axis=(0, 1))

    n1 = jnp.select(
        [d == 0, d == 1, d == 2, d == 3],
        [shift(mag, 0, 1), shift(mag, -1, 1), shift(mag, -1, 0), shift(mag, -1, -1)])
    n2 = jnp.select(
        [d == 0, d == 1, d == 2, d == 3],
        [shift(mag, 0, -1), shift(mag, 1, -1), shift(mag, 1, 0), shift(mag, 1, 1)])
    nms = jnp.where((mag >= n1) & (mag >= n2), mag, 0.0)
    mmax = jnp.max(nms)
    strong = nms >= high * mmax
    weak = nms >= low * mmax

    def body(state):
        s, _ = state
        grown = _neighbor_min(jnp.where(s, 0.0, 1.0), eight=True, pad_val=1.0) < 0.5
        new = s | (grown & weak)
        return new, jnp.any(new != s)

    edges, _ = jax.lax.while_loop(lambda st: st[1], body, (strong, jnp.bool_(True)))
    return edges


# ---------------- resize / watermark ----------------

@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(image, out_h: int, out_w: int):
    """Bilinear resize (≙ nppiResize / the nvJPEG resize pipeline).
    image: (H, W) or (H, W, C)."""
    h, w = image.shape[:2]
    ys = (jnp.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (jnp.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)
    img = image.astype(jnp.float32)

    def gather(yi, xi):
        return img[yi][:, xi]

    top = gather(y0, x0) * (1 - wx)[None, :, None] if img.ndim == 3 else gather(y0, x0) * (1 - wx)[None, :]
    if img.ndim == 3:
        top = top + gather(y0, x1) * wx[None, :, None]
        bot = gather(y1, x0) * (1 - wx)[None, :, None] + gather(y1, x1) * wx[None, :, None]
        out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    else:
        top = top + gather(y0, x1) * wx[None, :]
        bot = gather(y1, x0) * (1 - wx)[None, :] + gather(y1, x1) * wx[None, :]
        out = top * (1 - wy)[:, None] + bot * wy[:, None]
    return out.astype(image.dtype)


@jax.jit
def watermark(image, mark, alpha: float = 0.3):
    """Alpha-blend a watermark (≙ nppiAlphaComp in the Image-Resize-WaterMark
    pipeline). mark is broadcast/cropped to the image's top-left."""
    img = image.astype(jnp.float32)
    mh, mw = mark.shape[:2]
    region = img[:mh, :mw]
    blended = (1 - alpha) * region + alpha * mark.astype(jnp.float32)
    return img.at[:mh, :mw].set(blended).astype(image.dtype)


def jpeg_resize_watermark(blob: bytes, out_w: int = 0, out_h: int = 0,
                          mark=None, alpha: float = 0.3,
                          quality: int = 85) -> bytes:
    """Full decode → bilinear resize → optional watermark → encode JPEG
    pipeline (≙ nvJPEG/Image-Resize imageResize.cpp and
    Image-Resize-WaterMark/imageResizeWatermark.cpp:39-240:
    decodeResizeEncodeOneImage — nvjpegDecode + nppiResize_8u_C3R +
    alpha composite + nvjpegEncodeImage with a resize quality knob).

    ``out_w``/``out_h`` default to half the source dimensions, matching
    the sample's ``resizeWidth == 0`` behavior. ``mark`` is an optional
    uint8 watermark image blended into the top-left at ``alpha``. The
    pixel stages (resize + blend) run as device ops between the codec's
    own device pixel pipelines."""
    from tpumathlib.image.jpeg import jfif_decode, jfif_encode

    img = jfif_decode(blob)
    h, w = img.shape[:2]
    out_w = out_w or max(w // 2, 1)
    out_h = out_h or max(h // 2, 1)
    resized = resize_bilinear(jnp.asarray(img), out_h, out_w)
    if mark is not None:
        resized = watermark(resized, jnp.asarray(mark), alpha)
    return jfif_encode(np.asarray(resized), quality=quality)
