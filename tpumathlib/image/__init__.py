"""image — the NPP / NPP+ / nvJPEG / nvJPEG2000 / nvTIFF capability surface.

- ops: connected-component label markers + compression (≙ NPP
  batchedLabelMarkersAndCompression), watershed segmentation, Euclidean
  distance transform via jump-flooding (the parallel-banding-algorithm
  class NPP's distanceTransform implements), Canny edges (≙ nppCanny /
  NPP+ cannyEdgeDetector), flood fill (≙ NPP+ floodFill), contours
  (≙ findContour), resize + watermark (≙ nvJPEG Image-Resize-WaterMark)
- jpeg: TPU pixel pipeline (8×8 DCT on the MXU, quantization, YCbCr) with a
  host rANS entropy stage — the "host codec + TPU pixel pipeline" split
  SURVEY.md §2.10 prescribes for entropy-coded formats
- tiff: baseline TIFF reader/writer (uncompressed), region decode, image
  info, multi-image (chained IFDs), GeoTIFF tag read/write
  (≙ nvTIFF decode/encode/imageinfo/GeoTIFF samples)

Everything in ops is data-parallel jnp (VPU) with iteration expressed as
lax.while_loop/fori_loop — the TPU formulation of these queue-based CPU/GPU
algorithms.
"""

from tpumathlib.image.ops import (  # noqa: F401
    canny,
    distance_transform,
    flood_fill,
    find_contours,
    label_markers,
    label_markers_batched,
    label_compress,
    jpeg_resize_watermark,
    resize_bilinear,
    watermark,
    watershed,
)
from tpumathlib.image.jpeg import (  # noqa: F401
    dct8x8,
    idct8x8,
    jfif_decode,
    jfif_encode,
    jfif_encode_batch,
    jpeg_decode,
    jpeg_decode_batched,
    jpeg_encode,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
from tpumathlib.image.j2k import (  # noqa: F401
    j2k_decode,
    j2k_decode_batched,
    j2k_encode,
)
from tpumathlib.image.j2k_codestream import (  # noqa: F401
    j2k_decode_codestream,
)
from tpumathlib.image.tiff import (  # noqa: F401
    geotiff_read,
    geotiff_write,
    tiff_info,
    tiff_read,
    tiff_read_all,
    tiff_write,
)
