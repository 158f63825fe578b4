"""fft — the cuFFT / cuFFTMp capability surface, TPU-native.

- plan:        cuFFT-style plan/exec lifecycle (plan_1d/2d/3d/many, C2C/R2C/
               C2R, batched, fwd/inv) with plan cache and fused load/store
               callbacks (≙ cuFFT LTO callbacks)
- distributed: slab + pencil decompositions over meshes and the standalone
               reshape (redistribution) API (≙ cuFFTMp, incl. the xfft
               pure-JAX design the reference itself ships)
- kernels:     Pallas Stockham FFT stages (the tuned local engine)

Default local engine is XLA's FFT (jnp.fft) — on TPU this is the production
path the reference's own JAX_FFT sample uses; the Pallas engine targets
fused-callback and odd-radix cases.
"""

from tpumathlib.fft.plan import (  # noqa: F401
    FftPlan,
    FftType,
    Direction,
    plan_1d,
    plan_2d,
    plan_3d,
    plan_many,
    fft,
    ifft,
    rfft,
    irfft,
)
from tpumathlib.fft.stockham import dif_fft  # noqa: F401
from tpumathlib.fft.distributed import (  # noqa: F401
    Box,
    DistributedFftPlan,
    fft_slab,
    fft_pencil,
    reshape as mp_reshape,
    local_box,
)
