"""rand — the cuRAND capability surface, TPU-native.

Generator families (≙ cuRAND/Host/ 9 families × 4 distributions):
- philox:   exact Philox4x32-10 (counter-based → embarrassingly parallel on
            the VPU; bitwise-verified against the Random123 known-answer
            vectors, matching the reference's device-vs-host bitwise check)
- threefry: JAX's native counter-based PRNG, wrapped with cuRAND
            seed/offset/ordering semantics
- xorwow / mrg32k3a: exact sequential recurrences under lax.scan (these
            families are inherently serial; offset = skip-ahead)
- mt19937:  device-side Mersenne Twister (vectorized 3-pass twist under
            lax.scan), bit-exact vs NumPy's RandomState
- mtgp32:   the GPU Mersenne variant's per-block-independent-streams design
            rendered TPU-native: N device MT19937 streams under one
            vectorized scan, block-interleaved output
- sobol32/sobol64 (+scrambled): quasi-random with embedded Joe–Kuo
            new-joe-kuo-6.21201 direction vectors, Gray-code device
            generation, digital-shift scrambling (64-bit words are planar
            (hi, lo) uint32 pairs on device)

Distributions: uniform, normal (Box–Muller), lognormal, poisson — transforms
over raw bits from any generator (≙ curandGenerateUniform/Normal/LogNormal/
Poisson).
"""

from tpumathlib.rand.generators import (  # noqa: F401
    PhiloxGenerator,
    ThreefryGenerator,
    XorwowGenerator,
    Mrg32k3aGenerator,
    Mt19937Generator,
    Mtgp32Generator,
    philox4x32_10,
)
from tpumathlib.rand.distributions import (  # noqa: F401
    bits_to_uniform,
    bits_to_normal,
    bits_to_lognormal,
    bits_to_poisson,
)
from tpumathlib.rand.sobol import SobolGenerator  # noqa: F401
