"""pqc — the cuPQC capability surface (device-parallel crypto primitives).

- sha256: the full SHA-256 compression schedule in vectorized int32/uint32
  jnp ops, batched over messages — the TPU analogue of cuPQC's
  block-parallel hashing (one VPU lane-set per message instead of one CUDA
  thread block). Bitwise-verified against hashlib.
- merkle_root: binary Merkle tree over batched sha256 (≙ example_merkle).
- NTT: the ML-KEM/Kyber negacyclic number-theoretic transform over
  Z_3329[x]/(x^256+1) — forward/inverse NTT and polynomial multiplication,
  the core primitive of example_ml_kem (full KEM: later round).
"""

from tpumathlib.pqc.sha256 import sha256, merkle_root  # noqa: F401
from tpumathlib.pqc.ntt import kyber_ntt, kyber_intt, kyber_polymul  # noqa: F401
