"""pqc — the cuPQC capability surface (device-parallel crypto primitives).

- sha256: the full SHA-256 compression schedule in vectorized int32/uint32
  jnp ops, batched over messages — the TPU analogue of cuPQC's
  block-parallel hashing (one VPU lane-set per message instead of one CUDA
  thread block). Bitwise-verified against hashlib.
- keccak/SHA3: Keccak-f[1600] with planar (hi, lo) uint32 lanes (no
  uint64 on this backend), batched; sha3_256/sha3_512/shake128/shake256,
  bitwise-verified against hashlib (≙ cuPQC SHA3 samples).
- merkle_root: binary Merkle tree over batched sha256 (≙ example_merkle).
- NTT: the ML-KEM/Kyber negacyclic number-theoretic transform over
  Z_3329[x]/(x^256+1) — forward/inverse NTT and polynomial multiplication.
- ML-KEM (FIPS 203): full KeyGen/Encaps/Decaps at 512/768/1024 with
  device NTT arithmetic and Keccak hash plumbing (≙ example_ml_kem).
- ML-DSA (FIPS 204, ML-DSA-44): KeyGen/Sign/Verify — device NTT over
  q=8380417 in uint32 Montgomery form, host-driven abort loop
  (≙ example_ml_dsa).
- Poseidon2: the ZK-friendly permutation + sponge over BabyBear in uint32
  Montgomery arithmetic (≙ cuPQC Poseidon2 samples).
"""

from tpumathlib.pqc.sha256 import sha256, merkle_root  # noqa: F401
from tpumathlib.pqc.ntt import kyber_ntt, kyber_intt, kyber_polymul  # noqa: F401
from tpumathlib.pqc.keccak import (  # noqa: F401
    keccak_f,
    sha3_256,
    sha3_512,
    shake128,
    shake256,
)
from tpumathlib.pqc import mlkem  # noqa: F401
from tpumathlib.pqc import mldsa  # noqa: F401
from tpumathlib.pqc.poseidon2 import (  # noqa: F401
    poseidon2_hash,
    poseidon2_permute,
)
