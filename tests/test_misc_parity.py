"""Planar-complex Lt matmul, mp_laset, benchmarks-module smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpumathlib.blas.lt import matmul_planar
from tpumathlib.core import assert_allclose
from tpumathlib.mp import Grid
from tpumathlib.mp.solver import mp_laset


def test_matmul_planar(rng):
    a = rng.normal(size=(16, 24)) + 1j * rng.normal(size=(16, 24))
    b = rng.normal(size=(24, 12)) + 1j * rng.normal(size=(24, 12))
    for use_3m in (True, False):
        dr, di = matmul_planar(jnp.asarray(a.real, jnp.float32),
                               jnp.asarray(a.imag, jnp.float32),
                               jnp.asarray(b.real, jnp.float32),
                               jnp.asarray(b.imag, jnp.float32),
                               alpha=2.0, use_3m=use_3m)
        want = 2.0 * a @ b
        assert_allclose(np.asarray(dr) + 1j * np.asarray(di), want, rtol=1e-4)


def test_mp_laset():
    grid = Grid.create(jax.devices())
    m = mp_laset((16, 16), grid, alpha=0.5, beta=3.0)
    mn = np.asarray(m)
    assert np.allclose(np.diag(mn), 3.0)
    assert np.allclose(mn[0, 1], 0.5)
    lo = np.asarray(mp_laset((16, 16), grid, alpha=1.0, beta=2.0, uplo="L"))
    assert np.allclose(np.triu(lo, 1), 0.0)
    assert np.allclose(np.diag(lo), 2.0)


def test_benchmarks_smoke():
    """The harness runs end-to-end on small problems (CPU)."""
    from tpumathlib import benchmarks

    g = benchmarks.bench_gemm(128, 128, 128, "float32")
    assert g["tflops"] > 0
    f = benchmarks.bench_fft(16, 256)
    assert f["gflops"] > 0
    s = benchmarks.bench_spmv(1000, 8)
    assert s["gbps"] > 0
    c = benchmarks.bench_compression("lz4", size=1 << 16)
    assert c["ratio"] > 1.0


# ---------------- cuPQC round-2 breadth ----------------

def test_sha3_shake_vs_hashlib(rng):
    """Keccak family bitwise vs hashlib (≙ cuPQC SHA3 samples)."""
    import hashlib

    from tpumathlib.pqc import sha3_256, sha3_512, shake128, shake256

    msgs = [b"", b"abc", rng.bytes(135), rng.bytes(136), rng.bytes(137),
            rng.bytes(500)]
    for m in msgs:
        assert sha3_256(m) == hashlib.sha3_256(m).digest()
        assert sha3_512(m) == hashlib.sha3_512(m).digest()
        assert shake128(m, 99) == hashlib.shake_128(m).digest(99)
        assert shake256(m, 64) == hashlib.shake_256(m).digest(64)
    outs = sha3_256([b"x", b"y", b"x" * 200])
    assert outs[2] == hashlib.sha3_256(b"x" * 200).digest()


def test_ml_kem_full(rng):
    """FIPS 203 ML-KEM end-to-end (≙ cuPQC example_ml_kem): object sizes,
    encaps/decaps agreement, implicit rejection on tampering."""
    from tpumathlib.pqc import mlkem

    for level in (512, 768, 1024):
        ek, dk = mlkem.keygen(rng.bytes(64), level)
        sz = mlkem.sizes(level)
        assert len(ek) == sz["ek"] and len(dk) == sz["dk"]
        k1, c = mlkem.encaps(ek, rng.bytes(32), level)
        assert len(c) == sz["ct"] and len(k1) == sz["ss"]
        assert mlkem.decaps(dk, c, level) == k1
        bad = bytes([c[0] ^ 1]) + c[1:]
        k3 = mlkem.decaps(dk, bad, level)
        assert k3 != k1 and len(k3) == 32
        # implicit rejection is deterministic
        assert mlkem.decaps(dk, bad, level) == k3


def test_poseidon2(rng):
    """Poseidon2/BabyBear: Montgomery arithmetic exactness, determinism,
    full avalanche, sponge digests in-field."""
    import jax.numpy as jnp

    from tpumathlib.pqc.poseidon2 import (
        P, _from_mont, _montmul, _to_mont, poseidon2_hash, poseidon2_permute)

    a = rng.integers(0, P, 500).astype(np.uint32)
    b = rng.integers(0, P, 500).astype(np.uint32)
    got = np.asarray(_from_mont(_montmul(_to_mont(jnp.asarray(a)),
                                         _to_mont(jnp.asarray(b)))))
    ref = (a.astype(object) * b.astype(object)) % P
    assert np.array_equal(got.astype(object), ref)
    s = rng.integers(0, P, (32, 16)).astype(np.uint32)
    o1 = np.asarray(poseidon2_permute(s))
    s2 = s.copy()
    s2[:, 3] ^= 2
    o2 = np.asarray(poseidon2_permute(s2))
    assert (o1 != o2).mean() > 0.95
    h = poseidon2_hash(rng.integers(0, P, (3, 20)))
    assert h.shape == (3, 8) and (h < P).all()


def test_ml_dsa(rng):
    """FIPS 204 ML-DSA-44 (≙ cuPQC example_ml_dsa): device NTT exactness,
    FIPS object sizes, sign/verify round-trip, tamper rejection."""
    import jax.numpy as jnp

    from tpumathlib.pqc import mldsa

    a = rng.integers(0, mldsa.Q, 256).astype(np.int64)
    rt = np.asarray(mldsa.intt(mldsa.ntt(jnp.asarray(a))), np.int64)
    np.testing.assert_array_equal(rt % mldsa.Q, a % mldsa.Q)
    pk, sk = mldsa.keygen(rng.bytes(32))
    assert len(pk) == mldsa.sizes()["pk"] == 1312
    sig = mldsa.sign(sk, b"tpumathlib")
    assert len(sig) == mldsa.sizes()["sig"] == 2420
    assert mldsa.verify(pk, b"tpumathlib", sig)
    assert not mldsa.verify(pk, b"tpumathlib!", sig)
    sig2 = sig[:50] + bytes([sig[50] ^ 1]) + sig[51:]
    assert not mldsa.verify(pk, b"tpumathlib", sig2)
    # hint canonicality (FIPS 204 Alg 21): swapping two hint position
    # bytes, or writing junk into the zero padding after the final hint,
    # must invalidate the signature (strong unforgeability)
    zoff = 32 + 18 * 32 * mldsa.L
    hints = bytearray(sig[zoff:])
    counts = [hints[mldsa.OMEGA + i] for i in range(mldsa.K)]
    prev = 0
    for i in range(mldsa.K):  # first polynomial holding >= 2 hints
        if counts[i] - prev >= 2:
            swapped = bytearray(hints)
            swapped[prev], swapped[prev + 1] = swapped[prev + 1], swapped[prev]
            assert not mldsa.verify(pk, b"tpumathlib",
                                    sig[:zoff] + bytes(swapped))
            break
        prev = counts[i]
    if counts[-1] < mldsa.OMEGA:
        padded = bytearray(hints)
        padded[mldsa.OMEGA - 1] = 7  # nonzero padding byte
        assert not mldsa.verify(pk, b"tpumathlib", sig[:zoff] + bytes(padded))


def test_pqc_pinned_kats():
    """Pinned known-answer vectors (tests/fixtures/pqc_kat.json): freeze the
    exact byte encodings of ML-KEM-512/768/1024 keygen/encaps/decaps (incl.
    the implicit-rejection secret), deterministic ML-DSA-44 keygen/sign, and
    a Poseidon2 digest, so any drift in NTT convention, sampler, or codec
    fails loudly. Generated once from this implementation (no external FIPS
    vectors exist in the zero-egress image — interop caveat documented in
    the fixture's _note). ≙ cuPQC example_ml_kem.cu / example_ml_dsa.cu."""
    import hashlib
    import json
    import pathlib

    from tpumathlib.pqc import mldsa, mlkem
    from tpumathlib.pqc.poseidon2 import poseidon2_hash

    kat = json.loads((pathlib.Path(__file__).parent / "fixtures"
                      / "pqc_kat.json").read_text())
    h = lambda b: hashlib.sha256(b).hexdigest()

    for level_s, v in kat["ml_kem"].items():
        level = int(level_s)
        ek, dk = mlkem.keygen(bytes.fromhex(v["seed"]), level)
        assert h(ek) == v["ek_sha256"] and h(dk) == v["dk_sha256"]
        ss, ct = mlkem.encaps(ek, bytes.fromhex(v["m"]), level)
        assert h(ct) == v["ct_sha256"] and ss.hex() == v["ss"]
        assert mlkem.decaps(dk, ct, level) == ss
        bad = bytes([ct[0] ^ 1]) + ct[1:]
        assert mlkem.decaps(dk, bad, level).hex() == v["kbar"]

    d = kat["ml_dsa_44"]
    pk, sk = mldsa.keygen(bytes.fromhex(d["xi"]))
    assert h(pk) == d["pk_sha256"]
    sig = mldsa.sign(sk, d["msg"].encode())
    assert h(sig) == d["sig_sha256"]
    assert mldsa.verify(pk, d["msg"].encode(), sig)

    st = (np.arange(48, dtype=np.uint32).reshape(3, 16)
          * np.uint32(2654435761)) % np.uint32(2013265921)
    dig = np.asarray(poseidon2_hash(st))
    np.testing.assert_array_equal(dig, np.asarray(kat["poseidon2_babybear"]
                                                  ["digest"], dig.dtype))
