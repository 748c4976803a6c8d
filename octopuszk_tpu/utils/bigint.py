"""Host-side conversions between python ints and TPU limb tensors.

Field elements live on device as ``uint32[L, ...]`` arrays of 16-bit limbs
(little-endian limb order, limb axis *leading* so the batch axis lands on the
TPU 128-lane dimension).  These helpers convert between that representation
and python ints / lists of ints on the host.

Reference parity: replaces the JNI byte-marshaling convention of
OctopusZK (src/main/java/algebra/fft/FFTAuxiliary.java:40-52,
FixedBaseMSM.java:171-181) — there is no serialization boundary on TPU, so
these run only at program edges (test oracles, IO).
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, num_limbs: int) -> np.ndarray:
    """One python int -> uint32[num_limbs] little-endian 16-bit limbs."""
    if x < 0:
        raise ValueError("negative")
    out = np.empty(num_limbs, dtype=np.uint32)
    for i in range(num_limbs):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("value does not fit in limbs")
    return out


def limbs_to_int(limbs) -> int:
    """uint32[L] (or list) -> python int."""
    x = 0
    for i, v in enumerate(np.asarray(limbs, dtype=np.uint64).tolist()):
        x |= int(v) << (LIMB_BITS * i)
    return x


def ints_to_limbs(xs, num_limbs: int) -> np.ndarray:
    """List of n python ints -> uint32[num_limbs, n] (limb-major layout)."""
    from octopuszk_tpu.utils import native

    n = len(xs)
    nbytes = num_limbs * 2
    buf = bytearray(n * nbytes)
    for j, x in enumerate(xs):
        buf[j * nbytes:(j + 1) * nbytes] = int(x).to_bytes(nbytes, "little")
    got = native.bytes_to_limbs(bytes(buf), n, nbytes, num_limbs)
    if got is not None:
        return got
    arr = np.frombuffer(bytes(buf), dtype="<u2").reshape(n, num_limbs)
    return arr.T.astype(np.uint32)


def limbs_to_ints(limbs) -> list:
    """uint32[L, n] -> list of n python ints."""
    arr = np.asarray(limbs)
    if arr.ndim == 1:
        return [limbs_to_int(arr)]
    L, n = arr.shape[0], int(np.prod(arr.shape[1:]))
    arr = arr.reshape(L, n).T.astype("<u2")  # canonical limbs fit in u16
    raw = arr.tobytes()
    nbytes = L * 2
    return [int.from_bytes(raw[j * nbytes:(j + 1) * nbytes], "little")
            for j in range(n)]
