"""Prime-field specifications: compile-time constants for limb arithmetic.

A ``FieldSpec`` packages everything the vectorized Montgomery kernels need
about one prime field: the modulus as python int and as a limb table, the
Montgomery constants (R = 2**256, n0inv = -p^-1 mod 2**16, R^2 mod p), and
2-adicity data for NTT domains.

Reference parity: the roles of BN254aFrParameters / BN254aFqParameters
(reference src/main/java/algebra/curves/barreto_naehrig/bn254a/
bn254a_parameters/BN254aFrParameters.java:33-47) — but expressed as
device-ready constant tensors instead of BigInteger objects.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from octopuszk_tpu.utils.bigint import int_to_limbs

NUM_LIMBS = 16          # 16 limbs x 16 bits = 256-bit containers
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = NUM_LIMBS * LIMB_BITS  # Montgomery radix R = 2**256


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Constants for one prime field, hashable so jitted fns can close over it."""

    name: str
    p: int                       # modulus
    generator: int               # multiplicative generator of F_p^*
    two_adicity: int             # s with p - 1 = t * 2**s, t odd
    root_of_unity: int           # element of order 2**two_adicity

    def __post_init__(self):
        assert self.p % 2 == 1 and self.p < (1 << R_BITS)

    # ---- derived python-int constants (cached) ----

    @functools.cached_property
    def r_mod_p(self) -> int:
        return (1 << R_BITS) % self.p

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return (1 << (2 * R_BITS)) % self.p

    @functools.cached_property
    def n0inv(self) -> int:
        """-p^-1 mod 2**LIMB_BITS (CIOS per-limb constant)."""
        return (-pow(self.p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def p_minus_2(self) -> int:
        return self.p - 2

    # ---- numpy constant tables ----

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.p, NUM_LIMBS)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.r2_mod_p, NUM_LIMBS)

    @functools.cached_property
    def one_mont_limbs(self) -> np.ndarray:
        """1 in Montgomery form, i.e. R mod p."""
        return int_to_limbs(self.r_mod_p, NUM_LIMBS)

    def wide_fixup_limbs(self, k: int, out_mont: bool) -> np.ndarray:
        """Montgomery factor fixing up a from_wide reduction of k REDC passes.

        After k extra REDC passes a wide value X becomes X * 2**(-16k) mod p;
        mont_mul by this constant yields X mod p (raw) or X*R mod p (mont).
        """
        e = LIMB_BITS * k + R_BITS + (R_BITS if out_mont else 0)
        return int_to_limbs(pow(2, e, self.p), NUM_LIMBS)

    # ---- field ops on python ints (host oracle) ----

    def to_mont(self, x: int) -> int:
        return (x << R_BITS) % self.p

    def from_mont(self, a: int) -> int:
        return (a * pow(1 << R_BITS, -1, self.p)) % self.p

    def rou_of_order(self, order: int) -> int:
        """Root of unity of the given power-of-two order.

        Reference: Fp.rootOfUnity (algebra/fields/Fp.java:98-102).
        """
        assert order & (order - 1) == 0
        log = order.bit_length() - 1
        assert log <= self.two_adicity, "domain too large for field 2-adicity"
        return pow(self.root_of_unity, 1 << (self.two_adicity - log), self.p)

    def __hash__(self):
        return hash((self.name, self.p))


# BN254 ("BN254a" in DIZK / alt_bn128): the curve the reference GPU kernels
# hard-code (algebra_msm_VariableBaseMSM.cu:58-71).
FR = FieldSpec(
    name="bn254_fr",
    p=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    generator=5,
    two_adicity=28,
    root_of_unity=19103219067921713944291392827692070036145651957329286315305642004821462161904,
)

FQ = FieldSpec(
    name="bn254_fq",
    p=21888242871839275222246405745257275088696311157297823662689037894645226208583,
    generator=3,
    two_adicity=1,
    root_of_unity=21888242871839275222246405745257275088696311157297823662689037894645226208582,
)

# Small/Large non-curve test fields — the role of the reference's
# Small/LargeFpParameters (algebra/fields/fieldparameters/): exercise the
# generic limb kernels at different moduli.  SMALL has high 2-adicity so
# NTT domains exist: p = 1 + 2^32 * 3 * 5 * q ... chosen 2-adicity 32.
SMALL = FieldSpec(
    name="small_fp",
    p=4179340454199820289,          # 29 * 2^57 + 1, a 62-bit NTT prime
    generator=3,
    two_adicity=57,
    root_of_unity=pow(3, 29, 4179340454199820289),
)

LARGE = FieldSpec(
    name="large_fp",
    # the BLS12-381 scalar field: a second 255-bit prime with 2-adicity 32
    p=52435875175126190479447740508185965837690552500527637822603658699938581184513,
    generator=7,
    two_adicity=32,
    root_of_unity=pow(
        7,
        (52435875175126190479447740508185965837690552500527637822603658699938581184513 - 1) >> 32,
        52435875175126190479447740508185965837690552500527637822603658699938581184513),
)
