"""Application circuit tests: matmul / linear-regression / covariance.

Reference test parity: relations/MatMulTest.java:107-113 (matmul R1CS
satisfiability incl. LR constructs).
"""

import pytest

from octopuszk_tpu.fields.spec import FR
from octopuszk_tpu.relations import apps
from octopuszk_tpu.relations.r1cs import assignment_to_device, is_satisfied

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("dims", [(2, 3, 2), (1, 1, 1), (3, 2, 4)])
def test_matmul_satisfied(dims):
    n1, n2, n3 = dims
    r1cs, primary, aux = apps.matmul_construct(n1, n2, n3, seed=41)
    assert r1cs.is_valid()
    z = assignment_to_device(FR, primary + aux)
    assert bool(is_satisfied(FR, r1cs, z))
    # tampering with C must break it
    bad = list(primary)
    c_pos = 1 + n1 * n2 + n2 * n3
    bad[c_pos] = (bad[c_pos] + 1) % FR.p
    assert not bool(is_satisfied(FR, r1cs, assignment_to_device(
        FR, bad + aux)))


def test_lr_satisfied():
    r1cs, primary, aux = apps.lr_construct(4, 3, seed=42)
    z = assignment_to_device(FR, primary + aux)
    assert bool(is_satisfied(FR, r1cs, z))
    bad = list(primary)
    bad[-1] = (bad[-1] + 1) % FR.p   # rss is the last primary input
    assert not bool(is_satisfied(FR, r1cs, assignment_to_device(
        FR, bad + aux)))


def test_gaussian_satisfied():
    r1cs, primary, aux = apps.gaussian_construct(4, 2, seed=43)
    z = assignment_to_device(FR, primary + aux)
    assert bool(is_satisfied(FR, r1cs, z))


# (the matmul Groth16 end-to-end lives in test_groth16.py — slow tier;
# the quick-tier e2e is test_msm_quick.test_groth16_e2e_small, whose
# shapes share compiled executables with the MSM tests there)
