"""R1CS containers, synthetic construction, and QAP reduction tests.

Reference test parity: relations/R1CSConstructionTest.java,
reductions/R1CStoQAPRDDTest.java:62-106 (QAP relation & witness checked
against an independent oracle — here exact python-int math).
"""

import numpy as np
import pytest

from octopuszk_tpu.fields.spec import FR
from octopuszk_tpu.reductions import r1cs_to_qap as qap
from octopuszk_tpu.relations import construct
from octopuszk_tpu.relations.r1cs import (
    assignment_to_device, is_satisfied, make_sparse, matvec, rmatvec)
from octopuszk_tpu.utils.bigint import limbs_to_ints

pytestmark = pytest.mark.quick

P = FR.p


def _host(arr):
    return [FR.from_mont(v) for v in limbs_to_ints(np.asarray(arr))]


def test_sparse_matvec(rng):
    nr, ncol = 6, 5
    entries = [(r, c, rng.randrange(P))
               for r in range(nr) for c in range(ncol) if rng.random() < 0.6]
    m = make_sparse(FR, [e[0] for e in entries], [e[1] for e in entries],
                    [e[2] for e in entries], nr, ncol)
    z = [rng.randrange(P) for _ in range(ncol)]
    got = _host(matvec(FR, m, assignment_to_device(FR, z)))
    expect = [0] * nr
    for r, c, v in entries:
        expect[r] = (expect[r] + v * z[c]) % P
    assert got == expect
    w = [rng.randrange(P) for _ in range(nr)]
    gotT = _host(rmatvec(FR, m, assignment_to_device(FR, w)))
    expectT = [0] * ncol
    for r, c, v in entries:
        expectT[c] = (expectT[c] + v * w[r]) % P
    assert gotT == expectT


def test_dense_row_segment_sum(rng):
    # one row with many terms exercises the hierarchical chunk path
    ncol = 20000
    cols = list(range(ncol))
    vals = [rng.randrange(P) for _ in range(ncol)]
    m = make_sparse(FR, [0] * ncol, cols, vals, 1, ncol)
    z = [rng.randrange(P) for _ in range(ncol)]
    got = _host(matvec(FR, m, assignment_to_device(FR, z)))
    assert got == [sum(v * x for v, x in zip(vals, z)) % P]


@pytest.mark.parametrize("nc,ni", [(7, 2), (16, 5)])
def test_serial_construct_satisfied(nc, ni):
    r1cs, primary, aux = construct.serial_construct(nc, ni, seed=3)
    assert r1cs.is_valid()
    assert primary[0] == 1
    z = assignment_to_device(FR, primary + aux)
    assert bool(is_satisfied(FR, r1cs, z))
    # perturbed assignment must fail
    bad = list(primary + aux)
    bad[-1] = (bad[-1] + 1) % P
    assert not bool(is_satisfied(FR, r1cs, assignment_to_device(FR, bad)))


def test_qap_instance_vs_naive(rng):
    nc, ni = 7, 2
    r1cs, primary, aux = construct.serial_construct(nc, ni, seed=4)
    t = rng.randrange(P)
    inst = qap.qap_instance(FR, r1cs, t)
    n = qap.domain_size(r1cs)
    root = FR.rou_of_order(n)
    # naive Lagrange coefficients at t
    ws = [pow(root, i, P) for i in range(n)]
    zt = (pow(t, n, P) - 1) % P
    lag = []
    for i in range(n):
        li = zt * ws[i] % P * pow(n * (t - ws[i]) % P, -1, P) % P
        lag.append(li)
    # naive At/Bt/Ct via host matrices
    m = r1cs.num_variables
    at = [0] * m
    bt = [0] * m
    ct = [0] * m
    a_rows = np.asarray(r1cs.a.row).tolist()
    a_cols = np.asarray(r1cs.a.col).tolist()
    a_vals = _host(r1cs.a.val)
    for r, c, v in zip(a_rows, a_cols, a_vals):
        at[c] = (at[c] + lag[r] * v) % P
    for i in range(ni):
        at[i] = (at[i] + lag[nc + i]) % P
    for r, c, v in zip(np.asarray(r1cs.b.row).tolist(),
                       np.asarray(r1cs.b.col).tolist(), _host(r1cs.b.val)):
        bt[c] = (bt[c] + lag[r] * v) % P
    for r, c, v in zip(np.asarray(r1cs.c.row).tolist(),
                       np.asarray(r1cs.c.col).tolist(), _host(r1cs.c.val)):
        ct[c] = (ct[c] + lag[r] * v) % P
    assert _host(inst.at) == at
    assert _host(inst.bt) == bt
    assert _host(inst.ct) == ct
    assert _host(inst.ht) == [pow(t, i, P) for i in range(n + 1)]
    assert inst.zt == zt


def test_qap_witness_satisfies_qap(rng):
    """H must satisfy A(x)B(x) - C(x) = H(x) Z(x) at a random point."""
    nc, ni = 7, 2
    r1cs, primary, aux = construct.serial_construct(nc, ni, seed=5)
    n = qap.domain_size(r1cs)
    z = assignment_to_device(FR, primary + aux)
    h = qap.qap_witness(FR, r1cs, n, z)
    h_int = _host(h)
    assert h_int[-1] == 0 and h_int[-2] == 0  # degree <= n-2
    # evaluate the QAP identity at random t via the instance map
    t = rng.randrange(P)
    inst = qap.qap_instance(FR, r1cs, t)
    zf = primary + aux
    at = sum(a * w % P for a, w in zip(_host(inst.at), zf)) % P
    bt = sum(b * w % P for b, w in zip(_host(inst.bt), zf)) % P
    ct = sum(c * w % P for c, w in zip(_host(inst.ct), zf)) % P
    ht = sum(hc * pow(t, i, P) for i, hc in enumerate(h_int)) % P
    assert (at * bt - ct) % P == ht * inst.zt % P
