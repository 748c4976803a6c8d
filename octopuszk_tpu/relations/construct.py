"""Synthetic R1CS workload generator.

Reference parity: profiler/generation/R1CSConstruction.serialConstruct
(R1CSConstruction.java:28-111) — a Fibonacci-style chain of alternating
``a + b = c`` / ``a * b = c`` constraints closed by one dense constraint
``(sum of all chain variables)^2 = last variable``.  Tests and profiler
sweeps depend on these exact semantics (the dense final constraint also
exercises the hierarchical segment-sum path).
"""

from __future__ import annotations

import random

from octopuszk_tpu.fields.spec import FieldSpec, FR
from octopuszk_tpu.relations.r1cs import R1CS, make_sparse


def serial_construct(num_constraints: int, num_inputs: int,
                     seed: int = 0, spec: FieldSpec = FR):
    """Build (r1cs, primary, auxiliary) with host-int assignments.

    primary = full_assignment[:num_inputs] (index 0 is the constant one),
    auxiliary = the rest — exactly the reference's split.
    """
    assert num_inputs <= num_constraints + 1
    p = spec.p
    rng = random.Random(seed)
    num_aux = 3 + num_constraints - num_inputs
    num_vars = num_inputs + num_aux

    a = rng.randrange(p)
    b = rng.randrange(p)
    assignment = [1, a, b]

    rows_a, cols_a, vals_a = [], [], []
    rows_b, cols_b, vals_b = [], [], []
    rows_c, cols_c, vals_c = [], [], []

    for i in range(num_constraints - 1):
        if i % 2 != 0:
            # a * b = c
            rows_a.append(i); cols_a.append(i + 1); vals_a.append(1)
            rows_b.append(i); cols_b.append(i + 2); vals_b.append(1)
            rows_c.append(i); cols_c.append(i + 3); vals_c.append(1)
            tmp = a * b % p
        else:
            # (a + b) * 1 = c
            rows_a.append(i); cols_a.append(i + 1); vals_a.append(1)
            rows_a.append(i); cols_a.append(i + 2); vals_a.append(1)
            rows_b.append(i); cols_b.append(0); vals_b.append(1)
            rows_c.append(i); cols_c.append(i + 3); vals_c.append(1)
            tmp = (a + b) % p
        a, b = b, tmp
        assignment.append(tmp)

    # final dense constraint: (sum_{i=1}^{numVars-2} z_i)^2 = z_{numVars-1}
    last = num_constraints - 1
    res = 0
    for i in range(1, num_vars - 1):
        rows_a.append(last); cols_a.append(i); vals_a.append(1)
        rows_b.append(last); cols_b.append(i); vals_b.append(1)
        res = (res + assignment[i]) % p
    rows_c.append(last); cols_c.append(num_vars - 1); vals_c.append(1)
    assignment.append(res * res % p)

    r1cs = R1CS(
        a=make_sparse(spec, rows_a, cols_a, vals_a, num_constraints, num_vars),
        b=make_sparse(spec, rows_b, cols_b, vals_b, num_constraints, num_vars),
        c=make_sparse(spec, rows_c, cols_c, vals_c, num_constraints, num_vars),
        num_constraints=num_constraints,
        num_inputs=num_inputs,
        num_variables=num_vars)
    assert len(assignment) == num_vars
    return r1cs, assignment[:num_inputs], assignment[num_inputs:]
