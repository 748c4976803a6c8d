"""Application R1CS constructions: matmul, linear regression, covariance.

Reference parity: profiler/generation/R1CSConstruction.java —
``matmulConstruct`` (…java:509+, products Z + sum chain S verifying
C = A*B over public matrices), ``linear regression`` (…java:1693+) and
``gaussian`` covariance (…java:2204+).  Re-designed with the same
capability: verifiable matrix products with public matrix inputs, product
auxiliaries and sum constraints, built as COO arrays (no Spark
partition plumbing needed — the arrays ARE the distributed layout).
"""

from __future__ import annotations

import random

from octopuszk_tpu.fields.spec import FieldSpec, FR
from octopuszk_tpu.relations.r1cs import R1CS, make_sparse


class _Builder:
    def __init__(self):
        self.ra, self.ca, self.va = [], [], []
        self.rb, self.cb, self.vb = [], [], []
        self.rc, self.cc, self.vc = [], [], []
        self.n = 0

    def constraint(self, a_terms, b_terms, c_terms):
        i = self.n
        for c, v in a_terms:
            self.ra.append(i); self.ca.append(c); self.va.append(v)
        for c, v in b_terms:
            self.rb.append(i); self.cb.append(c); self.vb.append(v)
        for c, v in c_terms:
            self.rc.append(i); self.cc.append(c); self.vc.append(v)
        self.n += 1

    def build(self, spec, num_inputs, num_vars):
        return R1CS(
            a=make_sparse(spec, self.ra, self.ca, self.va, self.n, num_vars),
            b=make_sparse(spec, self.rb, self.cb, self.vb, self.n, num_vars),
            c=make_sparse(spec, self.rc, self.cc, self.vc, self.n, num_vars),
            num_constraints=self.n,
            num_inputs=num_inputs,
            num_variables=num_vars)


def matmul_construct(n1: int, n2: int, n3: int, seed: int = 0,
                     spec: FieldSpec = FR):
    """R1CS verifying C = A @ B for public A (n1 x n2), B (n2 x n3),
    C (n1 x n3); auxiliaries are the n1*n3*n2 products Z.

    Returns (r1cs, primary, auxiliary) host-int assignments.
    Reference: R1CSConstruction.matmulConstruct (…java:509-780).
    """
    p = spec.p
    rng = random.Random(seed)
    a_vals = [[rng.randrange(p) for _ in range(n2)] for _ in range(n1)]
    b_vals = [[rng.randrange(p) for _ in range(n3)] for _ in range(n2)]
    c_vals = [[sum(a_vals[r][j] * b_vals[j][c] for j in range(n2)) % p
               for c in range(n3)] for r in range(n1)]

    # variable layout: [one | A | B | C | Z]
    a0 = 1
    b0 = a0 + n1 * n2
    c0 = b0 + n2 * n3
    z0 = c0 + n1 * n3
    num_inputs = z0
    num_vars = z0 + n1 * n3 * n2

    def a_idx(r, j):
        return a0 + r * n2 + j

    def b_idx(j, c):
        return b0 + j * n3 + c

    def c_idx(r, c):
        return c0 + r * n3 + c

    def z_idx(r, c, j):
        return z0 + (r * n3 + c) * n2 + j

    bld = _Builder()
    for r in range(n1):
        for c in range(n3):
            for j in range(n2):
                # A[r,j] * B[j,c] = Z[r,c,j]
                bld.constraint([(a_idx(r, j), 1)], [(b_idx(j, c), 1)],
                               [(z_idx(r, c, j), 1)])
            # (sum_j Z[r,c,j]) * 1 = C[r,c]
            bld.constraint([(z_idx(r, c, j), 1) for j in range(n2)],
                           [(0, 1)], [(c_idx(r, c), 1)])

    r1cs = bld.build(spec, num_inputs, num_vars)
    assignment = [1]
    assignment += [a_vals[r][j] for r in range(n1) for j in range(n2)]
    assignment += [b_vals[j][c] for j in range(n2) for c in range(n3)]
    assignment += [c_vals[r][c] for r in range(n1) for c in range(n3)]
    z_assign = [a_vals[r][j] * b_vals[j][c] % p
                for r in range(n1) for c in range(n3) for j in range(n2)]
    assignment += z_assign
    return r1cs, assignment[:num_inputs], assignment[num_inputs:]


def lr_construct(n: int, d: int, seed: int = 0, spec: FieldSpec = FR):
    """Linear-regression check: public X (n x d), w (d), y (n), rss;
    verifies yhat = X @ w and rss = sum (yhat_i - y_i)^2.

    Reference: R1CSConstruction LR application (…java:1693+).
    """
    p = spec.p
    rng = random.Random(seed)
    x_vals = [[rng.randrange(p) for _ in range(d)] for _ in range(n)]
    w_vals = [rng.randrange(p) for _ in range(d)]
    y_vals = [rng.randrange(p) for _ in range(n)]
    yhat = [sum(x_vals[i][j] * w_vals[j] for j in range(d)) % p
            for i in range(n)]
    resid = [(yh - y) % p for yh, y in zip(yhat, y_vals)]
    rss = sum(r * r for r in resid) % p

    # variables: [one | X | w | y | rss | Z products | yhat | R^2 squares]
    x0 = 1
    w0 = x0 + n * d
    y0 = w0 + d
    rss_i = y0 + n
    z0 = rss_i + 1
    yh0 = z0 + n * d
    sq0 = yh0 + n
    num_inputs = z0
    num_vars = sq0 + n

    bld = _Builder()
    for i in range(n):
        for j in range(d):
            # X[i,j] * w[j] = Z[i,j]
            bld.constraint([(x0 + i * d + j, 1)], [(w0 + j, 1)],
                           [(z0 + i * d + j, 1)])
        # (sum_j Z[i,j]) * 1 = yhat_i
        bld.constraint([(z0 + i * d + j, 1) for j in range(d)],
                       [(0, 1)], [(yh0 + i, 1)])
        # (yhat_i - y_i) * (yhat_i - y_i) = sq_i
        diff = [(yh0 + i, 1), (y0 + i, p - 1)]
        bld.constraint(diff, diff, [(sq0 + i, 1)])
    # (sum_i sq_i) * 1 = rss
    bld.constraint([(sq0 + i, 1) for i in range(n)], [(0, 1)],
                   [(rss_i, 1)])

    r1cs = bld.build(spec, num_inputs, num_vars)
    assignment = [1]
    assignment += [x_vals[i][j] for i in range(n) for j in range(d)]
    assignment += w_vals + y_vals + [rss]
    assignment += [x_vals[i][j] * w_vals[j] % p
                   for i in range(n) for j in range(d)]
    assignment += yhat
    assignment += [r * r % p for r in resid]
    return r1cs, assignment[:num_inputs], assignment[num_inputs:]


def gaussian_construct(n: int, d: int, seed: int = 0,
                       spec: FieldSpec = FR):
    """Covariance check: public X (n x d) and S (d x d); verifies
    S = X^T @ X (the Gaussian-fit sufficient statistic).

    Reference: R1CSConstruction gaussian application (…java:2204+).
    """
    p = spec.p
    rng = random.Random(seed)
    x_vals = [[rng.randrange(p) for _ in range(d)] for _ in range(n)]
    s_vals = [[sum(x_vals[k][i] * x_vals[k][j] for k in range(n)) % p
               for j in range(d)] for i in range(d)]

    # variables: [one | X | S | Z products]
    x0 = 1
    s0 = x0 + n * d
    z0 = s0 + d * d
    num_inputs = z0
    num_vars = z0 + d * d * n

    bld = _Builder()
    for i in range(d):
        for j in range(d):
            for k in range(n):
                # X[k,i] * X[k,j] = Z[i,j,k]
                bld.constraint([(x0 + k * d + i, 1)], [(x0 + k * d + j, 1)],
                               [(z0 + (i * d + j) * n + k, 1)])
            bld.constraint([(z0 + (i * d + j) * n + k, 1)
                            for k in range(n)],
                           [(0, 1)], [(s0 + i * d + j, 1)])

    r1cs = bld.build(spec, num_inputs, num_vars)
    assignment = [1]
    assignment += [x_vals[k][i] for k in range(n) for i in range(d)]
    assignment += [s_vals[i][j] for i in range(d) for j in range(d)]
    assignment += [x_vals[k][i] * x_vals[k][j] % p
                   for i in range(d) for j in range(d) for k in range(n)]
    return r1cs, assignment[:num_inputs], assignment[num_inputs:]
