"""Arithmetic circuit DAG for BACE (batch circuit evaluation).

Reference parity: bace/circuit/{Circuit, Gate, InputGate, ConstantGate,
SumGate, ProductGate}.java.  Gates evaluate *vectorized*: a gate value is
a uint32[L, B] Montgomery limb tensor over B parallel evaluation points —
the reference evaluates one column per Spark task, here all columns are
one batched dataflow.
"""

from __future__ import annotations

import jax.numpy as jnp

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec, NUM_LIMBS
from octopuszk_tpu.utils.bigint import int_to_limbs


class Gate:
    pass


class InputGate(Gate):
    def __init__(self, index: int):
        self.index = index

    def degree(self):
        return 1


class ConstantGate(Gate):
    def __init__(self, value: int):
        self.value = value

    def degree(self):
        return 0


class SumGate(Gate):
    def __init__(self, left: Gate, right: Gate):
        self.left, self.right = left, right

    def degree(self):
        return max(self.left.degree(), self.right.degree())


class ProductGate(Gate):
    def __init__(self, left: Gate, right: Gate):
        self.left, self.right = left, right

    def degree(self):
        return self.left.degree() + self.right.degree()


class Circuit:
    """A circuit with one output gate over ``input_size`` inputs."""

    def __init__(self, input_size: int, output: Gate):
        self.input_size = input_size
        self.output = output

    def total_degree(self) -> int:
        return max(1, self.output.degree())

    def compute(self, spec: FieldSpec, inputs):
        """inputs: uint32[L, input_size, B] Montgomery -> uint32[L, B]."""
        memo = {}

        def ev(g: Gate):
            if id(g) in memo:
                return memo[id(g)]
            if isinstance(g, InputGate):
                v = inputs[:, g.index]
            elif isinstance(g, ConstantGate):
                v = jnp.broadcast_to(
                    jnp.asarray(int_to_limbs(
                        spec.to_mont(g.value % spec.p), NUM_LIMBS)
                    ).reshape((NUM_LIMBS,) + (1,) * (inputs.ndim - 2)),
                    (NUM_LIMBS,) + inputs.shape[2:])
            elif isinstance(g, SumGate):
                v = fp.add(spec, ev(g.left), ev(g.right))
            elif isinstance(g, ProductGate):
                v = fp.mont_mul(spec, ev(g.left), ev(g.right))
            else:
                raise TypeError(g)
            memo[id(g)] = v
            return v

        return ev(self.output)
