"""Field arithmetic: JAX limb engine vs the bigint oracle, bit-exact."""

import random

import numpy as np
import pytest

from zkp_subnet_tpu.ops.field import FR, FQ
from zkp_subnet_tpu.utils import oracle as o

FIELDS = [(FR, o.R), (FQ, o.Q)]


@pytest.mark.parametrize("F,P", FIELDS, ids=["fr", "fq"])
class TestFieldOps:
    def _pairs(self, P, n=32, seed=1):
        rnd = random.Random(seed)
        xs = [rnd.randrange(P) for _ in range(n)]
        ys = [rnd.randrange(P) for _ in range(n)]
        return xs, ys

    def test_roundtrip(self, F, P):
        xs, _ = self._pairs(P)
        assert F.decode(F.encode(xs)) == xs

    def test_add(self, F, P):
        xs, ys = self._pairs(P)
        got = F.decode(F.add(F.encode(xs), F.encode(ys)))
        assert got == [(x + y) % P for x, y in zip(xs, ys)]

    def test_sub(self, F, P):
        xs, ys = self._pairs(P)
        got = F.decode(F.sub(F.encode(xs), F.encode(ys)))
        assert got == [(x - y) % P for x, y in zip(xs, ys)]

    def test_mul(self, F, P):
        xs, ys = self._pairs(P)
        got = F.decode(F.mont_mul(F.encode(xs), F.encode(ys)))
        assert got == [x * y % P for x, y in zip(xs, ys)]

    def test_edge_cases(self, F, P):
        a = F.encode([0, 1, P - 1, P - 1, 0])
        b = F.encode([0, P - 1, P - 1, 1, P - 1])
        assert F.decode(F.add(a, b)) == [0, 0, P - 2, 0, P - 1]
        assert F.decode(F.sub(a, b)) == [0, 2, 0, P - 2, 1]
        assert F.decode(F.mont_mul(a, b)) == [0, P - 1, 1, P - 1, 0]

    def test_inv(self, F, P):
        xs, _ = self._pairs(P, n=8)
        got = F.decode(F.inv(F.encode(xs)))
        assert got == [pow(x, P - 2, P) for x in xs]

    def test_powers(self, F, P):
        x = 0xDEADBEEF12345678
        pw = F.decode(F.powers(F.encode([x])[0], 9))
        assert pw == [pow(x, k, P) for k in range(9)]

    def test_batch_shapes(self, F, P):
        xs, ys = self._pairs(P, n=12)
        a = F.encode(xs).reshape(3, 4, F.L)
        b = F.encode(ys).reshape(3, 4, F.L)
        got = F.decode(F.mont_mul(a, b))
        assert got == [x * y % P for x, y in zip(xs, ys)]
