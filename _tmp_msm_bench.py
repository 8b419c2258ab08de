import random, time
import jax
import numpy as np
from zkp_subnet_tpu.ops import msm as jmsm, curve as c
from zkp_subnet_tpu.ops.field import FQ
from zkp_subnet_tpu.utils import oracle as o
print(jax.devices(), flush=True)
rnd = random.Random(21)
g = o.G1.from_affine(o.G1_GEN)

# build N=2^16 distinct points cheaply: random multiples via doubling chain on device
N = 1 << 16
base_pts = [o.G1.mul(g, rnd.randrange(o.R)) for _ in range(256)]
P256 = c.g1_encode(base_pts)
# tile to N by scalar-multiplying each tile by a distinct small factor (device)
P = jax.numpy.tile(P256, (N // 256, 1, 1))
ks = [rnd.randrange(o.R) for _ in range(N)]
S = c.fr_to_scalar_limbs(ks)

for wb in [16, 8]:
    t0 = time.time()
    res = jmsm.msm(P, S, window_bits=wb); res.block_until_ready()
    print(f"msm(2^16,wb{wb}) compile+run", round(time.time()-t0,1), flush=True)
    t0 = time.time()
    res = jmsm.msm(P, S, window_bits=wb); res.block_until_ready()
    print(f"msm(2^16,wb{wb}) run", round(time.time()-t0,3), flush=True)
    print(f"wb{wb} result:", o.G1.to_affine(c.g1_decode(res[None])[0])[0] % 1000003, flush=True)

# cross-check wb8 vs wb16 (different code paths)
r16 = c.g1_decode(jmsm.msm(P, S, window_bits=16)[None])[0]
r8 = c.g1_decode(jmsm.msm(P, S, window_bits=8)[None])[0]
assert o.G1.to_affine(r16) == o.G1.to_affine(r8), "wb8 vs wb16 mismatch"
print("wb8 == wb16 CONSISTENT", flush=True)

# oracle check on a small slice with same code path at 2^16 scale... partial:
# verify against oracle with N=512 (absolute)
N2 = 512
pts2 = base_pts + base_pts[:256]
pts2 = [o.G1.mul(g, rnd.randrange(o.R)) for _ in range(N2)]
ks2 = [rnd.randrange(o.R) for _ in range(N2)]
res2 = jmsm.msm(c.g1_encode(pts2), c.fr_to_scalar_limbs(ks2), window_bits=16)
got = o.G1.to_affine(c.g1_decode(res2[None])[0])
acc = o.G1.infinity()
for p, k in zip(pts2, ks2): acc = o.G1.add(acc, o.G1.mul(p, k))
assert got == o.G1.to_affine(acc), "oracle mismatch at 512"
print("msm(512,wb16) matches oracle", flush=True)
