import random, time
import jax
from zkp_subnet_tpu.ops import msm as jmsm, curve as c
from zkp_subnet_tpu.utils import oracle as o
rnd = random.Random(22)
g = o.G1.from_affine(o.G1_GEN)
base_pts = [o.G1.mul(g, rnd.randrange(o.R)) for _ in range(256)]
P256 = c.g1_encode(base_pts)
for logn in [16, 20]:
    N = 1 << logn
    P = jax.numpy.tile(P256, (N // 256, 1, 1))
    S = c.fr_to_scalar_limbs([rnd.randrange(o.R) for _ in range(N)])
    t0 = time.time()
    res = jmsm.msm(P, S, window_bits=16); res.block_until_ready()
    print(f"2^{logn} compile+run {round(time.time()-t0,1)}", flush=True)
    for it in range(3):
        S2 = c.fr_to_scalar_limbs([rnd.randrange(o.R) for _ in range(N)])
        t0 = time.time()
        res = jmsm.msm(P, S2, window_bits=16)
        res.block_until_ready()
        dt = time.time()-t0
        print(f"2^{logn} run{it} {round(dt,3)}s -> {round(N/dt/1e6,2)} Mpts/s", flush=True)
