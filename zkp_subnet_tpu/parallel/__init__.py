"""Multi-chip sharding: mesh construction and SPMD Pianist programs."""

from .pianist import (BATCH_AXIS, MACHINES_AXIS, DistributedProof, fft,
                      make_mesh, prove, shard_srs)

__all__ = ["BATCH_AXIS", "MACHINES_AXIS", "DistributedProof", "fft",
           "make_mesh", "prove", "shard_srs"]
