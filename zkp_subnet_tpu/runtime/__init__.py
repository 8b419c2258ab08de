"""Runtime: coordinator/worker roles replacing the reference's neurons.

The reference's chain-coupled pieces (wallets, subtensor extrinsics, pm2) are
out of scope by design (SURVEY.md §7.4); membership is the device mesh, and
scoring/weights/state keep behavioral parity.
"""

from .config import (CoordinatorConfig, ProverConfig, WorkerConfig,
                     add_coordinator_args, add_worker_args,
                     coordinator_config, worker_config)
from .coordinator import Challenge, Coordinator
from .protocol import Prove
from .server import HttpTransport, WorkerServer
from .transport import LocalTransport, MeshTransport, MockTransport
from .worker import Worker

__all__ = ["Challenge", "Coordinator", "CoordinatorConfig", "HttpTransport", "LocalTransport",
           "MeshTransport", "MockTransport", "Prove", "ProverConfig", "Worker", "WorkerConfig",
           "add_coordinator_args", "add_worker_args", "coordinator_config",
           "worker_config", "WorkerServer"]
