from ai2bmd_tpu.parallel.mesh import make_mesh  # noqa: F401
from ai2bmd_tpu.parallel.sharding import (  # noqa: F401
    EnsembleSimulation,
    ReplicaEnsemble,
    ShardedPotential,
)
