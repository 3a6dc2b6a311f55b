from ai2bmd_tpu.parallel.mesh import make_mesh  # noqa: F401
from ai2bmd_tpu.parallel.multislice import (  # noqa: F401
    detect_slices,
    make_hybrid_mesh,
)
from ai2bmd_tpu.parallel.sharding import (  # noqa: F401
    EnsembleSimulation,
    ReplicaEnsemble,
    ShardedPotential,
    SolvatedReplicaEnsemble,
)
