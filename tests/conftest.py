import os

# Force a deterministic 8-device CPU mesh for all tests (multi-chip sharding
# is validated on a virtual host-device mesh; real-TPU runs happen in bench).
# NOTE: the surrounding environment exports JAX_PLATFORMS=axon (tunneled TPU)
# and the plugin merges itself back in, so the env var alone is NOT enough —
# jax.config.update after import is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ai2bmd_tpu.data import example_pdb, examples_dir  # noqa: E402,F401


def require_examples():
    if not os.path.isdir(examples_dir()):
        pytest.skip("example PDBs not available")


@pytest.fixture(scope="session")
def chig_protein():
    require_examples()
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.system import Protein

    atoms = normalize_atom_order(read_pdb(example_pdb("chig")))
    return Protein.from_atoms(atoms)


@pytest.fixture()
def rng():
    # function-scoped on purpose: a shared session RNG makes each test's
    # data depend on which tests ran before it (order-dependent flakiness
    # in tolerance-marginal comparisons); this way every test draws the
    # same stream whether run alone or in the full suite
    return np.random.default_rng(0)
