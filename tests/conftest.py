"""Test config: run all tests on a virtual 8-device CPU mesh.

Sharding/pjit tests emulate a TPU pod slice with
xla_force_host_platform_device_count (SURVEY.md §4); numerical tests are
device-count agnostic.
"""
import pathlib
import sys

import jax
import pytest

# Force an 8-device CPU platform. NB: this environment pre-sets
# JAX_PLATFORMS=axon via sitecustomize, so env vars are NOT enough — the
# config must be updated before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Pin full-f32 matmuls for numerical parity tests (TPU/oneDNN default is a
# bf16-precision passthrough).
jax.config.update("jax_default_matmul_precision", "float32")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference repo, or skip if unavailable."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    return REFERENCE


@pytest.fixture(autouse=True)
def _reference_import_hygiene():
    """Keep reference-parity imports from shadowing repo modules.

    Several parity tests `sys.path.insert(0, '/root/reference')` to import
    reference packages. Without cleanup, a later `import hubconf` resolves to
    the REFERENCE's hubconf (which tries a network download). After every
    test, strip reference path entries and evict any module imported from
    under the reference tree.
    """
    yield
    ref = str(REFERENCE)
    sys.path[:] = [p for p in sys.path if not p.startswith(ref)]
    for name, mod in list(sys.modules.items()):
        modfile = getattr(mod, "__file__", None) or ""
        if modfile.startswith(ref):
            del sys.modules[name]
