"""`import gf2bv_tpu` must not initialize a JAX backend.

Backend initialization at import time claims the accelerator as a side
effect of merely importing the library (and wedges every process when the
device transport is unreachable).  The reference's import is similarly
side-effect-free (/root/reference/gf2bv/__init__.py imports only ctypes
bindings).  Regression guard for the module-scope jnp-constant class of
bug; runs in a subprocess because the test session itself has backends up.
"""

import subprocess
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent

_CHECK = """
import gf2bv_tpu
from jax._src import xla_bridge
assert not xla_bridge.backends_are_initialized(), "import initialized a backend"
print("lazy-ok")
"""


def test_import_does_not_initialize_backend():
    out = subprocess.run(
        [sys.executable, "-c", _CHECK],
        cwd=_ROOT, timeout=120, capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert "lazy-ok" in out.stdout
