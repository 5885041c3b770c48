"""Static typing as a test layer (the reference ships a mypy config + .pyi
stub as part of its test surface, ``/root/reference/pyproject.toml:11-19``).

Runs ``mypy gf2bv_tpu`` when the tool is importable; this image has no mypy
(and installs are not permitted), so the check skips there and runs in any
environment that has it.
"""

import subprocess
import sys
from pathlib import Path

import pytest

pytest.importorskip("mypy")

REPO = Path(__file__).resolve().parent.parent


def test_mypy_clean():
    proc = subprocess.run(
        [sys.executable, "-m", "mypy", "gf2bv_tpu"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
